package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contracts for deterministic hard-negative sampling. */
class NegativeSampleSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (1L to 40L).toDF("id")
  private val anchors = docs.where(col("id") <= 3)
  private val noAvoid = Seq.empty[(Long, Long)].toDF("id", "neg")

  test("k slots per anchor, each the bucket argmin of the slot hash; " +
    "never the anchor itself; deterministic across partitionings") {
    val got = Sampling.negativeSample(anchors, docs, "id", k = 3,
        avoid = noAvoid, nBuckets = 4, seed = 7)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2)).size == 9, s"missing slots: $got")
    assert(got.forall(r => r._1 != r._3))
    // replay the argmin by hand for one slot
    val (a, s) = (1L, 0)
    val bucket = Dedup.md5Hash32Kernel(s"$a:$s", 8) % 4
    val inBucket = (1L to 40L).filter(c =>
      Dedup.md5Hash32Kernel(c.toString, 7) % 4 == bucket && c != a)
    val want = inBucket.map(c =>
      (Dedup.md5Hash32Kernel(s"$a:$s:$c", 9), c)).min._2
    assert(got.exists(r => r._1 == a && r._2 == s && r._3 == want))
    val again = Sampling.negativeSample(anchors.repartition(5),
        docs.repartition(7), "id", 3, noAvoid, 4, 7)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("excluded pairs yield the NEXT-best candidate, not a hole; a " +
    "fully-excluded bucket drops the slot") {
    val base = Sampling.negativeSample(anchors, docs, "id", 2,
        noAvoid, 4, 7)
      .as[(Long, Int, Long, Long)].collect()
    val victim = base.head
    // forbid that winner: the slot survives with a different candidate
    // from the same bucket (n_bucket down by one)
    val avoid = Seq((victim._1, victim._3)).toDF("id", "neg")
    val after = Sampling.negativeSample(anchors, docs, "id", 2,
        avoid, 4, 7)
      .as[(Long, Int, Long, Long)].collect()
      .filter(r => r._1 == victim._1 && r._2 == victim._2)
    assert(after.length == 1 && after.head._3 != victim._3)
    assert(after.head._4 == victim._4 - 1)
    // forbidding the ENTIRE candidate set drops every slot
    val all = docs.as[Long].collect().flatMap(c =>
      Seq(1L, 2L, 3L).map(a => (a, c))).toSeq.toDF("id", "neg")
    assert(Sampling.negativeSample(anchors, docs, "id", 2, all, 4, 7)
      .count() == 0)
  }
}
