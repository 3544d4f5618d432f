package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contracts for deterministic hard-negative sampling. */
class NegativeSampleSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (1L to 40L).toDF("id")
  private val anchors = docs.where(col("id") <= 3)
  private val noAvoid = Seq.empty[(Long, Long)].toDF("id", "neg")

  /** Hand replay of the rank assignment: anchor a's slot s takes the
    * r-th smallest (h32(a:c, 9), c) of its bucket, where r is s's rank
    * among a's slots hashing to the same bucket. */
  private def replay(a: Long, s: Int, k: Int, b: Int): Long = {
    def slotBucket(j: Int) = Dedup.md5Hash32Kernel(s"$a:$j", 8) % b
    val myBucket = slotBucket(s)
    val rank = (0 until k).count(j => j < s && slotBucket(j) == myBucket)
    val inBucket = (1L to 40L).filter(c =>
      Dedup.md5Hash32Kernel(c.toString, 7) % b == myBucket && c != a)
    inBucket.map(c => (Dedup.md5Hash32Kernel(s"$a:$c", 9), c))
      .sorted.apply(rank)._2
  }

  test("k slots per anchor, each a distinct rank of its bucket's seeded " +
    "permutation; never the anchor itself; deterministic across " +
    "partitionings") {
    val got = Sampling.negativeSample(anchors, docs, "id", k = 3,
        avoid = noAvoid, nBuckets = 4, seed = 7)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2)).size == 9, s"missing slots: $got")
    assert(got.forall(r => r._1 != r._3))
    // replay the ranked pick by hand for every (anchor, slot)
    for (a <- 1L to 3L; s <- 0 until 3) {
      val want = replay(a, s, k = 3, b = 4)
      assert(got.exists(r => r._1 == a && r._2 == s && r._3 == want),
        s"anchor $a slot $s: wanted $want in $got")
    }
    val again = Sampling.negativeSample(anchors.repartition(5),
        docs.repartition(7), "id", 3, noAvoid, 4, 7)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("an anchor's k negatives are DISTINCT even when slots collide " +
    "on a bucket (k > nBuckets forces collisions)") {
    val got = Sampling.negativeSample(anchors, docs, "id", k = 6,
        avoid = noAvoid, nBuckets = 2, seed = 7)
      .as[(Long, Int, Long, Long)].collect()
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.nonEmpty)
    byAnchor.foreach { case (a, rows) =>
      // 6 slots over 2 buckets: pigeonhole guarantees same-bucket slots
      assert(rows.length == 6, s"anchor $a: ${rows.toSeq}")
      assert(rows.map(_._3).distinct.length == rows.length,
        s"anchor $a drew a duplicate negative: ${rows.toSeq}")
    }
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

  test("nBuckets = 0 auto-sizes from the candidate count (~256/bucket) " +
    "and still fills every slot") {
    // 40 candidates -> max(1, 40/256) = 1 bucket: every slot ranks the
    // same global permutation, negatives stay distinct per anchor
    val got = Sampling.negativeSample(anchors, docs, "id", k = 4,
        avoid = noAvoid, nBuckets = 0, seed = 7)
      .as[(Long, Int, Long, Long)].collect()
    assert(got.length == 12, got.toSeq.toString)
    assert(got.forall(_._4 == 39L), "1 bucket of 39 eligible candidates")
    got.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.map(_._3).distinct.length == 4, s"anchor $a: ${rows.toSeq}")
      // rank j takes the j-th smallest of the global permutation
      val perm = (1L to 40L).filter(_ != a)
        .map(c => (Dedup.md5Hash32Kernel(s"$a:$c", 9), c)).sorted
      rows.sortBy(_._2).zipWithIndex.foreach { case (r, j) =>
        assert(r._3 == perm(j)._2, s"anchor $a slot ${r._2}")
      }
    }
  }
}
