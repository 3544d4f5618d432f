package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed contracts for leakage-safe target encoding. */
class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  // category A: targets fold0 = (1, 1), fold1 = (0,); category B:
  // fold0 = (1,), fold1 only via row 6? keep B in fold1 only.
  private val df = Seq(
    (1L, "A", 1.0, 0), (2L, "A", 1.0, 0), (3L, "A", 0.0, 1),
    (4L, "B", 1.0, 0), (5L, "B", 0.0, 1)
  ).toDF("id", "cat", "t", "f")

  test("encode excludes the row's own fold and smooths to the " +
    "other-folds prior") {
    val m = 2.0
    val got = Features.targetEncode(df, "cat", col("t"), col("f"), m)
      .select("id", "enc").as[(Long, Double)].collect().toMap
    // global: S=3, N=5; fold0: S=3,N=3; fold1: S=0,N=2
    val prior0 = (3.0 - 3.0) / (5 - 3) // rows in fold0 use fold1+... = 0
    val prior1 = (3.0 - 0.0) / (5 - 2) // = 1
    // row 1 (A, fold0): S_A=2,N_A=3 minus fold0 (2,2) -> (0,1)
    val e1 = (0 + m * prior0) / (1 + m)
    // row 3 (A, fold1): minus fold1 (0,1) -> (2,2)
    val e3 = (2 + m * prior1) / (2 + m)
    // row 4 (B, fold0): S_B=1,N_B=2 minus fold0 (1,1) -> (0,1)
    val e4 = (0 + m * prior0) / (1 + m)
    // row 5 (B, fold1): minus fold1 (0,1) -> (1,1)
    val e5 = (1 + m * prior1) / (1 + m)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L) == r6(e1) && got(2L) == r6(e1))
    assert(got(3L) == r6(e3))
    assert(got(4L) == r6(e4))
    assert(got(5L) == r6(e5))
  }

  test("category seen only in the row's own fold encodes to the prior") {
    val d2 = df.union(Seq((6L, "C", 1.0, 0)).toDF("id", "cat", "t", "f"))
    val got = Features.targetEncode(d2, "cat", col("t"), col("f"), 2.0)
      .select("id", "enc").as[(Long, Double)].collect().toMap
    // C exists only in fold 0: S_C - S_C0 = 0, N_C - N_C0 = 0 ->
    // enc = m*prior/m = prior of fold 0 = (4-4)/(6-4) = 0
    assert(got(6L) == 0.0)
  }

  test("null category is a category: rows survive and encode from " +
    "the null group's own other-fold evidence") {
    val dn = df.union(Seq((7L, null.asInstanceOf[String], 1.0, 0),
      (9L, null.asInstanceOf[String], 0.0, 1)).toDF("id", "cat", "t", "f"))
    val got = Features.targetEncode(dn, "cat", col("t"), col("f"), 2.0)
      .select("id", "enc").as[(Long, Double)].collect().toMap
    assert(got.keySet == (1L to 5L).toSet ++ Set(7L, 9L),
      s"rows dropped: ${got.keySet}")
    // row 7 (null cat, fold 0): null-group other-fold = (0, 1);
    // prior0 = (4 - 4)/(7 - 4) = 0 -> enc = (0 + 2*0)/(1 + 2) = 0
    assert(got(7L) == 0.0)
  }

  test("encoding is partitioning-invariant") {
    val a = Features.targetEncode(df, "cat", col("t"), col("f"), 5.0)
      .select("id", "enc").collect().toSet
    val b = Features.targetEncode(df.repartition(7), "cat", col("t"),
      col("f"), 5.0).select("id", "enc").collect().toSet
    assert(a == b)
  }

  test("calibrationReport: equal-width bins, conf = 1.0 lands in the " +
    "TOP bin, per-bin mean confidence and accuracy are exact") {
    import spark.implicits._
    val preds = Seq(
      (0.05, 0), (0.15, 0), (0.15, 1), // bins 0 and 1
      (0.95, 1), (0.95, 1), (0.95, 0), // bin 9
      (1.0, 1) // exactly 1.0 must clamp into bin 9, not a phantom 10
    ).toDF("conf", "correct")
    val got = Features.calibrationReport(preds, "conf", "correct")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(0, 1, 9), got.toString)
    assert(got(0) == ((1L, 0.05, 0.0)))
    assert(got(1) == ((2L, 0.15, 0.5)))
    // bin 9: (0.95*3 + 1.0)/4 = 0.9625, accuracy 3/4
    assert(got(9) == ((4L, 0.9625, 0.75)), got(9).toString)
  }
}
