package graft.plans

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, Seq(1f, 2f, 3f, 4f), Seq(1f, 2f, 3f, 4f)),   // identical
    (2L, Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f)),   // orthogonal
    (3L, Seq(0f, 0f, 0f, 0f), Seq(1f, 2f, 3f, 4f)),   // zero-norm left
    (4L, Seq(1f, 2f, 3f, 4f), Seq(0f, 0f, 0f, 0f)),   // zero-norm right
    (5L, Seq(-1f, 2.5f, -3.25f, 4.125f), Seq(9f, -8f, 7f, -6f)),
    (6L, Seq(1e-30f, 2e-30f, 3e-30f, 4e-30f), Seq(1f, 1f, 1f, 1f)))

  test("CosineSim equals the JVM kernel bit-for-bit, including zero-norm " +
    "guards and subnormal-ish inputs") {
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorExpressions.cosineSim(col("a"), col("b")).as("c"))
      .as[(Long, Double)].collect().toMap
    for ((id, a, b) <- rows)
      assert(got(id) == Similarity.cosineKernel(a, b),
        s"id=$id: ${got(id)} vs ${Similarity.cosineKernel(a, b)}")
  }

  test("double arrays and mixed float/double sides evaluate identically") {
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), col("a"),
        transform(col("b"), _.cast("double")).as("bd"))
    val got = df.select(col("id"),
        VectorExpressions.cosineSim(col("a"), col("bd")).as("c"))
      .as[(Long, Double)].collect().toMap
    for ((id, a, b) <- rows)
      assert(got(id) == Similarity.cosineKernel(a, b))
  }

  test("null arrays yield null; the expression stays in codegen") {
    val df = Seq((1L, Option(Seq(1f, 2f)), Option(Seq(1f, 2f))),
      (2L, Option.empty[Seq[Float]], Option(Seq(1f, 2f))))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        VectorExpressions.cosineSim(col("a"), col("b")).as("c"))
    val got = out.as[(Long, Option[Double])].collect().toMap
    // cos(v, v) lands an ulp under 1.0 (sqrt(na)*sqrt(nb) vs na) — the
    // kernel's contract, not a bug; the null row is the point here
    assert(got(1L).exists(c => math.abs(c - 1.0) < 1e-12) && got(2L).isEmpty)

    // WholeStageCodegen covers the projection (no UDF fallback) — over a
    // range source so ConvertToLocalRelation can't fold the projection
    val live = spark.range(10).select(
        array(lit(1f), col("id").cast("float")).as("a"),
        array(lit(1f), lit(2f)).as("b"))
      .select(VectorExpressions.cosineSim(col("a"), col("b")).as("c"))
    live.collect()
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
