package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The 100 TB paths documented for a6/a14 swap exact aggregates for
  * sketches (HLL++ distinct counts, t-digest style percentiles) whose
  * partials merge map-side. These can't hash-match a DuckDB oracle, so
  * this spec pins their error against the exact answers on the driver's
  * tables instead — the claim "bounded error, mergeable state" is tested,
  * not asserted in prose. */
class SketchSpec extends SparkTestBase {

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("approx_count_distinct stays within 3x the configured rsd") {
    val row = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx"))
      .head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.15,
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val row = orders.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx"))
      .head()
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    // accuracy=10000 on 1.5k rows pins the rank exactly; the remaining
    // gap is interpolation (approx returns an actual data point)
    assert(math.abs(approx - exact) / exact <= 0.01,
      s"exact=$exact approx=$approx")
  }
}
