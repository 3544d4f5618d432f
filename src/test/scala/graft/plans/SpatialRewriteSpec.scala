package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SpatialRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val places = Seq(
    (1L, 48.2000, 16.3700),
    (2L, 48.2001, 16.3700), // ~11 m from 1
    (3L, 48.2000, 16.3720), // ~148 m from 1
    (4L, 48.3000, 16.5000)  // far
  ).toDF("pid", "plat", "plon")

  private lazy val probes = Seq(
    (10L, 48.20005, 16.37001), // near 1 and 2
    (11L, 48.29995, 16.50005)  // near 4
  ).toDF("qid", "qlat", "qlon")

  test("WithinMeters joins rewrite to grid equi-joins with exact results") {
    GraftExtensions.install(spark)
    val joined = places.join(probes,
      WithinMeters(col("plat"), col("plon"), col("qlat"), col("qlon"), 200.0))
    val got = joined.select("pid", "qid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 11L)))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("WithinMeters combined with extra equi conditions still rewrites") {
    GraftExtensions.install(spark)
    val l = places.withColumn("grp", col("pid") % 2)
    val r = probes.withColumn("grp", col("qid") % 2)
    val joined = l.join(r,
      l("grp") === r("grp") &&
        WithinMeters(col("plat"), col("plon"), col("qlat"), col("qlon"), 200.0))
    val got = joined.select("pid", "qid").as[(Long, Long)].collect().toSet
    // grp parity must also match: only (2,10) has equal pid%2 and qid%2
    // among the within-radius pairs ((4,11) fails parity: 0 vs 1)
    assert(got == Set((2L, 10L)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("high-latitude pairs survive the rewrite (latitude-safe cell choice)") {
    GraftExtensions.install(spark)
    // at 74N a 0.0121-deg lon gap is ~371 m, but under a 0.01-deg cell the
    // points can sit 2 cells apart (16.0099 -> 1600, 16.0220 -> 1602) and a
    // radius-only cell choice silently drops the pair; the safety factor
    // bumps 400 m to a 0.1-deg cell, keeping the 3x3 neighborhood complete
    val l = Seq((1L, 74.0, 16.0099)).toDF("pid", "plat", "plon")
    val r = Seq((2L, 74.0, 16.0220)).toDF("qid", "qlat", "qlon")
    val joined = l.join(r,
      WithinMeters(col("plat"), col("plon"), col("qlat"), col("qlon"), 400.0))
    assert(joined.select("pid", "qid").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("oversized radii decline the rewrite instead of dropping pairs") {
    GraftExtensions.install(spark)
    // > 27.8 km: no decade cell is latitude-safe; the join must fall back
    // to the exact (nested-loop) plan and stay CORRECT
    val l = Seq((1L, 48.0, 16.0)).toDF("pid", "plat", "plon")
    val r = Seq((2L, 48.2, 16.0)).toDF("qid", "qlat", "qlon") // ~22.3 km
    val joined = l.join(r,
      WithinMeters(col("plat"), col("plon"), col("qlat"), col("qlon"), 30000.0))
    assert(joined.select("pid", "qid").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L)))
  }

  test("WithinMeters still evaluates as a plain predicate outside joins") {
    GraftExtensions.install(spark)
    val out = places.where(WithinMeters(col("plat"), col("plon"),
        lit(48.2000), lit(16.3700), 200.0))
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L))
  }
}
