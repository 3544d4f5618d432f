package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.er.EntityResolution
import graft.functions.GeoFunctions
import graft.functions.TextFunctions
import graft.functions.UrlFunctions
import graft.operators._
import graft.sources.Sources
import graft.staging.CityAssignment
import graft.RegistryCore._

/** SURVEY §2.2 projections / filters (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object FilterRegistry {
  val rows: Seq[Q] = Seq(
    Q("p1_project_rename",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey").as("part_id"), col("p_name").as("part_name"),
          round(col("p_retailprice") * 1.1, 2).as("marked_up")),
      Some("""SELECT p_partkey AS part_id, p_name AS part_name,
             |  round(p_retailprice * 1.1, 2) AS marked_up FROM part""".stripMargin)),

    Q("p2_null_drop",
      (s, dir) => t(s, dir, "events")
        .na.drop(Seq("user_id", "value"))
        .where(col("value") > 50)
        .select("event_id", "user_id", "event_type"),
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE user_id IS NOT NULL AND value IS NOT NULL AND value > 50"""
        .stripMargin)),

    Q("p3_nonempty_text",
      (s, dir) => t(s, dir, "documents")
        .where(col("text").isNotNull && trim(col("text")) =!= "" &&
          col("n_chars") >= 300)
        .select("doc_id", "lang", "n_chars"),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE text IS NOT NULL AND trim(text) <> '' AND n_chars >= 300"""
        .stripMargin)),

    Q("p4_semi_join",
      (s, dir) => t(s, dir, "customer").join(
          t(s, dir, "orders").where(col("o_totalprice") > 400),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer WHERE c_custkey IN
             |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400)"""
        .stripMargin)),

    // P5/P6: per-key bbox containment + distance guard on lattice points
    Q("p5_bbox_filter",
      (s, dir) => custPoints(s, dir)
        .where(GeoFunctions.bboxContains(col("lat"), col("lon"),
          lit(40.02), lit(-74.99), lit(40.06), lit(-74.97)))
        .select("c_custkey", "lat", "lon"),
      Some(s"""SELECT c_custkey, lat, lon FROM ($custPointsSql)
              |WHERE lat >= 40.02 AND lat <= 40.06
              |  AND lon >= -74.99 AND lon <= -74.97""".stripMargin)),

    Q("p6_distance_guard",
      (s, dir) => custPoints(s, dir)
        .withColumn("meters", GeoFunctions.haversineM(col("lat"), col("lon"),
          lit(40.05), lit(-74.95)))
        .where(col("meters") <= 5000.0)
        .select(col("c_custkey"), round(col("meters"), 2).as("meters")),
      Some(s"""SELECT c_custkey,
              |  round(${havSql("lat", "lon", "40.05", "-74.95")}, 2) AS meters
              |FROM ($custPointsSql)
              |WHERE ${havSql("lat", "lon", "40.05", "-74.95")} <= 5000.0"""
        .stripMargin)),

    Q("p8_source_filter",
      (s, dir) => t(s, dir, "documents").where(col("source") === "src1")
        .select("doc_id", "source", "lang"),
      Some("SELECT doc_id, source, lang FROM documents WHERE source = 'src1'")),

    // P9/F3: slug sanitization as pure column expr
    Q("p9_slug_project",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          regexp_replace(regexp_replace(lower(col("p_name")), "[^a-z0-9]+", "-"),
            "^-+|-+$", "").as("slug")),
      Some("""SELECT p_partkey, regexp_replace(regexp_replace(lower(p_name),
             |  '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g') AS slug FROM part"""
        .stripMargin))
  )

  // =================================================================
  // §2.3 joins
  // =================================================================

}
