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

/** SURVEY §2.7 scalar functions (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object FunctionRegistry {
  val rows: Seq[Q] = Seq(
    // F10/F11: haversine + equirectangular side by side
    Q("f10_geo_distances",
      (s, dir) => custPoints(s, dir).where(col("c_custkey") < 200)
        .select(col("c_custkey"),
          round(GeoFunctions.haversineM(col("lat"), col("lon"),
            lit(40.05), lit(-74.95)), 2).as("hav_m"),
          round(GeoFunctions.equirectM(col("lat"), col("lon"),
            lit(40.05), lit(-74.95)), 2).as("eq_m")),
      Some(s"""SELECT c_custkey,
              |  round(${havSql("lat", "lon", "40.05", "-74.95")}, 2) AS hav_m,
              |  round(sqrt(pow((-74.95 - lon) * (40075000.0 / 360.0) *
              |      cos(radians((lat + 40.05) / 2)), 2) +
              |    pow((40.05 - lat) * 111320.0, 2)), 2) AS eq_m
              |FROM ($custPointsSql) WHERE c_custkey < 200""".stripMargin)),

    // F16: composite content id (md5 for cross-engine parity; the library
    // also ships sha1Id for reference byte-parity)
    Q("f16_hash_id",
      (s, dir) => t(s, dir, "orders").where(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          md5(concat_ws("|", col("o_orderkey").cast("string"),
            col("o_orderstatus"), col("o_orderpriority"))).as("row_id")),
      Some("""SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR) || '|' ||
             |  o_orderstatus || '|' || o_orderpriority) AS row_id
             |FROM orders WHERE o_orderkey < 500""".stripMargin)),

    // F17/F18: price parsing from dirty strings (synthesized from integer
    // arithmetic so both engines build byte-identical inputs)
    Q("f17_price_parse",
      (s, dir) => {
        val cents = pmod(col("p_partkey") * 7919L, lit(1000000L))
        val dollars = floor(cents / 100.0).cast("long")
        val frac = pmod(cents, lit(100L))
        val grouped = when(dollars >= 1000,
          concat(floor(dollars / 1000.0).cast("long").cast("string"), lit(","),
            lpad(pmod(dollars, lit(1000L)).cast("string"), 3, "0")))
          .otherwise(dollars.cast("string"))
        t(s, dir, "part")
          .withColumn("dirty", concat(lit("$"), grouped, lit("."),
            lpad(frac.cast("string"), 2, "0"), lit(" USD")))
          .select(col("p_partkey"), col("dirty"),
            regexp_replace(regexp_extract(col("dirty"), "([0-9,]+\\.[0-9]+)", 1),
              ",", "").cast("double").as("parsed"))
      },
      Some("""WITH d AS (
             |  SELECT p_partkey, (p_partkey * 7919) % 1000000 AS cents FROM part),
             |d2 AS (
             |  SELECT p_partkey,
             |    CAST(floor(cents / 1e2) AS BIGINT) AS dollars,
             |    cents % 100 AS frac FROM d),
             |d3 AS (
             |  SELECT p_partkey, '$' ||
             |    CASE WHEN dollars >= 1000 THEN
             |      CAST(CAST(floor(dollars / 1e3) AS BIGINT) AS VARCHAR) || ',' ||
             |      lpad(CAST(dollars % 1000 AS VARCHAR), 3, '0')
             |    ELSE CAST(dollars AS VARCHAR) END ||
             |    '.' || lpad(CAST(frac AS VARCHAR), 2, '0') || ' USD' AS dirty
             |  FROM d2)
             |SELECT p_partkey, dirty,
             |  CAST(replace(regexp_extract(dirty, '([0-9,]+\.[0-9]+)', 1), ',', '')
             |    AS DOUBLE) AS parsed
             |FROM d3""".stripMargin)),

    // F19: ID float-tail fix
    Q("f19_id_cleanup",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 300)
        .withColumn("dirty_id", concat(col("c_custkey").cast("string"), lit(".0")))
        .select(col("c_custkey"),
          regexp_replace(trim(col("dirty_id")), "\\.0+$", "").as("clean_id")),
      Some("""SELECT c_custkey, regexp_replace(trim(CAST(c_custkey AS VARCHAR)
             |  || '.0'), '\.0+$', '') AS clean_id
             |FROM customer WHERE c_custkey < 300""".stripMargin)),

    // F22/F23: coalesce fallback + bool decode
    Q("f23_bool_decode",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 400)
        .withColumn("raw_flag",
          element_at(array(lit("t"), lit("True"), lit("1"), lit("TRUE"), lit("f")),
            (pmod(col("c_custkey"), lit(5)) + 1).cast("int")))
        .select(col("c_custkey"), col("raw_flag"),
          col("raw_flag").isin("t", "True", "1", "TRUE").as("decoded")),
      Some("""SELECT c_custkey,
             |  (['t', 'True', '1', 'TRUE', 'f'])[(c_custkey % 5) + 1] AS raw_flag,
             |  (['t', 'True', '1', 'TRUE', 'f'])[(c_custkey % 5) + 1]
             |    IN ('t', 'True', '1', 'TRUE') AS decoded
             |FROM customer WHERE c_custkey < 400""".stripMargin)),

    // F24: timestamp handling — hour-of-day histogram
    Q("f24_time_parts",
      (s, dir) => t(s, dir, "events")
        .groupBy(hour(col("ts")).as("hour_of_day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value")),
      Some("""SELECT CAST(date_part('hour', ts) AS INT) AS hour_of_day,
             |  count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1""".stripMargin)),

    // F25: JSON extraction from the events props column
    Q("f25_json_extract",
      (s, dir) => t(s, dir, "events")
        // events ships as ONE parquet row group, so the scan is one task;
        // rebalance (2 MB shuffle) before the per-row JSON parse or the
        // whole extraction serializes on a single core
        .repartition(col("event_id"))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k")),
      Some("""SELECT event_type, count(*) AS n,
             |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
             |    AS avg_k
             |FROM events GROUP BY event_type""".stripMargin))
  )

  // =================================================================
  // §2.5 graph / ER operators
  // =================================================================

}
