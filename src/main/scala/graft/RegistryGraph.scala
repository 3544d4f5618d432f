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

/** SURVEY §2.8 graph / ER rows (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object GraphRegistry {
  val rows: Seq[Q] = Seq(
    // G1: banded pair-acceptance rule over the grid self-join candidates
    Q("g1_acceptance_rule",
      (s, dir) => {
        val pairs = SpatialJoins.gridSelfJoin(
          custPoints(s, dir).withColumn("name", col("c_name")),
          "c_custkey", "lat", "lon", radiusM = 250.0)
        val withSim = pairs
          .join(t(s, dir, "customer").select(col("c_custkey").as("a_id"),
            col("c_name").as("a_name")), "a_id")
          .join(t(s, dir, "customer").select(col("c_custkey").as("b_id"),
            col("c_name").as("b_name")), "b_id")
          .withColumn("sim", TextFunctions.levRatioCol(col("a_name"), col("b_name")))
        withSim.withColumn("accepted",
            (col("sim") >= 0.9) ||
            (col("sim") >= 0.85 && col("meters") <= 200.0) ||
            (col("sim") >= 0.8 && col("meters") <= 180.0))
          .where(col("accepted"))
          .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"),
            round(col("meters"), 2).as("meters"))
      },
      Some(s"""WITH pts AS ($custPointsSql),
              |pairs AS (
              |  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |    a.c_name AS a_name, b.c_name AS b_name,
              |    ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} AS meters
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
              |scored AS (SELECT *, 1.0 - levenshtein(a_name, b_name) /
              |  greatest(length(a_name), length(b_name)) AS sim FROM pairs)
              |SELECT a_id, b_id, round(sim, 4) AS sim, round(meters, 2) AS meters
              |FROM scored
              |WHERE sim >= 0.9 OR (sim >= 0.85 AND meters <= 200.0)
              |  OR (sim >= 0.8 AND meters <= 180.0)""".stripMargin)),

    // G2: connected components over near-pair edges (min-label fixpoint)
    Q("g2_connected_components",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        ConnectedComponents.run(edges)
      },
      Some(ccClosureOracleSql)),

    // GR: INCREMENTAL connected components — the same 200 m proximity
    // graph arriving as an initial load plus two ingest batches
    // (deterministic (src+dst)%3 / src%2 split), folded through the
    // standing base + flat-alias layout (ConnectedComponents
    // .incrementalMerge: batch endpoints probe the standing labels, a
    // BATCH-sized label graph solves the merges, the alias map absorbs
    // them — the corpus labeling is never recomputed). The oracle is
    // g2's full reachability closure over ALL edges VERBATIM — the
    // fold-equals-rebuild equivalence IS the check.
    Q("gr_cc_incremental",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val k = pmod(col("src") + col("dst"), lit(3))
        ConnectedComponents.incrementalFold(
          edges.where(k =!= 0),
          Seq(edges.where(k === 0 && pmod(col("src"), lit(2)) === 0),
            edges.where(k === 0 && pmod(col("src"), lit(2)) === 1)))
      },
      Some(ccClosureOracleSql)),

    // G3: canonical-id minting from the longest member name per cluster
    Q("g3_canonical_mint",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(length(col("c_name")).desc, col("c_name").asc)
        // "St. " prefix exercises norm_name's kept-punctuation class
        // (.,:_ survive; # is dropped) — reference etl/er.py:30-34
        t(s, dir, "customer").withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("c_nationkey"),
            concat(TextFunctions.normNameUdf(concat(lit("St. "), col("c_name"))),
              lit("::"), col("c_nationkey").cast("string")).as("canonical_id"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (
             |  PARTITION BY c_nationkey
             |  ORDER BY length(c_name) DESC, c_name ASC) AS rn FROM customer)
             |SELECT c_nationkey,
             |  regexp_replace(regexp_replace(lower(trim('St. ' || c_name)),
             |    '\s+', '-', 'g'), '[^a-z0-9\-:_.,]+', '', 'g')
             |  || '::' || CAST(c_nationkey AS VARCHAR) AS canonical_id
             |FROM ranked WHERE rn = 1""".stripMargin)),

    // G4: point-in-region assignment cascade, all three geometry rules
    // under the oracle (polygon ray-cast -> bbox -> radius), with the
    // reference's tie-breaks: polygon/bbox by config order (city_id), the
    // radius rule by distance. Each city gets a diamond polygon inside its
    // bbox so points exercise every rule.
    Q("g4_region_cascade",
      (s, dir) => {
        val cities = t(s, dir, "region")
          .select(col("r_regionkey").as("city_id"),
            (lit(40.0) + col("r_regionkey") * 0.04).as("center_lat"),
            lit(-74.95).as("center_lon"))
          .withColumn("min_lat", col("center_lat") - 0.01)
          .withColumn("max_lat", col("center_lat") + 0.01)
          .withColumn("min_lon", col("center_lon") - 0.02)
          .withColumn("max_lon", col("center_lon") + 0.02)
          .withColumn("polygon", array(
            struct((col("center_lat") + 0.008).as("lat"), col("center_lon").as("lon")),
            struct(col("center_lat").as("lat"), (col("center_lon") + 0.016).as("lon")),
            struct((col("center_lat") - 0.008).as("lat"), col("center_lon").as("lon")),
            struct(col("center_lat").as("lat"), (col("center_lon") - 0.016).as("lon"))))
        val pts = custPoints(s, dir)
        val cand = pts.crossJoin(broadcast(cities))
          .withColumn("in_poly", GeoFunctions.pointInPolygonUdf(col("lat"),
            col("lon"), col("polygon")))
          .withColumn("in_bbox", GeoFunctions.bboxContains(col("lat"), col("lon"),
            col("min_lat"), col("min_lon"), col("max_lat"), col("max_lon")))
          .withColumn("center_m", GeoFunctions.haversineM(col("lat"), col("lon"),
            col("center_lat"), col("center_lon")))
          .withColumn("rule", when(col("in_poly"), 1).when(col("in_bbox"), 2)
            .when(col("center_m") <= 3000.0, 3))
          .where(col("rule").isNotNull)
        val w = Window.partitionBy("c_custkey")
          .orderBy(col("rule").asc,
            when(col("rule") === 3, col("center_m"))
              .otherwise(col("city_id").cast("double")).asc,
            col("city_id").asc)
        cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("c_custkey"), col("city_id"), col("rule"),
            round(col("center_m"), 2).as("center_m"))
      },
      Some(s"""WITH cities AS (
              |  SELECT r_regionkey AS city_id,
              |    40e0 + r_regionkey * 4e-2 AS center_lat,
              |    -7.495e1 AS center_lon FROM region),
              |pts AS ($custPointsSql),
              |verts AS (
              |  SELECT city_id, center_lat, center_lon, v,
              |    CASE v WHEN 0 THEN center_lat + 8e-3 WHEN 1 THEN center_lat
              |           WHEN 2 THEN center_lat - 8e-3 ELSE center_lat END AS vy,
              |    CASE v WHEN 0 THEN center_lon WHEN 1 THEN center_lon + 1.6e-2
              |           WHEN 2 THEN center_lon ELSE center_lon - 1.6e-2 END AS vx
              |  FROM cities, (SELECT unnest(range(0, 4)) AS v)),
              |edges AS (
              |  SELECT a.city_id, a.vy AS yi, a.vx AS xi, b.vy AS yj, b.vx AS xj
              |  FROM verts a JOIN verts b
              |    ON a.city_id = b.city_id AND b.v = (a.v + 3) % 4),
              |poly AS (
              |  SELECT p.c_custkey, e.city_id,
              |    sum(CASE WHEN ((xi > p.lon) <> (xj > p.lon)) AND
              |      (p.lat < (yj - yi) * (p.lon - xi) / ((xj - xi) + 1e-12) + yi)
              |      THEN 1 ELSE 0 END) % 2 = 1 AS in_poly
              |  FROM pts p CROSS JOIN edges e GROUP BY p.c_custkey, e.city_id),
              |cand AS (
              |  SELECT p.c_custkey, c.city_id, poly.in_poly,
              |    (lat >= center_lat - 1e-2 AND lat <= center_lat + 1e-2 AND
              |     lon >= center_lon - 2e-2 AND lon <= center_lon + 2e-2) AS in_bbox,
              |    ${havSql("lat", "lon", "center_lat", "center_lon")} AS center_m
              |  FROM pts p CROSS JOIN cities c
              |  JOIN poly ON poly.c_custkey = p.c_custkey
              |    AND poly.city_id = c.city_id),
              |ruled AS (
              |  SELECT *, CASE WHEN in_poly THEN 1 WHEN in_bbox THEN 2
              |    WHEN center_m <= 3e3 THEN 3 END AS rule
              |  FROM cand
              |  WHERE in_poly OR in_bbox OR center_m <= 3e3),
              |ranked AS (SELECT *, row_number() OVER (PARTITION BY c_custkey
              |  ORDER BY rule ASC,
              |    CASE WHEN rule = 3 THEN center_m
              |         ELSE CAST(city_id AS DOUBLE) END ASC,
              |    city_id ASC) AS rn FROM ruled)
              |SELECT c_custkey, city_id, rule, round(center_m, 2) AS center_m
              |FROM ranked WHERE rn = 1""".stripMargin)),

    // G8: ER audit — near pairs in a distance band NOT accepted by G1
    Q("g8_audit_band",
      (s, dir) => {
        val pairs = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .join(t(s, dir, "customer").select(col("c_custkey").as("a_id"),
            col("c_name").as("a_name")), "a_id")
          .join(t(s, dir, "customer").select(col("c_custkey").as("b_id"),
            col("c_name").as("b_name")), "b_id")
          .withColumn("sim", TextFunctions.levRatioCol(col("a_name"), col("b_name")))
        pairs.where(col("meters") >= 150.0 && col("meters") <= 180.0 &&
            col("sim") <= 0.85)
          .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
      },
      Some(s"""WITH pts AS ($custPointsSql),
              |pairs AS (
              |  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |    a.c_name AS a_name, b.c_name AS b_name,
              |    ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} AS meters
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0)
              |SELECT a_id, b_id, round(1.0 - levenshtein(a_name, b_name) /
              |  greatest(length(a_name), length(b_name)), 4) AS sim
              |FROM pairs
              |WHERE meters >= 150.0 AND meters <= 180.0
              |  AND 1.0 - levenshtein(a_name, b_name) /
              |    greatest(length(a_name), length(b_name)) <= 0.85""".stripMargin))
  )

  // =================================================================
  // LLM-data-pipeline operators: dedup / similarity search / text analysis
  // =================================================================

  /** DuckDB fragment: alnum tokens of `rel`.text (mirrors Dedup.tokens). */
}
