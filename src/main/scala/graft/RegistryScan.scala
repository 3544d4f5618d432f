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

/** SURVEY §2.1 scans / sinks (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object ScanRegistry {
  val rows: Seq[Q] = Seq(
    // S1/S2: projection + filter pushdown reaching the scan
    Q("s1_pushdown_scan",
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_quantity") >= 45 && col("l_shipdate").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity >= 45 AND l_shipdate IS NOT NULL""".stripMargin)),

    // S3: chunkless scan+join (Spark partitions replace manual chunking)
    Q("s3_scan_join",
      (s, dir) => t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // S6/K3: CSV sink + schema-forced CSV scan roundtrip
    Q("k3_csv_roundtrip",
      (s, dir) => {
        val tmp = s"/tmp/graft_csv_rt_${new java.io.File(dir).getName}"
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").option("header", "true").csv(tmp)
        s.read.option("header", "true")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT").csv(tmp)
          .groupBy("n_regionkey").agg(count(lit(1)).as("n_nations"),
            min("n_name").as("first_nation"))
      },
      Some("""SELECT n_regionkey, count(*) AS n_nations,
             |  min(n_name) AS first_nation FROM nation GROUP BY n_regionkey"""
        .stripMargin)),

    // S9/K4: JSONL sink + scan roundtrip
    Q("k4_jsonl_roundtrip",
      (s, dir) => {
        val tmp = s"/tmp/graft_json_rt_${new java.io.File(dir).getName}"
        t(s, dir, "region").write.mode("overwrite").json(tmp)
        s.read.json(tmp).groupBy().agg(count(lit(1)).as("n_regions"),
          min("r_name").as("first_region"))
      },
      Some("SELECT count(*) AS n_regions, min(r_name) AS first_region FROM region")),

    // K7: ORC sink/source roundtrip (columnar format beside parquet) —
    // full-content identity proven by hashing the read-back rows against
    // the parquet-sourced oracle
    Q("k7_orc_roundtrip",
      (s, dir) => {
        val tmp = s"/tmp/graft_orc_rt_${new java.io.File(dir).getName}"
        t(s, dir, "documents").select("doc_id", "source", "lang", "text")
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp).select("doc_id", "source", "lang", "text")
      },
      Some("SELECT doc_id, source, lang, text FROM documents")),

    // K5/A11: nested-doc export — capped per-group sub-arrays rendered as a
    // deterministic JSON string (manual concat: byte-identical cross-engine)
    Q("k5_nested_doc",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val top = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .withColumn("rn", row_number().over(Window.partitionBy("n_name")
            .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
          .where(col("rn") <= 3)
        top.groupBy("n_name")
          .agg(concat(lit("{\"nation\":\""), col("n_name"),
            lit("\",\"top\":[\""),
            array_join(transform(
              array_sort(collect_list(struct(col("rn"), col("c_name")))),
              x => x.getField("c_name")), "\",\""),
            lit("\"]}")).as("doc"))
          .select("n_name", "doc")
      },
      Some("""WITH ranked AS (
             |  SELECT n_name, c_name, row_number() OVER (
             |    PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |SELECT n_name, '{"nation":"' || n_name || '","top":["' ||
             |  string_agg(c_name, '","' ORDER BY rn) || '"]}' AS doc
             |FROM ranked WHERE rn <= 3 GROUP BY n_name""".stripMargin)),

    // K8: the reference's EXACT POI-card export doc
    // (`neo4j_cypher/20_export_poi_cards.cypher:7-27`): one JSON card per
    // canonical place with {id, name, city, lat, lon, wv[<=2, 600-char],
    // listings_nearby, popularity_z, sustainability_popularity_flag,
    // quotes[<=4 of {src, txt<=220}]} — non-empty-after-trim review
    // filtering, popularity_z = coalesce(blended_z, listings_z) (cypher 13b
    // only writes blended for places WITH reviews; others fall back to the
    // listings z of cypher 12, which is also what the stored flag was
    // computed from). Customers play canonical places, nations play cities,
    // documents play reviews (dealt deterministically by doc_id), suppliers
    // play listings. JSON is assembled by explicit concatenation with
    // decimal-cast number rendering so the byte layout is engine-neutral;
    // collect order inside wv/quotes is pinned to doc_id (the reference's
    // Cypher collect() order is storage-dependent — deliberate divergence,
    // documented here).
    Q("k8_poi_cards",
      (s, dir) => {
        val esc = (c: Column) => replace(replace(c, lit("\\"), lit("\\\\")),
          lit("\""), lit("\\\""))
        val maxck = t(s, dir, "customer").agg(max("c_custkey").as("maxck"))
        val docs = t(s, dir, "documents")
          .where(trim(col("text")) =!= "")
          .crossJoin(broadcast(maxck))
          // deal into (nCust/15) buckets, ~5 docs per hit place, so the
          // <=2 wv and <=4 quote caps genuinely truncate (a 1:1 deal never
          // exercises them)
          .withColumn("place",
            pmod(col("doc_id") * 37L, expr("(maxck + 1) div 15")))
          .withColumn("src", element_at(
            array(lit("wikivoyage"), lit("yelp"), lit("reddit")),
            (pmod(col("doc_id"), lit(3L)) + 1L).cast("int")))
        val wvr = docs.where(col("src") === "wikivoyage")
          .withColumn("rn", row_number().over(Window.partitionBy("place")
            .orderBy(col("doc_id").asc)))
          .where(col("rn") <= 2)
        val wv = wvr.groupBy("place").agg(
          array_join(transform(array_sort(collect_list(struct(col("rn"),
              concat(lit("\""), esc(substring(col("text"), 1, 600)),
                lit("\"")).as("j")))),
            x => x.getField("j")), ",").as("wv_json"))
        val qr = docs.where(col("src").isin("yelp", "reddit"))
          .withColumn("rn", row_number().over(Window.partitionBy("place")
            .orderBy(col("doc_id").asc)))
          .where(col("rn") <= 4)
        val quotes = qr.groupBy("place").agg(
          array_join(transform(array_sort(collect_list(struct(col("rn"),
              concat(lit("{\"src\":\""), col("src"), lit("\",\"txt\":\""),
                esc(substring(col("text"), 1, 220)), lit("\"}")).as("j")))),
            x => x.getField("j")), ",").as("quotes_json"))
        val near = SpatialJoins.gridWithinJoin(
            custPoints(s, dir), suppPoints(s, dir),
            "c_custkey", "s_suppkey", thresholdM = 300.0)
          .groupBy("c_custkey")
          .agg(countDistinct("s_suppkey").as("listings_nearby"))
        val oc = t(s, dir, "orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"))
        val base = custPoints(s, dir)
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(near, Seq("c_custkey"), "left")
          .join(oc, col("c_custkey") === col("o_custkey"), "left")
          .withColumn("listings_nearby",
            coalesce(col("listings_nearby"), lit(0L)))
          .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
          .withColumn("city",
            regexp_replace(lower(trim(col("n_name"))), "\\s+", "-"))
        val w = Window.partitionBy("c_nationkey")
        def zOf(c0: Column): Column = {
          val mu = avg(c0).over(w)
          val sd = stddev_samp(c0).over(w)
          when(sd === 0 || sd.isNull, 0.0).otherwise((c0 - mu) / sd)
        }
        val zl = zOf(col("listings_nearby").cast("double"))
        val blended = when(col("n_orders") > 0,
          zOf(col("c_acctbal")) * 0.6 + zOf(col("n_orders").cast("double")) * 0.4)
        val scored = base
          .withColumn("pz", round(coalesce(blended, zl), 4) + 0.0)
          .withColumn("zl4", round(zl, 4) + 0.0)
          .withColumn("flag", when(col("zl4") >= 1.0, "high")
            .when(col("zl4") >= 0.0, "medium").otherwise("low"))
        scored
          .join(wv, col("c_custkey") === wv("place"), "left").drop("place")
          .join(quotes, col("c_custkey") === quotes("place"), "left")
          .drop("place")
          .select(col("c_custkey").as("poi_id"),
            concat(lit("{\"id\":\""),
              TextFunctions.normNameUdf(col("c_name")), lit("::"), col("city"),
              lit("\",\"name\":\""), col("c_name"),
              lit("\",\"city\":\""), col("city"),
              lit("\",\"lat\":"), col("lat").cast("decimal(8,4)").cast("string"),
              lit(",\"lon\":"), col("lon").cast("decimal(8,4)").cast("string"),
              lit(",\"wv\":["), coalesce(col("wv_json"), lit("")),
              lit("],\"listings_nearby\":"), col("listings_nearby").cast("string"),
              lit(",\"popularity_z\":"), col("pz").cast("decimal(12,4)").cast("string"),
              lit(",\"sustainability_popularity_flag\":\""), col("flag"),
              lit("\",\"quotes\":["), coalesce(col("quotes_json"), lit("")),
              lit("]}")).as("card"))
      },
      Some(s"""WITH pts AS ($custPointsSql), sup AS ($suppPointsSql),
              |maxck AS (SELECT max(c_custkey) AS m FROM customer),
              |docs AS (
              |  SELECT doc_id, text,
              |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'wikivoyage'
              |      WHEN 1 THEN 'yelp' ELSE 'reddit' END AS src,
              |    (doc_id * 37) % (SELECT (m + 1) // 15 FROM maxck) AS place
              |  FROM documents WHERE trim(text) <> ''),
              |wvr AS (
              |  SELECT place, text, row_number() OVER (
              |    PARTITION BY place ORDER BY doc_id ASC) AS rn
              |  FROM docs WHERE src = 'wikivoyage'),
              |wv AS (
              |  SELECT place, string_agg('"' ||
              |      replace(replace(left(text, 600), '\\', '\\\\'),
              |        '"', '\\"') || '"', ',' ORDER BY rn) AS wv_json
              |  FROM wvr WHERE rn <= 2 GROUP BY place),
              |qr AS (
              |  SELECT place, src, text, row_number() OVER (
              |    PARTITION BY place ORDER BY doc_id ASC) AS rn
              |  FROM docs WHERE src IN ('yelp', 'reddit')),
              |quotes AS (
              |  SELECT place, string_agg('{"src":"' || src || '","txt":"' ||
              |      replace(replace(left(text, 220), '\\', '\\\\'),
              |        '"', '\\"') || '"}', ',' ORDER BY rn) AS quotes_json
              |  FROM qr WHERE rn <= 4 GROUP BY place),
              |near AS (
              |  SELECT c_custkey, count(DISTINCT s_suppkey) AS listings_nearby
              |  FROM pts JOIN sup
              |    ON ${havSql("pts.lat", "pts.lon", "sup.lat", "sup.lon")} <= 300.0
              |  GROUP BY c_custkey),
              |oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders
              |       GROUP BY o_custkey),
              |base AS (
              |  SELECT p.c_custkey, p.c_name, p.c_nationkey, p.c_acctbal,
              |    p.lat, p.lon,
              |    regexp_replace(lower(trim(n.n_name)), '\\s+', '-', 'g') AS city,
              |    coalesce(nr.listings_nearby, 0) AS listings_nearby,
              |    coalesce(oc.n_orders, 0) AS n_orders
              |  FROM pts p JOIN nation n ON p.c_nationkey = n.n_nationkey
              |  LEFT JOIN near nr ON p.c_custkey = nr.c_custkey
              |  LEFT JOIN oc ON p.c_custkey = oc.o_custkey),
              |z AS (
              |  SELECT *,
              |    CASE WHEN stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w = 0
              |      OR stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w IS NULL
              |      THEN 0.0 ELSE (CAST(listings_nearby AS DOUBLE) -
              |        avg(CAST(listings_nearby AS DOUBLE)) OVER w) /
              |        stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w END AS zl,
              |    CASE WHEN stddev_samp(c_acctbal) OVER w = 0
              |      OR stddev_samp(c_acctbal) OVER w IS NULL THEN 0.0
              |      ELSE (c_acctbal - avg(c_acctbal) OVER w) /
              |        stddev_samp(c_acctbal) OVER w END AS zbal,
              |    CASE WHEN stddev_samp(CAST(n_orders AS DOUBLE)) OVER w = 0
              |      OR stddev_samp(CAST(n_orders AS DOUBLE)) OVER w IS NULL THEN 0.0
              |      ELSE (CAST(n_orders AS DOUBLE) -
              |        avg(CAST(n_orders AS DOUBLE)) OVER w) /
              |        stddev_samp(CAST(n_orders AS DOUBLE)) OVER w END AS zord
              |  FROM base WINDOW w AS (PARTITION BY c_nationkey)),
              |scored AS (
              |  SELECT *,
              |    round(CASE WHEN n_orders > 0 THEN zbal * 0.6 + zord * 0.4
              |      ELSE zl END, 4) + 0e0 AS pz,
              |    round(zl, 4) + 0e0 AS zl4
              |  FROM z)
              |SELECT s.c_custkey AS poi_id,
              |  '{"id":"' ||
              |  regexp_replace(regexp_replace(lower(trim(s.c_name)),
              |    '\\s+', '-', 'g'), '[^a-z0-9\\-:_.,]+', '', 'g') ||
              |  '::' || s.city ||
              |  '","name":"' || s.c_name ||
              |  '","city":"' || s.city ||
              |  '","lat":' || CAST(CAST(s.lat AS DECIMAL(8,4)) AS VARCHAR) ||
              |  ',"lon":' || CAST(CAST(s.lon AS DECIMAL(8,4)) AS VARCHAR) ||
              |  ',"wv":[' || coalesce(w.wv_json, '') ||
              |  '],"listings_nearby":' || CAST(s.listings_nearby AS VARCHAR) ||
              |  ',"popularity_z":' || CAST(CAST(s.pz AS DECIMAL(12,4)) AS VARCHAR) ||
              |  ',"sustainability_popularity_flag":"' ||
              |  CASE WHEN s.zl4 >= 1.0 THEN 'high' WHEN s.zl4 >= 0.0
              |    THEN 'medium' ELSE 'low' END ||
              |  '","quotes":[' || coalesce(q.quotes_json, '') || ']}' AS card
              |FROM scored s
              |LEFT JOIN wv w ON s.c_custkey = w.place
              |LEFT JOIN quotes q ON s.c_custkey = q.place""".stripMargin))
  )

  // =================================================================
  // §2.2 projections / filters
  // =================================================================

}
