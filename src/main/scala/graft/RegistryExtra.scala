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

/** composed / extension rows (P7 over G4, TPC-H-shaped analytics, windows) (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object ExtraRegistry {
  val rows: Seq[Q] = Seq(
    // P7: geometry re-check guard — recompute the region from coords, keep
    // only rows whose hint agrees (strict anti-leak drop)
    Q("p7_geometry_recheck",
      (s, dir) => {
        val assigned = queriesInternal("g4_region_cascade")(s, dir)
          .select(col("c_custkey"), col("city_id"))
        t(s, dir, "customer")
          .withColumn("hint_city", pmod(col("c_custkey"), lit(5)).cast("int"))
          .join(assigned, Seq("c_custkey"))
          .where(col("city_id") === col("hint_city"))
          .select("c_custkey", "city_id")
      },
      Some(s"""WITH assigned AS (
              |${GraphRegistry.rows.find(_.name == "g4_region_cascade").get.oracle.get}
              |)
              |SELECT c.c_custkey, a.city_id
              |FROM customer c JOIN assigned a ON c.c_custkey = a.c_custkey
              |WHERE a.city_id = CAST(c.c_custkey % 5 AS INT)""".stripMargin)),

    // F2: name normalization with German street-token canonicalization
    Q("f2_normalize_name",
      // suffix abbreviation "Hauptstr." exercises the boundary-free str.
      // rule (reference utils.py:73 has no leading \b); input is ASCII so
      // the oracle needs no ascii-fold step
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 300)
        .withColumn("raw", concat(lit("Hauptstr. "), col("c_name"), lit("!!")))
        .select(col("c_custkey"),
          TextFunctions.normalizeNameUdf(col("raw")).as("norm")),
      Some("""SELECT c_custkey, trim(regexp_replace(regexp_replace(
             |  regexp_replace(regexp_replace(
             |    lower('Hauptstr. ' || c_name || '!!'),
             |    'str\.|strasse\b', 'strasse', 'g'),
             |    '\bpl\.|platz\b', 'platz', 'g'),
             |  '[^a-z0-9 ]+', ' ', 'g'), '\s+', ' ', 'g')) AS norm
             |FROM customer WHERE c_custkey < 300""".stripMargin)),

    // F14: title -> match-key candidates (full, pre-'/' root, no '(...)')
    Q("f14_title_candidates",
      (s, dir) => t(s, dir, "part").where(col("p_partkey") < 500)
        .withColumn("title", concat(col("p_name"), lit("/district ("),
          col("p_brand"), lit(")")))
        .withColumn("cands", array_distinct(array(
          col("title"),
          regexp_replace(col("title"), "/.*$", ""),
          trim(regexp_replace(col("title"), "\\s*\\([^)]*\\)\\s*$", "")))))
        .select(col("p_partkey"), explode(col("cands")).as("candidate")),
      Some("""WITH w AS (SELECT p_partkey,
             |  p_name || '/district (' || p_brand || ')' AS title
             |  FROM part WHERE p_partkey < 500)
             |SELECT p_partkey, unnest(list_distinct([title,
             |  regexp_replace(title, '/.*$', ''),
             |  trim(regexp_replace(title, '\s*\([^)]*\)\s*$', ''))]))
             |  AS candidate
             |FROM w""".stripMargin)),

    // F15 + F21: wiki markup cleanup + truncation
    Q("f15_wiki_clean",
      (s, dir) => t(s, dir, "part").where(col("p_partkey") < 500)
        .withColumn("marked", concat(lit("[["), col("p_name"), lit("|Alias]] "),
          lit("{{infobox|x=1}} see [[Plain Page]] about "), col("p_type")))
        .select(col("p_partkey"),
          substring(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col("marked"),
            "\\[\\[[^\\]|]*\\|([^\\]]*)\\]\\]", "$1"),
            "\\[\\[([^\\]]*)\\]\\]", "$1"),
            "\\{\\{[^}]*\\}\\}", ""),
            "\\s+", " "), 1, 40).as("clean")),
      Some("""WITH w AS (SELECT p_partkey, '[[' || p_name ||
             |  '|Alias]] {{infobox|x=1}} see [[Plain Page]] about ' || p_type
             |  AS marked FROM part WHERE p_partkey < 500)
             |SELECT p_partkey, substr(regexp_replace(regexp_replace(
             |  regexp_replace(regexp_replace(marked,
             |  '\[\[[^\]|]*\|([^\]]*)\]\]', '\1', 'g'),
             |  '\[\[([^\]]*)\]\]', '\1', 'g'),
             |  '\{\{[^}]*\}\}', '', 'g'),
             |  '\s+', ' ', 'g'), 1, 40) AS clean
             |FROM w""".stripMargin)),

    // J7: pair-enrichment join — attach attributes to both ends of link pairs
    Q("j7_pair_enrich",
      (s, dir) => {
        val pairs = SpatialJoins.gridSelfJoin(
          custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 200.0)
        val dim = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"))
        pairs
          .join(dim.select(col("c_custkey").as("a_id"), col("c_name").as("a_name"),
            col("n_name").as("a_nation")), "a_id")
          .join(dim.select(col("c_custkey").as("b_id"), col("c_name").as("b_name"),
            col("n_name").as("b_nation")), "b_id")
          .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"),
            col("a_nation"), col("b_nation"), round(col("meters"), 2).as("meters"))
      },
      Some(s"""WITH pts AS ($custPointsSql),
              |dim AS (SELECT c_custkey, c_name, n_name FROM customer
              |        JOIN nation ON c_nationkey = n_nationkey),
              |pairs AS (
              |  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |    ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} AS meters
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0)
              |SELECT p.a_id, p.b_id, da.c_name AS a_name, db.c_name AS b_name,
              |  da.n_name AS a_nation, db.n_name AS b_nation,
              |  round(p.meters, 2) AS meters
              |FROM pairs p JOIN dim da ON p.a_id = da.c_custkey
              |JOIN dim db ON p.b_id = db.c_custkey""".stripMargin)),

    // A11 + F21: capped ordered collect with truncation, standalone
    Q("a11_capped_collect",
      (s, dir) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").asc, col("doc_id").asc)
        t(s, dir, "documents").withColumn("rn", row_number().over(w))
          .where(col("rn") <= 2)
          .groupBy("source")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")), ",").as("shortest_ids"),
            substring(min(col("text")), 1, 60).as("snippet"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (PARTITION BY source
             |  ORDER BY n_chars ASC, doc_id ASC) AS rn FROM documents)
             |SELECT source,
             |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
             |    AS shortest_ids,
             |  substr(min(text), 1, 60) AS snippet
             |FROM ranked WHERE rn <= 2 GROUP BY source""".stripMargin)),

    // G6: lift facts from members to their canonical component
    Q("g6_component_lift",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val comps = ConnectedComponents.run(edges)
          .withColumnRenamed("node", "c_custkey")
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(comps, Seq("c_custkey"), "left")
          .withColumn("component", coalesce(col("component"), col("c_custkey")))
          .groupBy("component")
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"))
      },
      Some(s"""WITH RECURSIVE pts AS ($custPointsSql),
              |edges AS (
              |  SELECT a.c_custkey AS src, b.c_custkey AS dst
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
              |sym AS (
              |  SELECT src AS u, dst AS v FROM edges
              |  UNION SELECT dst, src FROM edges
              |  UNION SELECT src, src FROM edges
              |  UNION SELECT dst, dst FROM edges),
              |reach AS (
              |  SELECT u, v FROM sym
              |  UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
              |comps AS (SELECT u AS c_custkey, min(v) AS component
              |          FROM reach GROUP BY u)
              |SELECT coalesce(comps.component, c.c_custkey) AS component,
              |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
              |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              |LEFT JOIN comps ON c.c_custkey = comps.c_custkey
              |GROUP BY 1""".stripMargin)),

    // listings_nearby + popularity: the operator the reference CONSUMES but
    // never ships (SURVEY §3.3 / §7.4.6) — count of NEAR "listings"
    // (suppliers) per "place" (customer) within 300 m, then the per-group
    // z-score + flag pipeline of neo4j_cypher/12.
    Q("g10_listings_nearby",
      (s, dir) => {
        val near = SpatialJoins.gridWithinJoin(
          custPoints(s, dir), suppPoints(s, dir),
          "c_custkey", "s_suppkey", thresholdM = 300.0)
        val counts = t(s, dir, "customer")
          .join(near.groupBy("c_custkey")
            .agg(countDistinct("s_suppkey").as("listings_nearby")),
            Seq("c_custkey"), "left")
          .withColumn("listings_nearby",
            coalesce(col("listings_nearby"), lit(0L)))
        val w = Window.partitionBy("c_nationkey")
        val mu = avg(col("listings_nearby").cast("double")).over(w)
        val sd = stddev_samp(col("listings_nearby").cast("double")).over(w)
        counts.withColumn("z",
            round(when(sd === 0 || sd.isNull, 0.0)
              .otherwise((col("listings_nearby") - mu) / sd), 4) + 0.0)
          .withColumn("flag", when(col("z") >= 1.0, "high")
            .when(col("z") >= 0.0, "medium").otherwise("low"))
          .select("c_custkey", "listings_nearby", "z", "flag")
      },
      Some(s"""WITH pts AS ($custPointsSql), sup AS ($suppPointsSql),
              |near AS (
              |  SELECT c_custkey, count(DISTINCT s_suppkey) AS listings_nearby
              |  FROM pts JOIN sup
              |    ON ${havSql("pts.lat", "pts.lon", "sup.lat", "sup.lon")} <= 300.0
              |  GROUP BY c_custkey),
              |counts AS (
              |  SELECT c.c_custkey, c.c_nationkey,
              |    coalesce(n.listings_nearby, 0) AS listings_nearby
              |  FROM customer c LEFT JOIN near n ON c.c_custkey = n.c_custkey),
              |z AS (
              |  SELECT c_custkey, listings_nearby,
              |    round(CASE WHEN stddev_samp(CAST(listings_nearby AS DOUBLE))
              |        OVER w = 0
              |      OR stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w IS NULL
              |      THEN 0.0
              |      ELSE (CAST(listings_nearby AS DOUBLE) -
              |        avg(CAST(listings_nearby AS DOUBLE)) OVER w) /
              |        stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w
              |      END, 4) + 0e0 AS z
              |  FROM counts WINDOW w AS (PARTITION BY c_nationkey))
              |SELECT c_custkey, listings_nearby, z,
              |  CASE WHEN z >= 1.0 THEN 'high' WHEN z >= 0.0 THEN 'medium'
              |    ELSE 'low' END AS flag
              |FROM z""".stripMargin)),

    // G9: alias-suggestion shape — unassigned rows vote a label toward
    // their nearest center within 35 km, kept above a min count
    Q("g9_alias_votes",
      (s, dir) => {
        val assigned = queriesInternal("g4_region_cascade")(s, dir)
          .select("c_custkey")
        val cities = t(s, dir, "region")
          .select(col("r_regionkey").as("city_id"),
            (lit(40.0) + col("r_regionkey") * 0.04).as("center_lat"),
            lit(-74.95).as("center_lon"))
        val unassigned = custPoints(s, dir)
          .join(assigned, Seq("c_custkey"), "left_anti")
        val cand = unassigned.crossJoin(broadcast(cities))
          .withColumn("center_m", GeoFunctions.haversineM(col("lat"), col("lon"),
            col("center_lat"), col("center_lon")))
        val w = Window.partitionBy("c_custkey")
          .orderBy(col("center_m").asc, col("city_id").asc)
        cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .where(col("center_m") <= 35000.0)
          .groupBy("city_id", "c_mktsegment")
          .agg(count(lit(1)).as("votes"))
          .where(col("votes") >= 5)
      },
      Some(s"""WITH assigned AS (
              |${GraphRegistry.rows.find(_.name == "g4_region_cascade").get.oracle.get}
              |),
              |cities AS (SELECT r_regionkey AS city_id,
              |  40e0 + r_regionkey * 4e-2 AS center_lat, -7.495e1 AS center_lon
              |  FROM region),
              |unassigned AS (
              |  SELECT * FROM ($custPointsSql) p
              |  WHERE NOT EXISTS (SELECT 1 FROM assigned a
              |                    WHERE a.c_custkey = p.c_custkey)),
              |cand AS (
              |  SELECT u.c_custkey, u.c_mktsegment, c.city_id,
              |    ${havSql("u.lat", "u.lon", "c.center_lat", "c.center_lon")}
              |      AS center_m,
              |    row_number() OVER (PARTITION BY u.c_custkey ORDER BY
              |      ${havSql("u.lat", "u.lon", "c.center_lat", "c.center_lon")}
              |      ASC, c.city_id ASC) AS rn
              |  FROM unassigned u CROSS JOIN cities c)
              |SELECT city_id, c_mktsegment, count(*) AS votes
              |FROM cand WHERE rn = 1 AND center_m <= 35e3
              |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin)),

    // TPC-H-shaped SQL through the spark.sql text surface (the engine's
    // declarative plans are the same whether built via DataFrame or SQL)
    Q("q3_shipping_priority",
      (s, dir) => {
        Seq("customer", "orders", "lineitem").foreach(n =>
          t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT l_orderkey,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue,
                 CAST(o_orderdate AS DATE) AS order_date
          FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
          GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
          ORDER BY revenue DESC, l_orderkey ASC
          LIMIT 10""")
      },
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue,
             |  CAST(o_orderdate AS DATE) AS order_date
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
             |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
             |ORDER BY revenue DESC, l_orderkey ASC
             |LIMIT 10""".stripMargin)),

    Q("q10_returned_items",
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "nation").foreach(n =>
          t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT c_custkey, c_name, n_name,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
          GROUP BY c_custkey, c_name, n_name
          HAVING sum(l_extendedprice * (1e0 - l_discount)) > 1000
          ORDER BY revenue DESC, c_custkey ASC
          LIMIT 20""")
      },
      Some("""SELECT c_custkey, c_name, n_name,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name
             |HAVING sum(l_extendedprice * (1e0 - l_discount)) > 1000
             |ORDER BY revenue DESC, c_custkey ASC
             |LIMIT 20""".stripMargin)),

    Q("q1_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 round(sum(l_quantity), 2) AS sum_qty,
                 round(sum(l_extendedprice), 2) AS sum_base_price,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2)
                   AS sum_disc_price,
                 round(sum(l_extendedprice * (1e0 - l_discount) *
                   (1e0 + l_tax)), 2) AS sum_charge,
                 round(avg(l_quantity), 4) AS avg_qty,
                 round(avg(l_extendedprice), 4) AS avg_price,
                 round(avg(l_discount), 6) AS avg_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2)
             |    AS sum_disc_price,
             |  round(sum(l_extendedprice * (1e0 - l_discount) *
             |    (1e0 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q5_local_supplier_volume",
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT n_name,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
            AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
          GROUP BY n_name""")
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |  AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // TPC-H q4 shape: correlated EXISTS decorrelates to a left semi join
    // (late-shipping lines flag their order) — grouped priority counts
    Q("q4_order_priority",
      (s, dir) => {
        Seq("orders", "lineitem")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT o_orderpriority, count(*) AS order_count
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
            AND EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey
                          AND l_shipdate > o_orderdate)
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority""".stripMargin)),

    // TPC-H q14 shape: conditional-aggregate ratio (promo revenue share
    // in one ship month), dim join broadcast-able on part
    Q("q14_promo_share",
      (s, dir) => {
        Seq("lineitem", "part")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT round(1e2 * sum(CASE WHEN p_type LIKE 'PROMO%'
                   THEN l_extendedprice * (1e0 - l_discount) ELSE 0e0 END)
                 / sum(l_extendedprice * (1e0 - l_discount)), 4)
                 AS promo_share,
                 count(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-03-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'""")
      },
      Some("""SELECT round(1e2 * sum(CASE WHEN p_type LIKE 'PROMO%'
             |         THEN l_extendedprice * (1e0 - l_discount) ELSE 0e0 END)
             |       / sum(l_extendedprice * (1e0 - l_discount)), 4)
             |       AS promo_share,
             |       count(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
             |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin)),

    // TPC-H q7 shape (volume shipping): the bidirectional two-nation
    // trade flow by ship year — a 5-join tree where BOTH nation dims
    // enter by broadcast under different aliases and the date-range
    // predicate pushes to the lineitem scan (PlanSpec asserts both).
    Q("q7_nation_volume",
      (s, dir) => {
        Seq("supplier", "lineitem", "orders", "customer", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT supp_nation, cust_nation, l_year,
                 round(sum(volume), 2) AS revenue
          FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1e0 - l_discount) AS volume
            FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00') shipping
          GROUP BY supp_nation, cust_nation, l_year""")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |       round(sum(volume), 2) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |         year(l_shipdate) AS l_year,
             |         l_extendedprice * (1e0 - l_discount) AS volume
             |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
             |    AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00') shipping
             |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H q9 shape (product-type profit): profit by supplier nation
    // and order year for a part-name family. The corpus has no partsupp
    // table, so supply cost is the documented proxy 1% of p_retailprice
    // per unit — the join tree (lineitem against part + supplier +
    // orders + nation, part filtered BEFORE the join) is the point.
    // Profit sums as exact integer ten-thousandths (4-decimal inputs ->
    // amt4 integral; long sums are ORDER-INDEPENDENT, unlike double
    // sums whose engine-specific order left one of 175 groups on a
    // rounding midpoint) and quantizes once at the end with the
    // identical-IEEE-ops floor form.
    Q("q9_product_profit",
      (s, dir) => {
        Seq("part", "supplier", "lineitem", "orders", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT nation, o_year,
                 floor(CAST(sum(amt4) AS DOUBLE) / 1e2 + 5e-1) / 1e2
                   AS sum_profit
          FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   CAST(floor((l_extendedprice * (1e0 - l_discount)
                     - 1e-2 * p_retailprice * l_quantity) * 1e4 + 5e-1)
                     AS BIGINT) AS amt4
            FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%rod%') profit
          GROUP BY nation, o_year""")
      },
      Some("""SELECT nation, o_year,
             |  floor(CAST(sum(amt4) AS DOUBLE) / 1e2 + 5e-1) / 1e2
             |    AS sum_profit
             |FROM (
             |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
             |         CAST(floor((l_extendedprice * (1e0 - l_discount)
             |           - 1e-2 * p_retailprice * l_quantity) * 1e4 + 5e-1)
             |           AS BIGINT) AS amt4
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE p_name LIKE '%rod%') profit
             |GROUP BY nation, o_year""".stripMargin)),

    // TPC-H q8 shape (national market share): one nation's share of a
    // region's import volume by order year — the 7-join tree with
    // nation entering TWICE under different roles. Numerator and
    // denominator sum exact integer ten-thousandths (the q9 lesson);
    // the ratio divides once at the end with identical IEEE ops.
    Q("q8_market_share",
      (s, dir) => {
        Seq("part", "lineitem", "supplier", "orders", "customer", "nation",
          "region").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT o_year,
                 floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN amt4
                     ELSE 0 END) AS DOUBLE) / CAST(sum(amt4) AS DOUBLE)
                   * 1e4 + 5e-1) / 1e4 AS mkt_share
          FROM (
            SELECT year(o_orderdate) AS o_year,
                   CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
                     + 5e-1) AS BIGINT) AS amt4,
                   n2.n_name AS nation
            FROM part JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00') all_nations
          GROUP BY o_year""")
      },
      Some("""SELECT o_year,
             |  floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN amt4
             |      ELSE 0 END) AS DOUBLE) / CAST(sum(amt4) AS DOUBLE)
             |    * 1e4 + 5e-1) / 1e4 AS mkt_share
             |FROM (
             |  SELECT year(o_orderdate) AS o_year,
             |    CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
             |      + 5e-1) AS BIGINT) AS amt4,
             |    n2.n_name AS nation
             |  FROM part JOIN lineitem ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
             |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             |    AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
             |  ) all_nations
             |GROUP BY o_year""".stripMargin)),

    // TPC-H q13 shape (customer order-count distribution): LEFT join
    // with a join-level predicate (the filter must NOT drop orderless
    // customers — they are the c_count = 0 bucket), double aggregation.
    Q("q13_customer_distribution",
      (s, dir) => {
        Seq("customer", "orders")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT c_count, count(*) AS custdist
          FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey) c_orders
          GROUP BY c_count""")
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |        AND o_orderpriority <> '1-URGENT'
             |      GROUP BY c_custkey) c_orders
             |GROUP BY c_count""".stripMargin)),

    // TPC-H q17 shape (small-quantity revenue): per-part average
    // quantity as a correlated bound. The below-a-fifth-of-average
    // test runs in EXACT integer arithmetic (qty * 5 * n < sum_qty —
    // quantities are integral), so no engine's division order can
    // flip a boundary row; the one output value quantizes once.
    Q("q17_small_quantity",
      (s, dir) => {
        Seq("lineitem", "part")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT floor(CAST(sum(ext2) AS DOUBLE) / 1e2 / 7e0 * 1e2 + 5e-1)
                   / 1e2 AS avg_yearly
          FROM (
            SELECT CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)
                     AS ext2
            FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN (SELECT l_partkey AS agg_pk,
                         sum(CAST(l_quantity AS BIGINT)) AS sq,
                         count(*) AS nq
                  FROM lineitem GROUP BY l_partkey) agg
              ON agg_pk = p_partkey
            WHERE p_brand = 'Brand#13'
              AND CAST(l_quantity AS BIGINT) * 5 * nq < sq) small""")
      },
      Some("""SELECT floor(CAST(sum(ext2) AS DOUBLE) / 1e2 / 7e0 * 1e2
             |         + 5e-1) / 1e2 AS avg_yearly
             |FROM (
             |  SELECT CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)
             |           AS ext2
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  JOIN (SELECT l_partkey AS agg_pk,
             |               sum(CAST(l_quantity AS BIGINT)) AS sq,
             |               count(*) AS nq
             |        FROM lineitem GROUP BY l_partkey) agg
             |    ON agg_pk = p_partkey
             |  WHERE p_brand = 'Brand#13'
             |    AND CAST(l_quantity AS BIGINT) * 5 * nq < sq) small"""
        .stripMargin)),

    // TPC-H q18 shape (large-volume orders): HAVING-style semi filter
    // on a grouped fact, then enrich with customer + order dims.
    // Quantities are integral so the 300 threshold is exact.
    Q("q18_large_orders",
      (s, dir) => {
        Seq("customer", "orders", "lineitem")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT c_name, c_custkey, o_orderkey, year(o_orderdate) AS o_year,
                 o_totalprice, sum_qty
          FROM (SELECT l_orderkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                         AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS BIGINT)) > 300) big
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey""")
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, year(o_orderdate)
             |         AS o_year,
             |       o_totalprice, sum_qty
             |FROM (SELECT l_orderkey,
             |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
             |               AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(CAST(l_quantity AS BIGINT)) > 300) big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey""".stripMargin)),

    // TPC-H q19 shape (disjunctive predicate revenue): three OR'd
    // brand/size/quantity bands — the planner must still push the
    // common p_partkey equi-key and evaluate the disjunction as a
    // post-join filter, never a cartesian.
    Q("q19_disjunct_revenue",
      (s, dir) => {
        Seq("lineitem", "part")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT floor(CAST(sum(amt4) AS DOUBLE) / 1e4 * 1e2 + 5e-1) / 1e2
                   AS revenue
          FROM (
            SELECT CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
                     + 5e-1) AS BIGINT) AS amt4
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)) matched""")
      },
      Some("""SELECT floor(CAST(sum(amt4) AS DOUBLE) / 1e4 * 1e2 + 5e-1)
             |         / 1e2 AS revenue
             |FROM (
             |  SELECT CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
             |           + 5e-1) AS BIGINT) AS amt4
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             |         AND l_quantity BETWEEN 1 AND 11)
             |     OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
             |         AND l_quantity BETWEEN 10 AND 20)
             |     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
             |         AND l_quantity BETWEEN 20 AND 30)) matched"""
        .stripMargin)),

    // TPC-H q22 shape (global sales opportunity): above-average-balance
    // customers in selected "country codes" (c_nationkey stands in —
    // the corpus has no phone column) with no URGENT orders (every
    // customer here has SOME order, so the classic no-orders predicate
    // would be vacuous): scalar-subquery threshold + anti join. The above-average test is the exact
    // integer cross-multiplication bal2 * n > s2 — no engine's
    // summation order can flip a boundary customer — and balances are
    // 2-decimal so sum(bal2)/1e2 is one exact division.
    Q("q22_sales_opportunity",
      (s, dir) => {
        Seq("customer", "orders")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          WITH sel AS (
            SELECT c_custkey, c_nationkey,
                   CAST(floor(c_acctbal * 1e2 + 5e-1) AS BIGINT) AS bal2
            FROM customer WHERE c_nationkey % 5 = 0),
          pos AS (
            SELECT sum(bal2) AS s2, count(*) AS n
            FROM sel WHERE bal2 > 0)
          SELECT c_nationkey AS cntrycode, count(*) AS numcust,
                 CAST(sum(bal2) AS DOUBLE) / 1e2 AS totacctbal
          FROM sel CROSS JOIN pos
          WHERE bal2 * n > s2
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')
          GROUP BY c_nationkey""")
      },
      Some("""WITH sel AS (
             |  SELECT c_custkey, c_nationkey,
             |         CAST(floor(c_acctbal * 1e2 + 5e-1) AS BIGINT) AS bal2
             |  FROM customer WHERE c_nationkey % 5 = 0),
             |pos AS (
             |  SELECT sum(bal2) AS s2, count(*) AS n
             |  FROM sel WHERE bal2 > 0)
             |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             |       CAST(sum(bal2) AS DOUBLE) / 1e2 AS totacctbal
             |FROM sel CROSS JOIN pos
             |WHERE bal2 * n > s2
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey""".stripMargin)),

    // TPC-H q2 shape (minimum-cost supplier): the corpus has no
    // partsupp table, so the part-supplier relation is the DISTINCT
    // (l_partkey, l_suppkey) pairs observed in lineitem and supply
    // cost/availqty are deterministic integer functions of the key
    // pair (psProxySql — identical arithmetic in both engines, the
    // q9 proxy-cost precedent). The correlated "cost = regional
    // minimum for this part" subquery decorrelates into a grouped-min
    // join; dims broadcast, the pair scan is the only fact.
    Q("q2_min_cost_supplier",
      (s, dir) => {
        Seq("lineitem", "part", "supplier", "nation", "region")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q2Sql)
      },
      Some(q2Sql)),

    // TPC-H q11 shape (important stock): per-part inventory value over
    // a nation group against a global-total threshold. Values are
    // exact integer cents x units; the fraction test is the exact
    // cross-multiplication v2 * 1000 > total (threshold 1/1000), so
    // no engine's summation order can flip a boundary part. The
    // global total enters by one-row broadcast cross join.
    Q("q11_important_stock",
      (s, dir) => {
        Seq("lineitem", "supplier", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q11Sql)
      },
      Some(q11Sql)),

    // TPC-H q12 shape (shipmode priority counts): the corpus has no
    // l_shipmode/commitdate/receiptdate, so mode is a deterministic
    // 3-way split of the line key and "late" is shipped > 60 days
    // after order date — the shape (fact-fact equi-join, date-window
    // pushdown, CASE'd priority counts) is the point.
    Q("q12_shipmode_priority",
      (s, dir) => {
        Seq("lineitem", "orders")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q12Sql)
      },
      Some(q12Sql)),

    // TPC-H q15 shape (top supplier): quarterly revenue per supplier,
    // global max by one-row broadcast cross join, equality back-join.
    // Revenue accumulates as exact integer ten-thousandths so the
    // max-equality test cannot be split by float summation order;
    // the one output value quantizes once at the end.
    Q("q15_top_supplier",
      (s, dir) => {
        Seq("lineitem", "supplier")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q15Sql)
      },
      Some(q15Sql)),

    // TPC-H q16 shape (parts/supplier count): distinct-supplier counts
    // per brand/type/size over the pair relation, excluding
    // "complaint" suppliers by NOT IN (negative account balance
    // stands in for the comment pattern — the corpus has no
    // s_comment). The NOT IN decorrelates to a null-aware anti join
    // against the 100-row supplier dim.
    Q("q16_supplier_count",
      (s, dir) => {
        Seq("lineitem", "part", "supplier")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q16Sql)
      },
      Some(q16Sql)),

    // TPC-H q20 shape (potential part promotion): suppliers whose
    // proxy availqty exceeds 5x what they actually shipped of a
    // part-name family in a year — nested IN subqueries decorrelated
    // into joins against the grouped-shipment frame; the availqty
    // test is exact integer arithmetic.
    Q("q20_potential_promotion",
      (s, dir) => {
        Seq("lineitem", "part", "supplier", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q20Sql)
      },
      Some(q20Sql)),

    // TPC-H q21 shape (suppliers who kept orders waiting): the
    // EXISTS / NOT EXISTS double-correlated self-join on lineitem.
    // "Late" is shipped > 90 days after order date (the corpus has no
    // commit/receipt dates; lateness correlates the OUTER order's
    // date into the NOT EXISTS branch, preserving the classic
    // other-supplier-was-also-late exclusion shape).
    Q("q21_waiting_suppliers",
      (s, dir) => {
        Seq("lineitem", "orders", "supplier", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q21Sql)
      },
      Some(q21Sql)),

    // J4 via the OPTIMIZER RULE: the join is written naively as a radius
    // predicate; SpatialJoinRule (plans/SpatialRewrite) rewrites it into
    // the grid-blocked equi-join — same results as the hand-built j4
    Q("j4_auto_rewrite",
      (s, dir) => {
        graft.plans.GraftExtensions.install(s)
        val a = custPoints(s, dir).select(col("c_custkey").as("a_id"),
          col("lat").as("a_lat"), col("lon").as("a_lon"))
        val b = custPoints(s, dir).select(col("c_custkey").as("b_id"),
          col("lat").as("b_lat"), col("lon").as("b_lon"))
        a.join(b, col("a_id") < col("b_id") &&
            graft.plans.WithinMeters(col("a_lat"), col("a_lon"),
              col("b_lat"), col("b_lon"), 250.0))
          .select(col("a_id"), col("b_id"),
            round(GeoFunctions.haversineM(col("a_lat"), col("a_lon"),
              col("b_lat"), col("b_lon")), 2).as("meters"))
      },
      Some(s"""WITH pts AS ($custPointsSql)
              |SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |  round(${havSql("a.lat", "a.lon", "b.lat", "b.lon")}, 2) AS meters
              |FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0"""
        .stripMargin)),

    // ANN via SRP-LSH buckets, fully oracle-checked (unrolled SRP SQL)
    Q("ann_lsh_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(
          emb.where(col("vec_id") >= 5), emb.where(col("vec_id") < 5),
          "vec_id", "vec_id", "embedding", k = 5, numPlanes = 8, tables = 2)
          .withColumn("rank", col("rank").cast("int"))
      },
      Some {
        val cBuckets = (0 until 2).map(t =>
          s"SELECT c_id, c_v, $t AS tbl, ${srpBucketSql("c_v", t, 8)} AS bucket FROM c")
          .mkString("\nUNION ALL\n")
        val qBuckets = (0 until 2).map(t =>
          s"SELECT q_id, q_v, $t AS tbl, ${srpBucketSql("q_v", t, 8)} AS bucket FROM q")
          .mkString("\nUNION ALL\n")
        s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_v FROM embeddings
           |           WHERE vec_id >= 5),
           |q AS (SELECT vec_id AS q_id, embedding AS q_v FROM embeddings
           |      WHERE vec_id < 5),
           |cb AS ($cBuckets),
           |qb AS ($qBuckets),
           |cand AS (SELECT DISTINCT q_id, c_id, q_v, c_v
           |         FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket),
           |scored AS (
           |  SELECT q_id, c_id, ${cosSql("c_v", "q_v")} AS cosine,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY ${cosSql("c_v", "q_v")} DESC, c_id ASC) AS rank
           |  FROM cand)
           |SELECT q_id, c_id, round(cosine, 6) AS cosine,
           |  CAST(rank AS INT) AS rank
           |FROM scored WHERE rank <= 5""".stripMargin
      })
  )

  // =================================================================
  // Spec-only-tail closure: S4/S7/K1/K2/F5/F9/F12/F18/F20 under the oracle
  // =================================================================

  /** DuckDB XML entity unescape mirroring Sources.xmlUnescape (literal
    * replaces, &amp; last). */
}
