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

/** SURVEY §2.3 joins (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object JoinRegistry {
  val rows: Seq[Q] = Seq(
    Q("j1_inner_join",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .where(col("o_orderstatus") === "F")
        .select("o_orderkey", "c_name", "o_totalprice"),
      Some("""SELECT o_orderkey, c_name, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderstatus = 'F'""".stripMargin)),

    Q("j2_left_join",
      (s, dir) => t(s, dir, "lineitem").where(col("l_orderkey") % 100 === 0)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(col("p_name"), lit("unknown")).as("part_name")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  coalesce(p_name, 'unknown') AS part_name
             |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
             |WHERE l_orderkey % 100 = 0""".stripMargin)),

    // J3: broadcast dimension join (explicit broadcast hint)
    Q("j3_broadcast_dim",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 4).as("avg_bal")),
      Some("""SELECT r_name, count(*) AS n_customers,
             |  round(avg(c_acctbal), 4) AS avg_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"""
        .stripMargin)),

    // J4: grid-blocked spatial self-join (the ER candidate join)
    Q("j4_grid_selfjoin",
      (s, dir) => SpatialJoins.gridSelfJoin(
          custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
        .select(col("a_id"), col("b_id"), round(col("meters"), 2).as("meters")),
      Some(s"""WITH pts AS ($custPointsSql)
              |SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |  round(${havSql("a.lat", "a.lon", "b.lat", "b.lon")}, 2) AS meters
              |FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0"""
        .stripMargin)),

    // J5: nearest-neighbor join with threshold (k=1)
    Q("j5_nearest_join",
      (s, dir) => {
        val l = custPoints(s, dir)
          .withColumn("blk", pmod(floor(col("c_custkey") / 97.0), lit(89.0)))
        val r = suppPoints(s, dir)
          .withColumn("blk", pmod(floor(col("s_suppkey") / 97.0), lit(89.0)))
        SpatialJoins.nearestJoin(l, r, "c_custkey", "s_suppkey",
            thresholdM = 100.0, blockKeys = Seq("blk"))
          .select(col("c_custkey"), col("s_suppkey"),
            round(col("meters"), 2).as("meters"))
      },
      Some(s"""WITH l AS (SELECT *, floor(c_custkey / 97.0) % 89 AS blk
              |            FROM ($custPointsSql)),
              |r AS (SELECT *, floor(s_suppkey / 97.0) % 89 AS blk
              |      FROM ($suppPointsSql)),
              |cand AS (
              |  SELECT c_custkey, s_suppkey,
              |    ${havSql("l.lat", "l.lon", "r.lat", "r.lon")} AS m,
              |    row_number() OVER (PARTITION BY c_custkey
              |      ORDER BY ${havSql("l.lat", "l.lon", "r.lat", "r.lon")} ASC,
              |        s_suppkey ASC) AS rn
              |  FROM l JOIN r ON l.blk = r.blk
              |  WHERE ${havSql("l.lat", "l.lon", "r.lat", "r.lon")} <= 100.0)
              |SELECT c_custkey, s_suppkey, round(m, 2) AS meters
              |FROM cand WHERE rn = 1""".stripMargin)),

    // J6: fuzzy name join — best >=threshold edit-similarity match per
    // part. Candidates come from MinHash-LSH over name token sets
    // (Dedup.lshCandidatePairs), NOT a natural-language block key: a
    // vocabulary-bounded key like type|first-token makes blocks grow
    // linearly with data (and in-block pairs quadratically), while LSH
    // bucket width is governed by the (bands, rowsPerBand) S-curve at any
    // scale. Recall contract: a candidate pair with name-token-set
    // jaccard j surfaces with p = 1-(1-j^2)^8 (S-curve knee ~0.35);
    // the codegen'd LevRatio verify stage then applies the exact 0.5
    // edit-similarity threshold to the argmax of the surviving pairs.
    // The length-band pre-filter is exact for the threshold (sim >= 0.5
    // implies 2*|len diff| <= greatest(len)), so it only prunes pairs the
    // argmax+threshold would discard anyway — the oracle replays the LSH
    // but not the pre-filter, and still hash-matches.
    Q("j6_fuzzy_name_join",
      (s, dir) => {
        // Distinct-name collapse: every row with the same name has an
        // IDENTICAL minhash signature, so row-level LSH would put whole
        // duplicate-name groups in the same buckets and the candidate join
        // would be quadratic in group size (measured: 76M pairs at sf0.1,
        // where part has 64 distinct names over 20k rows). Instead run
        // LSH + verify over DISTINCT names — sublinear in table size —
        // and rebuild the per-key answer algebraically:
        //   - a part whose name occurs >=2 times best-matches the
        //     smallest OTHER key of its own name group (sim 1.0, since
        //     levRatio(x,x)=1 and distinct names are strictly < 1);
        //   - otherwise its best is the name-level argmax, with the
        //     candidate name's min key as the tiebreak key (matching the
        //     row-level (sim desc, b_key asc) struct order).
        // The per-part side then needs only BROADCAST joins against the
        // tiny name-level frames: the fact table is never shuffled.
        val parts = t(s, dir, "part").select("p_partkey", "p_name")
        val k1s = parts.groupBy("p_name")
          .agg(min("p_partkey").as("k1"), count(lit(1)).as("cnt"))
        val k2s = parts.join(broadcast(k1s.select("p_name", "k1")), "p_name")
          .where(col("p_partkey") > col("k1"))
          .groupBy("p_name").agg(min("p_partkey").as("k2"))
        val stats = k1s.join(k2s, Seq("p_name"), "left")
        val dn = k1s.select(col("p_name").as("nm"))
        val namePairs = Dedup.lshCandidatePairs(dn, "nm", "nm",
            shingleN = 1, bands = 8, rowsPerBand = 2)
          .withColumn("sim", TextFunctions.levRatioCol(col("a_id"), col("b_id")))
        val nameSym = namePairs
          .select(col("a_id").as("a_nm"), col("b_id").as("b_nm"), col("sim"))
          .union(namePairs
            .select(col("b_id").as("a_nm"), col("a_id").as("b_nm"), col("sim")))
        val nameBest = nameSym
          .join(k1s.select(col("p_name").as("b_nm"), col("k1").as("bk1")), "b_nm")
          .groupBy("a_nm")
          .agg(max(struct(col("sim").as("s"), (-col("bk1")).as("nk"))).as("nbest"))
        parts.join(broadcast(stats), "p_name")
          .join(broadcast(nameBest), col("p_name") === col("a_nm"), "left")
          .withColumn("bs", when(col("cnt") >= 2, lit(1.0))
            .otherwise(col("nbest.s")))
          .withColumn("bk", when(col("cnt") >= 2,
            when(col("p_partkey") === col("k1"), col("k2")).otherwise(col("k1")))
            .otherwise(-col("nbest.nk")))
          .where(col("bs") >= 0.5)
          .select(col("p_partkey").as("a_key"), col("bk").as("b_key"),
            round(col("bs"), 4).as("sim"))
      },
      Some("""WITH p AS (
             |  SELECT p_partkey AS id, p_name AS nm,
             |    list_filter(string_split(trim(regexp_replace(lower(p_name),
             |      '[^a-z0-9]+', ' ', 'g')), ' '), x -> len(x) > 0) AS tk
             |  FROM part),
             |h1 AS (
             |  SELECT id, nm, list_transform(
             |    CASE WHEN len(tk) < 1 THEN [''] ELSE list_distinct(tk) END,
             |    s -> ('0x' || substr(md5('0:' || s), 1, 8))::BIGINT) AS h1
             |  FROM p),
             |sig AS (
             |  SELECT id, nm, list_transform(range(0, 16), i ->
             |    list_min(list_transform(h1,
             |      h -> (h * (i * 2 + 3) + i * 12582917) % 4294967291))) AS sig
             |  FROM h1),
             |banded AS (
             |  SELECT id, nm, b AS band,
             |    md5(b::VARCHAR || '_' || sig[b*2+1]::VARCHAR || '_' ||
             |      sig[b*2+2]::VARCHAR) AS bucket
             |  FROM sig, (SELECT unnest(range(0, 8)) AS b)),
             |scored AS (
             |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
             |    1.0 - levenshtein(a.nm, b.nm) /
             |      greatest(length(a.nm), length(b.nm)) AS sim
             |  FROM banded a JOIN banded b
             |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
             |sym AS (
             |  SELECT a_id AS a_key, b_id AS b_key, sim FROM scored
             |  UNION ALL
             |  SELECT b_id, a_id, sim FROM scored),
             |best AS (
             |  SELECT a_key, max({'s': sim, 'nk': -b_key}) AS best
             |  FROM sym GROUP BY a_key)
             |SELECT a_key, -((best).nk) AS b_key, round((best).s, 4) AS sim
             |FROM best WHERE (best).s >= 0.5""".stripMargin)),

    Q("j9_anti_join",
      (s, dir) => t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
             |                        WHERE o_custkey IS NOT NULL)""".stripMargin)),

    // J11: multi-hop chain join (graph-pattern shape)
    Q("j11_multihop",
      (s, dir) => t(s, dir, "region")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue")),
      Some("""SELECT r_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2)
             |  AS revenue
             |FROM region JOIN nation ON r_regionkey = n_regionkey
             |JOIN supplier ON n_nationkey = s_nationkey
             |JOIN lineitem ON s_suppkey = l_suppkey
             |GROUP BY r_name""".stripMargin)),

    // J12: backward as-of join — each purchase gets the user's most recent
    // prior click within 2h (AsOfJoin union+window formulation; oracle is
    // DuckDB's native ASOF JOIN, an independent implementation).
    Q("j12_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        // one row per (user, ts) so the as-of pick is deterministic
        val clicks = ev.where(col("event_type") === "click")
          .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
        AsOfJoin.backward(purchases, clicks, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            payload = Seq("click_id" -> "click_id", "ts" -> "click_ts"),
            within = Some((lt, rt) => rt >= lt - expr("INTERVAL 2 HOURS")))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"), col("click_id"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts")))
              .as("gap_us"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
             |           WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts AS cts, max(event_id) AS click_id
             |      FROM events WHERE event_type = 'click'
             |      GROUP BY user_id, ts)
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us,
             |  CASE WHEN c.cts >= p.ts - INTERVAL 2 HOUR
             |    THEN c.click_id END AS click_id,
             |  CASE WHEN c.cts >= p.ts - INTERVAL 2 HOUR
             |    THEN epoch_us(p.ts) - epoch_us(c.cts) END AS gap_us
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND p.ts >= c.cts""".stripMargin)),

    // J12b: forward as-of — each click attributed to the user's NEXT
    // purchase within 2h (first(ignoreNulls) over the following frame).
    Q("j14_asof_forward",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        AsOfJoin.forward(clicks, purchases, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            payload = Seq("purchase_id" -> "purchase_id",
              "ts" -> "purchase_ts"),
            within = Some((lt, rt) => rt <= lt + expr("INTERVAL 2 HOURS")))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("c_us"), col("purchase_id"),
            (unix_micros(col("purchase_ts")) - unix_micros(col("ts")))
              .as("wait_us"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, ts FROM events
             |           WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts AS pts, max(event_id) AS purchase_id
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY user_id, ts)
             |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS c_us,
             |  CASE WHEN p.pts <= c.ts + INTERVAL 2 HOUR
             |    THEN p.purchase_id END AS purchase_id,
             |  CASE WHEN p.pts <= c.ts + INTERVAL 2 HOUR
             |    THEN epoch_us(p.pts) - epoch_us(c.ts) END AS wait_us
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts <= p.pts""".stripMargin)),

    // J13: interval range join — clicks inside each purchase's trailing
    // 30-minute window, as a bucketed equi-join (RangeJoin), never a
    // per-key nested loop. Oracle is the naive inequality join.
    Q("j13_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"))
          .withColumn("w_start", col("p_us") - lit(1800000000L))
        val c = ev.where(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("c_us"),
            col("value"))
        val pairs = RangeJoin.intervalPoint(p, c, Seq("user_id"),
          startCol = "w_start", endCol = "p_us", pointCol = "c_us",
          bucketWidth = 1800000000L)
        val perPurchase = pairs.groupBy("event_id")
          .agg(count(lit(1)).as("n_clicks"),
            (round(sum("value"), 2) + lit(0.0)).as("click_value"))
        p.join(perPurchase, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"), col("p_us"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            (coalesce(col("click_value"), lit(0.0)) + lit(0.0))
              .as("click_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS p_us
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, epoch_us(ts) AS c_us, value
             |      FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, p.p_us,
             |  count(c.c_us) AS n_clicks,
             |  coalesce(round(sum(c.value), 2), 0e0) + 0e0 AS click_value
             |FROM p LEFT JOIN c ON p.user_id = c.user_id
             |  AND c.c_us >= p.p_us - 1800000000 AND c.c_us < p.p_us
             |GROUP BY p.event_id, p.user_id, p.p_us""".stripMargin)),

    // J15: interval x interval OVERLAP join — purchase attribution
    // windows overlapping click activity windows per user. Both sides
    // explode to covered epoch buckets, join as a plain equi-join on
    // (user, bucket), and each pair surfaces exactly once at the first
    // shared bucket (no distinct pass); the exact overlap predicate is
    // re-checked so results equal the naive inequality join. The
    // interval x point sibling is j13.
    Q("j15_interval_overlap",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            (unix_micros(col("ts")) - lit(1800000000L)).as("p_start"),
            unix_micros(col("ts")).as("p_end"))
        val c = ev.where(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id"),
            (unix_micros(col("ts")) - lit(600000000L)).as("c_start"),
            (unix_micros(col("ts")) + lit(600000000L)).as("c_end"))
        RangeJoin.intervalOverlap(p, c, Seq("user_id"),
          "p_start", "p_end", "c_start", "c_end",
          bucketWidth = 1800000000L)
          .select("user_id", "p_id", "c_id")
      },
      Some("""SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id
             |FROM (SELECT event_id, user_id,
             |        epoch_us(ts) - 1800000000 AS ps, epoch_us(ts) AS pe
             |      FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT event_id, user_id,
             |        epoch_us(ts) - 600000000 AS cs,
             |        epoch_us(ts) + 600000000 AS ce
             |      FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             |  AND p.ps <= c.ce AND c.cs <= p.pe""".stripMargin))
  )

  // =================================================================
  // §2.4 aggregations  +  §2.9 windows
  // =================================================================

}
