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

/** SURVEY §2.4 aggregations (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object AggRegistry {
  val rows: Seq[Q] = Seq(
    Q("a1_count_by_key",
      (s, dir) => t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    Q("a2_count_mean",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          round(avg("o_totalprice"), 4).as("avg_price")),
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  round(avg(o_totalprice), 4) AS avg_price
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A3: collect-list per key (rendered as deterministic sorted string)
    Q("a3_collect_per_key",
      (s, dir) => t(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          array_join(transform(slice(array_sort(collect_list(col("doc_id"))), 1, 5),
            x => x.cast("string")), ",").as("first_ids")),
      Some("""WITH ranked AS (SELECT source, doc_id, row_number() OVER (
             |  PARTITION BY source ORDER BY doc_id) AS rn FROM documents)
             |SELECT source, count(*) AS n_docs,
             |  string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
             |    ',' ORDER BY doc_id) AS first_ids
             |FROM ranked GROUP BY source""".stripMargin)),

    // A4: argmax-by-length canonical pick (max_by semantics w/ tiebreak)
    Q("a4_argmax_pick",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_name").asc)
        t(s, dir, "customer").withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("c_nationkey"), col("c_name").as("top_customer"),
            col("c_acctbal").as("top_bal"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (
             |  PARTITION BY c_nationkey
             |  ORDER BY c_acctbal DESC, c_name ASC) AS rn FROM customer)
             |SELECT c_nationkey, c_name AS top_customer, c_acctbal AS top_bal
             |FROM ranked WHERE rn = 1""".stripMargin)),

    Q("a5_dedupe_by_key",
      (s, dir) => t(s, dir, "documents").select("source", "lang")
        .dropDuplicates("source", "lang"),
      Some("SELECT DISTINCT source, lang FROM documents")),

    Q("a6_distinct_count",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(countDistinct("o_custkey").as("n_customers")),
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A7: per-group z-score via window avg/stddev_samp with sigma=0 guard
    Q("a7_zscore",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
        val mu = avg("c_acctbal").over(w)
        val sigma = stddev_samp(col("c_acctbal")).over(w)
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            (round(when(sigma === 0 || sigma.isNull, 0.0)
              .otherwise((col("c_acctbal") - mu) / sigma), 4) + 0.0).as("z"))
      },
      Some("""SELECT c_custkey, c_nationkey,
             |  round(CASE WHEN stddev_samp(c_acctbal) OVER w = 0
             |    OR stddev_samp(c_acctbal) OVER w IS NULL THEN 0.0
             |    ELSE (c_acctbal - avg(c_acctbal) OVER w) /
             |      stddev_samp(c_acctbal) OVER w END, 4) + 0e0 AS z
             |FROM customer WINDOW w AS (PARTITION BY c_nationkey)""".stripMargin)),

    // A8+G7: blended z-score + popularity flag
    Q("a8_blended_zscore",
      (s, dir) => {
        val oc = t(s, dir, "orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"))
        val c = t(s, dir, "customer").join(oc,
            col("c_custkey") === col("o_custkey"), "left")
          .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
        val w = Window.partitionBy("c_nationkey")
        def z(c0: Column): Column = {
          val mu = avg(c0).over(w)
          val sd = stddev_samp(c0).over(w)
          when(sd === 0 || sd.isNull, 0.0).otherwise((c0 - mu) / sd)
        }
        c.withColumn("blend",
            round(z(col("c_acctbal")) * 0.6 + z(col("n_orders").cast("double")) * 0.4, 4) + 0.0)
          .withColumn("flag", when(col("blend") >= 1.0, "high")
            .when(col("blend") >= 0.0, "medium").otherwise("low"))
          .select("c_custkey", "blend", "flag")
      },
      Some("""WITH oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders
             |            GROUP BY o_custkey),
             |c AS (SELECT c_custkey, c_nationkey, c_acctbal,
             |        coalesce(n_orders, 0) AS n_orders
             |      FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
             |z AS (SELECT c_custkey,
             |  CASE WHEN stddev_samp(c_acctbal) OVER w = 0
             |    OR stddev_samp(c_acctbal) OVER w IS NULL THEN 0.0
             |    ELSE (c_acctbal - avg(c_acctbal) OVER w) /
             |      stddev_samp(c_acctbal) OVER w END AS z_bal,
             |  CASE WHEN stddev_samp(CAST(n_orders AS DOUBLE)) OVER w = 0
             |    OR stddev_samp(CAST(n_orders AS DOUBLE)) OVER w IS NULL THEN 0.0
             |    ELSE (CAST(n_orders AS DOUBLE) -
             |      avg(CAST(n_orders AS DOUBLE)) OVER w) /
             |      stddev_samp(CAST(n_orders AS DOUBLE)) OVER w END AS z_ord
             |  FROM c WINDOW w AS (PARTITION BY c_nationkey))
             |SELECT c_custkey, round(z_bal * 0.6 + z_ord * 0.4, 4) + 0e0 AS blend,
             |  CASE WHEN round(z_bal * 0.6 + z_ord * 0.4, 4) + 0e0 >= 1.0 THEN 'high'
             |    WHEN round(z_bal * 0.6 + z_ord * 0.4, 4) + 0e0 >= 0.0 THEN 'medium'
             |    ELSE 'low' END AS flag
             |FROM z""".stripMargin)),

    Q("a9_conditional_count",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_totalprice") > 300, 1)).as("n_big")),
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
             |  count(CASE WHEN o_totalprice > 300 THEN 1 END) AS n_big
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A10: priority-cascaded aggregate with coalesce
    Q("a10_priority_cascade",
      (s, dir) => t(s, dir, "customer").groupBy("c_nationkey")
        .agg(round(coalesce(
          avg(when(col("c_mktsegment") === "BUILDING", col("c_acctbal"))),
          avg(when(col("c_mktsegment") === "AUTOMOBILE", col("c_acctbal"))),
          avg(col("c_acctbal"))), 4).as("rep_bal")),
      Some("""SELECT c_nationkey, round(coalesce(
             |  avg(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END),
             |  avg(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END),
             |  avg(c_acctbal)), 4) AS rep_bal
             |FROM customer GROUP BY c_nationkey""".stripMargin)),

    // A12: frequency count with threshold + ordering
    Q("a12_freq_threshold",
      (s, dir) => t(s, dir, "events").groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n")).where(col("n") >= 5),
      Some("""SELECT user_id, event_type, count(*) AS n FROM events
             |GROUP BY user_id, event_type HAVING count(*) >= 5""".stripMargin)),

    // A13: global sanity counts (one row)
    Q("a13_global_counts",
      (s, dir) => {
        val li = t(s, dir, "lineitem").agg(count(lit(1)).as("n_lineitem"))
        val o = t(s, dir, "orders").agg(count(lit(1)).as("n_orders"))
        val d = t(s, dir, "documents").agg(count(lit(1)).as("n_documents"))
        li.crossJoin(o).crossJoin(d)
      },
      Some("""SELECT (SELECT count(*) FROM lineitem) AS n_lineitem,
             |  (SELECT count(*) FROM orders) AS n_orders,
             |  (SELECT count(*) FROM documents) AS n_documents""".stripMargin)),

    // A14: exact interpolated quantiles per group. `percentile` is Spark's
    // exact sort-based aggregate — right for bounded group sizes under the
    // oracle; at 100 TB swap in approx_percentile (t-digest, mergeable
    // partials) and accept the documented error bound.
    Q("a14_quantiles",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99")),
      Some("""SELECT o_orderpriority,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A15: rollup (grouping sets) — subtotal lattice in one pass instead
    // of unioned re-aggregations; partials merge map-side per grouping set.
    Q("a15_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // A15b: full CUBE lattice — adds the (·, linestatus) cross-slices the
    // rollup hierarchy omits, still one pass with grouping-set partials
    Q("a18_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // A16: pivot — wide per-category columns from a long table; Spark's
    // pivot plans as a single aggregate with conditional partials (values
    // list given explicitly so no extra distinct pass is needed).
    Q("a16_pivot",
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("view"), lit(0L)).as("n_view")),
      Some("""SELECT user_id,
             |  count(*) FILTER (event_type = 'click') AS n_click,
             |  count(*) FILTER (event_type = 'error') AS n_error,
             |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
             |  count(*) FILTER (event_type = 'signup') AS n_signup,
             |  count(*) FILTER (event_type = 'view') AS n_view
             |FROM events GROUP BY user_id""".stripMargin)),

    // A17: time-RANGE window frame — per-customer trailing-30-day order
    // revenue. A range frame (value-bounded, peer-inclusive) is a
    // different physical window than the row-bounded frames elsewhere in
    // the registry; the frame key is epoch seconds so both engines bound
    // the frame with exact integer arithmetic.
    Q("a17_rolling_window",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("d"))
          .rangeBetween(-30L * 86400, 0)
        t(s, dir, "orders")
          // NTZ parquet date + UTC session tz: cast through TimestampType
          // for epoch seconds identical to DuckDB's naive epoch_ms
          .withColumn("d", col("o_orderdate").cast("timestamp").cast("long"))
          .select(col("o_custkey"), col("o_orderkey"), col("d"),
            round(sum("o_totalprice").over(w), 2).as("roll30"))
      },
      Some("""SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) // 1000 AS d,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY epoch_ms(o_orderdate) // 1000
             |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2)
             |    AS roll30
             |FROM orders""".stripMargin))
  )

  // =================================================================
  // §2.6 sorts / top-k  +  §2.7 set ops
  // =================================================================

}
