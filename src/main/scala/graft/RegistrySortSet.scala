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

/** SURVEY §2.5/§2.6 sorts, top-k, set ops (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object SortSetRegistry {
  val rows: Seq[Q] = Seq(
    Q("t1_multikey_sort",
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_orderkey") <= 200)
        .orderBy(col("l_returnflag").asc, col("l_quantity").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
             |FROM lineitem WHERE l_orderkey <= 200
             |ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC,
             |  l_linenumber ASC LIMIT 100""".stripMargin)),

    Q("t2_topn",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_name").asc)
        .limit(15),
      Some("""SELECT n_name, count(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_customers DESC, n_name ASC LIMIT 15"""
        .stripMargin)),

    // T4: argmin via min_by-with-tiebreak
    Q("t4_argmin_pick",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        t(s, dir, "customer").withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("c_nationkey"), col("c_custkey").as("poorest"),
            col("c_acctbal").as("min_bal"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (
             |  PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
             |  AS rn FROM customer)
             |SELECT c_nationkey, c_custkey AS poorest, c_acctbal AS min_bal
             |FROM ranked WHERE rn = 1""".stripMargin)),

    // U1: union by name with a missing column filled
    Q("u1_union_by_name",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_name").as("name"), col("c_acctbal").as("bal"),
            lit("customer").as("src"))
        val sup = t(s, dir, "supplier")
          .select(col("s_name").as("name"), col("s_acctbal").as("bal"),
            lit("supplier").as("src"))
        c.unionByName(sup).groupBy("src")
          .agg(count(lit(1)).as("n"), round(sum("bal"), 2).as("total_bal"))
      },
      Some("""SELECT src, count(*) AS n, round(sum(bal), 2) AS total_bal FROM (
             |  SELECT c_name AS name, c_acctbal AS bal, 'customer' AS src
             |    FROM customer
             |  UNION ALL
             |  SELECT s_name, s_acctbal, 'supplier' FROM supplier)
             |GROUP BY src""".stripMargin)),

    Q("u2_except",
      (s, dir) => t(s, dir, "customer").select("c_custkey")
        .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))),
      Some("SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders")),

    Q("u3_intersect",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin)),

    // U5/U6: multiset (ALL) set ops — bag semantics where duplicate
    // multiplicity matters (EXCEPT ALL subtracts occurrence counts;
    // INTERSECT ALL keeps the minimum). Spark plans both as a single
    // count-respecting aggregate join, not a distinct.
    Q("u5_except_all",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"))
        .exceptAll(t(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))),
      Some("""SELECT o_custkey AS custkey FROM orders
             |EXCEPT ALL
             |SELECT c_custkey FROM customer
             |WHERE c_mktsegment = 'BUILDING'""".stripMargin)),

    Q("u6_intersect_all",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"))
        .intersectAll(t(s, dir, "lineitem")
          .where(col("l_quantity") >= 45)
          .select(pmod(col("l_orderkey"), lit(1500)).as("custkey"))),
      Some("""SELECT o_custkey AS custkey FROM orders
             |INTERSECT ALL
             |SELECT l_orderkey % 1500 FROM lineitem
             |WHERE l_quantity >= 45""".stripMargin)),

    // U4: unpivot/melt — wide measure columns to (measure, value) rows,
    // the inverse reshape of a16_pivot. Narrow per-row expansion, no
    // shuffle. The oracle spells it as the equivalent UNION ALL.
    Q("u4_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_orderkey") < 1000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value"),
      Some {
        val arms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(m => s"""SELECT l_orderkey, l_linenumber, '$m' AS measure,
                       |  $m AS value FROM lineitem
                       |WHERE l_orderkey < 1000""".stripMargin)
        arms.mkString("\nUNION ALL\n")
      })
  )

  // =================================================================
  // §2.8 scalar functions
  // =================================================================

}
