package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clean A/B of the two HyperBall register layouts ([[graft.operators
  * .PageRank.hyperBall]] exploded tuples vs [[graft.operators.PageRank
  * .hyperBallPacked]] array rows): fresh JVM, NO exact-BFS leg (its
  * 64M-pair aggregates leave GC pressure that polluted the first
  * CentralityProbe A/B — the same binary measured packed at 91 s and
  * 31 s in consecutive probe runs), edges cached and counted untimed,
  * then N interleaved (exploded, packed) passes with a trivial count as
  * the contention control.
  *
  * Usage: runMain graft.tools.HyperBallAB <dir> [reps=3]
  */
object HyperBallAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cust = graft.Tables.load(spark, dir, "customer")
      .withColumn("lat",
        lit(40.0) + (col("c_custkey") % 97).cast("double") * 0.002)
      .withColumn("lon", lit(-75.0) +
        pmod(floor(col("c_custkey") / 97.0), lit(89.0)) * 0.002)
    val e0 = graft.operators.SpatialJoins.gridSelfJoin(
        cust, "c_custkey", "lat", "lon", radiusM = 250.0)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val bidir = e0.union(
      e0.select(col("dst").as("src"), col("src").as("dst"))).cache()
    val nEdges = bidir.count() // materialize untimed
    def t(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to reps) {
      val ctl = t(bidir.count())
      val ex = t(graft.operators.PageRank
        .hyperBall(bidir, maxHops = 3, p = 6).count())
      val pk = t(graft.operators.PageRank
        .hyperBallPacked(bidir, maxHops = 3, p = 6).count())
      println(f"[hyperball-ab] $dir rep=$r edges=$nEdges " +
        f"control=$ctl%.2fs exploded=$ex%.2fs packed=$pk%.2fs")
    }
    spark.stop()
  }
}
