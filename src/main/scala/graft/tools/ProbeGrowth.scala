package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure how the derived pair/graph structures grow under ScaleUp
  * replication (they densify quadratically — the scale-probe factors
  * for pair-producing operators must be read against these counts, not
  * raw row counts). */
object ProbeGrowth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val cust = graft.Tables.load(spark, dir, "customer")
        .withColumn("lat",
          lit(40.0) + (col("c_custkey") % 97).cast("double") * 0.002)
        .withColumn("lon", lit(-75.0) +
          pmod(floor(col("c_custkey") / 97.0), lit(89.0)) * 0.002)
      val edges = graft.operators.SpatialJoins.gridSelfJoin(
          cust, "c_custkey", "lat", "lon", radiusM = 250.0)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val nEdges = edges.count()
      val adj = edges.select(col("src").as("n"), col("dst").as("nbr"))
        .union(edges.select(col("dst").as("n"), col("src").as("nbr")))
      val deg = adj.groupBy("n").agg(count(lit(1)).as("d"))
      val nWedges = deg.agg(sum(col("d") * (col("d") - 1) / 2))
        .head().getDouble(0).toLong
      val truth = graft.operators.Dedup.prefixJaccardPairs(
        graft.Tables.load(spark, dir, "documents"), "doc_id", "text", 0.95)
      println(s"[growth] $dir edges=$nEdges wedges=$nWedges " +
        s"truthPairs=${truth.count()}")
    }
    spark.stop()
  }
}
