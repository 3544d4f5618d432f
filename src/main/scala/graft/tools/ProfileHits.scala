package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off wall-clock probe of PageRank.hits on the customer proximity
  * graph (the gr_hits registry shape). */
object ProfileHits {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
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
    // warm the scan
    cust.count()
    val edges = graft.operators.SpatialJoins.gridSelfJoin(
        cust, "c_custkey", "lat", "lon", radiusM = 250.0)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.operators.PageRank.hits(edges, iterations = 5)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] hits run$round ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
