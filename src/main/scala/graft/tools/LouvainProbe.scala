package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for multi-level Louvain over the supplier-proximity
  * graph (the gr_louvain_multi fixture shape): time the registry
  * schedule (2 levels x 2 rounds) and a deeper production schedule at
  * each sf dir given on the command line. */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val sup = graft.Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"),
          (lit(40.0003) + (col("s_suppkey") % 97).cast("double") * 0.002)
            .as("lat"),
          (lit(-75.0) + pmod(floor(col("s_suppkey") / 97.0), lit(89.0))
            * 0.002).as("lon"))
      val e0 = graft.operators.SpatialJoins.gridSelfJoin(
          sup, "s_suppkey", "lat", "lon", radiusM = 200.0)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val bidir = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      for ((rounds, levels) <- Seq((2, 2), (5, 3))) {
        val t0 = System.nanoTime()
        val labels0 = graft.operators.PageRank
          .labelPropagation(bidir, iterations = 3)
        val out = graft.operators.PageRank
          .louvainMulti(bidir, labels0, rounds, levels)
        val n = out.select("label").distinct().count()
        println(f"$dir rounds=$rounds levels=$levels: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s, $n communities")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
