package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the degeneracy family over the sparsified part
  * co-order graph (the gr_kcore/gr_coreness fixture shape). */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val e = graft.RegistryCore.partCoorderEdges(spark, dir)
        .select("src", "dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ne = e.count()
      for ((tag, f) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
          "kcore_k3" -> (() => graft.operators.PageRank.kCore(e, 3, 12)),
          "coreness" -> (() => graft.operators.PageRank.coreness(e, 12)))) {
        val t0 = System.nanoTime()
        val n = f().count()
        println(f"$dir $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
          f"$n nodes (graph $ne directed edges)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(_.id == e.rdd.id).foreach(_.unpersist(false))
      }
      e.unpersist(false)
    }
    spark.stop()
  }
}
