package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling + recall probe for NN-Descent kNN-graph construction. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      for (rounds <- Seq(2, 4)) {
        val t0 = System.nanoTime()
        val g = graft.operators.Similarity.knnDescent(emb, "vec_id",
          "embedding", k = 5, rounds = rounds)
        val rows = g.count()
        println(f"$dir rounds=$rounds: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
          f", $rows graph rows over $n vectors")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
