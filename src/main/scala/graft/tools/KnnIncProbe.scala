package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost-shape probe for incremental kNN-graph maintenance: per-batch
  * time must grow with the BATCH, not the corpus. Builds the standing
  * graph + SRP index once per scale (untimed — that is the standing
  * state a real pipeline amortizes), then times
  * `knnDescentIncremental` across batch sizes; running it across sf
  * dirs gives the corpus-growth axis at fixed batch. Feeds SCALE.md. */
object KnnIncProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val n = emb.count()
      val g = graft.operators.Similarity.knnDescent(emb, "vec_id",
        "embedding", k = 5, rounds = 2).persist()
      g.count()
      val idx = graft.operators.Similarity.srpBucketed(emb, "vec_id",
        "embedding", numPlanes = 8, tables = 4).persist()
      idx.count()
      for (b <- Seq(50, 100, 200, 400)) {
        // disjoint ids, corpus-drawn vectors: the cost shape is what
        // is being measured, not recall
        val batch = emb.orderBy("vec_id").limit(b)
          .select((col("vec_id") + 10000000L).as("vec_id"),
            col("embedding"))
        val t0 = System.nanoTime()
        val rows = graft.operators.Similarity.knnDescentIncremental(
          g, idx, batch, "vec_id", "embedding", k = 5, rounds = 1)
          .count()
        println(f"$dir corpus=$n batch=$b: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s, $rows delta rows")
      }
      g.unpersist(false)
      idx.unpersist(false)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
