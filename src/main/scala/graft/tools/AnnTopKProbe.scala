package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** A/B: per-query window top-k (the round-8 plan) vs the bounded-heap
  * TopKPairs aggregation, on the brute-force ANN scan. Identical inputs,
  * identical outputs; the window funnels every scored corpus row for a
  * query through ONE task, the heap keeps k-bounded buffers. */
object AnnTopKProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val c = emb.where(col("vec_id") >= 5)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_v"))
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_v"))
    def scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"),
        Similarity.cosineCol(col("c_v"), col("q_v")).as("cosine"))
    def windowed = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("cosine").desc, col("c_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
    }
    def heaped = Similarity.topKPerQuery(scored, "cosine", 5)
    def time(tag: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"ANNTOPK $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("warmup", heaped)
    for (_ <- 1 to 2) { time("window", windowed); time("heap", heaped) }
    spark.stop()
  }
}
