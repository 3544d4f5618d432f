package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** A/B: Scala-UDF cosine (encoder round-trip per row) vs the codegen'd
  * CosineSim expression, on an identical brute-scan plan. */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = emb.limit(100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_v"))
    println(s"COSPROBE corpus=${emb.count()} queries=100")
    val cosineUdf = udf(Similarity.cosineKernel _)
    def run(tag: String, f: org.apache.spark.sql.Column): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        emb.crossJoin(broadcast(q))
          .select(col("q_id"), col("vec_id"), f.as("cos"))
          .write.format("noop").mode("overwrite").save()
        println(f"COSPROBE $tag run$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    run("udf ", cosineUdf(col("embedding"), col("q_v")))
    run("expr", Similarity.cosineCol(col("embedding"), col("q_v")))
    spark.stop()
  }
}
