package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
object SemAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    def run(tag: String, c: Boolean): Unit = for (r <- 1 to 2) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      val n = Dedup.semanticDedup(emb, "vec_id", "embedding",
        k = 8, iters = 2, threshold = 0.3, collapseExactDups = c).count()
      println(f"SEMAB $tag run$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    run("collapse_on ", c = true)
    run("collapse_off", c = false)
    spark.stop()
  }
}
