package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ContainRowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    for (pass <- 1 to 3) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      val t0 = System.nanoTime()
      graft.operators.Dedup.containmentPairs(docs, "doc_id", "text", 0.9)
        .write.format("noop").mode("overwrite").save()
      println(f"pass $pass: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
