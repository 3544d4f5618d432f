package graft.tools
import org.apache.spark.sql.SparkSession
object CountContain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, args(0), "documents")
    println("TRUEPAIRS " + graft.operators.Dedup.containmentPairs(
      docs, "doc_id", "text", 0.9).count())
    spark.stop()
  }
}
