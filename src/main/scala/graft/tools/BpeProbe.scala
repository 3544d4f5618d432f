package graft.tools
import org.apache.spark.sql.SparkSession
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    for (n <- Seq(1, 3, 6)) {
      val t0 = System.nanoTime()
      graft.operators.BpeTrainer.bpeTrain(docs, "text", n).collect()
      println(f"nMerges=$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
