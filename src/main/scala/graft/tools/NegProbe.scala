package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NegProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (dir <- args) {
      val docs = graft.Tables.load(spark, dir, "documents")
      val anchors = docs.where(pmod(col("doc_id"), lit(20)) === 0)
      val noAvoid = Seq.empty[(Long, Long)].toDF("doc_id", "neg")
      for (nb <- Seq(32, 0)) {
        val t0 = System.nanoTime()
        graft.operators.Sampling.negativeSample(anchors, docs, "doc_id",
          k = 4, avoid = noAvoid, nBuckets = nb)
          .write.format("noop").mode("overwrite").save()
        println(f"$dir nBuckets=$nb: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
