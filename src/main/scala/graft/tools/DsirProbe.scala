package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.load(spark, dir, "documents")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"DSIR $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val tk = Dedup.tokens(col("text"))
    val bigrams = when(size(tk) >= 2,
      transform(sequence(lit(0), size(tk) - 2), i =>
        concat(element_at(tk, i + 1), lit(" "), element_at(tk, i + 2))))
      .otherwise(array().cast("array<string>"))
    time("explode+count") {
      docs.select(col("doc_id").as("id"), explode(concat(tk, bigrams)).as("gram"))
        .select(col("id"), pmod(Dedup.md5Hash32(col("gram"), lit(0)), lit(64L)).as("bucket"))
        .groupBy("id", "bucket").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    time("tokens-only") {
      docs.select(col("doc_id").as("id"), explode(tk).as("gram"))
        .select(col("id"), pmod(Dedup.md5Hash32(col("gram"), lit(0)), lit(64L)).as("bucket"))
        .groupBy("id", "bucket").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full") {
      Sampling.dsirSelect(docs, "doc_id", "text", col("source") === "src0")
        .write.format("noop").mode("overwrite").save()
    }
    time("full2") {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Sampling.dsirSelect(docs, "doc_id", "text", col("source") === "src0")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
