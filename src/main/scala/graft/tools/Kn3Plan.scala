package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Kn3Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, args(0), "documents")
    val df = graft.operators.LanguageModel.kn3LogPerplexity(
      docs, "doc_id", "text", pmod(col("doc_id"), lit(4)) =!= 0)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println("SMJ=" + "SortMergeJoin".r.findAllIn(p).size +
      " BHJ=" + "BroadcastHashJoin".r.findAllIn(p).size +
      " EXCH=" + "Exchange hashpartitioning".r.findAllIn(
        p.split("== Initial Plan ==").head).size)
  }
}
