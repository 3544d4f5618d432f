package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profile of the dd_blocking_quality inputs. */
object ProfileBlocking {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val cand = graft.operators.Dedup.minHashLSH(docs, "doc_id", "text",
      shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.0)
    timed("cand (minhash lsh)")(println("  cand=" + cand.count()))
    val truth = graft.operators.Dedup.prefixJaccardPairs(
      docs, "doc_id", "text", 0.95)
    timed("truth (prefix join)")(println("  truth=" + truth.count()))
    val q = graft.operators.Dedup.blockingQuality(cand, truth, docs, "doc_id")
    timed("quality")(q.show(false))
    spark.stop()
  }
}
