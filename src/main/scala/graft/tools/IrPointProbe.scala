package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Point-lookup probe for the standing BM25 index: at the registry's
  * ~122-query batch, partition pruning contributes little (most of the
  * 64 term buckets are touched anyway — the honest r11 note); THIS
  * measures the 1-and-3-query batches the standing index exists for,
  * reporting wall time and the PARTITIONS ACTUALLY READ per batch
  * size. */
object IrPointProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = graft.Tables.load(spark, dir, "documents")
      val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"/tmp/graft_search_index/probe_$tag"
      graft.operators.Retrieval.writeSearchIndex(docs, "doc_id", "text",
        path)
      val allQ = docs
        .where(col("doc_id") % 41 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("q_id"),
          slice(graft.operators.Dedup.tokens(col("text")), 1, 5)
            .as("q_terms"))
        .where(size(col("q_terms")) > 0)
        .persist()
      val total = allQ.count()
      for (n <- Seq(1L, 3L, total)) {
        val q = allQ.orderBy("q_id").limit(n.toInt)
        val t0 = System.nanoTime()
        val out = graft.operators.Retrieval.bm25TopKIndexed(spark, path,
          q, k = 10)
        val rows = out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val scans = graft.plans.PlanWalk
          .fileScans(out.queryExecution.executedPlan).filter(
            _.relation.location.rootPaths.exists(
              _.toString.contains("postings")))
        val partsRead =
          scans.map(_.selectedPartitions.partitionCount).sum
        println(f"$dir batch=$n: $dt%.2f s, $rows rows, " +
          f"postings partitions read = $partsRead / 64 across " +
          f"${scans.length} scans (${scans.map(
            _.selectedPartitions.partitionCount).mkString("+")})")
      }
      allQ.unpersist()
    }
    spark.stop()
  }
}
