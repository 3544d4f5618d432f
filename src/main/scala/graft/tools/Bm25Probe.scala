package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Retrieval}

/** Stage breakdown for ir_bm25_topk: how much of the wall-clock is the
  * tokenize scan, the prefiltered tf aggregation, the stats pass, and the
  * full score+rank — so optimization goes where the time is. */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.load(spark, dir, "documents")
    // same fixed-batch cap as the registry fixture (the batch must not
    // grow with the corpus, or the probe measures work growth)
    val q = docs.where(col("doc_id") % 41 === 0 && col("doc_id") < 5000)
      .select(col("doc_id").as("q_id"),
        slice(Dedup.tokens(col("text")), 1, 5).as("q_terms"))
      .where(size(col("q_terms")) > 0)

    def time(tag: String)(body: => Unit): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        body
        println(f"BM25PROBE $tag run$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("tokenize-scan   ")(noop(
      docs.select(col("doc_id"), Dedup.tokens(col("text")).as("tk"))))
    time("explode-count   ")(noop(
      docs.select(explode(Dedup.tokens(col("text"))).as("t"))))
    time("stats-1row      ")(noop(
      docs.select(Dedup.tokens(col("text")).as("tk"))
        .agg(count(lit(1)).as("n"), avg(size(col("tk"))).as("avgdl"))))
    val qt = q.select(col("q_id"),
      explode(array_distinct(col("q_terms"))).as("term")).distinct()
    time("cand-tf-agg     ")(noop(
      docs.select(col("doc_id").as("id"),
          Dedup.tokens(col("text")).as("tk"))
        .select(col("id"), size(col("tk")).cast("long").as("dl"),
          explode(col("tk")).as("term"))
        .join(broadcast(qt.select("term").distinct()), "term")
        .groupBy("term", "id", "dl").agg(count(lit(1)).as("tf"))))
    time("full-bm25       ")(noop(
      Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 10)))
    val idxPath = s"/tmp/graft_probe_search_index"
    time("index-build     ")(
      Retrieval.writeSearchIndex(docs, "doc_id", "text", idxPath))
    time("indexed-query   ")(noop(
      Retrieval.bm25TopKIndexed(spark, idxPath, q, k = 10)))
    spark.stop()
  }
}
