package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

case class Doc(doc_id: Long, text: String)

class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val indexed = Seq(
    Doc(1, "the quick brown fox jumps over the lazy dog tonight"),
    Doc(2, "a completely different sentence about spark physical plans"),
    Doc(3, "the quick brown fox jumps over the lazy dog at dawn"))
  private val batch1 = Seq(
    Doc(10, "the quick brown fox jumps over the lazy dog tonight"), // ~1
    Doc(11, "nothing like anything already present in the index"))
  private val batch2 = Seq(
    Doc(20, "the quick brown fox jumps over the lazy dog tonight"), // ~1,10
    Doc(21, "nothing like anything already present in the index")) // ~11

  test("foreachBatch streaming ingest equals the batch-sequenced fold; " +
    "earlier stream batches surface as vs_index for later ones") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream")
      .toString
    val tbl = "dedup_stream_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeMinHashIndex(
      Dedup.minHashIndex(indexed.toDF(), "doc_id", "text"),
      tbl, s"$dir/index")

    val mem = MemoryStream[Doc]
    val q = DedupStream.run(mem.toDF(), "doc_id", "text", tbl,
      s"$dir/out", s"$dir/ckpt", simThreshold = 0.25)
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/out")
      .select("a_id", "b_id", "kind", "sig_sim", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().toSet

    // the fold over a FRESH index frame (the streaming run appended the
    // stream signatures to the table, so rebuild the pre-stream index)
    val fold = DedupStream.ingestFold(
        Dedup.minHashIndex(indexed.toDF(), "doc_id", "text"),
        Seq(batch1.toDF(), batch2.toDF()), "doc_id", "text",
        simThreshold = 0.25)
      .select("a_id", "b_id", "kind", "sig_sim", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().toSet
    assert(got == fold, s"stream $got vs fold $fold")

    // semantic pin: 20 pairs with 10 (ingested in batch 1) as vs_index
    // in batch 2, and near-dups against the standing index surface too
    assert(got.exists { case (a, b, k, _, bid) =>
      a == 10 && b == 20 && k == "vs_index" && bid == 1 })
    assert(got.exists { case (a, b, k, _, _) => a == 1 && b == 10 &&
      k == "vs_index" })
    // the streaming run GREW the standing index: 3 indexed + 4 stream
    // docs x 8 bands
    assert(spark.table(tbl).select("id").distinct().count() == 7)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("within-batch dups are flagged in the arriving batch itself") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream2")
      .toString
    val tbl = "dedup_stream_spec_index2"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeMinHashIndex(
      Dedup.minHashIndex(indexed.toDF(), "doc_id", "text"),
      tbl, s"$dir/index")
    val mem = MemoryStream[Doc]
    val q = DedupStream.run(mem.toDF(), "doc_id", "text", tbl,
      s"$dir/out", s"$dir/ckpt", simThreshold = 0.25)
    try {
      mem.addData(Doc(30, "twin text arriving twice in one batch load"),
        Doc(31, "twin text arriving twice in one batch load"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .select("a_id", "b_id", "kind")
      .as[(Long, Long, String)].collect().toSet
    assert(got.contains((30L, 31L, "within_batch")))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
