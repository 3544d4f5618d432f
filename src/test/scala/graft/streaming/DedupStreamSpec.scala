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

  test("FLAG mode: streaming collapse ingest equals the fold; " +
    "exact-duplicate texts collapse to one rep, reps flag against the " +
    "index and earlier batches, only reps join the index") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dedup_collapse")
      .toString
    val tbl = "dedup_collapse_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeMinHashIndex(
      Dedup.minHashIndex(indexed.toDF(), "doc_id", "text"),
      tbl, s"$dir/index")
    // batch 1: a 3-copy exact-dup group whose text matches standing doc
    // 1 (rep 30 collapses 31/32, then drops vs_index), plus a fresh doc
    // 33; batch 2: an exact copy of the KEPT 33 (drops vs_index through
    // the rep's band rows) and a fresh survivor
    val fresh = "entirely novel wording that matches no standing entry"
    val cb1 = Seq(
      Doc(30, "the quick brown fox jumps over the lazy dog tonight"),
      Doc(31, "the quick brown fox jumps over the lazy dog tonight"),
      Doc(32, "the quick brown fox jumps over the lazy dog tonight"),
      Doc(33, fresh))
    val cb2 = Seq(Doc(40, fresh),
      Doc(41, "yet another unrelated sentence with disjoint vocabulary"))
    val mem = MemoryStream[Doc]
    val q = DedupStream.runCollapse(mem.toDF(), "doc_id", "text", tbl,
      s"$dir/out", s"$dir/ckpt", simThreshold = 0.25)
    try {
      mem.addData(cb1: _*); q.processAllAvailable()
      mem.addData(cb2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .select("id", "rep_id", "n_rep", "keep", "batch_id")
      .as[(Long, Long, Long, Int, Long)].collect().toSet
    val fold = DedupStream.ingestFoldCollapse(
        Dedup.minHashIndex(indexed.toDF(), "doc_id", "text"),
        Seq(cb1.toDF(), cb2.toDF()), "doc_id", "text",
        simThreshold = 0.25)
      .select("id", "rep_id", "n_rep", "keep", "batch_id")
      .as[(Long, Long, Long, Int, Long)].collect().toSet
    assert(got == fold, s"stream $got vs fold $fold")
    assert(got((31L, 30L, 3L, 0, 0L)) && got((32L, 30L, 3L, 0, 0L)),
      got.toString)
    assert(got((30L, 30L, 3L, 0, 0L)), got.toString) // dup of standing 1
    assert(got((33L, 33L, 1L, 1, 0L)), got.toString)
    assert(got((40L, 40L, 1L, 0, 1L)), got.toString) // dup of kept 33
    assert(got((41L, 41L, 1L, 1, 1L)), got.toString)
    // index grew by REPS only: 3 standing + {30, 33} + {40, 41}
    assert(spark.table(tbl).select("id").distinct().count() == 7)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("FLAG mode: ingestFoldCollapse of zero batches yields an empty " +
    "flags frame (with a non-'id' id column), not a crash") {
    val idx = Dedup.minHashIndex(indexed.toDF(), "doc_id", "text")
    val out = DedupStream.ingestFoldCollapse(idx, Seq.empty,
      "doc_id", "text")
    assert(out.columns.toSeq ==
      Seq("id", "rep_id", "n_rep", "keep", "batch_id"))
    assert(out.count() == 0)
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
