package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

case class Emb(vec_id: Long, embedding: Seq[Float])

class EmbedDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  // two tight directions (near-dups across them never) plus an outlier;
  // 8-dim is plenty for SRP at 8 planes
  private def v(base: Seq[Float], eps: Float): Seq[Float] =
    base.zipWithIndex.map { case (x, i) => if (i == 0) x + eps else x }
  private val dirA = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val dirB = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
  private val indexed = Seq(
    Emb(1, dirA), Emb(2, dirB), Emb(3, v(dirA, 0.01f)))
  private val batch1 = Seq(
    Emb(10, v(dirA, 0.02f)), // near 1 and 3
    Emb(11, Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)))
  private val batch2 = Seq(
    Emb(20, v(dirA, 0.03f)), // near 1, 3, 10
    Emb(21, Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))) // dup of 11

  test("foreachBatch embedding ingest equals the batch-sequenced fold; " +
    "earlier stream batches surface as vs_index for later ones") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("embed_stream")
      .toString
    val tbl = "embed_stream_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeEmbedIndex(
      Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
      tbl, s"$dir/index")

    val mem = MemoryStream[Emb]
    val q = EmbedDedupStream.run(mem.toDF(), "vec_id", "embedding", tbl,
      s"$dir/out", s"$dir/ckpt", threshold = 0.9)
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/out")
      .select("a_id", "b_id", "kind", "cosine", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().toSet

    val fold = EmbedDedupStream.ingestFold(
        Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
        Seq(batch1.toDF(), batch2.toDF()), "vec_id", "embedding",
        threshold = 0.9)
      .select("a_id", "b_id", "kind", "cosine", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().toSet
    assert(got == fold, s"stream $got vs fold $fold")

    // semantic pins: 20 pairs with 10 (ingested in batch 1) as vs_index
    // in batch 2; 21 duplicates 11 across batches; the standing index
    // surfaces 1 ~ 10
    assert(got.exists { case (a, b, k, _, bid) =>
      a == 10 && b == 20 && k == "vs_index" && bid == 1 }, got.toString)
    assert(got.exists { case (a, b, k, c, bid) =>
      a == 11 && b == 21 && k == "vs_index" && c == 1.0 && bid == 1 },
      got.toString)
    assert(got.exists { case (a, b, k, _, _) =>
      a == 1 && b == 10 && k == "vs_index" }, got.toString)
    // directions never cross-pair
    assert(!got.exists { case (a, b, _, _, _) =>
      Set(a, b) == Set(2L, 10L) || Set(a, b) == Set(1L, 11L) })
    // the streaming run grew the standing index: 3 + 4 ids
    assert(spark.table(tbl).select("id").distinct().count() == 7)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("a replayed micro-batch is idempotent: output and index unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("embed_replay")
      .toString
    val tbl = "embed_replay_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeEmbedIndex(
      Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
      tbl, s"$dir/index")
    def ingest(): Unit = IncrementalIngest.ingestBatch(batch1.toDF(),
      Dedup.embedLshIndex(_, "vec_id", "embedding"),
      Dedup.incrementalEmbedLshBuckets(_, _, 0.9),
      tbl, s"$dir/out", batchId = 0L)
    ingest()
    val out1 = spark.read.parquet(s"$dir/out")
      .select("a_id", "b_id", "kind", "cosine", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().sorted.toSeq
    val idx1 = spark.table(tbl).count()
    assert(out1.nonEmpty) // 10 pairs with the standing 1 and 3
    ingest() // the crash-before-checkpoint replay
    val out2 = spark.read.parquet(s"$dir/out")
      .select("a_id", "b_id", "kind", "cosine", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().sorted.toSeq
    assert(out2 == out1, s"replay changed output: $out2 vs $out1")
    assert(spark.table(tbl).count() == idx1, "replay grew the index")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("a re-ingested id is immutable: no self-pair against its own " +
    "standing copy, and fold matches the streaming path") {
    val dir = java.nio.file.Files.createTempDirectory("embed_reingest")
      .toString
    val tbl = "embed_reingest_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeEmbedIndex(
      Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
      tbl, s"$dir/index")
    // batch 2 re-ingests id 10 (already ingested by batch 1)
    val b2 = Seq(Emb(10, v(dirA, 0.02f)), Emb(20, v(dirA, 0.03f)))
    def ingest(b: Seq[Emb], id: Long): Unit =
      IncrementalIngest.ingestBatch(b.toDF(),
        Dedup.embedLshIndex(_, "vec_id", "embedding"),
        Dedup.incrementalEmbedLshBuckets(_, _, 0.9),
        tbl, s"$dir/out", batchId = id)
    ingest(batch1, 0L)
    ingest(b2, 1L)
    val got = spark.read.parquet(s"$dir/out")
      .select("a_id", "b_id", "kind", "cosine", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().toSet
    val fold = EmbedDedupStream.ingestFold(
        Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
        Seq(batch1.toDF(), b2.toDF()), "vec_id", "embedding",
        threshold = 0.9)
      .select("a_id", "b_id", "kind", "cosine", "batch_id")
      .as[(Long, Long, String, Double, Long)].collect().toSet
    assert(got == fold, s"stream $got vs fold $fold")
    // the re-ingested 10 never pairs against its own standing copy
    assert(!got.exists { case (a, b, _, _, _) => a == 10 && b == 10 })
    // ...and since 10 rode along IN batch 2, its pair with the new 20
    // is within_batch (the standing copy is masked for this batch),
    // while 10 still pairs vs_index against standing ids NOT in the
    // batch
    assert(got.exists { case (a, b, k, _, bid) =>
      a == 10 && b == 20 && k == "within_batch" && bid == 1 },
      got.toString)
    assert(got.exists { case (a, b, k, _, bid) =>
      a == 1 && b == 10 && k == "vs_index" && bid == 1 }, got.toString)
    // and the index holds ONE copy of id 10
    assert(spark.table(tbl).where(col("id") === 10)
      .select("table").distinct().count() == 4) // 4 hash tables, once each
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("ingestFold of zero batches yields an empty pair frame, not a " +
    "crash") {
    val idx = Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding")
    val out = EmbedDedupStream.ingestFold(idx, Seq.empty, "vec_id",
      "embedding")
    assert(out.columns.toSeq ==
      Seq("a_id", "b_id", "kind", "cosine", "batch_id"))
    assert(out.count() == 0)
  }

  test("FLAG mode: micro-batch ingest releases the collapse operator's " +
    "internal pins — zero persistent-RDD growth across batches") {
    val dir = java.nio.file.Files.createTempDirectory("embed_pins")
      .toString
    val tbl = "embed_pins_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeEmbedIndex(
      Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
      tbl, s"$dir/index")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    for (i <- 0 until 3)
      IncrementalIngest.ingestBatchCollapse(
        Seq(Emb(100L + i, v(dirA, 0.02f + i * 0.001f))).toDF(), "vec_id",
        (idx, b) => Dedup.embedDedupCollapse(idx, b, "vec_id",
          "embedding", 0.9, 8, 4),
        tbl, s"$dir/out", i.toLong)
    assert(sc.getPersistentRDDs.size == before,
      s"collapse batches leaked pins: $before -> ${sc.getPersistentRDDs.size}")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("FLAG mode: empty and zero-norm vectors route to the uncollapsible " +
    "branch — each is its own rep and neither collapses nor drops") {
    val idx = Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding")
    // two identical EMPTY vectors + two identical zero vectors: under
    // the documented contract none of them collapse (cosine guarded to
    // 0), so all four keep and each is its own rep with n_rep = 1
    val batch = Seq(Emb(30, Seq.empty[Float]), Emb(31, Seq.empty[Float]),
      Emb(32, Seq.fill(8)(0f)), Emb(33, Seq.fill(8)(0f))).toDF()
    val (flags, _) = Dedup.embedDedupCollapse(idx, batch, "vec_id",
      "embedding", threshold = 0.9)
    val got = flags.select("id", "rep_id", "n_rep", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == Set((30L, 30L, 1L, 1), (31L, 31L, 1L, 1),
      (32L, 32L, 1L, 1), (33L, 33L, 1L, 1)), got.toString)
  }

  test("FLAG mode: ingestFoldCollapse of zero batches yields an empty " +
    "flags frame (with a non-'id' id column), not a crash") {
    val idx = Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding")
    val out = EmbedDedupStream.ingestFoldCollapse(idx, Seq.empty,
      "vec_id", "embedding")
    assert(out.columns.toSeq ==
      Seq("id", "rep_id", "n_rep", "keep", "batch_id"))
    assert(out.count() == 0)
  }

  test("FLAG mode: streaming collapse ingest equals the fold; exact-dup " +
    "groups collapse to one rep, reps flag against index and earlier " +
    "batches, only reps join the index") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("embed_collapse")
      .toString
    val tbl = "embed_collapse_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Dedup.writeEmbedIndex(
      Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
      tbl, s"$dir/index")
    // batch 1: a 3-copy exact-dup group near dirA (30 collapses 31, 32;
    // rep 30 then drops vs the standing 1/3), plus a fresh direction;
    // batch 2: an exact copy of batch 1's kept rep (drops vs_index
    // through the rep's bucket rows) and a survivor
    val c = Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)
    val cb1 = Seq(Emb(30, v(dirA, 0.02f)), Emb(31, v(dirA, 0.02f)),
      Emb(32, v(dirA, 0.02f)), Emb(33, c))
    val cb2 = Seq(Emb(40, c), // identical to 33 -> drops vs_index
      Emb(41, Seq(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)))
    val mem = MemoryStream[Emb]
    val q = EmbedDedupStream.runCollapse(mem.toDF(), "vec_id",
      "embedding", tbl, s"$dir/out", s"$dir/ckpt", threshold = 0.9)
    try {
      mem.addData(cb1: _*); q.processAllAvailable()
      mem.addData(cb2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .select("id", "rep_id", "n_rep", "keep", "batch_id")
      .as[(Long, Long, Long, Int, Long)].collect().toSet
    val fold = EmbedDedupStream.ingestFoldCollapse(
        Dedup.embedLshIndex(indexed.toDF(), "vec_id", "embedding"),
        Seq(cb1.toDF(), cb2.toDF()), "vec_id", "embedding",
        threshold = 0.9)
      .select("id", "rep_id", "n_rep", "keep", "batch_id")
      .as[(Long, Long, Long, Int, Long)].collect().toSet
    assert(got == fold, s"stream $got vs fold $fold")
    // the dup group collapsed onto 30; 30 itself drops against the
    // standing near-dups (1, 3); 33 survives batch 1
    assert(got((31L, 30L, 3L, 0, 0L)) && got((32L, 30L, 3L, 0, 0L)),
      got.toString)
    assert(got((30L, 30L, 3L, 0, 0L)), got.toString)
    assert(got((33L, 33L, 1L, 1, 0L)), got.toString)
    // 40 duplicates the KEPT 33 across batches -> vs_index drop; 41 new
    assert(got((40L, 40L, 1L, 0, 1L)), got.toString)
    assert(got((41L, 41L, 1L, 1, 1L)), got.toString)
    // index grew by REPS only: 3 standing + {30, 33} + {40, 41}
    assert(spark.table(tbl).select("id").distinct().count() == 7,
      spark.table(tbl).select("id").distinct().collect().mkString(","))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
