package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Similarity

class KnnGraphStreamSpec extends SparkTestBase {
  import spark.implicits._

  // the clustered fixture of the knnDescent specs: three tight
  // clusters of 8 in 8-d, exact kNN intra-cluster by construction;
  // corpus = i < 6 of each cluster, the rest arrives in two batches
  private val base = Seq(
    Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
    Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f),
    Seq(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f))
  private val allRows = for {
    c <- 0 until 3; i <- 0 until 8
  } yield {
    val eps = 0.01f * (i + 1)
    Emb((c * 8 + i).toLong, base(c).zipWithIndex.map { case (x, d) =>
      if (d == (c + 1) % 8) x + eps else x })
  }
  private val corpusRows = allRows.filter(_.vec_id % 8 < 6)
  private val batch1 = allRows.filter(_.vec_id % 8 == 6)
  private val batch2 = allRows.filter(_.vec_id % 8 == 7)

  private def standing() = {
    val corpus = corpusRows.toDF()
    (Similarity.knnDescent(corpus, "vec_id", "embedding", k = 3,
      rounds = 2),
      Similarity.srpBucketed(corpus, "vec_id", "embedding",
        numPlanes = 8, tables = 4))
  }

  test("foreachBatch kNN ingest equals the batch-sequenced fold, and " +
    "the standing tables end at the folded state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("knn_stream")
      .toString
    val (g0, idx0) = standing()
    val (gTbl, iTbl) = ("knn_stream_spec_graph", "knn_stream_spec_index")
    spark.sql(s"DROP TABLE IF EXISTS $gTbl")
    spark.sql(s"DROP TABLE IF EXISTS $iTbl")
    g0.write.option("path", s"$dir/graph").saveAsTable(gTbl)
    idx0.write.option("path", s"$dir/index").saveAsTable(iTbl)

    val mem = MemoryStream[Emb]
    val q = KnnGraphStream.run(mem.toDF(), "vec_id", "embedding", gTbl,
      iTbl, s"$dir/out", s"$dir/ckpt", k = 3, rounds = 1)
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/out")
      .select("id", "nbr_id", "cosine", "rank", "kind", "batch_id")
      .as[(Long, Long, Double, Int, String, Long)].collect().toSet
    val fold = KnnGraphStream.ingestFold(g0, idx0,
        Seq(batch1.toDF(), batch2.toDF()), "vec_id", "embedding",
        k = 3, rounds = 1)
      .select("id", "nbr_id", "cosine", "rank", "kind", "batch_id")
      .as[(Long, Long, Double, Int, String, Long)].collect().toSet
    assert(got == fold, s"stream ${got -- fold} vs fold ${fold -- got}")

    // batch 2's new node pairs with batch 1's (ingested earlier in the
    // same stream): 23 is 22's nearest cluster mate
    assert(got.exists { case (id, nbr, _, _, k, bid) =>
      id == 23 && nbr == 22 && k == "new" && bid == 1 }, got.toString)
    // the standing graph table ended at the folded state: every id
    // holds exactly k rows, and new ids are present
    val gEnd = spark.table(gTbl)
    assert(gEnd.select("id").distinct().count() == 24)
    assert(gEnd.groupBy("id").count().select(max("count"))
      .as[Long].head() == 3)
    // the index holds one bucket set per ingested id
    assert(spark.table(iTbl).select("id").distinct().count() == 24)
    spark.sql(s"DROP TABLE IF EXISTS $gTbl")
    spark.sql(s"DROP TABLE IF EXISTS $iTbl")
  }

  test("a replayed kNN micro-batch is idempotent: output, graph table " +
    "and index table all unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("knn_replay")
      .toString
    val (g0, idx0) = standing()
    val (gTbl, iTbl) = ("knn_replay_spec_graph", "knn_replay_spec_index")
    spark.sql(s"DROP TABLE IF EXISTS $gTbl")
    spark.sql(s"DROP TABLE IF EXISTS $iTbl")
    g0.write.option("path", s"$dir/graph").saveAsTable(gTbl)
    idx0.write.option("path", s"$dir/index").saveAsTable(iTbl)
    def ingest(): Unit = KnnGraphStream.ingestBatch(batch1.toDF(),
      "vec_id", "embedding", gTbl, iTbl, s"$dir/out", batchId = 0L,
      k = 3, rounds = 1, numPlanes = 8, tables = 4)
    def state() = (
      spark.read.parquet(s"$dir/out")
        .select("id", "nbr_id", "cosine", "rank", "kind", "batch_id")
        .as[(Long, Long, Double, Int, String, Long)].collect().sorted.toSeq,
      spark.table(gTbl).select("id", "nbr_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().sorted.toSeq,
      spark.table(iTbl).count())
    ingest()
    val s1 = state()
    assert(s1._1.nonEmpty && s1._3 > 0)
    ingest() // the crash-before-checkpoint replay
    val s2 = state()
    assert(s2._1 == s1._1, "replay changed the delta output")
    assert(s2._2 == s1._2, "replay changed the standing graph")
    assert(s2._3 == s1._3, "replay grew the bucket index")
    spark.sql(s"DROP TABLE IF EXISTS $gTbl")
    spark.sql(s"DROP TABLE IF EXISTS $iTbl")
  }

  test("ingestFold of zero batches yields an empty delta frame with " +
    "the contract columns, not a crash") {
    val (g0, idx0) = standing()
    val out = KnnGraphStream.ingestFold(g0, idx0, Seq.empty, "vec_id",
      "embedding", k = 3, rounds = 1)
    assert(out.columns.toSeq ==
      Seq("id", "nbr_id", "cosine", "rank", "kind", "batch_id"))
    assert(out.count() == 0)
  }
}
