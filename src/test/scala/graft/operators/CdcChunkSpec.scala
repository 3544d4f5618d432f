package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins content-defined chunking semantics: lossless partition of the
  * token stream, boundary rule, and the shift-robustness property that
  * motivates CDC over fixed-stride splitting. */
class CdcChunkSpec extends SparkTestBase {

  import spark.implicits._

  private def chunksOf(rows: (Long, String)*) =
    Dedup.cdcChunks(rows.toDF("doc_id", "text"), "doc_id", "text",
      avgLen = 4) // short chunks so small fixtures hit boundaries

  /** Tokens whose hash does / does not close a chunk at avgLen=4. */
  private def isBoundary(t: String): Boolean =
    Dedup.md5Hash32Kernel(t, 7) % 4 == 0
  private val boundaryTok =
    (0 to 1000).map(i => s"b$i").find(isBoundary).get
  private val plainToks =
    (0 to 1000).map(i => s"p$i").filterNot(isBoundary)

  test("chunks partition the token stream losslessly, in order") {
    val text = (plainToks.take(3) ++ Seq(boundaryTok) ++ plainToks.slice(3, 6)
      ++ Seq(boundaryTok) ++ plainToks.slice(6, 8)).mkString(" ")
    val got = chunksOf(1L -> text)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tokens")
      .as[(Long, Long)].collect().toSeq
    // boundary AFTER the boundary token: 3+1, 3+1, 2
    assert(got == Seq((0L, 4L), (1L, 4L), (2L, 2L)))
  }

  test("a trailing boundary token closes the last chunk, no empty tail") {
    val text = (plainToks.take(2) :+ boundaryTok).mkString(" ")
    val got = chunksOf(1L -> text).select("n_tokens").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("empty and boundary-free docs chunk to nothing / one chunk") {
    val got = chunksOf(1L -> "", 2L -> plainToks.take(5).mkString(" "))
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 5L)))
  }

  test("shift robustness: one insertion changes at most one chunk hash") {
    // 8 runs of 5 plain tokens separated by boundary tokens -> 8 chunks
    val runs = (0 until 8).map(r => plainToks.slice(r * 5, r * 5 + 5))
    val base = runs.map(_ :+ boundaryTok).flatten.dropRight(1)
    val edited = { // insert a non-boundary token inside run 4
      val at = base.indexOf(plainToks(4 * 5)) + 2
      base.take(at) ++ Seq(plainToks.last) ++ base.drop(at)
    }
    val hashes = Dedup.cdcChunks(
        Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
          .toDF("doc_id", "text"), "doc_id", "text", avgLen = 4)
      .select("doc_id", "chunk_hash").as[(Long, String)].collect()
    val a = hashes.filter(_._1 == 1L).map(_._2).toSet
    val b = hashes.filter(_._1 == 2L).map(_._2).toSet
    assert((a diff b).size <= 1, s"changed chunks: ${(a diff b).size}")
    assert((b diff a).size <= 2) // an insertion may split one chunk in two
  }

  test("cdcDuplicateChunks surfaces only cross-doc duplicates") {
    val shared = (plainToks.take(3) :+ boundaryTok).mkString(" ")
    val docs = Seq(
      1L -> s"$shared ${plainToks(10)}",
      2L -> s"$shared ${plainToks(11)}",
      3L -> plainToks.slice(20, 23).mkString(" "))
    val got = Dedup.cdcDuplicateChunks(docs.toDF("doc_id", "text"),
        "doc_id", "text", avgLen = 4)
      .select("n_docs", "n_occurrences", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L, 4L))) // the shared 4-token prefix chunk only
  }
}
