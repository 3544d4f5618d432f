package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.functions.TextFunctions

/** Greedy top-k near-duplicate-suppressed text selection.
  *
  * Reference semantics (`/root/reference/etl/reviews_jsonl.py:316-325,355-357`):
  * consider candidate texts longest-first; keep a text only if its
  * token_set_ratio against every already-kept text is below `simThreshold`;
  * stop at k. Order-sensitive, so the buffer is sorted deterministically
  * (length desc, then lexicographic asc) before the greedy pass — SURVEY
  * §7.4.3: `collect_list` order is nondeterministic, sort inside.
  *
  * Groups are tiny (texts per place), so the O(k * n) pairwise pass is
  * per-group negligible; the aggregator is partial-aggregation friendly
  * (reduce keeps at most `maxBuffer` candidates per partition).
  *
  * `maxBuffer` is the explicit memory/exactness contract: the buffer keeps
  * the global top-`maxBuffer` candidates by the greedy's own visiting order
  * (length desc, then lexicographic), so the result is IDENTICAL to the
  * reference's scan-everything greedy whenever the group has at most
  * `maxBuffer` non-empty texts. Size it at or above the worst-case group
  * (default 4096 ≫ any reviews-per-place group); an earlier silent cap of 64
  * could drop a keepable text when the longest 64 were mutual near-dups.
  * Eagerly pruning inside reduce() instead would be unsound — a newly
  * arrived longer text can displace a kept text and resurrect texts it had
  * pruned — so bounding memory any tighter than this requires accepting
  * approximation, which we refuse to do silently (SURVEY §7.4.5).
  */
class TopKDistinct(k: Int, simThreshold: Double, maxLen: Int = 1200,
                   maxBuffer: Int = 4096)
    extends Aggregator[String, List[String], Seq[String]] {

  require(maxBuffer >= k,
    s"maxBuffer ($maxBuffer) must be >= k ($k): the greedy can keep up to k texts")

  override def zero: List[String] = Nil

  private def trimmed(s: String): String =
    if (s == null) "" else if (s.length > maxLen) s.substring(0, maxLen) else s

  override def reduce(buf: List[String], text: String): List[String] = {
    val t = trimmed(text)
    if (t.isEmpty) buf
    else (t :: buf).sortBy(s => (-s.length, s)).take(maxBuffer)
  }

  override def merge(a: List[String], b: List[String]): List[String] =
    (a ++ b).sortBy(s => (-s.length, s)).take(maxBuffer)

  override def finish(buf: List[String]): Seq[String] = {
    val sorted = buf.sortBy(s => (-s.length, s))
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = sorted.iterator
    while (it.hasNext && kept.size < k) {
      val cand = it.next()
      if (kept.forall(prev => TextFunctions.tokenSetRatio(cand, prev) < simThreshold))
        kept += cand
    }
    kept.toSeq
  }

  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object TopKDistinct {
  import org.apache.spark.sql.TypedColumn

  /** Typed column usable in ds.groupByKey(...).agg(...). `maxBuffer` must be
    * sized >= the largest group for exact reference-greedy parity. */
  def topK(k: Int, simThreshold: Double, maxLen: Int = 1200,
           maxBuffer: Int = 4096): TypedColumn[String, Seq[String]] =
    new TopKDistinct(k, simThreshold, maxLen, maxBuffer).toColumn
}
