package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich et al. 2016) — the engine already
  * APPLIES a committed GPT-2 merge list (`functions/Bpe.scala`); this
  * learns the merge list from the corpus itself, the remaining half of
  * the tokenizer story for a training-data pipeline. (The single-JVM
  * `tools/BpeTrain.scala` that generated the committed fixture is the
  * same algorithm as an offline local loop; THIS is the distributed
  * operator — the corpus never leaves the cluster.)
  *
  * The classic algorithm operates on the word-frequency dictionary, not
  * the corpus: tokenize once, count words, represent each distinct word
  * as a symbol sequence (initially characters), then repeatedly (1) count
  * adjacent symbol pairs weighted by word frequency, (2) take the most
  * frequent pair (count desc, then lexicographic — fully deterministic),
  * (3) merge its occurrences greedily left-to-right in every word.
  *
  * Scale shape: the corpus is touched exactly ONCE (the word-count
  * partial-agg shuffle); every training round runs over the vocab-sized
  * dictionary (orders of magnitude below corpus size) and ships exactly
  * one (pair, count) row to the driver — the k-means model-sized-driver-
  * traffic precedent. Rounds persist the dictionary and unpersist the
  * previous round (the iterative-frontier discipline), so round r never
  * replays rounds 1..r-1. A production 30k-merge run is 30k vocab-sized
  * jobs — seconds each; the corpus is never rescanned.
  *
  * Greedy merge semantics (pinned in BpeTrainerSpec and replayed by the
  * SQL oracle): scan left to right, merge at position i iff (s_i, s_{i+1})
  * is the pair and position i-1 did not just merge. Overlapping
  * occurrences exist only when lhs == rhs, where the scan takes every
  * OTHER position of each maximal run — the oracle expresses the same
  * rule as run-start parity (merged iff (i - runStart) is even), provably
  * the same set.
  */
object BpeTrainer {

  /** Greedy left-to-right merge of (lhs, rhs) in one symbol sequence —
    * the sequential kernel (legitimately a fold: each merge decision
    * depends on whether the previous position merged; vocab-sized input,
    * so the UDF-where-builtin rule's model-scope exception applies). */
  def mergeKernel(syms: Seq[String], lhs: String, rhs: String): Seq[String] = {
    if (syms == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
        out += lhs + rhs
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  private val mergeUdf = udf(mergeKernel _)

  /** Adjacent symbol pairs of a materialized array column, as structs —
    * zip_with over two slices (no per-element indexing of an
    * unmaterialized array; the docBigrams shape). */
  private def adjacentPairs(sy: Column): Column = {
    val n1 = greatest(size(sy) - 1, lit(0))
    zip_with(slice(sy, lit(1), n1), slice(sy, lit(2), n1),
      (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** Learn `nMerges` BPE merges from the token stream of `docs`.
    * Returns the merge table (rank, lhs, rhs, pair_count) — model-sized.
    * Ties break (count desc, lhs asc, rhs asc); empty pair space stops
    * early. (No doc-id parameter: training sees only the word
    * multiset.) */
  def bpeTrain(docs: DataFrame, textCol: String,
               nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // chars via substring transform: tokens are [a-z0-9]+ so one char ==
    // one byte == one codepoint in both engines
    var cur = docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("sy"))
      .persist()
    cur.count()

    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val best = cur
        .select(col("freq"), explode(adjacentPairs(col("sy"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val row = best.head
        val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((r, a, b, cnt))
        val next = cur
          .select(col("freq"), mergeUdf(col("sy"), lit(a), lit(b)).as("sy"))
          .persist()
        next.count()
        cur.unpersist()
        cur = next
        r += 1
      }
    }
    cur.unpersist()
    merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("int").as("rank"), col("lhs"), col("rhs"),
        col("pair_count"))
  }

  /** Greedy application of an ORDERED merge list to one word —
    * [[mergeKernel]] folded over the ranks, the standard BPE encode. */
  def encodeKernel(word: String, lhs: Seq[String], rhs: Seq[String]): Int = {
    var syms: Seq[String] = word.map(_.toString)
    var r = 0
    while (r < lhs.length) {
      syms = mergeKernel(syms, lhs(r), rhs(r))
      r += 1
    }
    syms.length
  }

  /** Tokenize `docs` under a LEARNED merge table (the [[bpeTrain]]
    * output — closes the train→apply loop) and report the per-doc
    * subword count. The merge list is collected (model-sized — 30k
    * rows at production vocab) and CLOSED OVER by the kernel UDF, so it
    * ships once per executor in the task closure — a typedlit argument
    * would instead convert both arrays Catalyst→Scala once per token
    * row. One tokenize scan, one partial-agg shuffle. */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
                    merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("rank").select("lhs", "rhs")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val (lhs, rhs) = (ms.map(_._1).toSeq, ms.map(_._2).toSeq)
    val encodeUdf = udf((w: String) => encodeKernel(w, lhs, rhs))
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("w"))
      .select(col("doc_id"), encodeUdf(col("w")).as("n_sub"))
      .groupBy("doc_id")
      .agg(sum("n_sub").cast("long").as("n_subwords"),
        count(lit(1)).as("n_words"))
  }
}
