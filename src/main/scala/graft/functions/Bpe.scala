package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Byte-level BPE tokenizer (the public GPT-2 scheme: Sennrich et al. 2016
  * byte-pair encoding applied per pre-tokenized word, Radford et al. 2019
  * byte-level alphabet). The reference repo has no tokenizer — this is part
  * of the training-data-pipeline extension surface: sequence packing and
  * mixture sampling budget by REAL token counts, not proxy word counts.
  *
  * The merges table is a COMMITTED fixture (`graft/bpe_merges.txt`, one
  * `a<TAB>b` pair per line in rank order) trained deterministically by
  * [[graft.tools.BpeTrain]] on the sf0.001 documents corpus. It ships as a
  * classpath resource, loads once per JVM, and is captured by the UDF
  * closure — the executor-side equivalent of a broadcast dict, with no
  * per-row driver traffic.
  *
  * Encoding contract (mirrored EXACTLY by the DuckDB oracle):
  *  - pre-tokenize on whitespace runs (`\s+`), drop empties — a documented
  *    simplification of GPT-2's contraction-aware regex;
  *  - per word, start from single characters (the corpus is ASCII, so
  *    characters ARE bytes; non-ASCII input would first map through the
  *    UTF-8 byte alphabet);
  *  - repeatedly find the lowest-rank adjacent pair present and merge its
  *    occurrences left-to-right until no pair is in the table.
  *
  * The oracle replays the same loop as a recursive CTE that merges ONE
  * leftmost occurrence per step. The two are equivalent for any
  * TRAINING-CONSISTENT table — one where every pair involving a merged
  * token ranks later than the merge that created it, which BPE training
  * guarantees by construction ([[graft.tools.BpeTrain]]) and `BpeSpec`
  * re-asserts against the committed fixture: while occurrences of the
  * min-rank pair remain, no lower-rank pair can appear, so merge order
  * within the pair cannot change the final tokens.
  *
  * Scale shape: the kernel is a pure per-row JVM function (mapPartitions
  * batch semantics via codegen'd UDF call sites); a per-JVM word cache
  * exploits the Zipfian word distribution (a 100 TB corpus has billions of
  * word OCCURRENCES but a bounded distinct vocabulary per executor
  * lifetime). The cache is capacity-bounded and eviction never changes
  * results — it is a pure memo.
  */
object Bpe {

  final val Sep = '\u001f'

  /** The committed merges fixture, rank = line index. */
  lazy val merges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource graft/bpe_merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"malformed merge line: $line")
      (line.substring(0, i), line.substring(i + 1))
    }.toIndexedSeq
    finally src.close()
  }

  /** pair-key -> rank; the broadcast-dict equivalent (loaded once/JVM). */
  private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      m.put(a + Sep + b, Integer.valueOf(r))
    }
    m
  }

  /** Encode one word: GPT-2 `bpe()` loop — find the min-rank adjacent
    * pair, merge its occurrences left-to-right (a merge consumes both
    * symbols; the scan continues after the merged token), repeat. */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    while (syms.length > 1) {
      // lowest-rank adjacent pair present
      var best = -1
      var bestRank = Int.MaxValue
      i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); best = i
        }
        i += 1
      }
      if (best < 0) return syms
      val a = syms(best); val b = syms(best + 1)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
    }
    syms
  }

  private val wsRe = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace pre-tokenization (mirrors the oracle's `\s+` split). */
  def words(text: String): Array[String] =
    if (text == null) Array.empty
    else wsRe.split(text).filter(_.nonEmpty)

  // Pure memo over the Zipfian word distribution; bounded so a
  // pathological open vocabulary cannot grow it without limit.
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val CacheCap = 1 << 20

  private def tokenCountOf(w: String): Int = {
    val hit = countCache.get(w)
    if (hit != null) return hit.intValue()
    val n = encodeWord(w).length
    if (countCache.size < CacheCap) countCache.put(w, Integer.valueOf(n))
    n
  }

  /** (n_words, n_tokens) of a text under the committed merges. */
  def tokenStatsKernel(text: String): (Long, Long) = {
    val ws = words(text)
    var tok = 0L
    var i = 0
    while (i < ws.length) { tok += tokenCountOf(ws(i)); i += 1 }
    (ws.length.toLong, tok)
  }

  private val tokenStatsUdf = udf((t: String) => tokenStatsKernel(t))

  /** Struct column `(_1 n_words, _2 n_tokens)`. */
  def tokenStats(c: Column): Column = tokenStatsUdf(c)

  /** BPE token count of a text column. */
  def tokenCount(c: Column): Column = tokenStats(c).getField("_2")

  /** DuckDB SQL mirroring the full encode as a recursive CTE over the
    * DISTINCT words of `rel`.text: per word the state is the token list
    * joined by unit separators (wrapped both ends, so a pair pattern
    * `US a US b US` can never match inside a token); each step merges the
    * LEFTMOST occurrence of the min-rank pair present; a word is final
    * when no pair is in the table. Yields `bpe(w, n_tok)` plus
    * `bpe_words(doc_id, w)` (one row per word OCCURRENCE) for callers to
    * aggregate. Equivalence with the all-occurrence kernel pass is the
    * training-consistency argument in the object doc, re-asserted by
    * BpeSpec. */
  def oracleCtesSql(rel: String): String = {
    val values = merges.zipWithIndex
      .map { case ((a, b), r) => s"('$a','$b',$r)" }.mkString(", ")
    s"""mg(a, b, rnk) AS (SELECT * FROM (VALUES $values) v(a, b, rnk)),
       |bpe_words AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
       |    x -> len(x) > 0)) AS w
       |  FROM $rel WHERE text IS NOT NULL),
       |bpe_st(w, s) AS (
       |  SELECT w, chr(31) ||
       |    array_to_string(string_split(w, ''), chr(31)) || chr(31)
       |  FROM (SELECT DISTINCT w FROM bpe_words)
       |  UNION ALL
       |  SELECT w,
       |    substr(s, 1, strpos(s, pat) - 1) || chr(31) ||
       |    replace(substr(pat, 2, length(pat) - 2), chr(31), '') || chr(31) ||
       |    substr(s, strpos(s, pat) + length(pat))
       |  FROM (
       |    SELECT w, s,
       |      (SELECT chr(31) || m.a || chr(31) || m.b || chr(31)
       |       FROM mg m
       |       WHERE strpos(s, chr(31) || m.a || chr(31) || m.b || chr(31)) > 0
       |       ORDER BY m.rnk LIMIT 1) AS pat
       |    FROM bpe_st) x
       |  WHERE pat IS NOT NULL),
       |bpe(w, n_tok) AS (
       |  SELECT w, length(s) - length(replace(s, chr(31), '')) - 1
       |  FROM bpe_st t
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM mg m
       |    WHERE strpos(t.s, chr(31) || m.a || chr(31) || m.b || chr(31)) > 0))"""
      .stripMargin
  }
}
