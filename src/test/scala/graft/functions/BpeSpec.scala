package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed BPE merges fixture and the oracle-equivalence
  * argument (no SparkSession needed — the kernel is pure JVM). */
class BpeSpec extends AnyFunSuite {

  test("committed fixture loads and is TRAINING-CONSISTENT: every merge " +
    "operand is a single char or the product of an EARLIER merge") {
    assert(Bpe.merges.nonEmpty)
    val available = scala.collection.mutable.Set.empty[String]
    Bpe.merges.foreach { case (a, b) =>
      for (t <- Seq(a, b))
        assert(t.length == 1 || available.contains(t),
          s"operand '$t' of merge ($a,$b) is neither a char nor a prior product")
      available += a + b
    }
    // ranks are unique pairs
    assert(Bpe.merges.distinct.size == Bpe.merges.size)
  }

  test("ground-truth fixture: pinned token sequences under the committed " +
    "merges (corpus words collapse; unseen words fall back to subwords)") {
    def enc(w: String) = Bpe.encodeWord(w).toSeq
    assert(enc("window") == Seq("window"))
    assert(enc("customer") == Seq("customer"))
    assert(enc("batch") == Seq("batch"))
    assert(enc("column") == Seq("column"))
    assert(enc("query") == Seq("query"))
    assert(enc("windows") == Seq("window", "s"))
    assert(enc("unseenword") ==
      Seq("u", "n", "s", "e", "e", "n", "w", "or", "d"))
    assert(enc("xyzzy") == Seq("x", "y", "z", "z", "y"))
    assert(enc("a") == Seq("a"))
    assert(enc("") == Seq.empty)
    // round-trip: concatenating tokens always restores the word
    for (w <- Seq("window", "windows", "unseenword", "xyzzy", "stream"))
      assert(enc(w).mkString == w)
  }

  test("tokenStatsKernel counts words and tokens over whitespace splits") {
    assert(Bpe.tokenStatsKernel("the fast key order sort") == (5L, 5L))
    // padded -> [p,a,d,d,e,d] (6), words -> [w,or,d,s] (4),
    // here -> [h,er,e] (3): 13 tokens under the committed table
    assert(Bpe.tokenStatsKernel("  padded\t words \n here  ") == (3L, 13L))
    assert(Bpe.tokenStatsKernel("") == (0L, 0L))
    assert(Bpe.tokenStatsKernel(null) == (0L, 0L))
  }

  /** The oracle's algorithm: merge ONE leftmost occurrence of the
    * min-rank pair per step (vs the kernel's all-occurrence pass). */
  private def oracleSim(word: String): Seq[String] = {
    val ranks = Bpe.merges.zipWithIndex
      .map { case ((a, b), r) => (a, b) -> r }.toMap
    var syms: Vector[String] = word.map(String.valueOf).toVector
    var go = true
    while (go && syms.length > 1) {
      val cands = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
      if (cands.isEmpty) go = false
      else {
        // min rank; leftmost occurrence OF THAT PAIR
        val bestRank = cands.map(_._1).min
        val i = cands.filter(_._1 == bestRank).map(_._2).min
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  test("kernel (all-occurrence pass) equals the oracle's one-leftmost-" +
    "occurrence recursion on corpus words and random strings — the " +
    "training-consistency equivalence the DuckDB oracle relies on") {
    val corpus = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream",
      "spark", "dup", "group", "query", "row", "data", "slow", "filter",
      "customer", "line", "value", "agg", "column", "big", "a", "vector")
    val rnd = new scala.util.Random(7)
    val randoms = (1 to 500).map { _ =>
      val len = 1 + rnd.nextInt(14)
      (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    // concatenated corpus words exercise shared-boundary chains
    val doubled = corpus.map(w => w + w) ++ corpus.map(w => w + "s" + w)
    for (w <- corpus ++ randoms ++ doubled)
      assert(Bpe.encodeWord(w).toSeq == oracleSim(w), s"diverged on '$w'")
  }
}
