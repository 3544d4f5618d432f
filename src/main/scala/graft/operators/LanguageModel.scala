package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language modeling for perplexity-based curation — the
  * CCNet/RedPajama stage this engine was missing: train a smoothed bigram
  * LM on a trusted reference slice, score EVERY document by per-token
  * negative log-likelihood, and gate/bucket on the score (low-perplexity
  * "head" docs read like the reference corpus; the high-perplexity "tail"
  * is noise, boilerplate, or another register).
  *
  * Model: interpolated Kneser-Ney (Kneser & Ney 1995; Chen & Goodman 1998)
  * with a fixed absolute discount D = 0.75 —
  *
  *   P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1)
  *            + D * N1+(w1,*) / c(w1) * Pcont(w2)          when c(w1) > 0
  *   P(w2|w1) = Pcont(w2)                                  when w1 unseen
  *   Pcont(w2) = (N1+(*,w2) + 1) / (Ntypes + V + 1)
  *
  * where N1+(w1,*) = distinct successors of w1, N1+(*,w2) = distinct
  * predecessors of w2, Ntypes = distinct training bigrams, and V = the
  * training vocabulary size. The +1/(+V+1) add-one over the continuation
  * distribution folds every out-of-vocabulary token into one smoothed
  * class, so the score is total (no zero probabilities) and the whole
  * model is a deterministic function of counts — replayable in SQL.
  *
  * Scale shape: the corpus is touched exactly twice (one tokenize scan
  * for training counts, one for scoring); everything else is keyed on
  * terms. Model frames are bigram-type- and vocab-sized — orders of
  * magnitude below corpus size — and join back to the scoring stream on
  * term keys (the documented vocabulary-skew shape: AQE-splittable, and
  * broadcastable outright when the model fits). The two corpus-level
  * scalars (Ntypes, V) travel as a broadcast 1-row frame, never through
  * the driver. Bigrams come from zip_with over two slices of the
  * materialized token array — no positional self-join, no per-element
  * indexing of an unmaterialized array (the SCALE.md HOF rule).
  */
object LanguageModel {

  val Discount = 0.75

  /** Interior bigrams of each document: (doc_id, w1, w2), one row per
    * adjacent token pair. Docs with fewer than 2 tokens emit nothing. */
  def docBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("tk"))
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    tk.select(col("doc_id"),
        explode(zip_with(
          slice(col("tk"), lit(1), n1), slice(col("tk"), lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** The KN count model from a TRAINING bigram stream: four frames.
    * `bc(w1, w2, bc)`, `cc(w1, cc, n1f)`, `cont(w2, n1r)`, and the 1-row
    * `scalars(ntypes, v)`. `vocab` is the training token stream (w1 and
    * the final w2 of every doc both count — V is defined over TOKENS). */
  def knModel(trainBigrams: DataFrame, trainVocabSize: DataFrame)
  : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val bc = trainBigrams.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val cc = bc.groupBy("w1")
      .agg(sum("bc").as("cc"), count(lit(1)).as("n1f"))
    val cont = bc.groupBy("w2").agg(count(lit(1)).as("n1r"))
    val scalars = bc.agg(count(lit(1)).as("ntypes"))
      .crossJoin(trainVocabSize)
    (bc, cc, cont, scalars)
  }

  /** Per-document mean negative log-likelihood (`logppl` — ln of the
    * perplexity) of every doc in `docs` under a KN bigram model trained
    * on the `trainFilter` slice of the same frame. Output:
    * (doc_id, logppl) — docs with < 2 tokens emit no row.
    *
    * The probability expression is written in one fixed operation order
    * (matching the SQL oracle term for term) so both engines run the
    * identical double arithmetic; the per-doc mean is rounded to 6
    * decimals (the ta_bigram_surprisal ln-parity precedent). */
  def knLogPerplexity(docs: DataFrame, idCol: String, textCol: String,
                      trainFilter: Column): DataFrame = {
    val train = docs.where(trainFilter)
    val vocab = train
      .select(explode(Dedup.tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val (bc, cc, cont, scalars) =
      knModel(docBigrams(train, idCol, textCol), vocab)

    val scored = docBigrams(docs, idCol, textCol)
      .join(bc, Seq("w1", "w2"), "left")
      .join(cc, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
    val pcont = (coalesce(col("n1r"), lit(0L)).cast("double") + 1.0) /
      (col("ntypes") + col("v") + 1).cast("double")
    val prob = when(col("cc").isNotNull,
      greatest(coalesce(col("bc"), lit(0L)).cast("double") - Discount, lit(0.0))
        / col("cc") +
        lit(Discount) * col("n1f") / col("cc") * pcont)
      .otherwise(pcont)
    scored.select(col("doc_id"), prob.as("prob"))
      .groupBy("doc_id")
      .agg((round(avg(-log(col("prob"))), 6) + 0.0).as("logppl"))
  }

  /** Interior trigrams of each document: (doc_id, w1, w2, w3). Docs
    * with fewer than 3 tokens emit nothing. */
  def docTrigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"),
      Dedup.tokens(col(textCol)).as("tk"))
    val n2 = greatest(size(col("tk")) - 2, lit(0))
    val inner = zip_with(
      slice(col("tk"), lit(1), n2), slice(col("tk"), lit(2), n2),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    tk.select(col("doc_id"),
        explode(zip_with(inner, slice(col("tk"), lit(3), n2),
          (p, c) => struct(p.getField("w1").as("w1"),
            p.getField("w2").as("w2"), c.as("w3")))).as("tg"))
      .select(col("doc_id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
  }

  /** Trigram interpolated Kneser-Ney (Chen & Goodman 1998's full
    * recursive form) — the highest order uses raw counts, the middle
    * order uses CONTINUATION counts c_KN(w2,w3) = N1+(·,w2,w3), and the
    * base is [[knLogPerplexity]]'s add-one continuation unigram, so the
    * model is again a pure deterministic function of count frames:
    *
    *   P3(w3|w1,w2) = max(c(w1w2w3)−D,0)/c(w1w2)
    *                + D·N1+(w1w2,·)/c(w1w2) · P2(w3|w2)   [ctx seen]
    *   P2(w3|w2)    = max(cKN(w2,w3)−D,0)/ΣcKN(w2,·)
    *                + D·N1+KN(w2,·)/ΣcKN(w2,·) · Pc(w3)   [mid seen]
    *   Pc(w3)       = (N1+(·,w3)+1) / (Ntypes₂ + V + 1)
    *
    * with each unseen level falling through to the next. Same scale
    * shape as the bigram model — two corpus scans, term-keyed
    * model-frame joins, one broadcast scalar row — with two extra
    * model frames (trigram contexts, mid-level continuation counts).
    * Output: (doc_id, logppl) over docs with ≥ 3 tokens. */
  def kn3LogPerplexity(docs: DataFrame, idCol: String, textCol: String,
                       trainFilter: Column): DataFrame = {
    val train = docs.where(trainFilter)
    val vocab = train
      .select(explode(Dedup.tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    // level-1 base: corpus bigram continuation counts (the knModel cont
    // frame) + the bigram-type count scalar
    val bg = docBigrams(train, idCol, textCol)
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val cont1 = bc.groupBy(col("w2").as("w3")).agg(count(lit(1)).as("n1r1"))
    val scalars = bc.agg(count(lit(1)).as("ntypes2")).crossJoin(vocab)
    // level-3 raw counts + contexts
    val tg = docTrigrams(train, idCol, textCol)
    val tc3 = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("tc3"))
    val cc3 = tc3.groupBy("w1", "w2")
      .agg(sum("tc3").as("cc3"), count(lit(1)).as("n1f3"))
    // level-2 continuation counts from the trigram table: cKN(w2,w3) =
    // distinct predecessors (tc3 rows are distinct triples, so a plain
    // row count per (w2,w3) IS N1+)
    val b2 = tc3.groupBy("w2", "w3").agg(count(lit(1)).as("ckn"))
    val z2 = b2.groupBy("w2")
      .agg(sum("ckn").as("z2"), count(lit(1)).as("n1f2k"))

    val scored = docTrigrams(docs, idCol, textCol)
      .join(tc3, Seq("w1", "w2", "w3"), "left")
      .join(cc3, Seq("w1", "w2"), "left")
      .join(b2, Seq("w2", "w3"), "left")
      .join(z2, Seq("w2"), "left")
      .join(cont1, Seq("w3"), "left")
      .crossJoin(broadcast(scalars))
    val pc = (coalesce(col("n1r1"), lit(0L)).cast("double") + 1.0) /
      (col("ntypes2") + col("v") + 1).cast("double")
    val p2 = when(col("z2").isNotNull,
      greatest(coalesce(col("ckn"), lit(0L)).cast("double") - Discount,
        lit(0.0)) / col("z2") +
        lit(Discount) * col("n1f2k") / col("z2") * pc)
      .otherwise(pc)
    val p3 = when(col("cc3").isNotNull,
      greatest(coalesce(col("tc3"), lit(0L)).cast("double") - Discount,
        lit(0.0)) / col("cc3") +
        lit(Discount) * col("n1f3") / col("cc3") * p2)
      .otherwise(p2)
    scored.select(col("doc_id"), p3.as("prob"))
      .groupBy("doc_id")
      .agg((round(avg(-log(col("prob"))), 6) + 0.0).as("logppl"))
  }

  /** CCNet-style perplexity bucketing: tercile cuts of the corpus logppl
    * distribution (exact interpolated percentiles — the a14 parity
    * precedent), each doc labeled head / middle / tail. The cuts are a
    * broadcast 1-row frame; no global window anywhere. */
  def perplexityBuckets(scored: DataFrame): DataFrame = {
    // 1e0/3: explicit DOUBLE division in both engines (a bare 1.0/3 is
    // DECIMAL division in both SQL dialects, at dialect-specific scales)
    val cuts = scored.agg(
      round(expr("percentile(logppl, 1e0/3)"), 6).as("t1"),
      round(expr("percentile(logppl, 2e0/3)"), 6).as("t2"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("logppl"),
        when(col("logppl") <= col("t1"), "head")
          .when(col("logppl") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
