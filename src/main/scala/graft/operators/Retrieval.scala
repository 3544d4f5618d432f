package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over a document corpus: BM25 scoring with top-k
  * per query, and positional phrase matching — the query-time half of the
  * inverted-index story (`ta_postings` builds the index; these rows answer
  * queries against it).
  *
  * Scale shape (the part that matters at 100 TB): the corpus-sized frames
  * are only ever touched by (a) one tokenize+explode scan and (b) keyed
  * partial aggregations. The query side is always tiny relative to the
  * corpus, so every join that decides *which* postings participate is a
  * broadcast hash join — the full index is never shuffled, only the
  * postings of terms that appear in some query. Per-query ranking is the
  * bounded-heap [[TopKPairs]] aggregation (k-bounded buffers across the
  * shuffle), never a per-query window sort over candidate rows.
  *
  * Reference behavior: the reference's query surface stops at index build
  * + per-document tf-idf (see SURVEY.md §2.8); BM25 (Robertson/Sparck
  * Jones, the Lucene `k1`/`b` practical form with the non-negative
  * `ln(1 + (N-df+0.5)/(df+0.5))` idf) and positional phrase match are the
  * standard completions a corpus engine needs to be usable for retrieval
  * and for contamination forensics ("which training docs contain this
  * benchmark phrase").
  */
object Retrieval {

  /** BM25 top-k retrieval.
    *
    * Plan: explode the tokenize scan and BROADCAST-join query terms right
    * on it, so non-query tokens die map-side before any aggregation — the
    * (term, doc, tf) stats are only ever built for terms some query
    * mentions (df per query term still counts ALL docs containing it:
    * the prefilter keeps every occurrence of those terms); corpus size /
    * average doc length are a single 1-row aggregate broadcast
    * everywhere. Scores sum per (query, doc) in one keyed partial-agg
    * shuffle of candidate rows, then [[Similarity.topKPerQuery]] ranks
    * with k-bounded heap buffers.
    *
    * Scores are quantized to 1e-6 BEFORE ranking (floor(x*1e6 + 0.5)/1e6,
    * the engine-portable midpoint rule used across the registry) so the
    * rank order is a property of the quantized score and ties break by
    * doc id ascending identically on any engine.
    *
    * Query-term multiplicity is ignored (each distinct (q_id, term) once),
    * the standard short-query simplification of the qtf saturation term.
    *
    * @param queries DataFrame(q_id: long, q_terms: array<string>) — terms
    *                need not be distinct; duplicates are collapsed here
    * @return DataFrame(q_id, doc_id, score, rank) — rank 1..k by
    *         (score desc, doc_id asc); docs sharing no term with the
    *         query never appear (disjunctive semantics) */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")

    // tiny: one row per distinct (query, term)
    val qt = queries.select(col("q_id"),
        explode(array_distinct(col("q_terms"))).as("term"))
      .distinct()

    // corpus stats: single row, broadcast into every score expression
    val stats = docs
      .select(Dedup.tokens(col(textCol)).as("tk"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(size(col("tk"))).as("avgdl"))

    // broadcast prefilter BEFORE the tf aggregation: non-query tokens die
    // on the map side of the explode scan, so only query-term occurrences
    // are ever aggregated or shuffled (A/B in SCALE.md: filtering after
    // building the full (term, doc) index aggregates the whole corpus
    // vocabulary for nothing)
    val cand = docs
      .select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("tk"))
      .select(col("id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .join(broadcast(qt.select("term").distinct()), "term")
      .groupBy("term", "id", "dl")
      .agg(count(lit(1)).as("tf"))

    scoreAndRank(cand, qt, stats, k, k1, b)
  }

  /** Shared BM25 scoring + ranking stage — one code path for the inline
    * ([[bm25TopK]]) and standing-index ([[bm25TopKIndexed]]) variants so
    * the scoring semantics cannot drift between them.
    *
    * @param cand  (term, id, dl, tf) — postings restricted to query terms
    * @param qt    (q_id, term) tiny, broadcast
    * @param stats (n_docs, avgdl) single row, broadcast */
  private def scoreAndRank(cand0: DataFrame, qt: DataFrame, stats: DataFrame,
                           k: Int, k1: Double, b: Double): DataFrame = {
    // cand feeds TWO consumers — the df aggregate (broadcast back) and
    // the scoring join — so un-pinned, the whole candidate pipeline
    // (inline: a corpus tokenize+explode scan; indexed: the bucketed
    // postings probe) executes twice. Pin it (postings restricted to
    // query terms — query-batch-bounded); the Bench/Verify isolation
    // clears pins between queries (the blockingQuality multi-consumer
    // discipline).
    val cand = graft.operators.CacheScope.pin(cand0)
    // df per query term — small output (≤ #query terms), broadcast back
    val dfreq = cand.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = cand
      .join(broadcast(dfreq), "term")
      .join(broadcast(qt), "term") // fans out per query containing term
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("id"),
        (log(lit(1.0) +
            (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("part"))
      .groupBy("q_id", "id")
      .agg(sum("part").as("raw"))
      .select(col("q_id"), col("id").as("c_id"),
        (floor(col("raw") * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"))
    Similarity.topKPerQuery(scored, "score", k)
      .select(col("q_id"), col("c_id").as("doc_id"), col("score"),
        col("rank"))
  }

  /** Reciprocal-rank fusion over any number of retrieval legs — the
    * standard hybrid-search combiner (lexical BM25 + embedding ANN, or
    * any mix): fused(q, d) = Σ_legs 1 / (c + rank_leg(q, d)), docs
    * missing from a leg simply contribute nothing. Rank-based, so the
    * legs' score scales never need calibrating against each other, and
    * ANY top-k leg plugs in (brute cosine, IVF, LSH — the recall/cost
    * dial stays inside each leg).
    *
    * Scale shape: each leg is already k-bounded (n_queries × k rows),
    * so the union + fuse aggregation and the final bounded-heap top-k
    * all operate on query-batch-sized frames — nothing here touches the
    * corpus. Fused scores quantize to 1e-9 BEFORE ranking (engine-
    * portable, the bm25 discipline); ties break by doc_id ascending.
    *
    * @param legs frames with (q_id, doc_id, rank) — rank 1-based
    * @param c    RRF damping constant (60 per Cormack et al.)
    * @return (q_id, doc_id, rrf, n_legs, rank), rank <= k */
  def rrfFuse(legs: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(k > 0, s"k must be positive, got $k")
    val all = legs.map(_.select(col("q_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = all.groupBy("q_id", "doc_id")
      .agg(
        (floor(sum(lit(1.0) / (lit(c) + col("rank"))) * lit(1e9) + lit(0.5))
          / lit(1e9)).as("rrf"),
        count(lit(1)).as("n_legs"))
    Similarity.topKPerQuery(
        fused.select(col("q_id"), col("doc_id").as("c_id"), col("rrf")),
        "rrf", k)
      .join(fused.select(col("q_id"), col("doc_id").as("c_id"),
        col("n_legs")), Seq("q_id", "c_id"))
      .select(col("q_id"), col("c_id").as("doc_id"), col("rrf"),
        col("n_legs"), col("rank"))
  }

  /** Retrieval-quality evaluation: per-query recall@k, reciprocal rank,
    * and nDCG@k of a ranked result list against graded relevance
    * judgments — the measurement half of every retrieval/ANN tuning
    * loop (e.g. an approximate leg scored against exact top-k truth, or
    * a system scored against human qrels).
    *
    * nDCG uses the exponential gain (2^rel − 1) with NATURAL-log
    * discounts on both dcg and idcg — nDCG is invariant to the log
    * base, so this avoids cross-engine log2 differences. Metrics
    * quantize to 1e-6 (engine-portable, the bm25 discipline).
    *
    * Scale shape: `results` is k-bounded per query and `qrels` is
    * judgment-sized, so every join, window, and aggregate here runs on
    * query-batch-sized frames — the per-query idcg window partitions
    * never exceed the judgment count for that query. A query with no
    * relevant judgments scores rr = ndcg = 0 and NULL recall (0/0 —
    * no statement about recall is possible, and NULL says so).
    *
    * @param results (q_id, doc_id, rank) — rank 1-based; rows with
    *                rank > k are ignored
    * @param qrels   (q_id, doc_id, rel) — rel > 0 means relevant;
    *                graded rels feed the dcg gains
    * @return (q_id, n_rel, hits, recall, rr, ndcg) one row per query
    *         appearing in `results` */
  def evalTopK(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val res = results.where(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"))
    // the judgment frame feeds BOTH the hit join and the ideal-gain
    // aggregate — pin it so a computed qrels leg (e.g. exact top-k
    // truth from a corpus scan) runs once, not once per consumer
    val qr = CacheScope.pin(qrels.select(col("q_id"), col("doc_id"),
      col("rel").cast("double").as("rel")))
    val joined = res.join(qr, Seq("q_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0.0)))
    val per = joined.groupBy("q_id").agg(
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
      min(when(col("rel") > 0, col("rank"))).as("first_rel"),
      sum(when(col("rel") > 0,
          (pow(lit(2.0), col("rel")) - 1) / log(col("rank") + 1))
        .otherwise(lit(0.0))).as("dcg"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("rel").desc, col("doc_id").asc)
    // one pass over the judgments for n_rel AND idcg (pos caps the
    // gains at k, the count is uncapped by definition)
    val ideal = qr.where(col("rel") > 0)
      .withColumn("pos", row_number().over(w))
      .groupBy("q_id").agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("pos") <= k,
            (pow(lit(2.0), col("rel")) - 1) / log(col("pos") + 1))
          .otherwise(lit(0.0))).as("idcg"))
    per.join(ideal, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits"),
        q6(col("hits") / col("n_rel")).as("recall"),
        q6(coalesce(lit(1.0) / col("first_rel"), lit(0.0))).as("rr"),
        q6(when(col("idcg").isNull || col("idcg") === 0, lit(0.0))
          .otherwise(col("dcg") / col("idcg"))).as("ndcg"))
  }

  /** Full postings index with its partition key: (tb, term, id, tf, dl),
    * tb = md5-hash(term) % nBuckets. Written `partitionBy("tb")`, a query
    * batch touches only the partitions its terms hash into — partition
    * PRUNING at the scan, not just a join filter (the at-rest analog of
    * [[bm25TopK]]'s broadcast prefilter). */
  def searchIndex(docs: DataFrame, idCol: String, textCol: String,
                  nBuckets: Int = 64): DataFrame =
    docs.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("tk"))
      .select(col("id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy("term", "id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb",
        pmod(Dedup.md5Hash32(col("term"), lit(3)), lit(nBuckets.toLong)))

  /** Corpus stats the scorer needs, computed once at INDEX time (n_docs,
    * avgdl over every doc with ≥ 0 tokens — the full corpus). */
  def indexStats(docs: DataFrame, textCol: String): DataFrame =
    docs.select(Dedup.tokens(col(textCol)).as("tk"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(size(col("tk"))).as("avgdl"))

  /** Persist the standing search index: term-bucket-partitioned postings
    * plus the 1-row stats frame. Build once, query forever — at corpus
    * scale the per-batch tokenize+aggregate of [[bm25TopK]] is the cost
    * you amortize away. */
  def writeSearchIndex(docs: DataFrame, idCol: String, textCol: String,
                       path: String, nBuckets: Int = 64): Unit = {
    searchIndex(docs, idCol, textCol, nBuckets)
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$path/postings")
    indexStats(docs, textCol)
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against a standing [[writeSearchIndex]] layout. The query
    * batch's terms hash to their partition buckets (computed on the tiny
    * query frame, collected driver-side — query-batch-sized, the
    * model-only driver-traffic discipline) and the postings scan prunes
    * to exactly those partitions; everything after is the shared
    * [[scoreAndRank]] stage. `nBuckets` must match the written index. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int, k1: Double = 1.2,
                      b: Double = 0.75, nBuckets: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qt = queries.select(col("q_id"),
        explode(array_distinct(col("q_terms"))).as("term"))
      .distinct()
    val buckets = qt
      .select(pmod(Dedup.md5Hash32(col("term"), lit(3)),
        lit(nBuckets.toLong)).as("tb"))
      .distinct().collect().map(_.getLong(0))
    val cand = spark.read.parquet(s"$path/postings")
      .where(col("tb").isin(buckets: _*))
      .join(broadcast(qt.select("term").distinct()), "term")
      .select("term", "id", "dl", "tf")
    scoreAndRank(cand, qt, spark.read.parquet(s"$path/stats"), k, k1, b)
  }

  /** Positional exact-phrase match: for each (query phrase, doc), the
    * number of token positions where the full phrase occurs contiguously.
    *
    * Plan: one posexplode scan builds (doc, pos, term); the phrase side
    * explodes to (q_id, offset, term) — tiny, broadcast. Joining on term
    * maps every (occurrence, phrase-slot) pair to a candidate start
    * `pos - offset`; a start is a true occurrence iff ALL `plen` distinct
    * offsets are present at it (`count(distinct offset) = plen` — robust
    * to repeated terms inside the phrase). Two keyed partial aggregations
    * over candidate rows; nothing corpus-sized shuffles except postings
    * of phrase terms.
    *
    * @param phrases DataFrame(q_id: long, terms: array<string>) — the
    *                phrase token sequence, order-significant
    * @return DataFrame(q_id, doc_id, n_matches) — only (phrase, doc)
    *         pairs with at least one occurrence */
  def phraseMatch(docs: DataFrame, idCol: String, textCol: String,
                  phrases: DataFrame): DataFrame = {
    val pos = docs
      .select(col(idCol).as("id"), posexplode(Dedup.tokens(col(textCol))))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("col").as("term"))

    val slots = phrases.select(col("q_id"), size(col("terms")).as("plen"),
        posexplode(col("terms")))
      .select(col("q_id"), col("plen").cast("long").as("plen"),
        col("pos").cast("long").as("off"), col("col").as("term"))

    // at a fixed (q_id, doc, start), each offset contributes exactly one
    // joined row — (doc, pos) is unique and (q_id, off) is unique — so a
    // plain count equals the distinct-offset count without the
    // two-phase distinct aggregation
    pos.join(broadcast(slots), "term")
      .select(col("q_id"), col("id"), col("plen"),
        (col("pos") - col("off")).as("start"))
      .where(col("start") >= 0)
      .groupBy("q_id", "id", "plen", "start")
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") === col("plen"))
      .groupBy("q_id", "id")
      .agg(count(lit(1)).as("n_matches"))
      .select(col("q_id"), col("id").as("doc_id"), col("n_matches"))
  }
}
