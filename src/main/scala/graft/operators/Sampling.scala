package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic sampling and mixing for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the selected set changes
  * with partitioning, retries, and cluster size — unacceptable when a
  * corpus must be reproducible. These operators decide membership from a
  * seeded md5 hash of the ROW KEY alone, so the same row makes the same
  * cut on any cluster, any partitioning, any engine (the DuckDB oracle
  * replays the identical arithmetic), and the op is a codegen'd filter —
  * no RNG state, no shuffle.
  */
object Sampling {

  private val Denom = 1000000L

  /** Keep-this-row predicate: md5-derived uniform in [0, 1) < fraction.
    * Deterministic in (key, seed); independent draws need distinct seeds. */
  def keyedCut(keyCol: Column, fraction: Double, seed: Int): Column =
    pmod(Dedup.md5Hash32(keyCol.cast("string"), lit(seed)), lit(Denom)) <
      lit((fraction * Denom).toLong)

  /** Deterministic uniform sample of `fraction` of the rows. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Int = 0): DataFrame =
    df.where(keyedCut(col(keyCol), fraction, seed))

  /** Per-stratum exact-k smallest-hash sample WITHOUT a per-stratum window
    * sort: `PARTITION BY stratum ORDER BY h ... ROW_NUMBER() <= k` funnels
    * each stratum's ENTIRE row set through one window task — with a handful
    * of strata (the normal case for a training-data mix) that is the whole
    * table through ~n_strata tasks. This computes the identical result as a
    * bounded k-heap [[SmallestK]] Aggregator: partial aggregation keeps at
    * most k `(h, key)` pairs per stratum per map task (map-side
    * combinable), the merge is k-bounded, and the only shuffle moves
    * O(n_strata * k * n_map_tasks) tiny buffers — never rows.
    *
    * Determinism: the k smallest by `(h, key)` is a set property of the
    * stratum, independent of partitioning, so the output matches the window
    * formulation row-for-row whenever `(h, key)` is unique per row (key
    * uniqueness suffices).
    *
    * @return DataFrame(keyOut, stratumCol, hOut) — one row per kept sample.
    */
  def stratifiedSmallestK(df: DataFrame, keyCol: Column, stratumCol: Column,
                          hCol: Column, k: Int, keyOut: String = "key",
                          stratumOut: String = "stratum",
                          hOut: String = "h"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(stratumCol.cast("string"), keyCol.cast("long"),
        hCol.cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(new SmallestK(k).toColumn.name("kept"))
      .toDF(stratumOut, "kept")
      .select(col(stratumOut), explode(col("kept")).as("p"))
      .select(col("p._1").as(keyOut), col(stratumOut),
        col("p._2").as(hOut))
  }

  /** Temperature-scaled stratum mixing (the multilingual-sampling rule of
    * mT5/UniMax: stratum probability ∝ size^alpha): each stratum keeps
    * rows at rate (min_size / size_s)^(1 - alpha), so the smallest
    * stratum keeps everything and larger strata downsample toward the
    * temperature-flattened distribution. Unlike [[mixBySource]] the rates
    * are DERIVED from the data (one tiny n_strata-row aggregate,
    * broadcast back — never a driver round-trip), which is how a real
    * corpus mix is specified when stratum sizes aren't known up front.
    * Row membership is the same seeded-hash integer cut as every sampler
    * here — deterministic under any partitioning and replayable by the
    * oracle.
    *
    * @param sizeCol per-row contribution to the stratum size (token or
    *                char count; `lit(1)` weights by row count)
    * @return input rows that make the cut, plus a `rate` column */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
                     sizeCol: String, alpha: Double = 0.3,
                     seed: Int = 0): DataFrame = {
    val sizes = df.groupBy(col(stratumCol))
      .agg(sum(col(sizeCol)).as("_sz"))
    val minSz = sizes.agg(min(col("_sz")).as("_min"))
    val rates = sizes.crossJoin(broadcast(minSz))
      .select(col(stratumCol),
        pow(col("_min").cast("double") / col("_sz").cast("double"),
          lit(1.0 - alpha)).as("rate"))
    // integer cut points (floor(rate * 1e6)), same discipline as keyedCut
    df.join(broadcast(rates), Seq(stratumCol))
      .where(pmod(Dedup.md5Hash32(col(keyCol).cast("string"), lit(seed)),
        lit(Denom)) < floor(col("rate") * Denom).cast("long"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * every row draws u hash-uniform in (0, 1) from its key and scores
    * u^(1/w); the k LARGEST scores are a weighted-without-replacement
    * draw (each row's inclusion probability proportional to its weight
    * among the remaining rows). Deterministic in (key, seed) like every
    * sampler here, and the global top-k plans as per-partition top-k
    * heaps + a k-row merge (TakeOrderedAndProject) — never a global
    * sort, never more than k rows to the driver side of the plan.
    *
    * @param weightCol strictly positive weights (token/byte counts...)
    * @return the k sampled rows plus their `es_key` score */
  def weightedTopK(df: DataFrame, keyCol: String, weightCol: Column,
                   k: Int, seed: Int): DataFrame = {
    val u = (pmod(Dedup.md5Hash32(col(keyCol).cast("string"), lit(seed)),
      lit(Denom)).cast("double") + 0.5) / Denom.toDouble
    df.withColumn("es_key", pow(u, lit(1.0) / weightCol.cast("double")))
      .orderBy(col("es_key").desc, col(keyCol).asc)
      .limit(k)
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score every raw document by how
    * much more likely its hashed n-gram bag is under the TARGET
    * distribution than under the raw pool, and keep the top `k`. The
    * standard pretraining-mix curation operator when you have a quality
    * exemplar set (the paper's target = Wikipedia/books) and a web-scale
    * raw pool.
    *
    *  - features: unigrams + bigrams, md5-hashed into `numBuckets`
    *    (engine-replayable — the hashFeatures discipline; the paper uses
    *    10^4, the registry uses a small bucket space the oracle enumerates)
    *  - model: add-1-smoothed bag-of-buckets multinomials for target and
    *    raw; both are `numBuckets`-row model frames, broadcast — never
    *    driver-side
    *  - weight: sum over the doc's buckets of c_b * (ln p_target(b) -
    *    ln p_raw(b)), quantized floor(w*1e6+0.5)/1e6 (pure-IEEE midpoint
    *    rule, cross-engine stable) so selection never hinges on a
    *    last-ulp sum-order difference
    *  - selection: top-k by the selection key (desc, id asc) — plans as
    *    per-partition heaps + k-row merge (TakeOrderedAndProject), the
    *    ds_weighted_k shape, never a global sort. The key is the weight
    *    itself, or with `gumbelSeed` set the paper's actual importance
    *    RESAMPLING: weight + seeded-hash Gumbel noise (Gumbel-top-k =
    *    sampling without replacement ∝ softmax(w)), still deterministic
    *    and oracle-replayable; the output then carries `sel_key`.
    *
    * Shuffles: ONE (id, class, bucket) partial agg over the gram explode
    * (persisted — class totals and doc weights both consume it), the
    * bucket-model regroup (numBuckets-sized), one per-doc weight agg, and
    * the k-row top-k merge. Both classes must be non-empty.
    *
    * @param isTarget row predicate marking the target exemplars
    * @return (idCol, w, selected:int) for EVERY input row; docs with no
    *         tokens weigh 0 */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, numBuckets: Int = 64,
                 k: Int = 25, gumbelSeed: Option[Int] = None): DataFrame = {
    require(numBuckets >= 2, "numBuckets must be >= 2")
    require(k >= 1, "k must be positive")
    val spark = docs.sparkSession
    // grams via the single-pass JIT kernel: the expression form
    // (transform/sequence/element_at) interprets per element and
    // re-tokenizes per access under projection collapse — measured 15x
    // slower at sf0.1
    // NULL predicate rows belong to the RAW pool (the oracle's binary
    // CASE split) — without the coalesce they would silently vanish from
    // BOTH multinomial models
    val dc = docs
      .select(col(idCol).as("id"),
        coalesce(isTarget.cast("int"), lit(0)).as("tgt"),
        explode(Dedup.unigramBigramUdf(col(textCol))).as("gram"))
      .select(col("id"), col("tgt"),
        pmod(Dedup.md5Hash32(col("gram"), lit(0)),
          lit(numBuckets.toLong)).as("bucket"))
      .groupBy("id", "tgt", "bucket").agg(count(lit(1)).as("c"))
      .transform(CacheScope.pin)
    val cb = dc.groupBy("tgt", "bucket").agg(sum("c").as("n"))
    val tot = cb.groupBy("tgt").agg(sum("n").as("nn"))
    val dom = spark.range(numBuckets).toDF("bucket")
    val ratio = dom
      .join(broadcast(cb.where(col("tgt") === 1)
        .select(col("bucket"), col("n").as("nt"))), Seq("bucket"), "left")
      .join(broadcast(cb.where(col("tgt") === 0)
        .select(col("bucket"), col("n").as("nr"))), Seq("bucket"), "left")
      .crossJoin(broadcast(tot.where(col("tgt") === 1)
        .select(col("nn").as("ntot"))))
      .crossJoin(broadcast(tot.where(col("tgt") === 0)
        .select(col("nn").as("rtot"))))
      .select(col("bucket"),
        (log((coalesce(col("nt"), lit(0L)) + 1).cast("double") /
            (col("ntot") + numBuckets).cast("double")) -
          log((coalesce(col("nr"), lit(0L)) + 1).cast("double") /
            (col("rtot") + numBuckets).cast("double"))).as("lr"))
    val w = dc.join(broadcast(ratio), "bucket")
      .groupBy("id").agg(sum(col("c") * col("lr")).as("wraw"))
    val weights = docs.select(col(idCol).as("id"))
      .join(w, Seq("id"), "left")
      .select(col("id"), coalesce(
        floor(col("wraw") * 1e6 + 0.5) / 1e6 + 0.0, lit(0.0)).as("w"))
      .transform(CacheScope.pin)
    // selection key: the weight itself, or — the paper's actual
    // importance RESAMPLING — weight + seeded-hash Gumbel noise
    // (g = -ln(-ln(u)), u the keyedCut integer-uniform: deterministic
    // in (id, seed), replayable by the oracle, quantized so ranking
    // never hinges on a last-ulp ln difference). Top-k by perturbed
    // weight IS Gumbel-top-k sampling without replacement ∝ softmax(w).
    val selKey = gumbelSeed match {
      case None => col("w")
      case Some(seed) =>
        val u = (pmod(Dedup.md5Hash32(col("id").cast("string"), lit(seed)),
          lit(Denom)).cast("double") + 0.5) / Denom.toDouble
        floor((col("w") - log(-log(u))) * 1e6 + 0.5) / 1e6 + 0.0
    }
    val keyed = weights.select(col("id"), col("w"), selKey.as("sel_key"))
    val top = keyed.orderBy(col("sel_key").desc, col("id").asc).limit(k)
      .select(col("id"), lit(1).as("sel"))
    val out = keyed.join(broadcast(top), Seq("id"), "left")
    // schema contract: the perturbed key only appears when it differs
    // from w (gumbelSeed set) — the deterministic top-k output is
    // unchanged from before
    if (gumbelSeed.isDefined)
      out.select(col("id").as(idCol), col("w"), col("sel_key"),
        coalesce(col("sel"), lit(0)).as("selected"))
    else
      out.select(col("id").as(idCol), col("w"),
        coalesce(col("sel"), lit(0)).as("selected"))
  }

  /** Dataset mixing: per-stratum sampling fractions (e.g. source/language
    * weights when composing a training corpus). Strata absent from
    * `fractions` are dropped — the mix IS the contract. */
  def mixBySource(df: DataFrame, keyCol: String, stratumCol: String,
                  fractions: Map[String, Double], seed: Int = 0): DataFrame = {
    // integer cut points ((f * 1e6).toLong), NOT a double compare: a float
    // boundary like 0.1 * 1e6 = 100000.0000...1 would admit the exact
    // boundary hash 1-in-a-million times and diverge from any integer
    // replay of the same arithmetic
    val cut = fractions.foldLeft(lit(-1L)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit((f * Denom).toLong)).otherwise(acc)
    }
    df.where(pmod(Dedup.md5Hash32(col(keyCol).cast("string"), lit(seed)),
      lit(Denom)) < cut)
  }

  /** Deterministic epoch-seeded shard shuffle — the training-dataloader
    * export: every row lands in shard `pmod(h1, nShards)` at position
    * `row_number` by `(h2, key)` within its shard, where h1/h2 are
    * seed-derived hashes of the key. A different `seed` (epoch) yields an
    * independent permutation; the same seed replays bit-identically on
    * any cluster layout, so a resumed training job reads the exact same
    * byte order. Shape at scale: ONE hash-partition exchange on the
    * shard key + a per-shard sort (the window parallelizes across
    * shards, and shard size is bounded by the caller's nShards choice —
    * the export contract, not a skew risk: h1 is uniform).
    * Output: (keyCol, shard:int, pos:long). */
  def shardShuffle(df: DataFrame, keyCol: String, nShards: Int,
                   seed: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val h1 = Dedup.md5Hash32(col(keyCol).cast("string"), lit(seed))
    val h2 = Dedup.md5Hash32(col(keyCol).cast("string"), lit(seed + 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h2"), col(keyCol))
    df.select(col(keyCol), pmod(h1, lit(nShards)).cast("int").as("shard"),
        h2.as("h2"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(keyCol), col("shard"), col("pos"))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * never straddle a split boundary — a test doc whose near-dup sits in
    * train is benchmark leakage, and a plain per-doc hash split
    * ([[deterministicSample]] / ds_train_split) puts ~split-fraction of
    * every dup cluster on each side. Here the split unit is the
    * CONNECTED COMPONENT of the near-dup graph: every doc hashes by its
    * component id, so a whole cluster lands together by construction
    * (singletons are their own component — for them this degrades to
    * exactly the per-doc split).
    *
    * Scale shape: the pair frame comes from any bucketed candidate
    * generator (MinHash-LSH here — never all-pairs), components run the
    * frontier-bounded [[ConnectedComponents]] loop (node-sized state),
    * and the split itself is one codegen'd hash filter — the same
    * partition/cluster-invariant cut as every other sampler in this
    * file.
    *
    * @param pairs near-dup edges (src, dst) over `idCol` values
    * @return (idCol, component, bucket, split) — split in
    *         {train, val, test} by trainPct/valPct/rest */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       seed: Int = 42, trainPct: Int = 80,
                       valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    val cc = ConnectedComponents.run(pairs.select(col("src"), col("dst")))
      .withColumnRenamed("node", idCol)
    val bucket = pmod(Dedup.md5Hash32(col("component").cast("string"),
      lit(seed)), lit(100L))
    docs.select(col(idCol)).join(cc, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .select(col(idCol), col("component"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Deterministic NEGATIVE sampling for contrastive training: k
    * pseudo-random candidates per anchor, excluding the anchor itself
    * and any (anchor, candidate) pair in `avoid` (near-dups sampled as
    * negatives are false negatives — the classic contrastive-data bug).
    *
    * Per (anchor, slot j < k): the slot hashes to a candidate BUCKET
    * (seeded md5, `nBuckets` of them), each anchor's slots landing in
    * the same bucket are ranked by slot order, and the rank-r slot
    * takes the bucket's r-th smallest (anchor, candidate)-seeded hash —
    * ONE pseudo-random permutation per (anchor, bucket), distinct ranks
    * per slot, so the k negatives of an anchor are GUARANTEED distinct
    * (same-bucket slots draw distinct ranks; different buckets hold
    * disjoint candidates). Each slot's lookup touches one bucket
    * (|C|/nBuckets candidates), never the full candidate set, and
    * resampling is replayable from the seeds alone. Exclusions apply
    * BEFORE the ranking, so a slot whose winner was excluded returns
    * the next-best candidate, not a hole; a slot only goes missing if
    * its bucket has fewer eligible candidates than the slot's rank
    * needs (e.g. an entirely-excluded bucket). All joins are bucket-/
    * pair-keyed; the ranking is a k-sliced sort of per-(anchor, bucket)
    * collected pairs — group size is the ~256-candidate bucket the
    * auto-sizing maintains, never corpus-sized, and no window runs.
    *
    * Bucket count is a MODEL parameter (the IVF-centroid precedent):
    * per-slot work is |C| / nBuckets, so it must scale with the
    * candidate corpus — `nBuckets = 0` (the default) auto-sizes to
    * ~256 candidates per bucket from one count (measured: a fixed 32
    * at 10x candidates turned the sf1 probe superlinear, SCALE.md).
    *
    * @param avoid (anchor idCol, avoidCol) forbidden pairs, e.g. the
    *              near-dup pair frame curation already produced
    * @return (idCol, slot, neg_id, n_bucket) — n_bucket audits the
    *         bucket population the slot drew from (no silent caps) */
  def negativeSample(anchors: DataFrame, candidates: DataFrame,
                     idCol: String, k: Int, avoid: DataFrame,
                     nBuckets: Int = 0, seed: Int = 7): DataFrame = {
    require(k >= 1 && nBuckets >= 0, "k must be >= 1, nBuckets >= 0")
    val buckets =
      if (nBuckets > 0) nBuckets
      else math.max(1L, candidates.count() / 256).toInt
    val cand = candidates.select(col(idCol).as("neg_id"))
      .withColumn("bucket",
        pmod(Dedup.md5Hash32(col("neg_id").cast("string"), lit(seed)),
          lit(buckets.toLong)))
    val slots = anchors.select(col(idCol))
      .withColumn("slot", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("bucket",
        pmod(Dedup.md5Hash32(concat(col(idCol).cast("string"), lit(":"),
          col("slot").cast("string")), lit(seed + 1)), lit(buckets.toLong)))
    // rank each anchor's slots within their bucket (ascending slot) —
    // k-bounded arrays per (anchor, bucket), no window
    val slotRanks = slots.groupBy(col(idCol), col("bucket"))
      .agg(sort_array(collect_list(col("slot"))).as("sl"))
      .select(col(idCol), col("bucket"),
        posexplode(col("sl")).as(Seq("rs", "slot")))
    val av = avoid.toDF(idCol, "neg_id").distinct()
    // ONE slot-independent score per (anchor, candidate): same-bucket
    // slots share the permutation and take distinct ranks off it
    val scored = slots.select(col(idCol), col("bucket")).distinct()
      .join(cand, "bucket")
      .where(col("neg_id") =!= col(idCol))
      .join(av, Seq(idCol, "neg_id"), "left_anti")
      .withColumn("score",
        Dedup.md5Hash32(concat(col(idCol).cast("string"), lit(":"),
          col("neg_id").cast("string")), lit(seed + 2)))
    // per-group size is the bucket population (~256 by the auto-sizing
    // contract), so collecting before the k-slice is model-bounded
    val ranked = scored.groupBy(col(idCol), col("bucket"))
      .agg(slice(sort_array(collect_list(
          struct(col("score"), col("neg_id")))), 1, k).as("top"),
        count(lit(1)).as("n_bucket"))
    slotRanks.join(ranked, Seq(idCol, "bucket"))
      .where(col("rs") < size(col("top")))
      .select(col(idCol), col("slot"),
        element_at(col("top"), col("rs") + 1)
          .getField("neg_id").as("neg_id"),
        col("n_bucket"))
  }
}

/** Bounded k-heap "smallest k rows by (h, key)" Aggregator — the
  * partial-aggregation shape `TopKDistinct` (t3) demonstrates, specialized
  * to keyed-hash sampling. State is a sorted list capped at k `(key, h)`
  * pairs: `reduce` inserts and re-caps (k is small — 10s, not 10^6 — so a
  * sorted-list insert beats heap bookkeeping), `merge` concatenates and
  * re-caps. Both are associative and commutative on the "k smallest by
  * (h, key)" lattice, so Spark runs it map-side-combine first: no row ever
  * crosses the shuffle, only k-bounded buffers.
  */
class SmallestK(k: Int)
    extends Aggregator[(String, Long, Long), List[(Long, Long)],
      Seq[(Long, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  // order by (h, key): the sample keeps the k smallest hashes, key tiebreak
  private def keep(xs: List[(Long, Long)]): List[(Long, Long)] =
    xs.sortBy { case (key, h) => (h, key) }.take(k)

  override def zero: List[(Long, Long)] = Nil

  override def reduce(buf: List[(Long, Long)],
                      in: (String, Long, Long)): List[(Long, Long)] =
    keep((in._2, in._3) :: buf)

  override def merge(a: List[(Long, Long)],
                     b: List[(Long, Long)]): List[(Long, Long)] =
    keep(a ++ b)

  override def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = keep(buf)

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
