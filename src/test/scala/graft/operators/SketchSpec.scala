package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The 100 TB paths documented for a6/a14 swap exact aggregates for
  * sketches (HLL++ distinct counts, t-digest style percentiles) whose
  * partials merge map-side. These can't hash-match a DuckDB oracle, so
  * this spec pins their error against the exact answers on the driver's
  * tables instead — the claim "bounded error, mergeable state" is tested,
  * not asserted in prose. */
class SketchSpec extends SparkTestBase {

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("approx_count_distinct stays within 3x the configured rsd") {
    val row = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx"))
      .head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.15,
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val row = orders.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx"))
      .head()
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    // accuracy=10000 on 1.5k rows pins the rank exactly; the remaining
    // gap is interpolation (approx returns an actual data point)
    assert(math.abs(approx - exact) / exact <= 0.01,
      s"exact=$exact approx=$approx")
  }

  // ----------------------------------------------------- graft.Sketches
  // The library's own sketches are DETERMINISTIC under the md5 parity
  // hash, so beyond error bounds we can pin exact invariances: register
  // parity with a JVM reference, duplicate-insensitivity, and partition-
  // layout-insensitivity (the register fold sums exact powers of two).

  test("hllRegister matches a scalar JVM reference implementation") {
    import spark.implicits._
    val vals = (1 to 500).map(i => s"v$i")
    val df = vals.toDF("v")
    val (idx, rho) = Sketches.hllRegister(col("v"), p = 12)
    val got = df.select(col("v"), idx.as("idx"), rho.as("rho"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    vals.foreach { v =>
      val h = Dedup.md5Hash32Kernel(v, 0)
      val w = h & 0xFFFFFL
      val expRho =
        if (w == 0) 21 else 20 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      assert(got(v) == ((h >>> 20, expRho)), s"mismatch for $v (h=$h)")
    }
  }

  test("hllDistinct estimates 5000 distinct within the m=4096 error bound") {
    val df = spark.range(5000).selectExpr("id % 2 AS grp", "id AS v")
    val est = Sketches.hllDistinct(df, Seq("grp"), "v", p = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // rsd for m=4096 is 1.04/sqrt(m) ~ 1.6%; allow 3 sigma
    Seq(0L, 1L).foreach { g =>
      assert(math.abs(est(g) - 2500.0) / 2500.0 <= 0.05, s"grp=$g est=${est(g)}")
    }
  }

  test("hllDistinct is exactly duplicate- and partition-insensitive") {
    val base = spark.range(3000).selectExpr("0L AS grp", "id AS v")
    val dup = base.union(base).union(base)
    val e1 = Sketches.hllDistinct(base, Seq("grp"), "v").head().getDouble(1)
    val e2 = Sketches.hllDistinct(dup, Seq("grp"), "v").head().getDouble(1)
    val e3 = Sketches.hllDistinct(dup.repartition(7), Seq("grp"), "v")
      .head().getDouble(1)
    assert(e1 == e2 && e2 == e3, s"$e1 / $e2 / $e3")
  }

  test("hllMerge of per-shard registers is bit-identical to the direct " +
       "estimate (max commutes with sharding)") {
    val df = spark.range(4000)
      .selectExpr("id % 3 AS grp", "id % 5 AS shard", "id % 1700 AS v")
    val direct = Sketches.hllDistinct(df, Seq("grp"), "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sharded = Sketches.hllEstimate(
      Sketches.hllMerge(
        Sketches.hllRegisters(df, Seq("grp", "shard"), "v"), Seq("grp")),
      Seq("grp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(direct == sharded, s"$direct vs $sharded")
  }

  test("cmsMerge of per-shard counter tables equals the direct sketch " +
       "(integer counters are additive)") {
    import spark.implicits._
    val items = (1 to 300).flatMap(k => Seq.fill(k % 7 + 1)(s"t$k"))
      .zipWithIndex.map { case (it, i) => (it, i % 4) }.toDF("it", "shard")
    val direct = Sketches.cmsBuild(items, "it")
    val merged = Sketches.cmsMerge(
      (0 until 4).map(sh => Sketches.cmsBuild(items.where(col("shard") === sh),
        "it")).reduce(_ unionByName _))
    val probes = Seq("t1", "t100", "t299", "absent").toDF("it")
    def probe(c: org.apache.spark.sql.DataFrame) =
      Sketches.cmsEstimate(c, probes, "it")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probe(direct) == probe(merged))
  }

  test("histQuantiles interpolates within buckets; histMerge of shards " +
       "is identical; out-of-range values clamp to edge buckets") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val hist = Sketches.histogramCounts(df, "v", lo = 0.0, hi = 100.0,
      bins = 100)
    val got = Sketches.histQuantiles(hist, Seq(0.01, 0.5), lo = 0.0,
        hi = 100.0, bins = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // bucket b holds value b (1..99; 100 clamps into 99): p50 pos = 50
    // lands at bucket 50's upper edge -> 51.0; p01 at bucket 1's -> 2.0
    assert(got(0.5) == 51.0 && got(0.01) == 2.0, got.toString)
    // merge identity: per-shard histograms sum to the direct sketch
    val sharded = Sketches.histMerge(
      (0 until 3).map(sh => Sketches.histogramCounts(
        df.where(pmod(col("v").cast("int"), lit(3)) === sh), "v",
        0.0, 100.0, 100)).reduce(_ unionByName _))
    val mergedQ = Sketches.histQuantiles(sharded, Seq(0.01, 0.5), 0.0,
        100.0, 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(mergedQ == got)
    // clamping: far-out values land in the edge buckets — including values
    // beyond 2^31 bucket-widths out, where a pre-clamp long->int cast
    // would wrap the bucket index and break the edge-clamp contract
    val edges = Sketches.histogramCounts(
      Seq(-5.0, 1000.0, -1e18, 1e18).toDF("v"), "v", 0.0, 10.0, 10)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(edges == Map(0 -> 2L, 9 -> 2L), edges.toString)
    // null and NaN are not observations: excluded, never bucket 0
    val withNulls = Sketches.histogramCounts(
      Seq(Some(1.0), None, Some(Double.NaN), Some(9.0))
        .toDF("v"), "v", 0.0, 10.0, 10)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(withNulls == Map(1 -> 1L, 9 -> 1L), withNulls.toString)
  }

  test("kmvSketch: merge of per-shard sketches IS the direct sketch; " +
    "estimates hit exact counts under k and land within KMV error over") {
    import spark.implicits._
    // 5000 distinct values sharded 4 ways
    val vals = (1 to 5000).map(v => (s"v$v", v % 4)).toDF("v", "shard")
    val direct = Sketches.kmvSketch(vals, Seq.empty, "v", k = 64)
      .select("kmv").as[Seq[Long]].head()
    val sharded = Sketches.kmvMerge(
        Sketches.kmvSketch(vals, Seq("shard"), "v", k = 64),
        Seq.empty, k = 64)
      .select("kmv").as[Seq[Long]].head()
    assert(direct == sharded, "merge(shards) != direct")
    assert(direct.length == 64 && direct == direct.sorted &&
      direct.distinct.length == 64)
    // estimator: within the ~1/sqrt(k) relative-error regime (k=64 ->
    // 12.5% sigma; allow 3 sigma)
    val est = spark.range(1).select(
      Sketches.kmvEstimate(typedLit(direct), 64)).as[Double].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.375, s"est=$est")
    // under k distinct values the sketch reports the EXACT count
    val tiny = (1 to 10).map(v => s"t$v").toDF("v")
    val tinySketch = Sketches.kmvSketch(tiny, Seq.empty, "v", k = 64)
    assert(tinySketch.select(Sketches.kmvEstimate(col("kmv"), 64))
      .as[Double].head() == 10.0)
    // duplicates never occupy extra slots (set semantics)
    val dup = (1 to 10).flatMap(v => Seq.fill(7)(s"t$v")).toDF("v")
    assert(Sketches.kmvSketch(dup, Seq.empty, "v", k = 64)
      .select(size(col("kmv"))).as[Int].head() == 10)
  }

  test("kmvSetEstimates: jaccard-scaled intersection tracks the true " +
    "overlap of two value sets") {
    import spark.implicits._
    // A = 1..3000, B = 2001..5000 -> union 5000, intersection 1000
    val a = (1 to 3000).map(v => ("a", s"v$v"))
    val b = (2001 to 5000).map(v => ("b", s"v$v"))
    val sk = Sketches.kmvSketch((a ++ b).toDF("g", "v"), Seq("g"), "v", 64)
    val ka = sk.where(col("g") === "a").select("kmv").as[Seq[Long]].head()
    val kb = sk.where(col("g") === "b").select("kmv").as[Seq[Long]].head()
    val e = spark.range(1).select(
        Sketches.kmvSetEstimates(typedLit(ka), typedLit(kb), 64).as("e"))
      .select("e.est_union", "e.est_inter").as[(Double, Double)].head()
    assert(math.abs(e._1 - 5000.0) / 5000.0 < 0.375, s"union=${e._1}")
    // intersection compounds union + jaccard error; allow a loose band
    assert(e._2 > 200 && e._2 < 2500, s"inter=${e._2}")
  }

  test("cmsEstimate is one-sided: est >= exact, absent items near zero") {
    import spark.implicits._
    // skewed multiset: item k appears k times, k in 1..200
    val items = (1 to 200).flatMap(k => Seq.fill(k)(s"item$k")).toDF("it")
    val n = items.count()
    val counters = Sketches.cmsBuild(items, "it", depth = 4, width = 1024)
    val probes = Seq("item200", "item150", "item7", "nosuchitem").toDF("it")
    val est = Sketches.cmsEstimate(counters, probes, "it")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("item200") >= 200 && est("item150") >= 150 && est("item7") >= 7)
    // CMS error bound: est <= exact + eps*N with eps ~ e/width
    val slack = (math.E / 1024 * n).ceil.toLong
    assert(est("item200") <= 200 + slack && est("nosuchitem") <= slack,
      est.toString)
  }

  test("heavyHitters equals the direct GROUP BY ... HAVING — the CMS " +
    "prefilter changes the cost, never the answer") {
    import spark.implicits._
    // zipf-ish: item i appears max(1, 200/i) times over 1..200
    val rows = (1 to 200).flatMap(i =>
      Seq.fill(math.max(1, 200 / i))(s"item$i")).toDF("item")
    for (minCount <- Seq(2L, 10L, 50L, 100L, 201L)) {
      val got = Sketches.heavyHitters(rows, "item", minCount)
        .as[(String, Long)].collect().toSet
      val direct = rows.groupBy("item").agg(count(lit(1)).as("n"))
        .where(col("n") >= minCount)
        .as[(String, Long)].collect().toSet
      assert(got == direct, s"minCount=$minCount: $got vs $direct")
    }
    // the threshold 201 case: empty output, no crash
    assert(Sketches.heavyHitters(rows, "item", 201L).count() == 0)
  }

  test("autoRangeQuantiles: two deterministic passes — sharded min/max + " +
    "histMerge composition IS the direct sketch; accuracy within a bin") {
    import spark.implicits._
    // deliberately unknown-range data: heavy-tailed, negative lo
    val xs = (1 to 5000).map(i => -50.0 + (i.toLong * i % 9973).toDouble)
    val df = xs.toDF("x")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val direct = Sketches.autoRangeQuantiles(df, "x", qs, bins = 256)
      .as[(Double, Double)].collect().toMap

    // shard-merge replay: per-shard (min,max) merged by min/max gives the
    // global domain; per-shard histograms under THAT domain histMerge to
    // the direct histogram — so the composed result is bit-identical
    val shards = (0 until 3).map(k => df.where(pmod(col("x").cast("long"),
      lit(3)) === k))
    val mms = shards.map(_.agg(min(col("x").cast("double")),
      max(col("x").cast("double"))).collect().head)
    val lo = mms.map(_.getDouble(0)).min
    val hi = mms.map(_.getDouble(1)).max
    val merged = Sketches.histMerge(
      shards.map(sh => Sketches.histogramCounts(sh, "x", lo, hi, 256))
        .reduce(_ unionAll _))
    val composed = Sketches.histQuantiles(merged, qs, lo, hi, 256)
      .as[(Double, Double)].collect().toMap
    assert(direct == composed, s"$direct vs $composed")

    // accuracy: each quantile within one bin width of the exact value
    val sorted = xs.sorted
    val binW = (sorted.last - sorted.head) / 256
    for (q <- qs) {
      val exact = sorted(math.ceil(q * xs.size).toInt - 1)
      assert(math.abs(direct(q) - exact) <= binW + 1e-9,
        s"q=$q got ${direct(q)} exact $exact binW $binW")
    }

    // degenerate contracts
    assert(Sketches.autoRangeQuantiles(df.where(lit(false)), "x", qs)
      .count() == 0)
    val const = Sketches.autoRangeQuantiles(
      Seq(7.25, 7.25, 7.25).toDF("x"), "x", Seq(0.5, 0.99))
      .as[(Double, Double)].collect().toMap
    assert(const == Map(0.5 -> 7.25, 0.99 -> 7.25))
  }

  test("heavyHittersAudit: a well-sized width reports sparse selectivity, " +
    "an undersized width reports ~1.0 — while the OUTPUT stays identical") {
    import spark.implicits._
    // zipf-ish over a 2000-item vocabulary: item i appears max(1, 2000/i)
    // times; minCount=200 keeps items 1..10 (their rows dominate the head)
    val rows = (1 to 2000).flatMap(i =>
      Seq.fill(math.max(1, 2000 / i))(s"item$i")).toDF("item")
    val total = rows.count().toDouble
    val heavyRows = (1 to 2000).map(i => math.max(1, 2000 / i))
      .filter(_ >= 200).map(_.toLong).sum.toDouble

    def audit(width: Int): (Long, Long, Double) = {
      val r = Sketches.heavyHittersAudit(rows, "item", 200L, width = width)
        .collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val (totWide, candWide, selWide) = audit(1024)
    val (totNarrow, candNarrow, selNarrow) = audit(8)
    assert(totWide == total.toLong && totNarrow == total.toLong)
    // wide sketch: prefilter passes the heavy rows plus bounded collision
    // overcount — well under half the corpus
    assert(candWide >= heavyRows.toLong, s"recall: $candWide < $heavyRows")
    assert(selWide < 0.5, s"wide width should be selective, got $selWide")
    // 8 buckets for a 2000-item vocabulary: everything collides past the
    // threshold, the prefilter passes ~all rows — THIS is what the audit
    // row exists to expose
    assert(selNarrow > 0.95, s"narrow width should degrade, got $selNarrow")
    // and the heavy-hitters OUTPUT is identical at both widths (exact
    // recall + exact verify): only the cost profile changed
    val outWide = Sketches.heavyHitters(rows, "item", 200L, width = 1024)
      .as[(String, Long)].collect().toSet
    val outNarrow = Sketches.heavyHitters(rows, "item", 200L, width = 8)
      .as[(String, Long)].collect().toSet
    assert(outWide == outNarrow && outWide.nonEmpty)
  }
}
