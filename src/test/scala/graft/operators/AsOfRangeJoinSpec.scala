package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfRangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic pseudo-random fixtures: keys with dense, duplicated and
  // boundary-aligned times
  private val rnd = new scala.util.Random(42)
  private lazy val probes = (1 to 300).map { i =>
    (i.toLong, (i % 5).toLong, rnd.nextInt(1000).toLong)
  } // (probe_id, key, t)
  private lazy val quotes = rnd.shuffle(
    (for (k <- 0L to 4L; t <- 0L to 999L by 7L) yield (k, t)).toList)
    .take(400)
    .zipWithIndex.map { case ((k, t), i) => (k, t, i * 10.0) }
  // (key, t, payload) — (key, t) unique so the as-of pick is deterministic

  private def bruteBackward(tol: Option[Long]): Map[Long, Option[Double]] =
    probes.map { case (id, k, t) =>
      val cands = quotes.filter(q => q._1 == k && q._2 <= t &&
        tol.forall(w => q._2 >= t - w))
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(_._2)._3))
    }.toMap

  private def bruteForward(tol: Option[Long]): Map[Long, Option[Double]] =
    probes.map { case (id, k, t) =>
      val cands = quotes.filter(q => q._1 == k && q._2 >= t &&
        tol.forall(w => q._2 <= t + w))
      id -> (if (cands.isEmpty) None
             else Some(cands.minBy(_._2)._3))
    }.toMap

  private lazy val probeDf = probes.toDF("probe_id", "k", "t")
  private lazy val quoteDf = quotes.toDF("k", "qt", "payload")

  test("asof backward matches the brute-force most-recent-quote pick") {
    val got = AsOfJoin.backward(probeDf, quoteDf, Seq("k"), "t", "qt",
        Seq("payload" -> "p"))
      .select("probe_id", "p").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == bruteBackward(None))
  }

  test("asof backward tolerance nulls matches older than the bound") {
    val got = AsOfJoin.backward(probeDf, quoteDf, Seq("k"), "t", "qt",
        Seq("payload" -> "p"),
        within = Some((lt, rt) => rt >= lt - 3L))
      .select("probe_id", "p").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == bruteBackward(Some(3L)))
    // the tolerance must actually bite somewhere on this fixture
    assert(got.values.count(_.isEmpty) >
      bruteBackward(None).values.count(_.isEmpty))
  }

  test("asof forward matches the brute-force earliest-future-quote pick") {
    val got = AsOfJoin.forward(probeDf, quoteDf, Seq("k"), "t", "qt",
        Seq("payload" -> "p"),
        within = Some((lt, rt) => rt <= lt + 50L))
      .select("probe_id", "p").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == bruteForward(Some(50L)))
  }

  test("asof: equal-time quote matches; null times never match") {
    val probe = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, 1L, java.lang.Long.valueOf(100L)),
        org.apache.spark.sql.Row(2L, 1L, java.lang.Long.valueOf(99L)),
        org.apache.spark.sql.Row(3L, 1L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("probe_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType))))
    val quote = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, java.lang.Long.valueOf(100L), 7.0),
        org.apache.spark.sql.Row(1L, null, 99.0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("qt",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.DoubleType))))
    val got = AsOfJoin.backward(probe, quote, Seq("k"), "t", "qt",
        Seq("payload" -> "p"))
      .select("probe_id", "p").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(7.0), // equal time matches (<=)
                      2L -> None,      // only later/null quotes exist
                      3L -> None))     // null probe time never matches
    // the FORWARD direction must honor the same null-probe contract: its
    // descending sort puts null-time probes NULLS LAST (every quote in the
    // running prefix), so the operator nulls the carry explicitly
    val fwd = AsOfJoin.forward(probe, quote, Seq("k"), "t", "qt",
        Seq("payload" -> "p"))
      .select("probe_id", "p").as[(Long, Option[Double])].collect().toMap
    assert(fwd == Map(1L -> Some(7.0), // equal time matches (>=)
                      2L -> Some(7.0), // quote at 100 is the next future
                      3L -> None))     // null probe time never matches
  }

  test("asof rejects payload names colliding with left columns") {
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(probeDf, quoteDf, Seq("k"), "t", "qt",
        Seq("payload" -> "t"))
    }
  }

  private lazy val intervals = (1 to 200).map { i =>
    val s = rnd.nextInt(2000).toLong
    // lengths straddle the bucket width (64): 0..~191, some zero-length
    (i.toLong, (i % 4).toLong, s, s + (i % 3) * rnd.nextInt(96).toLong)
  } // (iv_id, key, start, end)
  private lazy val points = (1 to 500).map { i =>
    // multiples of 64 land exactly on bucket boundaries
    val t = if (i % 7 == 0) (rnd.nextInt(31) * 64).toLong
            else rnd.nextInt(2000).toLong
    (1000L + i, (i % 4).toLong, t, rnd.nextDouble())
  } // (pt_id, key, t, v)

  private def brutePairs(cs: Boolean, ce: Boolean): Set[(Long, Long)] =
    (for {
      (ivId, k, s, e) <- intervals
      (ptId, pk, t, _) <- points
      if pk == k &&
        (if (cs) t >= s else t > s) && (if (ce) t <= e else t < e)
    } yield (ivId, ptId)).toSet

  test("rangeJoin intervalPoint equals the brute-force inequality join") {
    val iv = intervals.toDF("iv_id", "k", "s", "e")
    val pt = points.toDF("pt_id", "k", "t", "v")
    for ((cs, ce) <- Seq((true, false), (true, true), (false, false))) {
      val got = RangeJoin.intervalPoint(iv, pt, Seq("k"), "s", "e", "t",
          bucketWidth = 64L, closedStart = cs, closedEnd = ce)
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
      assert(got == brutePairs(cs, ce), s"closedStart=$cs closedEnd=$ce")
    }
  }

  test("rangeJoin intervalOverlap equals the brute-force overlap join " +
       "with every pair exactly once") {
    val l = intervals.toDF("iv_id", "k", "s", "e")
    val r = intervals.map { case (id, k, s, e) => (id + 5000L, k, s, e) }
      .toDF("rv_id", "k", "rs", "re")
    val rows = RangeJoin.intervalOverlap(l, r, Seq("k"), "s", "e",
        "rs", "re", bucketWidth = 64L)
      .select("iv_id", "rv_id").as[(Long, Long)].collect()
    val brute = (for {
      (aId, ak, as_, ae) <- intervals
      (bId, bk, bs, be) <- intervals
      if ak == bk && as_ <= be && bs <= ae
    } yield (aId, bId + 5000L)).toSet
    assert(rows.length == rows.toSet.size, "duplicate pairs emitted")
    assert(rows.toSet == brute)
  }

  test("rangeJoin intervalOverlap with NO keys is a global overlap join") {
    // keys = Seq.empty joins on the bucket alone — the global variant
    // (every interval against every interval, still bucket-bounded)
    val l = intervals.take(60).toDF("iv_id", "k", "s", "e")
    val r = intervals.drop(60).take(60)
      .map { case (id, k, s, e) => (id + 5000L, k, s, e) }
      .toDF("rv_id", "rk", "rs", "re")
    val rows = RangeJoin.intervalOverlap(l, r, Seq.empty, "s", "e",
        "rs", "re", bucketWidth = 64L)
      .select("iv_id", "rv_id").as[(Long, Long)].collect()
    val brute = (for {
      (aId, _, as_, ae) <- intervals.take(60)
      (bId, _, bs, be) <- intervals.drop(60).take(60)
      if as_ <= be && bs <= ae
    } yield (aId, bId + 5000L)).toSet
    assert(rows.length == rows.toSet.size, "duplicate pairs emitted")
    assert(rows.toSet == brute)
  }

  test("rangeJoin drops malformed intervals (end < start) like nulls") {
    val iv = Seq((1L, 0L, 10L, 5L),   // inverted: dropped
                 (2L, 0L, 10L, 20L))  // well-formed
      .toDF("iv_id", "k", "s", "e")
    val pt = Seq((100L, 0L, 12L, 1.0)).toDF("pt_id", "k", "t", "v")
    val got = RangeJoin.intervalPoint(iv, pt, Seq("k"), "s", "e", "t", 64L)
      .select("iv_id").as[Long].collect().toSet
    assert(got == Set(2L))
    val ov = RangeJoin.intervalOverlap(
        Seq((1L, 0L, 10L, 5L), (2L, 0L, 10L, 20L)).toDF("a_id", "k", "s", "e"),
        Seq((9L, 0L, 0L, 100L)).toDF("b_id", "k", "rs", "re"),
        Seq("k"), "s", "e", "rs", "re", 64L)
      .select("a_id").as[Long].collect().toSet
    assert(ov == Set(2L))
  }

  test("rangeJoin rejects colliding non-key columns and bad widths") {
    val iv = intervals.toDF("iv_id", "k", "s", "e")
    val pt = points.toDF("pt_id", "k", "s", "v") // 's' collides
    intercept[IllegalArgumentException] {
      RangeJoin.intervalPoint(iv, pt, Seq("k"), "s", "e", "s", 64L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalPoint(iv, intervals.toDF("a", "k", "b", "c"),
        Seq("k"), "s", "e", "b", 0L)
    }
  }
}
