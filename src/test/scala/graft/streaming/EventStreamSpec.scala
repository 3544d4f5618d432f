package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("windowed counts over a MemoryStream match the batch equivalent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      Ev(Timestamp.valueOf("2024-01-01 00:10:00"), 1, "click", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 00:40:00"), 2, "click", 2.0),
      Ev(Timestamp.valueOf("2024-01-01 01:05:00"), 1, "view", 3.0),
      Ev(Timestamp.valueOf("2024-01-01 01:15:00"), 3, "click", 4.0)
    )
    mem.addData(events: _*)
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("win_out")
      .select("win_start", "event_type", "n_events", "total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val h1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime / 1000
    assert(got == Set(
      (h0, "click", 2L, 3.0), (h1, "view", 1L, 3.0), (h1, "click", 1L, 4.0)))
    // batch equivalent over the same rows gives the same aggregation
    val batch = EventStream.windowedCounts(events.toDF())
      .as[(Long, String, Long, Double)].collect().toSet
    assert(batch == got)
  }

  test("streaming OHLC bars match the batch equivalent and pick " +
    "open/close by event time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      Ev(Timestamp.valueOf("2024-01-01 00:10:00"), 1, "click", 5.0),
      Ev(Timestamp.valueOf("2024-01-01 00:20:00"), 2, "click", 2.0),
      Ev(Timestamp.valueOf("2024-01-01 00:50:00"), 3, "click", 7.0),
      Ev(Timestamp.valueOf("2024-01-01 00:30:00"), 1, "view", 9.0),
      Ev(Timestamp.valueOf("2024-01-01 01:10:00"), 2, "click", 3.0)
    )
    mem.addData(events: _*)
    val q = EventStream.ohlcBars(mem.toDF())
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ohlc_out")
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect().toSet
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val h1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime / 1000
    // click hour 0: open = earliest (5.0), close = latest (7.0),
    // high/low span the middle dip
    assert(got == Set(
      (h0, "click", 5.0, 7.0, 7.0, 2.0, 3L),
      (h0, "view", 9.0, 9.0, 9.0, 9.0, 1L),
      (h1, "click", 3.0, 3.0, 3.0, 3.0, 1L)), s"got $got")
    val batch = EventStream.ohlcBars(events.toDF())
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect().toSet
    assert(batch == got)
  }

  test("streaming HLL registers match the batch build bit-for-bit " +
    "across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val batch1 = (1 to 40).map(i =>
      Ev(Timestamp.valueOf("2024-01-01 00:10:00"), i.toLong, "click", 1.0))
    val batch2 = (30 to 70).map(i => // overlaps batch1: merge must dedup
      Ev(Timestamp.valueOf("2024-01-01 00:50:00"), i.toLong, "click", 1.0)) ++
      (1 to 5).map(i =>
        Ev(Timestamp.valueOf("2024-01-01 01:20:00"), i.toLong, "view", 1.0))
    val q = EventStream.hllRegisterStream(mem.toDF(), p = 12)
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hll_regs")
      .as[(Long, String, Long, Int)].collect().toSet
    val direct = EventStream.hllRegisterStream(
        (batch1 ++ batch2).toDF(), p = 12)
      .as[(Long, String, Long, Int)].collect().toSet
    assert(streamed == direct) // max-merge == direct build, exactly
    // and the estimate fold lands near the true distinct count
    // (click hour 0 saw users 1..70 across the two micro-batches)
    val est = EventStream.hllWindowEstimate(spark.table("hll_regs"), p = 12)
      .where($"event_type" === "click" && $"win_start" ===
        Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000)
      .select($"hll_estimate").as[Double].head()
    assert(math.abs(est - 70.0) / 70.0 < 0.15, s"estimate $est")
  }

  test("stream-stream interval self-join attributes clicks to purchases " +
    "with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      Ev(Timestamp.valueOf("2024-01-01 09:20:00"), 1, "click", 0.0), // too old
      Ev(Timestamp.valueOf("2024-01-01 09:40:00"), 1, "click", 0.0), // in window
      Ev(Timestamp.valueOf("2024-01-01 09:55:00"), 2, "click", 0.0), // other user
      Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "purchase", 9.99),
      Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 0.0), // equal ts
      Ev(Timestamp.valueOf("2024-01-01 10:05:00"), 3, "purchase", 5.0) // no clicks
    )
    val q = EventStream.attributedPurchases(mem.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_out")
      .as[(Long, Long, Long, Double)].collect().toSet
    def s(t: String) = Timestamp.valueOf(t).getTime / 1000
    assert(got == Set(
      (1L, s("2024-01-01 10:00:00"), s("2024-01-01 09:40:00"), 9.99),
      (1L, s("2024-01-01 10:00:00"), s("2024-01-01 10:00:00"), 9.99)))
    // batch parity: the same operator over a batch frame agrees
    val batch = EventStream.attributedPurchases(events.toDF())
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batch == got)
  }

  test("left-outer stream-stream join emits unmatched purchases on " +
    "watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.attributedPurchasesOuter(mem.toDF())
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(Timestamp.valueOf("2024-01-01 09:40:00"), 1, "click", 0.0),
        Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "purchase", 9.99),
        Ev(Timestamp.valueOf("2024-01-01 10:05:00"), 3, "purchase", 5.0))
      q.processAllAvailable()
      // user 3's clickless purchase cannot emit yet: a click up to
      // 10:05 (+1h delay) may still arrive. The GLOBAL watermark is the
      // min over both sides' watermark nodes, and each side only sees
      // rows surviving its event_type filter — so advancing it needs a
      // far-future CLICK and a far-future PURCHASE (a 'view' would be
      // filtered before either watermark operator and move nothing).
      mem.addData(
        Ev(Timestamp.valueOf("2024-01-01 14:00:00"), 9, "click", 0.0),
        Ev(Timestamp.valueOf("2024-01-01 14:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_outer_out")
      .as[(Long, Long, Option[Long], Double)].collect().toSet
    def s(t: String) = Timestamp.valueOf(t).getTime / 1000
    // user 9's 14:00 purchase matches its own 14:00 click immediately;
    // its presence also proves matched rows don't wait for the horizon
    assert(got == Set(
      (1L, s("2024-01-01 10:00:00"), Some(s("2024-01-01 09:40:00")), 9.99),
      (9L, s("2024-01-01 14:00:00"), Some(s("2024-01-01 14:00:00")), 1.0),
      (3L, s("2024-01-01 10:05:00"), None, 5.0)), s"got $got")
    // batch parity: plain left interval join over the same events gives
    // the same rows
    val batch = EventStream.attributedPurchasesOuter(Seq(
        Ev(Timestamp.valueOf("2024-01-01 09:40:00"), 1, "click", 0.0),
        Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "purchase", 9.99),
        Ev(Timestamp.valueOf("2024-01-01 10:05:00"), 3, "purchase", 5.0),
        Ev(Timestamp.valueOf("2024-01-01 14:00:00"), 9, "click", 0.0),
        Ev(Timestamp.valueOf("2024-01-01 14:00:00"), 9, "purchase", 1.0))
        .toDF())
      .as[(Long, Long, Option[Long], Double)].collect().toSet
    assert(batch == got)
  }

  test("stream-static join enriches a stream against a broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = mem.toDF()
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(Timestamp.valueOf("2024-01-01 10:01:00"), 3, "view", 2.0))
      q.processAllAvailable()
      val got = spark.table("enrich_out").select("user_id", "tier")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "gold"), (3L, null)))
    } finally q.stop()
  }

  test("streaming dedup drops re-deliveries across micro-batches " +
    "within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStream.dedupedEvents(mem.toDF(), Seq("user_id", "event_type"),
        delay = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0)) // dup in-batch
      q.processAllAvailable()
      // batch 2: same key re-delivered within the watermark + a new key
      mem.addData(
        Ev(Timestamp.valueOf("2024-01-01 10:05:00"), 1, "click", 9.0),
        Ev(Timestamp.valueOf("2024-01-01 10:06:00"), 2, "view", 2.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select("user_id", "event_type").as[(Long, String)].collect().toSeq
      assert(got.sorted == Seq((1L, "click"), (2L, "view")),
        s"re-delivered keys must be dropped: $got")
    } finally q.stop()
  }

  test("checkpoint restart: stop mid-input, resume, exactly-once output " +
    "with window state recovered across runs") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ckpt_restart").toString
    val (inDir, outDir, ckptDir) = (s"$base/in", s"$base/out", s"$base/ckpt")
    def run(): Unit = {
      val q = EventStream.ingest(spark, inDir, outDir, ckptDir)
      try q.awaitTermination() finally q.stop()
    }
    def outRows() = spark.read.parquet(outDir)
      .select("win_start", "event_type", "n_events", "total_value")
      .as[(Long, String, Long, Double)].collect().toSeq
    def hour(h: Int) =
      Timestamp.valueOf(f"2024-01-01 $h%02d:00:00").getTime / 1000
    // run 1: hour-0 clicks complete; hour-1 has ONE view so far; the
    // 03:30 tick advances the watermark (2h delay) to 01:30, closing
    // only the hour-0 window before the query stops mid-input
    Seq(
      Ev(Timestamp.valueOf("2024-01-01 00:10:00"), 1, "click", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 00:40:00"), 2, "click", 2.0),
      Ev(Timestamp.valueOf("2024-01-01 01:10:00"), 1, "view", 3.0),
      Ev(Timestamp.valueOf("2024-01-01 03:30:00"), 9, "tick", 9.0)
    ).toDF().coalesce(1).write.mode("append").parquet(inDir)
    run()
    assert(outRows().toSet == Set((hour(0), "click", 2L, 3.0)),
      s"run 1 must emit exactly the closed hour-0 window, got ${outRows()}")
    // run 2 (restart from the checkpoint): a second view joins hour-1 —
    // its partial count must come from RECOVERED state — and the 06:00
    // tick moves the watermark to 04:00, closing hours 1 and 3
    Seq(
      Ev(Timestamp.valueOf("2024-01-01 01:40:00"), 4, "view", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 06:00:00"), 9, "tick", 1.0)
    ).toDF().coalesce(1).write.mode("append").parquet(inDir)
    run()
    val afterRestart = outRows()
    assert(afterRestart.toSet == Set(
      (hour(0), "click", 2L, 3.0),
      (hour(1), "view", 2L, 4.0), // 3.0 from run 1's state + 1.0 new
      (hour(3), "tick", 1L, 9.0)), s"got $afterRestart")
    assert(afterRestart.size == 3,
      s"closed windows must not re-emit on restart: $afterRestart")
    // run 3: restart with NO new input is a no-op, not a replay
    run()
    assert(outRows().size == 3, s"idempotent restart violated: ${outRows()}")
  }
}
