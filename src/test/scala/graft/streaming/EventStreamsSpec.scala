package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0),
    (2L, ts("2024-01-01 10:20:00"), 7L, "click", 2.0),
    (3L, ts("2024-01-01 11:10:00"), 7L, "view", 4.0),
    (4L, ts("2024-01-01 10:30:00"), 9L, "click", 8.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  "windowedCounts" should "aggregate tumbling windows per type (batch parity)" in {
    val r = EventStreams.windowedCounts(events, "1 hour").collect()
      .map(x => (x.getTimestamp(0), x.getString(1), x.getLong(2), x.getDouble(3)))
      .toSet
    r shouldBe Set(
      (ts("2024-01-01 10:00:00"), "click", 3L, 11.0),
      (ts("2024-01-01 11:00:00"), "view", 1L, 4.0))
  }

  it should "interpret an integral ts column as epoch NANOS (the events parquet layout)" in {
    // same rows, ts as bigint nanos — a plain cast("timestamp") would
    // read these as SECONDS and put every window thousands of years out
    val nanos = events.withColumn("ts", expr("unix_micros(ts) * 1000"))
    val r = EventStreams.windowedCounts(nanos, "1 hour").collect()
      .map(x => (x.getTimestamp(0), x.getString(1), x.getLong(2), x.getDouble(3)))
      .toSet
    r shouldBe Set(
      (ts("2024-01-01 10:00:00"), "click", 3L, 11.0),
      (ts("2024-01-01 11:00:00"), "view", 1L, 4.0))
  }

  it should "run the same plan as a stream over MemoryStream" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    stream.addData(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 10:20:00"), 7L, "click", 2.0))
    val counts = EventStreams.windowedCounts(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      "1 hour")
    val q = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r = spark.table("win_counts").collect()
        .map(x => (x.getString(1), x.getLong(2))).toSet
      r shouldBe Set(("click", 2L))
    } finally q.stop()
  }

  "windowedDistinctUsers" should "run the HLL sketch as a streaming aggregate across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val counts = EventStreams.windowedDistinctUsers(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      "1 hour")
    val q = counts.writeStream.format("memory")
      .queryName("win_distinct").outputMode("complete").start()
    try {
      // users 1..40 in batch one, 21..60 in batch two → 60 distinct,
      // accumulated across micro-batches by the state-store merge
      stream.addData((1L to 40L).map(u =>
        (u, ts("2024-01-01 10:05:00"), u, "click", 1.0)): _*)
      q.processAllAvailable()
      stream.addData((21L to 60L).map(u =>
        (u + 100, ts("2024-01-01 10:25:00"), u, "click", 1.0)): _*)
      q.processAllAvailable()
      val r = spark.table("win_distinct").collect()
        .map(x => (x.getString(1), x.getLong(2))).toMap
      // p=12 HLL is exact in the linear-counting regime at n=60
      r shouldBe Map("click" -> 60L)
    } finally q.stop()
  }

  it should "match the batch run over the same rows (order-blind merge)" in {
    val rows = ((1L to 40L) ++ (21L to 60L)).zipWithIndex.map { case (u, i) =>
      (i.toLong, ts("2024-01-01 10:05:00"), u, "click", 1.0)
    }
    val batch = EventStreams.windowedDistinctUsers(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"), "1 hour")
      .collect().map(x => (x.getString(1), x.getLong(2))).toMap
    batch shouldBe Map("click" -> 60L)
  }

  "windowedUserSketch" should "accumulate a probe-able CMS across micro-batches, batch-identical" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.graft.SketchFunctions
    import graft.functions.{HashFunctions => H}
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sketch = EventStreams.windowedUserSketch(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      "1 hour")
    val q = sketch.writeStream.format("memory")
      .queryName("win_sketch").outputMode("complete").start()
    try {
      // user 7 appears 3 times across two micro-batches, user 8 once
      stream.addData(
        (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0),
        (2L, ts("2024-01-01 10:10:00"), 7L, "view", 1.0),
        (3L, ts("2024-01-01 10:15:00"), 8L, "click", 1.0))
      q.processAllAvailable()
      stream.addData(
        (4L, ts("2024-01-01 10:40:00"), 7L, "click", 1.0))
      q.processAllAvailable()
      val row = spark.table("win_sketch").collect()
      row.length shouldBe 1
      row(0).getLong(2) shouldBe 4L // n_events
      // probe the emitted sketch for per-user counts
      val est = spark.table("win_sketch")
        .select(explode(typedLit(Seq(7L, 8L, 999L))).as("u"),
          col("user_sketch"))
        .select(col("u"), SketchFunctions.cmsEstimate(col("user_sketch"),
          H.md5Bucket(1L, col("u")), H.md5Bucket(2L, col("u"))).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      est(7L) shouldBe 3L
      est(8L) shouldBe 1L
      est(999L) shouldBe 0L // absent user: all four probed counters empty

      // batch parity: same rows, same sketch bytes (elementwise-add merge
      // is order-blind)
      val batchBytes = EventStreams.windowedUserSketch(
        Seq(
          (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0),
          (2L, ts("2024-01-01 10:10:00"), 7L, "view", 1.0),
          (3L, ts("2024-01-01 10:15:00"), 8L, "click", 1.0),
          (4L, ts("2024-01-01 10:40:00"), 7L, "click", 1.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value"), "1 hour")
        .collect()(0).getAs[Array[Byte]]("user_sketch")
      row(0).getAs[Array[Byte]]("user_sketch") shouldBe batchBytes
    } finally q.stop()
  }

  "intervalJoinStreams" should "pair events within the time window on streams" in {
    implicit val sqlCtx = spark.sqlContext
    val lhs = MemoryStream[(Long, Timestamp)]
    val rhs = MemoryStream[(Long, Timestamp)]
    lhs.addData((100L, ts("2024-01-01 10:00:00")), (101L, ts("2024-01-01 11:00:00")))
    rhs.addData((200L, ts("2024-01-01 10:05:00")), (201L, ts("2024-01-01 10:30:00")),
      (202L, ts("2024-01-01 12:00:00")))
    val joined = EventStreams.intervalJoinStreams(
      lhs.toDF().toDF("event_id", "ts"), rhs.toDF().toDF("event_id", "ts"),
      windowSeconds = 600L)
    val q = joined.writeStream.format("memory")
      .queryName("interval_pairs").outputMode("append").start()
    try {
      q.processAllAvailable()
      val r = spark.table("interval_pairs").collect()
        .map(x => (x.getLong(0), x.getLong(2))).toSet
      // only purchase 100 has a click within ±10 min (200 at +5 min)
      r shouldBe Set((100L, 200L))
    } finally q.stop()
  }

  it should "give the same pairs on bounded frames (batch parity)" in {
    val l = Seq((100L, ts("2024-01-01 10:00:00")), (101L, ts("2024-01-01 11:00:00")))
      .toDF("event_id", "ts")
    val r = Seq((200L, ts("2024-01-01 10:05:00")), (201L, ts("2024-01-01 10:30:00")))
      .toDF("event_id", "ts")
    EventStreams.intervalJoinStreams(l, r, windowSeconds = 600L)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSet shouldBe
      Set((100L, 200L))
  }

  "sessionizeStream" should "close sessions via event-time timeout across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionizeStream(stream.toDS(), gapMillis = 30 * 60 * 1000L,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // batch 1: one open session for user 7
      stream.addData(
        EventStreams.Event(7L, ts("2024-01-01 10:05:00"), "click", 1.0),
        EventStreams.Event(7L, ts("2024-01-01 10:20:00"), "click", 2.0))
      q.processAllAvailable()
      spark.table("sessions").count() shouldBe 0 // still open

      // batch 2 advances the watermark far past 10:50 → timeout pending
      stream.addData(EventStreams.Event(9L, ts("2024-01-01 13:00:00"), "view", 4.0))
      q.processAllAvailable()
      // batch 3 triggers the timed-out state's emission
      stream.addData(EventStreams.Event(9L, ts("2024-01-01 13:01:00"), "view", 1.0))
      q.processAllAvailable()

      val sessions = spark.table("sessions")
        .select("user_id", "n_events", "total_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      sessions should contain((7L, 2L, 3.0))
    } finally q.stop()
  }

  "dedupStream" should "drop duplicate content within the watermark, batch and stream alike" in {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // batch parity
    val batch = Seq(
      (ts("2024-01-01 10:00:00"), "same text"),
      (ts("2024-01-01 10:05:00"), "same text"),
      (ts("2024-01-01 10:06:00"), "other text")
    ).toDF("ts", "text")
    EventStreams.dedupStream(batch).count() shouldBe 2

    // streaming: duplicate arrives in a later micro-batch, still dropped
    val stream = MemoryStream[(Timestamp, String)]
    val q = EventStreams.dedupStream(
        stream.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData((ts("2024-01-01 10:00:00"), "same text"))
      q.processAllAvailable()
      stream.addData(
        (ts("2024-01-01 10:05:00"), "same text"),
        (ts("2024-01-01 10:06:00"), "other text"))
      q.processAllAvailable()
      spark.table("dedup_out").select("text").as[String].collect().sorted shouldBe
        Array("other text", "same text")
    } finally q.stop()
  }

  "admissionStream" should "admit only docs with no LSH band collision against the corpus" in {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog in the field today"),
      (101L, "completely unrelated corpus text about database engines and joins")
    ).toDF("doc_id", "text")
    // DEFAULT banding on both sides on purpose: the gate's parameters
    // must equal the index's, and default-vs-default is the contract
    // (a bands mismatch makes the key spaces disjoint and admits all)
    val corpusBands = graft.operators.Dedup.bandKeys(corpus).persist()
    corpusBands.count()

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventStreams.admissionStream(
      stream.toDF().toDF("doc_id", "text"),
      corpusBands,
      (batch, _) => admitted.synchronized {
        admitted ++= batch.select("doc_id").collect().map(_.getLong(0))
      })
    try {
      stream.addData(
        // near-dup of corpus 100 (one word changed => most bands collide)
        (1L, "the quick brown fox jumps over the lazy dog in the field tonight"),
        // novel document, no collision
        (2L, "entirely fresh content with zero overlap whatsoever anywhere"))
      q.processAllAvailable()
      stream.addData((3L, "the quick brown fox jumps over the lazy dog in the field today"))
      q.processAllAvailable()
    } finally q.stop()
    corpusBands.unpersist()
    // 1 collides (near-dup), 3 collides (exact dup), 2 is admitted
    admitted.sorted shouldBe Seq(2L)
  }

  "ewmaSmooth" should "fold event-time-ordered halving steps per user" in {
    // user 1 in scrambled input order: ts order is 10→20→30 with values
    // 1, 2, 4 → s = 1, then 1.5, then 2.75; user 2 has one event
    val ev = Seq(
      (1L, 30L, 103L, 4.0),
      (1L, 10L, 101L, 1.0),
      (1L, 20L, 102L, 2.0),
      (2L, 99L, 201L, 7.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val r = EventStreams.ewmaSmooth(ev)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    r(1L) shouldBe ((3L, 30L, 2.75))
    r(2L) shouldBe ((1L, 99L, 7.5))
  }

  "ewmaSmoothStream" should "carry state across micro-batches and match the batch fold" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.ewmaSmoothStream(stream.toDS())
      .writeStream.format("memory").queryName("ewma_pts")
      .outputMode("update").start()
    try {
      stream.addData(
        EventStreams.Event(7L, ts("2024-01-01 10:00:00"), "click", 1.0),
        EventStreams.Event(7L, ts("2024-01-01 10:10:00"), "click", 2.0))
      q.processAllAvailable()
      stream.addData(
        EventStreams.Event(7L, ts("2024-01-01 10:20:00"), "click", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    // last update row per user is the stream's final state
    val last = spark.table("ewma_pts").orderBy(col("n_events").desc)
      .collect()(0)
    last.getAs[Long]("n_events") shouldBe 3L
    // ((1, then 1.5), then 2.75) — and identical to the batch operator
    last.getAs[Double]("ewma") shouldBe 2.75
    val batch = EventStreams.ewmaSmooth(
      Seq((7L, 1L, 101L, 1.0), (7L, 2L, 102L, 2.0), (7L, 3L, 103L, 4.0))
        .toDF("user_id", "ts", "event_id", "value")).collect()(0)
    batch.getDouble(3) shouldBe last.getAs[Double]("ewma")
  }

  it should "weight recent values ~2x the full-history mean" in {
    // constant 0 history then a spike: EWMA keeps half the spike, the
    // mean dilutes it to 1/n
    val ev = ((1L to 9L).map(t => (5L, t, t, 0.0)) :+ ((5L, 10L, 10L, 8.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val r = EventStreams.ewmaSmooth(ev).collect()(0)
    r.getDouble(3) shouldBe 4.0 // half of the spike survives
  }

  it should "fold exactly the bounded last-maxHistory suffix per key" in {
    // 100 scrambled events; with maxHistory = 8 the fold must equal a
    // driver replay over ONLY the last 8 values in (ts, id) order, while
    // n_events/last_ts still describe the full series
    val vals = (1L to 100L).map(t => (t, t, math.sin(t.toDouble) * 10.0))
    val ev = scala.util.Random.shuffle(vals)
      .map { case (t, i, v) => (9L, t, i, v) }
      .toDF("user_id", "ts", "event_id", "value")
      .repartition(7)
    val r = EventStreams.ewmaSmooth(ev, maxHistory = 8).collect()(0)
    val expected = vals.sortBy(x => (x._1, x._2)).takeRight(8).map(_._3)
      .reduceLeft((s, x) => s * 0.5 + x * 0.5)
    r.getLong(1) shouldBe 100L
    r.getLong(2) shouldBe 100L
    r.getDouble(3) shouldBe expected
    // and with maxHistory >= n the bounded fold IS the full fold
    val full = vals.sortBy(x => (x._1, x._2)).map(_._3)
      .reduceLeft((s, x) => s * 0.5 + x * 0.5)
    EventStreams.ewmaSmooth(ev, maxHistory = 100).collect()(0)
      .getDouble(3) shouldBe full
  }

  "holtSmooth" should "track level and trend in event-time order" in {
    // user 1 scrambled; ts order 10→20→30, values 1, 2, 4, α = β = 1/2:
    //   t1: l = 1, b = 0
    //   t2: l = 0.5·2 + 0.5·(1+0)   = 1.5,   b = 0.5·(1.5−1) + 0   = 0.25
    //   t3: l = 0.5·4 + 0.5·1.75    = 2.875, b = 0.5·1.375 + 0.125 = 0.8125
    val ev = Seq(
      (1L, 30L, 103L, 4.0),
      (1L, 10L, 101L, 1.0),
      (1L, 20L, 102L, 2.0),
      (2L, 99L, 201L, 7.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val r = EventStreams.holtSmooth(ev)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5))).toMap
    r(1L) shouldBe ((3L, 30L, 2.875, 0.8125, 3.6875))
    // a single-event key seeds (l = x, b = 0) — forecast is the value
    r(2L) shouldBe ((1L, 99L, 7.5, 0.0, 7.5))
  }

  it should "fold exactly the bounded last-maxHistory suffix per key" in {
    // scrambled 100-event series; the operator must equal a driver
    // replay of the Holt recurrence over ONLY the last 8 values in
    // (ts, id) order, and equal the full fold when maxHistory >= n
    val vals = (1L to 100L).map(t => (t, t, math.sin(t.toDouble) * 10.0))
    val ev = scala.util.Random.shuffle(vals)
      .map { case (t, i, v) => (9L, t, i, v) }
      .toDF("user_id", "ts", "event_id", "value")
      .repartition(7)
    def holtReplay(xs: Seq[Double]): (Double, Double) =
      xs.tail.foldLeft((xs.head, 0.0)) { case ((l, b), x) =>
        val ln = 0.5 * x + 0.5 * (l + b)
        (ln, 0.5 * (ln - l) + 0.5 * b)
      }
    val r = EventStreams.holtSmooth(ev, maxHistory = 8).collect()(0)
    val (l8, b8) = holtReplay(
      vals.sortBy(x => (x._1, x._2)).takeRight(8).map(_._3))
    r.getLong(1) shouldBe 100L
    r.getLong(2) shouldBe 100L
    r.getDouble(3) shouldBe l8
    r.getDouble(4) shouldBe b8
    r.getDouble(5) shouldBe (l8 + b8)
    val (lf, bf) = holtReplay(vals.sortBy(x => (x._1, x._2)).map(_._3))
    val full = EventStreams.holtSmooth(ev, maxHistory = 100).collect()(0)
    full.getDouble(3) shouldBe lf
    full.getDouble(4) shouldBe bf
  }

  "holtWinters" should "match a driver replay of the seasonal recurrence, gaps keeping phase" in {
    // hand-built hourly activity: type A has counts over hours 0, 1, 24,
    // 25, 49 (so slots 0 and 1 repeat across "days" and hour 49 arrives
    // after a gap — its slot is 49 % 24 = 1, not "next in sequence")
    val hours = Seq(0L -> 3, 1L -> 1, 24L -> 2, 25L -> 4, 49L -> 2)
    val ev = hours.flatMap { case (h, n) =>
      (0 until n).map(k => ("A", h * 3600000000L + k * 1000L, 1.0))
    } ++ Seq(("B", 7L * 3600000000L, 1.0)) // single-point type seeds only
    val df = scala.util.Random.shuffle(ev)
      .toDF("event_type", "ts", "value").repartition(5)

    def replay(points: Seq[(Long, Long)]): (Double, Double, Array[Double]) = {
      val s = Array.fill(24)(0.0)
      var l = points.head._2.toDouble
      var b = 0.0
      points.tail.foreach { case (h, c) =>
        val i = (h % 24).toInt
        val x = c.toDouble
        val ln = 0.5 * (x - s(i)) + 0.5 * (l + b)
        val bn = 0.25 * (ln - l) + 0.75 * b
        s(i) = 0.25 * (x - ln) + 0.75 * s(i)
        l = ln; b = bn
      }
      (l, b, s)
    }
    val (l, b, s) = replay(hours.map { case (h, n) => (h, n.toLong) })
    val got = EventStreams.holtWinters(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    val nextSlot = ((49L + 1) % 24).toInt
    got("A") shouldBe ((5L, 49L, l, b, s(nextSlot), l + b + s(nextSlot)))
    // single point: l = count, b = 0, untouched zero season
    got("B") shouldBe ((1L, 7L, 1.0, 0.0, 0.0, 1.0))
  }

  "holtSmoothStream" should "carry (level, trend) state across micro-batches and match the batch fold" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.holtSmoothStream(stream.toDS())
      .writeStream.format("memory").queryName("holt_pts")
      .outputMode("update").start()
    try {
      stream.addData(
        EventStreams.Event(7L, ts("2024-01-01 10:00:00"), "click", 1.0),
        EventStreams.Event(7L, ts("2024-01-01 10:10:00"), "click", 2.0))
      q.processAllAvailable()
      stream.addData(
        EventStreams.Event(7L, ts("2024-01-01 10:20:00"), "click", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("holt_pts").orderBy(col("n_events").desc)
      .collect()(0)
    last.getAs[Long]("n_events") shouldBe 3L
    // the hand-computed recurrence (see the batch spec): l = 2.875,
    // b = 0.8125 — and identical to the batch operator on the same data
    last.getAs[Double]("holt_level") shouldBe 2.875
    last.getAs[Double]("holt_trend") shouldBe 0.8125
    val batch = EventStreams.holtSmooth(
      Seq((7L, 1L, 101L, 1.0), (7L, 2L, 102L, 2.0), (7L, 3L, 103L, 4.0))
        .toDF("user_id", "ts", "event_id", "value")).collect()(0)
    batch.getDouble(3) shouldBe last.getAs[Double]("holt_level")
    batch.getDouble(4) shouldBe last.getAs[Double]("holt_trend")
  }

  it should "out-track a plain EWMA on a linearly trending series" in {
    // x_t = 2t: Holt's forecast locks onto the trend (error → 0), the
    // EWMA lags a constant ~2 steps behind — the reason the operator
    // exists next to ewmaSmooth
    val ev = (1L to 40L).map(t => (3L, t, t, 2.0 * t))
      .toDF("user_id", "ts", "event_id", "value")
    val holt = EventStreams.holtSmooth(ev).collect()(0)
    val next = 2.0 * 41L
    math.abs(holt.getDouble(5) - next) should be < 0.1
    val ewma = EventStreams.ewmaSmooth(ev).collect()(0)
    math.abs(ewma.getDouble(3) - next) should be > 3.0
  }

  "positionAttribution" should "hand out exact 40/20/40 ppm credits with the remainder on the first middle" in {
    val h = 3600000000L
    var id = 0L
    def e(u: Long, tpe: String, ts: Long) = { id += 1; (id, u, tpe, ts) }
    val rows = Seq(
      // user 1: 5 touches at hours 1..5, purchase at hour 6 —
      // 400000 / 66668 (66666+rem 2) / 66666 / 66666 / 400000
      e(1, "click", 1 * h), e(1, "click", 2 * h), e(1, "click", 3 * h),
      e(1, "click", 4 * h), e(1, "click", 5 * h), e(1, "purchase", 6 * h),
      // user 2: single touch -> the full million
      e(2, "click", 2 * h), e(2, "purchase", 2 * h + 1000000L),
      // user 3: two touches -> 500000 each
      e(3, "click", 3 * h), e(3, "click", 3 * h + 1000000L),
      e(3, "purchase", 3 * h + 2000000L),
      // user 4: a touch AFTER the purchase and one beyond the lookback —
      // both excluded, the conversion credits nothing
      e(4, "purchase", 20 * h), e(4, "click", 20 * h + 1000000L),
      e(4, "click", 2 * h))
    val df = scala.util.Random.shuffle(rows)
      .toDF("event_id", "user_id", "event_type", "ts").repartition(5)
    val got = EventStreams.positionAttribution(df, lookbackUs = 6 * h)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got shouldBe Map(
      1L -> ((1L, 400000L)),
      2L -> ((2L, 1066668L)),
      3L -> ((3L, 1066666L)),
      4L -> ((1L, 66666L)),
      5L -> ((1L, 400000L)))
    got.values.map(_._2).sum shouldBe 3000000L // 10^6 per credited conversion
  }

  "transitionEntropy" should "report 1 for deterministic chains and less for mixed ones" in {
    def ev(u: Long, i: Int, t: String) =
      (i.toLong + u * 1000L, u * 10000000000L + i * 1000000L, u, t, 1.0)
    // every user strictly alternates a->b->a->b: knowing prev fully
    // determines next (H_cond = 0, predictability = 1) while the
    // marginal is a coin flip (H_next = 1 bit)
    val det = (1L to 5L).flatMap(u => (0 until 20).map(i =>
      ev(u, i, if (i % 2 == 0) "a" else "b")))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventStreams.transitionEntropy(det).collect()(0)
    r.getAs[Double]("h_next_bits") shouldBe 1.0 +- 0.01
    r.getAs[Double]("h_cond_bits") shouldBe 0.0 +- 1e-9
    r.getAs[Double]("predictability") shouldBe 1.0 +- 0.01
    // hash-scrambled next steps: prev resolves (almost) nothing
    val mixed = (1L to 5L).flatMap(u => (0 until 40).map(i =>
      ev(u, i, "t" + (math.abs(scala.util.hashing.MurmurHash3
        .stringHash(s"$u:$i")) % 2))))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = EventStreams.transitionEntropy(mixed).collect()(0)
    m.getAs[Double]("predictability") should be < 0.3
  }

  it should "fail fast when the (from,to) cell matrix exceeds maxCells" in {
    // one user walking 40 distinct types in sequence -> 39 distinct
    // (from,to) cells; a maxCells below that must census-abort BEFORE
    // the single-row entropy folds, and a roomier cap must pass
    val walk = (0 until 40).map(i =>
      (i.toLong, i * 1000000L, 1L, s"t$i", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ex = the[IllegalArgumentException] thrownBy
      EventStreams.transitionEntropy(walk, maxCells = 10L).collect()
    ex.getMessage should include("exceed maxCells=10")
    EventStreams.transitionEntropy(walk, maxCells = 64L)
      .collect()(0).getAs[Long]("n_transitions") shouldBe 39L
  }

  "holtWintersBacktest" should "score only past the warmup and prefer the learnable series" in {
    def series(f: Int => Int) = (0 until 240).flatMap(h =>
      (0 until f(h)).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    def bt(df: org.apache.spark.sql.DataFrame) =
      EventStreams.holtWintersBacktest(df).collect()(0)
    // clean 24-periodic signal vs the same base with a chaotic hash
    // overlay: the forecaster must track the first far better
    val periodic = bt(series(h => 10 + 5 * ((h % 24) / 12)))
    val noisy = bt(series(h =>
      10 + (math.abs(scala.util.hashing.MurmurHash3.stringHash(h.toString)) % 13)))
    periodic.getAs[Long]("n_eval") shouldBe 240L - 48L
    periodic.getAs[Double]("mae") should be < noisy.getAs[Double]("mae")
    periodic.getAs[Double]("mape") should be < 0.1
    // rmse (forecast_skill's U2 numerator): same ordering, and >= mae
    // by Jensen on every series
    periodic.getAs[Double]("rmse") should be < noisy.getAs[Double]("rmse")
    periodic.getAs[Double]("rmse") should be >= periodic.getAs[Double]("mae")
    // a series shorter than the warmup has nothing to score: stated NULLs
    val short = EventStreams.holtWintersBacktest(
      series(h => if (h < 24) 5 else 0)).collect()(0)
    short.getAs[Long]("n_eval") shouldBe 0L
    short.isNullAt(3) shouldBe true
  }

  it should "census-guard the per-group series length like holtWinters" in {
    // 100 observed hours in one group: a maxHours below the span must
    // abort BEFORE the collect_list fold; the default cap stays idle
    val wide = (0 until 100).map(h => ("g", h * 3600000000L))
      .toDF("event_type", "ts")
    val exB = the[IllegalArgumentException] thrownBy
      EventStreams.holtWintersBacktest(wide, maxHours = 50L)
    exB.getMessage should include("holtWintersBacktest: 100 observed")
    val exW = the[IllegalArgumentException] thrownBy
      EventStreams.holtWinters(wide, maxHours = 50L)
    exW.getMessage should include("holtWinters: 100 observed")
    EventStreams.holtWinters(wide).collect()(0)
      .getAs[Long]("n_points") shouldBe 100L
  }

  "sloHourlyStream" should "emit closed hours bit-equal to the batch hour rows" in {
    implicit val sqlCtx = spark.sqlContext
    def ev(t: Long, typ: String) =
      EventStreams.Event(1L, new Timestamp(t), typ, 1.0)
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.sloHourlyStream(stream.toDS(),
      budgetPpm = 100000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("slo_pts")
      .outputMode("append").start()
    try {
      // hour 0: 8 ok + 2 errors -> 200000 ppm, breached at a 100000
      // budget; hour 1: 4 ok, clean
      stream.addData((1 to 8).map(i => ev(i * 1000L, "ok")) ++
        Seq(ev(9000L, "error"), ev(9500L, "error")) ++
        (1 to 4).map(i => ev(3600000L + i * 1000L, "ok")): _*)
      q.processAllAvailable()
      // two watermark-advancing sentinels (watermark lags a batch)
      stream.addData(ev(2L * 3600000L + 1000L, "ok"))
      q.processAllAvailable()
      stream.addData(ev(3L * 3600000L + 1000L, "ok"))
      q.processAllAvailable()
      val rows = spark.sql(
        "select * from slo_pts order by hour_start").collect()
      rows.length should be >= 2
      val h0 = rows(0)
      h0.getAs[Long]("n_total") shouldBe 10L
      h0.getAs[Long]("n_errors") shouldBe 2L
      h0.getAs[Long]("error_ppm") shouldBe 200000L
      h0.getAs[Long]("breached") shouldBe 1L
      val h1 = rows(1)
      h1.getAs[Long]("n_total") shouldBe 4L
      h1.getAs[Long]("error_ppm") shouldBe 0L
      h1.getAs[Long]("breached") shouldBe 0L
    } finally q.stop()
  }

  "heavyHittersStream" should "hold the SpaceSaving guarantees against the exact census across batches" in {
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, i: Int) = EventStreams.Event(
      u, new java.sql.Timestamp(i * 1000L), "click", 1.0)
    // planted skew: three heavy users among 40 singletons; N = 220,
    // capacity 10 -> threshold N/k = 22: users 1 (100), 2 (50), 3 (30)
    // are GUARANTEED table members whatever the fold order
    val all = ((1 to 100).map(i => ev(1L, i)) ++
      (1 to 50).map(i => ev(2L, 200 + i)) ++
      (1 to 30).map(i => ev(3L, 300 + i)) ++
      (100L until 140L).map(u => ev(u, 400 + u.toInt)))
    val (b1, b2) = new scala.util.Random(7).shuffle(all).splitAt(110)
    val trueCounts = all.groupBy(_.user_id).view.mapValues(_.size.toLong)
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.heavyHittersStream(stream.toDS(), capacity = 10)
      .writeStream.format("memory").queryName("hh_pts")
      .outputMode("update").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hh_pts").collect()
    val lastN = rows.map(_.getAs[Long]("n_processed")).max
    lastN shouldBe 220L
    val table = rows.filter(_.getAs[Long]("n_processed") == lastN)
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_est"), r.getAs[Long]("err")))
    table.length should be <= 10
    val tracked = table.map(_._1).toSet
    Set(1L, 2L, 3L).subsetOf(tracked) shouldBe true
    // estimates never under-count, and est - err never over-counts
    table.foreach { case (u, est, err) =>
      val truth = trueCounts(u)
      withClue(s"user $u est=$est err=$err true=$truth: ") {
        est should be >= truth
        (est - err) should be <= truth
      }
    }
    // the three guaranteed heavies carry exact or near-exact counts
    table.filter(t => t._1 <= 3L).foreach { case (u, est, err) =>
      (est - err) should be <= trueCounts(u)
      est should be >= trueCounts(u)
    }
  }

  "holtWintersStream" should "fold only watermark-closed hours and match the batch operator exactly" in {
    implicit val sqlCtx = spark.sqlContext
    val hours = Seq(0L -> 3, 1L -> 1, 24L -> 2, 25L -> 4, 49L -> 2)
    // second offsets keep every event STRICTLY above any prior batch's
    // max event time: the watermark filter drops rows at ts <= watermark
    // (found building this spec — an event landing exactly on a previous
    // batch's max timestamp silently vanishes at delay 0)
    def ev(h: Long, sec: Long) = EventStreams.Event(
      1L, new java.sql.Timestamp(h * 3600000L + sec * 1000L), "A", 1.0)
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.holtWintersStream(
      stream.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("hw_pts")
      .outputMode("update").start()
    try {
      // hour 24's two events land SPLIT across the batches — the
      // watermark gate must keep the hour open and fold it exactly once
      // with both counts
      stream.addData(ev(0, 1), ev(0, 2), ev(0, 3), ev(1, 1), ev(24, 1))
      q.processAllAvailable()
      stream.addData(ev(24, 2), ev(25, 1), ev(25, 2), ev(25, 3), ev(25, 4),
        ev(49, 1), ev(49, 2))
      q.processAllAvailable()
      // two sentinel batches push the watermark past hour 49 (watermark
      // for batch N derives from batch N-1's max event time). These
      // batches carry NO 'A' rows, so the assertions below only pass
      // because holtWintersStream registers EventTimeTimeout — under
      // NoTimeout a key without fresh rows never gets a callback and
      // its open hours (25, 49 here) would never fold. The watermark
      // contract that bit this spec's first draft is the dual: rows at
      // ts <= watermark are silently DROPPED, hence the second-offset
      // staggering above.
      for (_ <- 1 to 2) {
        stream.addData(EventStreams.Event(
          9L, new java.sql.Timestamp(100L * 3600000L), "zz", 1.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    val last = spark.table("hw_pts")
      .filter(col("event_type") === "A")
      .orderBy(col("n_points").desc).collect()(0)
    last.getAs[Long]("n_points") shouldBe 5L
    last.getAs[Long]("last_hour") shouldBe 49L
    val batch = EventStreams.holtWinters(
      hours.flatMap { case (h, n) =>
        (0 until n).map(k => ("A", h * 3600000000L + k * 1000000L, 1.0))
      }.toDF("event_type", "ts", "value")).collect()(0)
    last.getAs[Double]("hw_level") shouldBe batch.getDouble(3)
    last.getAs[Double]("hw_trend") shouldBe batch.getDouble(4)
    last.getAs[Double]("hw_season_next") shouldBe batch.getDouble(5)
    last.getAs[Double]("forecast_next") shouldBe batch.getDouble(6)
  }

  "userBurstiness" should "separate metronomic, Poisson-like and bursty arrival patterns" in {
    // user 1: perfectly regular gaps (1000 µs) → σ = 0 → B = −1
    // user 2: gaps 1, 1, 1, 997 (one long silence then a burst) → B > 0
    // user 3: single event → no gaps → absent
    val ev = ((1L to 10L).map(i => (1L, i * 1000L, i)) ++
      Seq((2L, 0L, 101L), (2L, 1L, 102L), (2L, 2L, 103L),
        (2L, 3L, 104L), (2L, 1000L, 105L)) ++
      Seq((3L, 5L, 201L)))
      .toDF("user_id", "ts", "event_id")
    val got = EventStreams.userBurstiness(ev)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got.keySet shouldBe Set(1L, 2L)
    got(1L)._1 shouldBe 9L
    got(1L)._2 shouldBe 1000L
    got(1L)._3 shouldBe -1.0
    got(2L)._1 shouldBe 4L
    got(2L)._2 shouldBe 250L // (1+1+1+997) div 4
    got(2L)._3 should be > 0.3
  }

  "sessionize" should "sum session values identically under any partitioning" in {
    // total_value folds through decimal(18,3): exact decimal addition
    // is order-independent, so the per-session sum must be BIT-equal
    // across partition layouts (a raw double fold would drift with
    // within-partition accumulation order) — the property that lets
    // the suite oracle grade the column
    val many = (1 to 500).map { i =>
      (7L, ts("2024-01-01 10:00:00"), "click", i / 7.0)
    }.toDF("user_id", "ts", "event_type", "value")
    def total(df: org.apache.spark.sql.DataFrame): Double =
      EventStreams.sessionize(
        df.select(col("user_id"), col("ts"), col("event_type"), col("value"))
          .as[EventStreams.Event])
        .collect().map(_.total_value).sum
    total(many.repartition(1)) shouldBe total(many.repartition(13))
  }

  "sessionize" should "split a user's events on the inactivity gap" in {
    val typed = events.select(
      col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val sessions = EventStreams.sessionize(typed, gapMillis = 30 * 60 * 1000L)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    // user 7: 10:05+10:20 in one session, 11:10 (50 min later) a new one
    sessions.map(s => (s.user_id, s.n_events)) shouldBe
      Array((7L, 2L), (7L, 1L), (9L, 1L))
    sessions(0).total_value shouldBe 3.0
    sessions(0).session_end shouldBe ts("2024-01-01 10:20:00")
  }

  "eventPaths" should "mine ordered trigrams with exact occurrence and user tallies" in {
    // user 1: A B C B C → A>B>C, B>C>B, C>B>C; user 2: A B C → A>B>C;
    // user 3: A B → too short, contributes nothing
    val ev = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C"),
      (4L, 40L, 1L, "B"), (5L, 50L, 1L, "C"),
      (6L, 10L, 2L, "A"), (7L, 20L, 2L, "B"), (8L, 30L, 2L, "C"),
      (9L, 10L, 3L, "A"), (10L, 20L, 3L, "B")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventStreams.eventPaths(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // count-desc, ties pinned by path
    got shouldBe Array(
      ("A>B>C", 2L, 2L), ("B>C>B", 1L, 1L), ("C>B>C", 1L, 1L))
  }

  it should "honor n and topK" in {
    val ev = Seq(
      (1L, 10L, 1L, "A"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C"),
      (4L, 40L, 1L, "A"), (5L, 50L, 1L, "B")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventStreams.eventPaths(ev, n = 2, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // bigrams: A>B ×2, B>C, C>A; top-2 with the tie cut by path order
    got shouldBe Array(("A>B", 2L), ("B>C", 1L))
  }

  it should "keep paths whose event types contain the separator character" in {
    // 'X>Y' as a TYPE: the validity gate is the lag null-check, so the
    // path survives (a separator-count filter would wrongly drop it)
    val ev = Seq(
      (1L, 10L, 1L, "X>Y"), (2L, 20L, 1L, "B"), (3L, 30L, 1L, "C")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventStreams.eventPaths(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array(("X>Y>B>C", 1L, 1L))
  }

  "rollingActiveUsers" should "count exact sliding-window distinct users per occurring day" in {
    val day = 86400000000L
    // day 0: users 1,2; day 1: user 1 (twice — presence, not events);
    // day 5: user 3; day 9: user 1
    val ev = Seq(
      (0L * day + 5L, 1L), (0L * day + 9L, 2L),
      (1L * day + 1L, 1L), (1L * day + 2L, 1L),
      (5L * day + 3L, 3L),
      (9L * day + 7L, 1L)
    ).toDF("ts", "user_id")
    val got = EventStreams.rollingActiveUsers(ev, windowDays = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // window [d-2, d]: day0 {1,2}; day1 {1,2} (day0 spill); day5 {3};
    // day9 {1} — days 2-4, 6-8 never occur, so they are absent
    got shouldBe Map(
      0L -> ((2L, 2L)), 1L -> ((1L, 2L)), 5L -> ((1L, 1L)), 9L -> ((1L, 1L)))
  }

  "rollingActiveUsersHll" should "track the exact tier within HLL tolerance on every grid day" in {
    // 2000 users spread over 20 days with overlapping activity; the HLL
    // twin must agree with the exact tier on the day grid and active_1d
    // exactly, and on the windowed count within ~5·(1.04/√2^12) rel err
    val day = 86400000000L
    val ev = (1L to 6000L).map { i =>
      val u = (i * 2654435761L) % 2000L
      val d = (i * 40503L) % 20L
      (d * day + (i % 1000L), u)
    }.toDF("ts", "user_id")
    val exact = EventStreams.rollingActiveUsers(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hll = EventStreams.rollingActiveUsersHll(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    hll.keySet shouldBe exact.keySet
    exact.foreach { case (d, (a1, a7)) =>
      hll(d)._1 shouldBe a1 // active_1d stays exact
      math.abs(hll(d)._2 - a7).toDouble / a7 should be < 0.09
    }
  }

  "abTest" should "compute Welch's z from exact quantized moments with a deterministic arm split" in {
    // values chosen integral so quantization is lossless; arms are
    // md5-parity of user_id — read the split back from the result sizes
    val ev = (1L to 40L).map { u =>
      ("exp1", u, if (u % 2 == 0) 10.0 + (u % 5) else 10.0 + (u % 7))
    }.toDF("event_type", "user_id", "value")
    val row = graft.operators.Reports.abTest(ev, "event_type", "user_id", "value")
      .collect()
    row.length shouldBe 1
    val r = row(0)
    val (na, nb) = (r.getLong(1), r.getLong(2))
    na + nb shouldBe 40L
    na should be >= 2L
    nb should be >= 2L
    // driver-side replay over the SAME md5-parity assignment
    def bucket(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"42:$u".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val byArm = (1L to 40L).groupBy(bucket).view
      .mapValues(_.map(u => math.floor(
        (if (u % 2 == 0) 10.0 + (u % 5) else 10.0 + (u % 7)) * 1000.0)))
    def stats(xs: Iterable[Double]): (Long, Double, Double) = {
      val n = xs.size.toDouble
      val s = xs.sum
      val ss = xs.map(x => x * x).sum
      (xs.size.toLong, s / n, (ss - s * s / n) / (n - 1.0))
    }
    val (ea, ma, va) = stats(byArm(0L))
    val (eb, mb, vb) = stats(byArm(1L))
    na shouldBe ea
    nb shouldBe eb
    r.getDouble(3) shouldBe ma +- 1e-9
    r.getDouble(4) shouldBe mb +- 1e-9
    r.getDouble(7) shouldBe
      ((ma - mb) / math.sqrt(va / ea + vb / eb)) +- 1e-9
  }

  it should "drop groups lacking two units in either arm" in {
    val ev = Seq(("solo", 1L, 5.0), ("solo", 3L, 6.0)).toDF(
      "event_type", "user_id", "value")
    graft.operators.Reports.abTest(ev, "event_type", "user_id", "value")
      .count() shouldBe 0L
  }

  behavior of "markovAttribution"

  it should "credit the channel every conversion flows through and zero the dead end" in {
    // u1: a → purchase; u2: b → (no conversion). Removing a kills ALL
    // conversion; removing b changes nothing.
    val ev = Seq(
      (1L, 10L, 101L, "a"), (1L, 20L, 102L, "purchase"),
      (2L, 10L, 201L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.streaming.EventStreams.markovAttribution(ev)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    got("a") shouldBe ((0.5, 1.0, 1.0))
    got("b") shouldBe ((0.5, 0.0, 0.0))
  }

  it should "truncate journeys at the first conversion" in {
    // u3's post-purchase event "d" must not become a state or channel
    val ev = Seq(
      (3L, 10L, 301L, "c"), (3L, 20L, 302L, "purchase"),
      (3L, 30L, 303L, "d"),
      (4L, 10L, 401L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val rows = graft.streaming.EventStreams.markovAttribution(ev).collect()
    rows.map(_.getString(0)).toSet shouldBe Set("c")
    // one of two c-journeys converts: p = 0.5, and c carries all of it
    rows.head.getDouble(2) shouldBe 1.0 +- 1e-9
  }

  it should "split credit across serial channels in proportion to flow" in {
    // u5: a → b → purchase; u6: a → (null). Both a and b are necessary
    // for the one conversion ⇒ equal removal effects, 0.5 attribution
    val ev = Seq(
      (5L, 10L, 501L, "a"), (5L, 20L, 502L, "b"),
      (5L, 30L, 503L, "purchase"),
      (6L, 10L, 601L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.streaming.EventStreams.markovAttribution(ev)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    got("a") shouldBe 0.5 +- 1e-9
    got("b") shouldBe 0.5 +- 1e-9
  }
  "driftHourlyStream" should "close hours bit-equal to the batch report against the same reference" in {
    implicit val sqlCtx = spark.sqlContext
    // hour 7 skewed low, hour 8 skewed high; reference = global mix.
    // Base sits at hour 7, not epoch 0: the initial watermark IS 0, and
    // a first event exactly at it is dropped as late
    val base = 7L * 3600000L
    val evRows = (0 until 6).map(i =>
      (7L, new Timestamp(base + i * 600000L), "e", 10.0)) ++
      (0 until 6).map(i =>
        (7L, new Timestamp(base + 3600000L + i * 600000L), "e", 480.0))
    val batchDf = evRows
      .map { case (_, t0, _, v) => (t0.getTime * 1000L, v) }
      .toDF("ts", "value")
    val batch = graft.operators.Reports
      .driftHourly(batchDf, col("value"), width = 50L, nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // reference histogram exactly as the batch op derives it
    val ref = Array.fill(10)(0L)
    evRows.foreach { case (_, _, _, v) =>
      ref(math.min(math.max(v.toLong / 50L, 0L), 9L).toInt) += 1L
    }
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = EventStreams.driftHourlyStream(
        stream.toDS().toDF("user_id", "ts", "event_type", "value")
          .as[EventStreams.Event],
        refCounts = ref.toSeq, refTotal = ref.sum,
        width = 50L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("drift_hourly_out")
      .outputMode("append").start()
    try {
      stream.addData(evRows.take(6))
      q.processAllAvailable()
      stream.addData(evRows.drop(6))
      q.processAllAvailable()
      // watermark sentinels far past hour 8 close both hours
      stream.addData((0L, new Timestamp(base + 4 * 3600000L), "zz", 0.0))
      q.processAllAvailable()
      stream.addData((0L, new Timestamp(base + 5 * 3600000L), "zz", 0.0))
      q.processAllAvailable()
      val got = spark.table("drift_hourly_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(_._1 < 9L).toSet
      got shouldBe batch
    } finally q.stop()
  }

  it should "keep state at one fixed-width row per open hour" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = EventStreams.driftHourlyStream(
        stream.toDS().toDF("user_id", "ts", "event_type", "value")
          .as[EventStreams.Event],
        refCounts = Seq.fill(10)(1L), refTotal = 10L,
        width = 50L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("drift_state_out")
      .outputMode("append").start()
    try {
      // 100 events, all inside ONE hour -> exactly one state row
      stream.addData((0 until 100).map(i =>
        (i.toLong, new Timestamp(i * 1000L), "e", i.toDouble)))
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      st.map(_.numRowsTotal).sum shouldBe 1L
    } finally q.stop()
  }
}
