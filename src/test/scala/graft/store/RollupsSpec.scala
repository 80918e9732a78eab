package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RollupsSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh = new Warehouse(spark,
    Files.createTempDirectory("rollups").toString)

  // (event_id, ts micros, event_type, value) — values chosen so a DOUBLE
  // sum would depend on fold order (1e15 beside many 0.1s) while the
  // decimal partials stay exact under any slicing
  private def events(ids: Range) = ids.map { i =>
    (i.toLong, i.toLong * 600L * 1000000L, if (i % 2 == 0) "click" else "view",
      if (i % 50 == 0) 1e15 else 0.1)
  }.toDF("event_id", "ts", "event_type", "value")

  "upsertHourly" should "equal the one-shot aggregate for ANY slicing of the stream" in {
    val all = events(0 until 300)
    def canon(df: org.apache.spark.sql.DataFrame) =
      Rollups.hourlyView(df).collect().map(_.toSeq).toSet

    val oneShot = Rollups.hourlyPartials(all)

    val wh2 = freshWh
    Rollups.upsertHourly(wh2, "r", all.filter(col("event_id") < 100))
    Rollups.upsertHourly(wh2, "r", all.filter(col("event_id") >= 100))
    canon(wh2.read("r")) shouldBe canon(oneShot)

    val wh5 = freshWh
    (0 until 5).foreach { i =>
      Rollups.upsertHourly(wh5, "r", all.filter(pmod(col("event_id"), lit(5)) === i))
    }
    canon(wh5.read("r")) shouldBe canon(oneShot)
    canon(wh5.read("r")) should not be empty
  }

  it should "only churn the delta's hours and keep prior state time-travelable" in {
    val wh = freshWh
    Rollups.upsertHourly(wh, "r", events(0 until 100))
    val v1 = Rollups.hourlyView(wh.read("r")).collect().map(_.toSeq).toSet
    Rollups.upsertHourly(wh, "r", events(100 until 200))
    // the previous snapshot is still readable (copy-on-write versioning)
    Rollups.hourlyView(wh.readVersion("r", wh.currentVersion("r") - 1))
      .collect().map(_.toSeq).toSet shouldBe v1
    // hours only in the first delta are untouched by the second merge
    val now = Rollups.hourlyView(wh.read("r"))
    now.filter(col("hour_id") === 0L).collect().map(_.toSeq).toSet shouldBe
      Rollups.hourlyView(Rollups.hourlyPartials(events(0 until 100)))
        .filter(col("hour_id") === 0L).collect().map(_.toSeq).toSet
  }

  it should "start from empty on first upsert" in {
    val wh = freshWh
    val r = Rollups.upsertHourly(wh, "fresh", events(0 until 10))
    r.count() should be > 0L
  }

  "hourlyStream" should "absorb micro-batches into the SAME state a one-shot batch produces" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val wh = freshWh
    val stream = MemoryStream[(Long, Long, String, Double)]
    val q = Rollups.hourlyStream(wh, "s",
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
    try {
      // three micro-batches slicing the same 300 events as the batch spec
      val all = (0 until 300).map { i =>
        (i.toLong, i.toLong * 600L * 1000000L,
          if (i % 2 == 0) "click" else "view",
          if (i % 50 == 0) 1e15 else 0.1)
      }
      all.grouped(120).foreach { g =>
        stream.addData(g)
        q.processAllAvailable()
      }
    } finally q.stop()
    val viaStream = Rollups.hourlyView(wh.read("s")).collect().map(_.toSeq).toSet
    val oneShot = Rollups.hourlyView(Rollups.hourlyPartials(events(0 until 300)))
      .collect().map(_.toSeq).toSet
    viaStream shouldBe oneShot
  }

  "absorbBatch" should "absorb a replayed micro-batch exactly once" in {
    // foreachBatch is at-least-once: after a failure the SAME batchId is
    // redelivered — absorption must be idempotent or every recovery
    // double-counts n_events/sum_value
    val wh = freshWh
    def state() = Rollups.hourlyView(wh.read("i")).collect().map(_.toSeq).toSet

    Rollups.absorbBatch(wh, "i", 0L, events(0 until 100)) shouldBe true
    val afterB0 = state()
    // replay of batch 0 (crash before the checkpoint advanced): skipped
    Rollups.absorbBatch(wh, "i", 0L, events(0 until 100)) shouldBe false
    state() shouldBe afterB0
    // the next batch is new work and lands
    Rollups.absorbBatch(wh, "i", 1L, events(100 until 200)) shouldBe true
    // ...and a late replay of an OLDER id is also skipped
    Rollups.absorbBatch(wh, "i", 1L, events(100 until 200)) shouldBe false
    Rollups.absorbBatch(wh, "i", 0L, events(0 until 100)) shouldBe false
    state() shouldBe Rollups.hourlyView(
      Rollups.hourlyPartials(events(0 until 200))).collect().map(_.toSeq).toSet
    // the committed id rode the same version flip as the data
    wh.commitMeta("i")(Rollups.BatchIdKey) shouldBe "1"
  }

  it should "recover the committed batchId from the LAST version after replay-then-new" in {
    val wh = freshWh
    Rollups.absorbBatch(wh, "j", 0L, events(0 until 50))
    Rollups.absorbBatch(wh, "j", 1L, events(50 until 100))
    Rollups.absorbBatch(wh, "j", 2L, events(100 until 150))
    wh.commitMeta("j")(Rollups.BatchIdKey) shouldBe "2"
    // prior versions keep THEIR committed ids (meta flips with the data)
    wh.currentVersion("j") shouldBe 2
  }
}
