package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exercises the real `readStream` → transform → `writeStream` path over
  * a parquet directory source (the MemoryStream test covers plan parity;
  * this covers the file-source + checkpoint machinery). */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  "streamWindowedCounts" should "tail a parquet directory and emit windowed aggregates" in {
    val in = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val out = Files.createTempDirectory("graft-stream-out").toString

    Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:20:00"), 7L, "click", 2.0, "{}"),
      (3L, ts("2024-01-01 11:10:00"), 9L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(in)

    val q = EventStreams.streamWindowedCounts(spark, in, ckpt, out)
    try {
      q.processAllAvailable()
    } finally q.stop()

    // append-mode windowed aggregates only emit when the watermark passes
    // the window end; with a bounded backlog the sink may still be empty —
    // feed a late batch far in the future to close the first windows
    Seq((4L, ts("2024-01-02 00:00:00"), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(in)
    val q2 = EventStreams.streamWindowedCounts(spark, in, ckpt, out)
    try {
      q2.processAllAvailable()
    } finally q2.stop()

    val result = spark.read.parquet(out)
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    result should contain(
      (ts("2024-01-01 10:00:00"), "click", 2L))
  }

  "streamIngest" should "tail an upload directory into the warehouse, exactly-once" in {
    import java.nio.file.{Files => JFiles, Paths}
    val in = Files.createTempDirectory("graft-ingest-in").toString
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val whRoot = Files.createTempDirectory("graft-ingest-wh").toString
    val wh = new graft.store.Warehouse(spark, whRoot)
    val ing = new graft.ingest.RunIngestor(wh,
      Map("maple" -> graft.pipelines.MaplePipeline),
      () => ts("2024-06-01 12:00:00"))
    def fixture(p: String): Array[Byte] =
      JFiles.readAllBytes(Paths.get(getClass.getResource(s"/fixtures/$p").toURI))

    JFiles.write(Paths.get(in, "a.json"),
      fixture("maple/maple_multi_sample_multi_rg.json"))
    val q = ing.streamIngest(in, ckpt, "maple", "avg")
    try q.processAllAvailable() finally q.stop()
    wh.read(graft.store.Warehouse.Runs).count() shouldBe 1
    wh.read(graft.store.Warehouse.samples("maple")).count() shouldBe 2

    // second batch: one duplicate of a processed file + one new upload —
    // the duplicate is a no-op (bulkIngest anti-join), the new one lands
    JFiles.write(Paths.get(in, "dup.json"),
      fixture("maple/maple_multi_sample_multi_rg.json"))
    JFiles.write(Paths.get(in, "b.json"),
      fixture("maple/maple_single_sample_single_rg.json"))
    val q2 = ing.streamIngest(in, ckpt, "maple", "avg")
    try q2.processAllAvailable() finally q2.stop()

    wh.read(graft.store.Warehouse.Runs).count() shouldBe 2
    graft.stats.StatsProcessor.globalRunStats(
      wh.read(graft.store.Warehouse.Runs)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))) shouldBe
      Array(("maple", 2L, 3L))
  }
}
