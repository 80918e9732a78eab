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
}
