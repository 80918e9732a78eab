package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The driver's events.parquet has carried two physical types for `ts`
  * across rounds — TIMESTAMP(NANOS) (surfaced as bigint nanos under
  * nanosAsLong) and timestamp[us] (surfaced as TIMESTAMP_NTZ). Every
  * ts-consuming query reads through SparkEntry's type-adaptive
  * normalization; this spec pins that BOTH shapes of the same logical
  * events produce identical results, so the next schema flip cannot
  * silently break the event family again (it cost 8 queries in the
  * round-7 driver run). */
class EventsSchemaSpec extends SparkSpec {
  import spark.implicits._

  // same logical events, µs precision: 4 day-groups of 64 events 97 s
  // apart — close enough for the ±10-min joins and 30-min session gaps
  // to engage, spread over enough days for the KMV day×day matrix
  private val rowsUs: Seq[(Long, Long, Long, String, Double, String)] =
    // 4 days × 3 hour-subgroups × 22 events 97 s apart: enough hourly
    // buckets (13 with the burst) for the 3σ anomaly rule to fire, close
    // spacing for the ±10-min joins and 30-min session gaps, multiple
    // days for the KMV day×day matrix
    (0L until 264L).map { i =>
      val us = 1700000000000000L + (i / 66) * 86400000000L +
        ((i % 66) / 22) * 3600000000L + (i % 22) * 97000000L
      (i, us, i % 2, Seq("view", "click", "purchase", "error")(
        (i % 4).toInt), i.toDouble / 7.0, s"""{"k":$i}""")
    } ++
      // one anomalous burst hour so window_anomalies has rows to flag
      (300L until 340L).map { i =>
        val us = 1700000000000000L + 10L * 3600000000L + (i % 40) * 1000000L
        (i, us, i % 2, "view", 1.0, s"""{"k":$i}""")
      }

  private lazy val (dirNanos, dirMicros) = {
    val a = Files.createTempDirectory("ev_nanos").toString
    val b = Files.createTempDirectory("ev_micros").toString
    val base = rowsUs
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    // the historical shape: TIMESTAMP(NANOS) surfaced as bigint nanos
    base.select(col("event_id"), expr("us * 1000").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$a/events.parquet")
    // the current shape: timestamp[us] surfaced as TIMESTAMP_NTZ
    base.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$b/events.parquet")
    (a, b)
  }

  private def rows(name: String, dir: String): Set[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSet

  for (q <- Seq("sessionize", "window_counts_hourly", "window_anomalies",
      "event_funnel", "asof_join", "range_join_events",
      "overlap_join_events", "kmv_overlap")) {
    q should "produce identical results from bigint-nanos and timestamp[us] events" in {
      val a = rows(q, dirNanos)
      withClue(s"$q: ") {
        a should not be empty
        rows(q, dirMicros) shouldBe a
      }
    }
  }
}
