package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained aggregates: the ETL pattern a 100 TB event
  * stream forces — you cannot re-aggregate history every hour, so the
  * persisted rollup absorbs each new delta with ONE pass over the DELTA
  * (aggregate it, union with the stored partials, merge on the group
  * keys) and never touches old raw events again.
  *
  * Correctness hinges on every stored measure being MERGEABLE, and the
  * merge being exactly the one-shot aggregate:
  *  - counts merge by sum; min/max by min/max;
  *  - value sums are stored as DECIMAL(28,6), not double — decimal
  *    addition is associative and order-blind, so `merge(agg(A), agg(B))
  *    == agg(A ∪ B)` BIT-FOR-BIT however the stream was sliced into
  *    deltas (double sums would drift with the slicing and the oracle
  *    compare would be flaky); the double view is one cast at read time;
  *  - non-mergeable measures (exact distinct users) are deliberately
  *    absent — that is what the mergeable HLL sketch tier
  *    ([[org.apache.spark.sql.graft.SketchAggregates]]) exists for.
  *
  * Storage piggybacks on [[Warehouse]]'s copy-on-write snapshots: the
  * merged frame is written as a NEW version before the pointer flips, so
  * a concurrent reader sees the previous rollup, never a half-merge, and
  * `readVersion` time-travels to any prior state.
  *
  * Reference surface: the reference precomputes per-run statistics
  * documents at ingest time and serves queries from them
  * (sentinel-core processors/RunsProcessor.scala:99-111 stores the run
  * record with its stats; processors/StatsProcessor.scala reads the
  * stored docs) — this generalizes that write-time materialization to
  * continuously MAINTAINED aggregates over an unbounded stream.
  */
object Rollups {

  /** Stored shape: (hour_id, event_type, n_events, sum_value_dec,
    * min_ts, max_ts). */
  val hourlySchema: StructType = StructType(Seq(
    StructField("hour_id", LongType),
    StructField("event_type", StringType),
    StructField("n_events", LongType),
    StructField("sum_value_dec", DecimalType(28, 6)),
    StructField("min_ts", LongType),
    StructField("max_ts", LongType)))

  /** Aggregate a delta of events (epoch-micros BIGINT `ts`) to hourly
    * mergeable partials. */
  def hourlyPartials(delta: DataFrame): DataFrame =
    delta
      .groupBy(expr("ts div 3600000000").as("hour_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).as("sum_value_dec"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))

  /** Merge stored partials with a delta's partials — the only shuffle is
    * keyed on (hour_id, event_type), and only the delta's hours churn. */
  private def merge(stored: DataFrame, deltaPartials: DataFrame): DataFrame =
    stored.unionByName(deltaPartials)
      .groupBy(col("hour_id"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value_dec")).cast("decimal(28,6)").as("sum_value_dec"),
        min(col("min_ts")).as("min_ts"),
        max(col("max_ts")).as("max_ts"))

  /** Absorb `delta` into the persisted rollup `name` and return the new
    * state. One aggregation of the delta + one keyed merge; the previous
    * state stays readable as the prior Warehouse version. `meta` (e.g.
    * the absorbing stream's batch id) commits in the SAME version flip as
    * the merged rollup. */
  def upsertHourly(wh: Warehouse, name: String, delta: DataFrame,
      meta: Map[String, String] = Map.empty): DataFrame = {
    wh.overwrite(name,
      merge(wh.readOr(name, hourlySchema), hourlyPartials(delta)), meta)
    wh.read(name)
  }

  /** The rollup in its reporting shape (double value sum). */
  def hourlyView(rollup: DataFrame): DataFrame =
    rollup.select(col("hour_id"), col("event_type"), col("n_events"),
      col("sum_value_dec").cast("double").as("sum_value"),
      col("min_ts"), col("max_ts"))

  /** Key under which [[hourlyStream]] commits its progress in the
    * rollup's Warehouse version metadata. */
  val BatchIdKey = "committedBatchId"

  /** Absorb a micro-batch EXACTLY ONCE: `foreachBatch` is an
    * at-least-once contract (a batch replays after a failure with the
    * SAME batchId), so absorption must be idempotent per batchId — the
    * last committed id rides in the same Warehouse version flip as the
    * merged rollup ([[Warehouse.overwrite]]'s meta), and a batchId at or
    * below it is skipped, never double-counted. Returns true when the
    * batch was absorbed, false when it was a replay. */
  def absorbBatch(wh: Warehouse, name: String, batchId: Long,
      batch: DataFrame): Boolean = {
    val committed = wh.commitMeta(name).get(BatchIdKey).map(_.toLong)
    if (committed.exists(batchId <= _)) false
    else {
      upsertHourly(wh, name, batch, Map(BatchIdKey -> batchId.toString))
      true
    }
  }

  /** Streaming twin: every micro-batch is a delta absorbed through the
    * SAME [[upsertHourly]] merge — `foreachBatch` with the
    * [[absorbBatch]] idempotence gate is exactly the incremental-ETL
    * contract (each batch ABSORBED once even when delivered twice; state
    * lives in the warehouse, not the state store), and because the
    * partials are mergeable decimals the stream's final rollup is
    * bit-identical to a one-shot batch aggregate of everything that
    * arrived, regardless of how the stream was micro-batched (parity and
    * replay-idempotence pinned in `RollupsSpec`). The returned query must
    * be stopped by the caller. */
  def hourlyStream(
      wh: Warehouse,
      name: String,
      deltas: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
    deltas.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbBatch(wh, name, batchId, batch): Unit
      }
      .start()
}
