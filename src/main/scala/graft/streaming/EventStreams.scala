package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events table shape
  * (`event_id, ts, user_id, event_type, value, props`).
  *
  * The reference is batch-only (SURVEY §1.6: "reference has none"), so
  * this module is the forward-looking streaming surface a training-data
  * pipeline needs: the same transforms run identically on a bounded
  * DataFrame (tested that way) and on a `readStream` source — declare the
  * plan once, let the engine pick micro-batch execution.
  *
  * Scale notes: the windowed aggregate is a streaming state-store hash
  * agg keyed by (window, event_type) — partial aggregation applies
  * map-side; the watermark bounds state. Sessionization uses
  * `flatMapGroupsWithState` with event-time timeout so state is evicted
  * deterministically.
  */
object EventStreams {

  /** Event-time column, type-aware: a timestamp-typed `ts` passes
    * through; a BIGINT `ts` is interpreted as NANOS since epoch (the
    * repo's events parquet stores TIMESTAMP(NANOS) read back as bigint).
    * A plain `cast("timestamp")` would read a bigint as SECONDS — feeding
    * the parquet table directly then yields windows thousands of years
    * out — so the nanos→micros division is explicit here instead of a
    * trap left to every caller. An INT `ts` keeps the seconds cast: an
    * int cannot hold even three seconds of nanos, but int epoch-seconds
    * are valid until 2038. */
  private def eventTime(events: DataFrame, tsCol: String = "ts"): org.apache.spark.sql.Column =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: float division of epoch-nanos loses
        // precision past 2^53 (any modern timestamp)
        timestamp_micros(expr(s"$tsCol div 1000"))
      case _ => col(tsCol).cast("timestamp")
    }

  /** Tumbling-window per-type counts with a watermark. Works on both
    * batch and streaming frames. */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", eventTime(events))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("double")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Tumbling-window APPROXIMATE distinct users per type — the
    * [[org.apache.spark.sql.graft.HllCountAgg]] sketch running as a
    * streaming aggregate. Exact streaming distinct-count needs per-key
    * state proportional to the distinct set (or a second dedup stage);
    * the HLL buffer is a constant 4 KiB per (window, type) group in the
    * state store, merged register-max across micro-batches — unbounded
    * cardinality, bounded state, the same estimate a batch run over the
    * full window would produce (the aggregate is order-blind). Works on
    * both batch and streaming frames. */
  def windowedDistinctUsers(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", eventTime(events))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      // isNotNull guard: xxhash64(NULL) is the (non-null) seed, so an
      // unguarded compose would count null users as one phantom distinct
      .agg(org.apache.spark.sql.graft.SketchFunctions
        .hllCount(when(col("user_id").isNotNull, xxhash64(col("user_id"))))
        .as("approx_users"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("approx_users"))

  /** Per-window count-min sketch of the user stream
    * ([[org.apache.spark.sql.graft.CmsSketchAgg]] under a watermark):
    * each event-time window folds its user ids into one depth×width
    * counter block — the shuffle and the state store carry 32 KiB blocks
    * per window, never per-user counts — and the emitted sketch answers
    * "how often did user X appear in window W" for ANY user after the
    * fact via [[org.apache.spark.sql.graft.SketchFunctions.cmsEstimate]]
    * (overestimate-only). The streaming twin of the batch
    * `cms_heavy_hitters` pass, same merge laws, so batch parity is exact
    * (spec'd). */
  def windowedUserSketch(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    import graft.functions.{HashFunctions => H}
    events
      .withColumn("ts", eventTime(events))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"))
      // isNotNull guards: md5Bucket hashes a null id as the bare "seed:"
      // string (concat_ws drops nulls), so unguarded composition would
      // count null users under one phantom key; a null hash makes the
      // aggregate skip the row instead
      .agg(org.apache.spark.sql.graft.SketchFunctions.cmsSketch(
          when(col("user_id").isNotNull, H.md5Bucket(1L, col("user_id"))),
          when(col("user_id").isNotNull, H.md5Bucket(2L, col("user_id"))),
          depth, width).as("user_sketch"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_sketch"),
        col("n_events"))
  }

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class EwmaState(s: Double, n: Long, lastTs: Long)
  final case class EwmaPoint(user_id: Long, n_events: Long, last_ts: Timestamp, ewma: Double)
  final case class HoltState(l: Double, b: Double, n: Long, lastTs: Long)
  final case class HoltPoint(user_id: Long, n_events: Long, last_ts: Timestamp,
    holt_level: Double, holt_trend: Double, forecast: Double)
  final case class HwState(l: Double, b: Double, s: Seq[Double],
    nPoints: Long, lastHour: Long, pending: Map[Long, Long])
  final case class HwPoint(event_type: String, n_points: Long,
    last_hour: Long, hw_level: Double, hw_trend: Double,
    hw_season_next: Double, forecast_next: Double)
  final case class SsEntry(user: Long, n: Long, err: Long)
  final case class SsState(entries: Seq[SsEntry], processed: Long)
  final case class SsPoint(event_type: String, user_id: Long,
    n_est: Long, err: Long, n_processed: Long)
  final case class SessionState(start: Timestamp, last: Timestamp, nEvents: Long, totalValue: Double)
  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** Gap-based sessionization, BATCH path: a user's events belong to one
    * session until `gapMillis` of inactivity.
    *
    * This is the window-function formulation (lag → gap flag → running
    * sum → group), not custom state: every window is PARTITIONED by
    * user, the per-user sort is Spark's spillable external sort, and the
    * final rollup partial-aggregates map-side. The custom-state
    * alternative (`groupByKey` + `flatMapGroupsWithState`) materializes
    * and sorts each user's events in executor heap — one whale user (bot
    * traffic) OOMs a task; that pattern is kept for streams in
    * [[sessionizeStream]], where the watermark bounds state. */
  /** Per-key EWMA (α = 1/2) over the event-time-ordered value stream:
    * s₁ = x₁, sₜ = xₜ/2 + sₜ₋₁/2 — the smoothed per-user signal an
    * anomaly detector compares the raw value against. α is fixed at 1/2
    * deliberately: halving is EXACT in IEEE doubles, so every step is
    * one exact scale + one rounding-deterministic add and the whole
    * recursion replays bit-for-bit in any engine (a general α would
    * multiply by an inexact constant — still deterministic, but 1/2
    * makes the dyadic tail analyzable).
    *
    * EWMA is inherently recursive (no window formulation exists without
    * recursion), but geometric decay bounds how much history the
    * recursion can SEE: after `maxHistory` halvings an event's weight is
    * 2^-maxHistory — at the default 64, below one double-ulp of any
    * same-magnitude result. So the fold runs over the BOUNDED tail of
    * each key's series, selected by [[org.apache.spark.sql.graft
    * .LastKValuesAgg]]: a proper partial aggregate whose per-key state is
    * ≤ maxHistory 24-byte entries on every task and in the shuffle — a
    * 10⁸-event bot key costs the same buffer as a 10-event key (the
    * earlier `collect_list` formulation buffered the key's WHOLE history
    * in one non-spillable aggregation row). The truncation contract:
    * `ewma` is the exact fold over the last `maxHistory` events in
    * (ts, id) order, seeded by the suffix's first value — identical to
    * the full fold whenever the key has ≤ maxHistory events, and within
    * 2^-maxHistory · |range| of it otherwise. `n_events`/`last_ts` still
    * count the full series. `tsCol`/`idCol` must be numeric (epoch
    * micros in this package); rows with a NULL ts/id/value are skipped
    * by the suffix selector. Returns one row per key:
    * (key, n_events, last_ts, ewma). */
  def ewmaSmooth(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      idCol: String = "event_id",
      maxHistory: Int = 64): DataFrame = {
    require(maxHistory >= 1, "maxHistory must be positive")
    val packed = events.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        max(col(tsCol)).as("last_ts"),
        org.apache.spark.sql.graft.TopKFunctions.lastKValues(
          col(tsCol).cast("long"), col(idCol).cast("long"),
          col(valueCol).cast("double"), maxHistory).as("__xs"))
    packed.select(col(keyCol), col("n_events"), col("last_ts"),
      aggregate(col("__xs"), lit(null).cast("double"),
        (s, x) => when(s.isNull, x).otherwise(s * lit(0.5) + x * lit(0.5)))
        .as("ewma"))
  }

  /** Per-key Holt double-exponential smoothing (Holt 1957): EWMA's
    * trend-aware sibling — state (level, trend) with
    * `ℓₜ = α·xₜ + (1−α)(ℓₜ₋₁ + bₜ₋₁)`,
    * `bₜ = β·(ℓₜ − ℓₜ₋₁) + (1−β)·bₜ₋₁`, seeded ℓ₁ = x₁, b₁ = 0 — the
    * one-step forecast `ℓ + b` is what a drifting metric's alert
    * threshold should track (a plain EWMA lags a trending series
    * forever).
    *
    * Same bounded-fold contract as [[ewmaSmooth]]: the fold runs over
    * the last `maxHistory` events in (ts, id) order via the
    * [[org.apache.spark.sql.graft.LastKValuesAgg]] partial aggregate
    * (fixed per-key state at every scale), defined as WINDOWED Holt —
    * exact over the suffix by definition, identical to the full fold for
    * keys with ≤ maxHistory events. α = β = 1/2 default keeps every
    * scale step exact in IEEE (the [[ewmaSmooth]] dyadic argument). The
    * level recurrence is written once per field in the fold lambda (the
    * interpreted-HOF double-evaluation costs 2 flops per step, not a
    * loop-invariant recompute — the r9 audit trap needs per-element
    * whole-array work to bite). Replays in SQL as a recursive CTE —
    * NOT a `list_reduce` struct fold: DuckDB v1.0 mutates struct
    * accumulator fields sequentially (field 2's expression reads field
    * 1's NEW value), found building this oracle.
    *
    * @return (key, n_events, last_ts, holt_level, holt_trend, forecast)
    *         with forecast = level + trend */
  def holtSmooth(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      idCol: String = "event_id",
      alpha: Double = 0.5,
      beta: Double = 0.5,
      maxHistory: Int = 64): DataFrame = {
    require(maxHistory >= 1, "maxHistory must be positive")
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1,
      s"alpha/beta in (0,1]: $alpha, $beta")
    val packed = events.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        max(col(tsCol)).as("last_ts"),
        org.apache.spark.sql.graft.TopKFunctions.lastKValues(
          col(tsCol).cast("long"), col(idCol).cast("long"),
          col(valueCol).cast("double"), maxHistory).as("__xs"))
    val st = aggregate(col("__xs"),
      struct(lit(null).cast("double").as("l"),
        lit(null).cast("double").as("b")),
      (s, x) => {
        val l = s.getField("l")
        val b = s.getField("b")
        val ln = lit(alpha) * x + lit(1.0 - alpha) * (l + b)
        when(l.isNull, struct(x.as("l"), lit(0.0).as("b")))
          .otherwise(struct(ln.as("l"),
            (lit(beta) * (ln - l) + lit(1.0 - beta) * b).as("b")))
      })
    packed.select(col(keyCol), col("n_events"), col("last_ts"),
      st.getField("l").as("holt_level"),
      st.getField("b").as("holt_trend"),
      (st.getField("l") + st.getField("b")).as("forecast"))
  }

  /** Fail-fast census for single-row series folds (the theilSenTrend
    * guard discipline): asserts no group in `hourly` holds more than
    * `maxHours` points before a collect_list assembles the series onto
    * one row. One 1-row collect over the already-reduced hour frame. */
  private def censusSeriesLength(
      hourly: DataFrame, typeCol: String, maxHours: Long,
      op: String): Unit = {
    require(maxHours >= 1, s"maxHours must be >= 1: $maxHours")
    val widest = hourly.groupBy(col(typeCol))
      .agg(count(lit(1)).as("__nh"))
      .agg(max(col("__nh")).as("__w")).collect()(0)
    val span = if (widest.isNullAt(0)) 0L else widest.getLong(0)
    require(span <= maxHours,
      s"$op: $span observed hours in one group exceed " +
        s"maxHours=$maxHours — the fold assembles each group's full " +
        "series onto one row; widen the bucket, shorten the window, " +
        "or raise maxHours only if the series fits in one task")
  }

  /** Holt–Winters additive TRIPLE-exponential smoothing (Winters 1960)
    * per event type over the hourly count series — [[holtSmooth]] plus
    * a fixed `seasonLen`-slot additive seasonal state indexed by
    * hour-of-day (`slot = hour mod seasonLen`), so calendar gaps keep
    * their phase instead of shifting the season. Recurrence per point
    * (x = count at hour h, i = h mod m):
    * {{{
    *   l_t = α(x − s_i) + (1−α)(l + b)
    *   b_t = β(l_t − l)  + (1−β) b
    *   s_i = γ(x − l_t)  + (1−γ) s_i     (only slot i updates)
    * }}}
    * First point initializes (l = x, b = 0, s = zeros).
    *
    * Scale shape: the event-scale work is ONE keyed (type, hour) count;
    * the fold then runs per type on the calendar-bounded hour list
    * (8,760 points/year — the cusum/user_growth bound), assembled in
    * pinned sort_array order; seasonal state is a fixed array of m
    * doubles. Nothing here scales with event count after the first agg,
    * and the per-group series length is fail-fast census-guarded
    * (`maxHours`, the theilSenTrend discipline): a caller feeding
    * sub-hour buckets or a decade of history learns the single-row
    * fold cost up front instead of OOMing one task.
    *
    * Replay: a recursive-CTE oracle steps the same recurrence with the
    * l_t expression repeated VERBATIM inside b_t and s_i (the
    * [[holtSmooth]] discipline — struct fields evaluate on the PRE-step
    * state); the slot update replays as an indexed list_transform.
    * α/β/γ default to DYADIC rationals (0.5, 0.25, 0.25) so both α and
    * 1−α are exactly representable and the Scala-side `1.0 - alpha`
    * equals the SQL literal bit-for-bit — a 0.3/0.7 pair would round
    * the complement differently on the two sides (0.7's nearest double
    * sits a half-ulp from 1−0.3's exact value).
    *
    * @param events frame with `ts` already normalized to epoch-µs
    * @return per type: (event_type, n_points, last_hour, hw_level,
    *         hw_trend, hw_season_next, forecast_next) where the *_next
    *         columns read the (last_hour+1) mod m seasonal slot
    */
  def holtWinters(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      alpha: Double = 0.5,
      beta: Double = 0.25,
      gamma: Double = 0.25,
      seasonLen: Int = 24,
      maxHours: Long = 50000L): DataFrame = {
    require(seasonLen >= 1, s"seasonLen must be positive: $seasonLen")
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1 &&
      gamma > 0 && gamma <= 1, s"alpha/beta/gamma in (0,1]")
    val hourly = events
      .groupBy(col(typeCol), expr(s"$tsCol div 3600000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // length census + the packed fold share it
    censusSeriesLength(hourly, typeCol, maxHours, "holtWinters")
    val packed = hourly.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_points"),
        max(col("hour")).as("last_hour"),
        sort_array(collect_list(struct(col("hour"), col("cnt")))).as("__xs"))
    val m = seasonLen.toLong
    val st = aggregate(col("__xs"),
      struct(lit(null).cast("double").as("l"), lit(0.0).as("b"),
        array_repeat(lit(0.0), seasonLen).as("s")),
      (s0, x) => {
        val i = pmod(x.getField("hour"), lit(m)).cast("int")
        val v = x.getField("cnt").cast("double")
        val l = s0.getField("l")
        val b = s0.getField("b")
        val sArr = s0.getField("s")
        val sOld = element_at(sArr, i + 1)
        val lNew = lit(alpha) * (v - sOld) + lit(1.0 - alpha) * (l + b)
        val bNew = lit(beta) * (lNew - l) + lit(1.0 - beta) * b
        val sNewV = lit(gamma) * (v - lNew) + lit(1.0 - gamma) * sOld
        when(l.isNull, struct(v.as("l"), lit(0.0).as("b"), sArr.as("s")))
          .otherwise(struct(lNew.as("l"), bNew.as("b"),
            transform(sArr,
              (sv, idx) => when(idx === i, sNewV).otherwise(sv)).as("s")))
      })
    val nextSlot = (pmod(col("last_hour") + 1, lit(m)).cast("int") + 1)
    packed.select(col(typeCol), col("n_points"), col("last_hour"),
      st.getField("l").as("hw_level"),
      st.getField("b").as("hw_trend"),
      element_at(st.getField("s"), nextSlot).as("hw_season_next"),
      (st.getField("l") + st.getField("b") +
        element_at(st.getField("s"), nextSlot)).as("forecast_next"))
  }

  /** Rolling-origin BACKTEST of the [[holtWinters]] forecaster: replay
    * the same fold over the hourly series, but before absorbing each
    * point emit the one-step-ahead forecast l + b + s[phase] and
    * accumulate |err| and |err|/actual — MAE and MAPE per group, the
    * "should we trust this forecaster on this series" report a capacity
    * planner reads before wiring forecasts into autoscaling. Points
    * inside the `warmup` prefix (default two seasons) are folded but
    * not scored — zero-initialized seasonals make early forecasts
    * meaningless, the standard rolling-origin discipline (Tashman
    * 2000).
    *
    * Determinism: the fold is the EXACT [[holtWinters]] recursion
    * (dyadic α/β/γ so both engines' coefficient arithmetic is
    * bit-identical) with three accumulator fields riding the same
    * struct; error terms reference only PRE-step state, so the SQL
    * recursive CTE replays them verbatim. Scale shape: unchanged —
    * one corpus-scale keyed count, then a calendar-bounded per-group
    * fold behind the same `maxHours` length census as [[holtWinters]].
    * Hourly counts are ≥ 1 by construction, so MAPE's divisor
    * never vanishes.
    *
    * @return (event_type, n_points, n_eval, mae, mape, rmse), 6-rounded;
    *         NULL scores when nothing outlived the warmup. The rmse is
    *         the numerator Theil's U2 divides by
    *         [[graft.operators.Reports.forecastBaseline]]'s naive_rmse,
    *         as mae is MASE's numerator over naive_mae — the
    *         forecast_skill composite reads both. */
  def holtWintersBacktest(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      alpha: Double = 0.5,
      beta: Double = 0.25,
      gamma: Double = 0.25,
      seasonLen: Int = 24,
      warmup: Int = 48,
      maxHours: Long = 50000L): DataFrame = {
    require(seasonLen >= 1, s"seasonLen must be positive: $seasonLen")
    require(warmup >= 1, s"warmup must be >= 1: $warmup")
    val hourly = events
      .groupBy(col(typeCol), expr(s"$tsCol div 3600000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // length census + the packed fold share it
    censusSeriesLength(hourly, typeCol, maxHours, "holtWintersBacktest")
    val packed = hourly.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_points"),
        sort_array(collect_list(struct(col("hour"), col("cnt")))).as("__xs"))
    val m = seasonLen.toLong
    val st = aggregate(col("__xs"),
      struct(lit(null).cast("double").as("l"), lit(0.0).as("b"),
        array_repeat(lit(0.0), seasonLen).as("s"), lit(0L).as("np"),
        lit(0.0).as("sae"), lit(0L).as("ne"), lit(0.0).as("sape"),
        lit(0.0).as("sse")),
      (s0, x) => {
        val i = pmod(x.getField("hour"), lit(m)).cast("int")
        val v = x.getField("cnt").cast("double")
        val l = s0.getField("l")
        val b = s0.getField("b")
        val sArr = s0.getField("s")
        val sOld = element_at(sArr, i + 1)
        val lNew = lit(alpha) * (v - sOld) + lit(1.0 - alpha) * (l + b)
        val bNew = lit(beta) * (lNew - l) + lit(1.0 - beta) * b
        val sNewV = lit(gamma) * (v - lNew) + lit(1.0 - gamma) * sOld
        val doEval = s0.getField("np") >= warmup
        val err = abs(v - (l + b + sOld))
        val sae = when(doEval, s0.getField("sae") + err)
          .otherwise(s0.getField("sae"))
        val ne = when(doEval, s0.getField("ne") + 1L)
          .otherwise(s0.getField("ne"))
        val sape = when(doEval, s0.getField("sape") + err / v)
          .otherwise(s0.getField("sape"))
        val sse = when(doEval, s0.getField("sse") + err * err)
          .otherwise(s0.getField("sse"))
        val np = s0.getField("np") + lit(1L)
        when(l.isNull,
          struct(v.as("l"), lit(0.0).as("b"), sArr.as("s"), np.as("np"),
            s0.getField("sae").as("sae"), s0.getField("ne").as("ne"),
            s0.getField("sape").as("sape"), s0.getField("sse").as("sse")))
          .otherwise(struct(lNew.as("l"), bNew.as("b"),
            transform(sArr,
              (sv, idx) => when(idx === i, sNewV).otherwise(sv)).as("s"),
            np.as("np"), sae.as("sae"), ne.as("ne"), sape.as("sape"),
            sse.as("sse")))
      })
    packed.select(col(typeCol), col("n_points"),
      st.getField("ne").as("n_eval"),
      when(st.getField("ne") > 0,
        round(st.getField("sae") / st.getField("ne").cast("double"), 6))
        .as("mae"),
      when(st.getField("ne") > 0,
        round(st.getField("sape") / st.getField("ne").cast("double"), 6))
        .as("mape"),
      when(st.getField("ne") > 0,
        round(sqrt(st.getField("sse") / st.getField("ne").cast("double")),
          6)).as("rmse"))
  }

  /** Rolling 7-day (windowDays) distinct active users per day — the DAU/
    * WAU report, EXACT. A sliding-window COUNT DISTINCT cannot be
    * composed from per-day partials (distinct does not sum), and the
    * naive per-day re-scan of the event stream is windowDays full passes;
    * the scale shape here is the standard expand-then-count: reduce the
    * stream to distinct (day, user) presence rows FIRST (the only
    * event-scale shuffle, map-side partial distinct; output is
    * DAU-bounded, orders of magnitude below event count), fan each
    * presence row out to the ≤ windowDays grid days it covers (a bounded
    * row-local explode of the ALREADY-reduced frame), keep grid days
    * that actually occur, and count distinct users per grid day. Exact
    * at every scale; the windowDays× expansion of a DAU-bounded frame is
    * the price of exactness (an HLL-merge tier trades that for sketches
    * — [[graft.operators.Frequency]]'s mergeable HLL composes with the
    * same grid).
    *
    * @param tsCol epoch-micros BIGINT
    * @return (day, active_1d, active_7d) for each day with any activity */
  def rollingActiveUsers(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      windowDays: Int = 7,
      dayUs: Long = 86400000000L): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val presence = events
      .select(expr(s"$tsCol div $dayUs").as("day"), col(userCol).as("__u"))
      .distinct()
      .localCheckpoint(true) // 3 consumers: day grid, 1d counts, expansion
    val days = presence.select(col("day")).distinct()
    val daily = presence.groupBy(col("day"))
      .agg(count(lit(1)).as("active_1d"))
    val windowed = presence
      .select(explode(sequence(col("day"),
        col("day") + lit(windowDays - 1L))).as("day"), col("__u"))
      .join(days.hint("broadcast"), Seq("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__u")).as(s"active_${windowDays}d"))
    daily.join(windowed, Seq("day"))
  }

  /** Sketch tier of [[rollingActiveUsers]]: the same presence-reduce +
    * windowDays× grid expansion, but the per-grid-day distinct-user
    * count is a mergeable HLL ([[org.apache.spark.sql.graft
    * .HllCountAgg]], ~1.6% rel. error at the default precision 12)
    * instead of exact. This is the tier a dashboard runs at 100 TB: the
    * exact tier's `countDistinct` per grid day shuffles every distinct
    * (day, user) pair to the day's reducer and holds a user-cardinality
    * hash set there; the HLL partial-aggregates map-side, so the shuffle
    * carries one FIXED 2^precision-byte register state per (task, day)
    * and the reducer folds register maxima — cost per day is constant in
    * user count. `active_1d` stays exact (the presence frame is already
    * distinct — counting it adds nothing). Approximate and hash-order-
    * blind, so no single-SQL oracle replay: rows-only, with the
    * parity-vs-exact tolerance pinned in EventStreamsSpec.
    *
    * @param tsCol epoch-micros BIGINT
    * @return (day, active_1d, active_{windowDays}d_hll) for occurring days */
  def rollingActiveUsersHll(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      windowDays: Int = 7,
      dayUs: Long = 86400000000L,
      precision: Int = 12): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val presence = events
      .select(expr(s"$tsCol div $dayUs").as("day"), col(userCol).as("__u"))
      .distinct()
      .localCheckpoint(true) // 3 consumers: day grid, 1d counts, expansion
    val days = presence.select(col("day")).distinct()
    val daily = presence.groupBy(col("day"))
      .agg(count(lit(1)).as("active_1d"))
    val windowed = presence
      .select(explode(sequence(col("day"),
        col("day") + lit(windowDays - 1L))).as("day"), col("__u"))
      .join(days.hint("broadcast"), Seq("day"))
      .groupBy(col("day"))
      .agg(org.apache.spark.sql.graft.SketchFunctions
        // isNotNull guard: xxhash64(NULL) is the seed (non-null), so an
        // unguarded compose would count nulls where count_distinct won't
        .hllCount(when(col("__u").isNotNull, xxhash64(col("__u"))), precision)
        .as(s"active_${windowDays}d_hll"))
    daily.join(windowed, Seq("day"))
  }

  /** User-growth curve: per day, how many users appeared for the FIRST
    * time and the running total — the DAU-adjacent acquisition report
    * (cohort analysis' x-axis). Two exact keyed aggregates (per-user min
    * day — map-side partials over the event stream — then a per-day
    * count), then the running total via the two-pass BANDED prefix sum
    * ([[graft.operators.Curation.sampleToTokenBudget]]'s discipline, and
    * what keeps the suite's no-unpartitioned-Window audit absolute): days
    * band by `day div bandDays`, per-band totals collect to the driver
    * (≤ |days|/bandDays rows — bounded by calendar time, not corpus
    * size), and each band prefix-sums under a PARTITIONED window plus
    * its broadcast band offset. Identical result to the global running
    * sum, no single-partition stage anywhere.
    *
    * @param tsCol epoch-micros BIGINT
    * @return (day, n_new_users, n_total_users) */
  def userGrowth(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      dayUs: Long = 86400000000L,
      bandDays: Int = 128): DataFrame = {
    require(bandDays >= 1, s"bandDays must be positive: $bandDays")
    val spark = events.sparkSession
    import spark.implicits._
    val perDay = events
      .groupBy(col(userCol))
      .agg(min(expr(s"$tsCol div $dayUs")).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_new_users"))
      .withColumn("__band", expr(s"day div $bandDays"))
      .localCheckpoint(true)
    // pass 1: the shared guarded census (Banded owns the maxBands
    // fail-fast and the exclusive-offset scan)
    val (offRows, _) = graft.operators.Banded.bandCensus(
      perDay.select(col("__band"), col("n_new_users")),
      Seq.empty, "n_new_users")
    val offsets = offRows.map { case (_, b, off) => (b, off) }
    // pass 2: per-band running sum (partitioned window) + band offset
    perDay
      .join(broadcast(offsets.toDF("__band", "__offset")), Seq("__band"))
      .select(col("day"), col("n_new_users"),
        (sum(col("n_new_users")).over(
          Window.partitionBy(col("__band")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          + col("__offset")).as("n_total_users"))
  }

  /** Per-user event-PATH mining: the top-k most frequent ordered
    * event-type n-grams (default trigrams) across all users — the
    * higher-order companion to [[eventTransitions]]' first-order matrix
    * (a Markov matrix shows view→click; the path report shows
    * view→click→purchase vs view→click→error, which the matrix's
    * memorylessness cannot distinguish). Sequence mining's workhorse
    * query at the n-gram (contiguous) tier.
    *
    * Shape: n−1 lag columns over ONE user-partitioned window (one keyed
    * shuffle on user, spillable per-user sort — all lags share the same
    * window spec so Catalyst evaluates them in a single Window exec),
    * then ONE path-keyed aggregate carrying both the occurrence count
    * (map-side partials; path cardinality ≤ |types|ⁿ) and the exact
    * distinct-user count (Catalyst's two-phase distinct-agg rewrite —
    * still a single pass over the gram stream), and a global top-k that
    * plans as TakeOrderedAndProject — never a full sort. Ties pinned by
    * path.
    *
    * @param tsCol epoch-micros BIGINT; order pinned by (ts, event_id)
    * @return (path, n_occurrences, n_users) top-k by count desc */
  def eventPaths(
      events: DataFrame,
      n: Int = 3,
      topK: Int = 20,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    require(n >= 2, s"a path needs at least 2 steps: $n")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    // steps oldest→newest: lag(n−1) … lag(1), current
    val steps = ((n - 1) to 1 by -1)
      .map(i => lag(col(typeCol), i).over(byUser)) :+ col(typeCol)
    val grams = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      // validity = every LAG step is non-null (fewer than n−1 prior
      // events leaves the outer lags null). Filtering on the lag
      // columns directly — NOT on the separator count of the
      // concatenated path — keeps the gate correct when an event_type
      // itself contains the '>' separator (a separator-count filter
      // would drop those valid paths), and matches the SQL oracle's
      // lag null-checks exactly. All steps share one window spec, so
      // Catalyst still plans a single Window exec
      .withColumn("__valid", steps.init.map(_.isNotNull).reduce(_ && _))
      .withColumn("__path", concat_ws(">", steps: _*))
      .filter(col("__valid"))
      .select(col("__path").as("path"), col(userCol))
    grams.groupBy(col("path"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col(userCol)).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("path"))
      .limit(topK)
  }

  /** Per-user event-type transition matrix (first-order Markov): pair
    * every event with its user's NEXT event via one user-partitioned lag
    * window (the spillable per-user sort [[sessionize]] uses), count
    * (from, to) pairs, and normalize per from-state ON THE MATRIX frame
    * — |types|² rows, so the probability window never touches the event
    * stream. The session-flow / funnel-discovery staple.
    *
    * @param tsCol epoch-micros BIGINT; order pinned by (ts, event_id)
    * @return (from_type, to_type, n_transitions, p) */
  def eventTransitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val matrix = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(byUser))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val byFrom = Window.partitionBy(col("from_type"))
    matrix.select(col("from_type"), col("to_type"), col("n_transitions"),
      (col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(byFrom).cast("double")).as("p"))
  }

  /** Sequence predictability report: Shannon entropy of the next event
    * type, unconditional H(next) vs conditional on the previous step
    * H(next | prev), both in bits, over [[eventTransitions]]' exact
    * count matrix — predictability = 1 − H(next|prev)/H(next) is the
    * share of next-step uncertainty the previous step already resolves
    * (≈ 0: the funnel is memoryless noise; → 1: journeys are
    * near-deterministic and a Markov attribution / next-step cache is
    * worth wiring).
    *
    * Exactness: all cell/marginal counts integral (type-vocab-bounded
    * frames); each entropy is a SINGLE pinned-order fold over its cell
    * list — H(next|prev) = Σ c/N·log₂(cf/c) folded in (from, to) order,
    * H(next) = Σ ct/N·log₂(N/ct) in to-order (the mutualInformation
    * sorted-fold discipline), one 6-round each. The fold collects the
    * FULL cell matrix into one row, so the cell count is fail-fast
    * census-guarded (`maxCells`, the [[graft.operators.Reports]]
    * mutualInformation discipline): a caller feeding a high-cardinality
    * type column learns the cost up front instead of OOMing one task.
    *
    * @return one row: (n_transitions, n_states, h_next_bits,
    *         h_cond_bits, predictability) */
  def transitionEntropy(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id",
      maxCells: Long = 1L << 20): DataFrame = {
    require(maxCells > 0, s"maxCells must be positive: $maxCells")
    val cells = eventTransitions(events, userCol, tsCol, typeCol, idCol)
      .select(col("from_type"), col("to_type"), col("n_transitions"))
      .localCheckpoint(true) // census + marginals + both folds share it
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"transitionEntropy: $nCells (from,to) cells exceed " +
        s"maxCells=$maxCells — the entropy folds collect the full " +
        "transition matrix onto one row; bucket the type vocabulary " +
        "or raise maxCells only if the cells fit in one task")
    val fromTot = cells.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).as("__cf"))
    val toTot = cells.groupBy(col("to_type"))
      .agg(sum(col("n_transitions")).as("__ct"))
    val grand = broadcast(cells.agg(
      sum(col("n_transitions")).as("__n"),
      countDistinct(col("to_type")).as("n_states")))
    val lg2 = math.log(2.0)
    val condTerms = cells.join(fromTot, Seq("from_type")).crossJoin(grand)
      .select(col("from_type"), col("to_type"),
        (col("n_transitions").cast("double") / col("__n").cast("double") *
          (log(col("__cf").cast("double") /
            col("n_transitions").cast("double")) / lit(lg2))).as("__term"))
    val hCond = condTerms
      .agg(aggregate(
        sort_array(collect_list(struct(col("from_type"), col("to_type"),
          col("__term")))),
        lit(0.0), (acc, x) => acc + x("__term")).as("h_cond_bits"))
    val nextTerms = toTot.crossJoin(grand)
      .select(col("to_type"),
        (col("__ct").cast("double") / col("__n").cast("double") *
          (log(col("__n").cast("double") / col("__ct").cast("double")) /
            lit(lg2))).as("__term"))
    val hNext = nextTerms
      .agg(aggregate(
        sort_array(collect_list(struct(col("to_type"), col("__term")))),
        lit(0.0), (acc, x) => acc + x("__term")).as("h_next_bits"))
    grand.crossJoin(broadcast(hNext)).crossJoin(broadcast(hCond))
      .select(col("__n").as("n_transitions"), col("n_states"),
        round(col("h_next_bits"), 6).as("h_next_bits"),
        round(col("h_cond_bits"), 6).as("h_cond_bits"),
        when(col("h_next_bits") > 0.0,
          round(lit(1.0) - col("h_cond_bits") / col("h_next_bits"), 6))
          .as("predictability"))
  }

  /** Per-user inter-arrival burstiness (Goh & Barabási 2008): B =
    * (σ−μ)/(σ+μ) over the user's event gaps — the behavioral signature
    * that separates Poisson-like humans (B ≈ 0), metronomic bots
    * (B → −1, gaps more regular than chance) and bursty scripted replays
    * (B → 1). The bot-detection companion to [[sessionize]], from the
    * same user-time ordering.
    *
    * Shape + exactness: gaps come from ONE user-partitioned lag window
    * (the [[sessionize]] spillable per-user sort); per-user moments are
    * one keyed agg — n and Σg exact BIGINTs, Σg² as the exact
    * DECIMAL(19,0)² product (µs gaps square past 2⁶³); μ, the sample σ
    * and B are one pinned IEEE expression per user row. Users need ≥ 2
    * gaps (sample variance).
    *
    * @param tsCol epoch-micros BIGINT; order pinned by (ts, event_id)
    * @return (user_id, n_gaps, mean_gap_us = exact floored µs,
    *         burstiness 6-rounded) */
  def userBurstiness(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gaps = events
      .select(col(userCol), col(tsCol), col(idCol))
      .withColumn("__g", col(tsCol) - lag(col(tsCol), 1).over(byUser))
      .filter(col("__g").isNotNull)
    val m = gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g")).as("__sg"),
        sum(col("__g").cast("decimal(19,0)") *
          col("__g").cast("decimal(19,0)")).as("__sgg"))
      .filter(col("n_gaps") >= 2)
    val nD = col("n_gaps").cast("double")
    val mean = col("__sg").cast("double") / nD
    val sd = sqrt((col("__sgg").cast("double") -
      col("__sg").cast("double") * col("__sg").cast("double") / nD) /
      (nD - 1.0))
    // mean_gap ships as an exact integer division: round(µs-scale
    // doubles, 6) is not portable (Spark's BigDecimal rounding and
    // DuckDB's scaled-multiply disagree in the last bits at 1e10);
    // burstiness is O(1) so its 6-rounding is safe
    m.select(col(userCol), col("n_gaps"),
      expr("__sg div n_gaps").as("mean_gap_us"),
      round((sd - mean) / (sd + mean), 6).as("burstiness"))
  }

  /** Batch sessionization: lag/gap-flag/cumsum windows partitioned by
    * user. `total_value` folds each value through `decimal(18,3)` and
    * casts the decimal sum back to double — exact decimal addition is
    * order-independent, so the sum is reproducible across partitionings
    * and engines (the `window_counts_hourly` decimal discipline; a raw
    * double fold would depend on within-session accumulation order). */
  def sessionize(
      events: Dataset[Event],
      gapMillis: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val prev = lag(col("ts"), 1).over(byUser)
    val newSession = when(
      prev.isNull ||
        unix_micros(col("ts")) - unix_micros(prev) > gapMillis * 1000L,
      1L).otherwise(0L)
    events.toDF()
      .withColumn("__new_s", newSession)
      .withColumn("__sid", sum(col("__new_s")).over(cum))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,3)")).cast("double")
          .as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .as[Session]
  }

  /** Streaming-correct sessionization: state survives across
    * micro-batches and sessions close via EVENT-TIME TIMEOUT — a user's
    * session is emitted when the watermark passes their last activity
    * plus the gap, so state is bounded and eviction is deterministic.
    * (The batch [[sessionize]] closes everything at the end instead.)
    * Scale: `StressScale`'s `sessionize_stream_2m` row drives 2M events
    * through 12 watermark-ordered micro-batches and reports max state
    * rows from the engine's own progress metrics — one open session per
    * recently-active user (20k), not per user ever seen. */
  def sessionizeStream(
      events: Dataset[Event],
      gapMillis: Long = 30 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start, s.last, s.nEvents, s.totalValue))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val out = Seq.newBuilder[Session]
            var cur: Option[SessionState] = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.last.getTime <= gapMillis =>
                  cur = Some(s.copy(last = e.ts, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  out += Session(userId, s.start, s.last, s.nEvents, s.totalValue)
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + gapMillis)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming twin of [[graft.operators.Reports.sloBurn]]'s per-hour
    * core: hourly (total, errors, error_ppm, breached) rows emitted as
    * the WATERMARK closes each hour — the live breach ticker feeding
    * the same ppm budget the batch report reads over trailing
    * multi-windows (the stream answers "did THIS hour blow the
    * budget" the moment the hour is complete; the batch answers "how
    * fast are the trailing windows burning"). Pure windowed streaming
    * aggregation (Append + watermark): state is one open hour-window
    * row per hour in flight, eviction deterministic at watermark
    * passage; error_ppm is the exact integer div of exact counts, so a
    * closed row equals the batch hour row bit-for-bit (parity spec).
    */
  def sloHourlyStream(
      events: Dataset[Event],
      errorType: String = "error",
      budgetPpm: Long = 1000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(budgetPpm > 0, s"budgetPpm must be positive: $budgetPpm")
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("event_type") === errorType, 1L).otherwise(0L))
          .as("n_errors"))
      .select(col("window.start").as("hour_start"),
        col("n_total"), col("n_errors"),
        expr("(n_errors * 1000000L) div n_total").as("error_ppm"))
      .withColumn("breached",
        when(col("error_ppm") > budgetPpm, 1L).otherwise(0L))
  }

  /** One closed hour of [[driftHourlyStream]]. */
  final case class DriftRow(hour_id: Long, n_events: Long, jsd_bits: Double)

  // not `private`: the state encoder's generated code needs public
  // constructor/accessor access
  final case class DriftState(counts: Array[Long], n: Long)

  /** Streaming twin of [[graft.operators.Reports.driftHourly]]: each
    * hour's value histogram is scored by Jensen–Shannon divergence
    * against a BROADCAST reference distribution the moment the
    * WATERMARK closes the hour — the live "did traffic change shape
    * this hour" monitor, against the same reference the batch report
    * scores (production wiring: train the reference once on the
    * corpus, stream against it).
    *
    * State per open hour is ONE fixed-width bin-count array (nBins
    * longs) — no growth with event volume, eviction deterministic at
    * watermark passage via EventTimeTimeout. The JSD fold runs
    * ascending-bin with EXACTLY the batch operator's add-one smoothing,
    * ln(2) literal, IEEE order and HALF_UP 6-rounding, so a closed
    * hour row equals the batch hour row bit-for-bit whenever the
    * reference matches (parity spec). Scale:
    * `StressScale`'s `drift_stream_2m` row drives 2M events through the
    * ordered file source and reports max state rows. */
  def driftHourlyStream(
      events: Dataset[Event],
      refCounts: Seq[Long],
      refTotal: Long,
      width: Long = 100L,
      hourUs: Long = 3600000000L,
      watermarkDelay: String = "10 minutes"): Dataset[DriftRow] = {
    require(width > 0 && refCounts.nonEmpty, "need width and a reference")
    require(refCounts.forall(_ >= 0) && refTotal >= 0, "negative reference")
    import events.sparkSession.implicits._
    val nBins = refCounts.size
    val lg2 = math.log(2.0)
    def jsd(counts: Array[Long], n: Long): Double = {
      var acc = 0.0
      var i = 0
      while (i < nBins) {
        val pa = (counts(i).toDouble + 1.0) / (n.toDouble + nBins.toDouble)
        val pb = (refCounts(i).toDouble + 1.0) /
          (refTotal.toDouble + nBins.toDouble)
        val m = (pa + pb) / 2.0
        acc += (pa * (math.log(pa / m) / lg2) +
          pb * (math.log(pb / m) / lg2)) / 2.0
        i += 1
      }
      java.math.BigDecimal.valueOf(acc)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => Math.floorDiv(e.ts.getTime * 1000L, hourUs))
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (hourId: Long, it: Iterator[Event], state: GroupState[DriftState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(DriftRow(hourId, s.n, jsd(s.counts, s.n)))
          } else {
            val s = state.getOption
              .getOrElse(DriftState(Array.fill(nBins)(0L), 0L))
            var n = s.n
            it.foreach { e =>
              // mirror the batch op exactly: value CASTS to bigint
              // (truncation) before the floor-div binning
              val b = math.max(0L,
                math.min(Math.floorDiv(e.value.toLong, width),
                  nBins - 1L)).toInt
              s.counts(b) += 1L
              n += 1L
            }
            state.update(DriftState(s.counts, n))
            // close when the watermark passes the hour's end
            state.setTimeoutTimestamp((hourId + 1L) * (hourUs / 1000L))
            Iterator.empty
          }
      }
  }

  /** Streaming twin of [[ewmaSmooth]]: per-user EWMA state carried
    * across micro-batches with `mapGroupsWithState`, each batch emitting
    * the user's updated smoothed point (Update output mode). Events
    * WITHIN a batch fold in event-time order; cross-batch order is
    * arrival order — the same trade [[dedupStream]] documents, and
    * exactly the batch result whenever the stream delivers in order
    * (parity pinned in `EventStreamsSpec`). State is three fixed-width
    * fields per user — no growth with history, the shape that holds at
    * any stream length. */
  def ewmaSmoothStream(events: Dataset[Event]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaPoint](GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[EwmaState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(EwmaState(0.0, 0L, Long.MinValue))
          sorted.foreach { e =>
            st =
              if (st.n == 0L) EwmaState(e.value, 1L, e.ts.getTime)
              else EwmaState(st.s * 0.5 + e.value * 0.5, st.n + 1L,
                math.max(st.lastTs, e.ts.getTime))
          }
          state.update(st)
          EwmaPoint(uid, st.n, new Timestamp(st.lastTs), st.s)
      }
  }

  /** Streaming twin of [[holtSmooth]]: per-user (level, trend) state
    * carried across micro-batches via `mapGroupsWithState` — the same
    * fixed-size-per-key discipline as [[ewmaSmoothStream]], stepping the
    * Holt recurrence per event in (event-time) order within each batch.
    * Matches the batch operator exactly for keys whose history fits
    * `maxHistory` there (the parity spec's contract); the stream never
    * truncates — its state IS the recurrence, two doubles per key. */
  def holtSmoothStream(
      events: Dataset[Event],
      alpha: Double = 0.5,
      beta: Double = 0.5): Dataset[HoltPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[HoltState, HoltPoint](GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[HoltState]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(HoltState(0.0, 0.0, 0L, Long.MinValue))
          sorted.foreach { e =>
            st =
              if (st.n == 0L) HoltState(e.value, 0.0, 1L, e.ts.getTime)
              else {
                val ln = alpha * e.value + (1.0 - alpha) * (st.l + st.b)
                HoltState(ln, beta * (ln - st.l) + (1.0 - beta) * st.b,
                  st.n + 1L, math.max(st.lastTs, e.ts.getTime))
              }
          }
          state.update(st)
          HoltPoint(uid, st.n, new Timestamp(st.lastTs), st.l, st.b,
            st.l + st.b)
      }
  }

  /** Streaming twin of [[holtWinters]]: the recurrence consumes COMPLETE
    * hours, so the state carries open-hour partial counts alongside the
    * (level, trend, season) triple and an hour folds only once the
    * WATERMARK passes it — a micro-batch boundary that splits an hour
    * can therefore never double-fold or misorder it, and state is
    * bounded (one long per open hour, a fixed seasonLen-double array
    * otherwise). Matches the batch operator exactly once every hour has
    * closed: the same dyadic coefficients, the same fold order
    * (ascending closed hours), the same IEEE expression shapes.
    *
    * @return per micro-batch, the latest smoothed point per event type
    *         (n_points = 0 until the first hour closes) */
  def holtWintersStream(
      events: Dataset[Event],
      alpha: Double = 0.5,
      beta: Double = 0.25,
      gamma: Double = 0.25,
      seasonLen: Int = 24,
      watermarkDelay: String = "10 minutes"): Dataset[HwPoint] = {
    import events.sparkSession.implicits._
    require(seasonLen >= 1, s"seasonLen must be positive: $seasonLen")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      // EventTimeTimeout, not NoTimeout: a key with open hours but no
      // new rows must still get a callback when the watermark passes an
      // hour boundary, or the last hours would never fold
      .mapGroupsWithState[HwState, HwPoint](
        GroupStateTimeout.EventTimeTimeout()) {
        (tpe: String, it: Iterator[Event], state: GroupState[HwState]) =>
          val wmHour = state.getCurrentWatermarkMs() / 3600000L
          val st = state.getOption.getOrElse(
            HwState(0.0, 0.0, Seq.fill(seasonLen)(0.0), 0L, Long.MinValue,
              Map.empty))
          var pending = it.foldLeft(st.pending) { (m, e) =>
            val h = e.ts.getTime / 3600000L
            m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          var l = st.l
          var b = st.b
          var n = st.nPoints
          var lastH = st.lastHour
          val s = st.s.toArray
          // fold hours the watermark has passed, in ascending order —
          // identical arithmetic to the batch fold
          pending.keys.filter(_ < wmHour).toSeq.sorted.foreach { h =>
            val x = pending(h).toDouble
            val i = (h % seasonLen).toInt
            if (n == 0L) { l = x; b = 0.0 }
            else {
              val ln = alpha * (x - s(i)) + (1.0 - alpha) * (l + b)
              b = beta * (ln - l) + (1.0 - beta) * b
              s(i) = gamma * (x - ln) + (1.0 - gamma) * s(i)
              l = ln
            }
            n += 1L
            lastH = math.max(lastH, h)
            pending -= h
          }
          state.update(HwState(l, b, s.toSeq, n, lastH, pending))
          // wake this key when the watermark passes its earliest open
          // hour (min pending h >= wmHour, so the boundary is always
          // strictly ahead of the current watermark)
          if (pending.nonEmpty)
            state.setTimeoutTimestamp((pending.keys.min + 1L) * 3600000L)
          val nextSlot = if (lastH == Long.MinValue) 0
            else (((lastH + 1) % seasonLen) + seasonLen).toInt % seasonLen
          HwPoint(tpe, n, lastH, l, b, s(nextSlot), l + b + s(nextSlot))
      }
  }

  /** Streaming heavy hitters per event type — SpaceSaving (Metwally,
    * Agrawal & El Abbadi 2005) as a `flatMapGroupsWithState` twin of
    * the exact [[graft.operators.Joins.keyFrequency]] census: a
    * capacity-`k` summary of user_ids whose guarantees hold at ANY
    * stream length in O(k) state — every user with true count > N/k is
    * in the table, estimates never under-count, and `n_est − err ≤
    * true ≤ n_est`. The monitoring tier when the exact census's keyed
    * shuffle is too slow to re-run per micro-batch.
    *
    * Update rule per arriving event: increment a tracked user; insert
    * untracked users while under capacity; otherwise OVERWRITE the
    * minimum-count entry (deterministic victim: (n, user) ascending)
    * with count min+1 and error min. Within-batch fold order follows
    * the shuffle iterator — two runs may differ on sub-guarantee
    * entries (documented; the r11 verdict's determinism taxonomy:
    * guarantees, not bit-layout, are the contract here), which is why
    * this twin is spec-pinned on its GUARANTEES against the exact
    * census rather than oracle-replayed.
    *
    * Emits the full table per group per batch (Update mode — latest
    * wins downstream); no watermark: the summary is a running census.
    * Works identically on a batch Dataset (one giant "batch"). */
  def heavyHittersStream(
      events: Dataset[Event],
      capacity: Int = 10): Dataset[SsPoint] = {
    import events.sparkSession.implicits._
    require(capacity >= 1, s"capacity must be positive: $capacity")
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SsState, SsPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, it: Iterator[Event], state: GroupState[SsState]) =>
          val st = state.getOption.getOrElse(SsState(Seq.empty, 0L))
          val table = scala.collection.mutable.Map(
            st.entries.map(e => e.user -> (e.n, e.err)): _*)
          var processed = st.processed
          it.foreach { e =>
            processed += 1L
            table.get(e.user_id) match {
              case Some((n, err)) => table(e.user_id) = (n + 1L, err)
              case None if table.size < capacity =>
                table(e.user_id) = (1L, 0L)
              case None =>
                val (victim, (vn, _)) =
                  table.minBy { case (u, (n, _)) => (n, u) }
                table -= victim
                table(e.user_id) = (vn + 1L, vn)
            }
          }
          val entries = table.toSeq
            .map { case (u, (n, err)) => SsEntry(u, n, err) }
            .sortBy(e => (-e.n, e.user))
          state.update(SsState(entries, processed))
          entries.iterator.map(e =>
            SsPoint(tpe, e.user, e.n, e.err, processed))
      }
  }

  /** Streaming exact dedup: the arrival-time half of [[graft.operators
    * .Dedup.exact]] — drop rows whose content digest was already seen,
    * with a watermark bounding the dedup state (late duplicates beyond
    * the delay are accepted again; that is the documented trade of
    * streaming dedup). Works identically on batch frames.
    *
    * Streaming uses `dropDuplicatesWithinWatermark`, NOT
    * `dropDuplicates`: plain dropDuplicates only evicts state when the
    * event-time column is part of the dedup keys, so keying on the
    * digest alone would keep EVERY digest ever seen — state growth
    * linear in corpus size, the exact failure the 2M-row stress twin
    * measures (dedup_stream_2m state_rows ≈ the watermark horizon, not
    * the distinct count). Batch frames take the plain-dropDuplicates
    * branch (the within-watermark operator is streaming-only, and batch
    * has no state to bound). */
  def dedupStream(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val keyed = docs
      .withColumn("content_md5", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermarkDelay)
    if (docs.isStreaming) keyed.dropDuplicatesWithinWatermark("content_md5")
    else keyed.dropDuplicates("content_md5")
  }

  /** Streaming NEAR-dup admission — the streaming twin of
    * [[graft.operators.Dedup.incrementalFilter]]: each micro-batch of
    * incoming documents is admitted only when none of its MinHash-LSH
    * band keys collide with the static corpus's band set
    * ([[graft.operators.Dedup.bandKeys]] — the persisted "index" a
    * 100 TB corpus exposes so new data never forces a re-dedup).
    *
    * Shape: `foreachBatch`, deliberately. The signature aggregation is an
    * explode → partial-min groupBy — a batch plan — and foreachBatch is
    * Structured Streaming's sanctioned escape hatch for exactly this
    * stream/batch hybrid: every micro-batch gets the full Catalyst plan
    * (including AQE) against the static band frame, and only the
    * micro-batch's own rows ever shuffle. Band collision = LSH candidate,
    * so admission is conservative (any colliding band rejects the doc) —
    * the same pre-gate the batch incremental filter applies before exact
    * scoring. `sink` receives each micro-batch's admitted rows.
    *
    * Returns the started query; callers own its lifecycle. */
  def admissionStream(
      incoming: DataFrame,
      corpusBands: DataFrame,
      sink: (DataFrame, Long) => Unit,
      shingleN: Int = 5,
      k: Int = 16,
      bands: Int = 8,
      tier: graft.operators.Dedup.HashTier = graft.operators.Dedup.PortableMd5,
      textCol: String = "text",
      idCol: String = "doc_id"): org.apache.spark.sql.streaming.StreamingQuery =
    // CONTRACT: (shingleN, k, bands, tier) must equal the parameters the
    // corpus band index was built with — band keys hash the banding
    // definition, so differing parameters produce disjoint key spaces and
    // the gate would silently admit everything. The defaults here are
    // Dedup.bandKeys' defaults for exactly that reason (default-vs-default
    // is pinned by EventStreamsSpec).
    incoming.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val collided = graft.operators.Dedup
          .bandKeys(batch, textCol, idCol, shingleN, k, bands, tier)
          .join(corpusBands.select(col("band")), Seq("band"), "left_semi")
          .select(col("id").as(idCol))
          .distinct()
        sink(batch.join(collided, Seq(idCol), "left_anti"), batchId)
      }
      .start()

  /** [[admissionStream]] against a PERSISTED band index: the band frame
    * and — crucially — the banding parameters come from the
    * [[graft.store.AnnArtifacts]] tables, so the stream can never probe
    * with a different (shingleN, k, bands, tier) than the index was built
    * with (the disjoint-key-space trap the admissionStream contract
    * documents becomes structurally impossible). This is the production
    * wiring: the corpus trains its index once, the stream loads it. */
  def admissionStreamIndexed(
      incoming: DataFrame,
      wh: graft.store.Warehouse,
      indexName: String,
      sink: (DataFrame, Long) => Unit,
      textCol: String = "text",
      idCol: String = "doc_id"): org.apache.spark.sql.streaming.StreamingQuery = {
    val (bandFrame, meta) = graft.store.AnnArtifacts.loadBandIndex(wh, indexName)
    admissionStream(incoming, bandFrame, sink,
      meta.shingleN, meta.k, meta.bands, meta.tier, textCol, idCol)
  }

  /** Stream-stream interval join: every left event paired with the right
    * events at most `windowSeconds` away — the streaming counterpart of
    * [[graft.operators.Joins.rangeJoin]], and it uses the SAME bin-key
    * trick, for two reasons. First, legality: Structured Streaming
    * rejects stream-stream joins without an equality predicate; the bin
    * key (left = its bin, right exploded to the ≤2 bins its window
    * covers) provides one. Second, scale: the equi-key hash-partitions
    * the join state instead of comparing every buffered pair. Both sides
    * carry watermarks and the time-range condition lets the state store
    * evict a buffered row once the other side's watermark guarantees no
    * future match. Output: (l_id, l_ts, r_id, r_ts).
    *
    * Runs identically on bounded frames (batch parity is spec'd), where
    * the bin key keeps it an equi-join rather than BroadcastNestedLoop. */
  def intervalJoinStreams(
      left: DataFrame,
      right: DataFrame,
      windowSeconds: Long = 600L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val winUs = windowSeconds * 1000000L
    val binUs = 2 * winUs
    // same type-aware event time as the windowed ops: bigint ts = nanos
    val l = left.select(col("event_id").as("l_id"),
        eventTime(left).as("l_ts"))
      .withWatermark("l_ts", watermarkDelay)
      .withColumn("__lbin", expr(s"unix_micros(l_ts) div ${binUs}L"))
    val r = right.select(col("event_id").as("r_id"),
        eventTime(right).as("r_ts"))
      .withWatermark("r_ts", watermarkDelay)
      .withColumn("__rbin", explode(sequence(
        expr(s"(unix_micros(r_ts) - ${winUs}L) div ${binUs}L"),
        expr(s"(unix_micros(r_ts) + ${winUs}L) div ${binUs}L"))))
    l.join(r,
      col("__lbin") === col("__rbin") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("l_ts") <= col("r_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select("l_id", "l_ts", "r_id", "r_ts")
  }

  /** Streaming entry: tail a directory of event parquet and maintain the
    * windowed counts (the `readStream → transform → writeStream` shape). */
  def streamWindowedCounts(
      spark: SparkSession,
      inputDir: String,
      checkpointDir: String,
      outputDir: String,
      windowLength: String = "1 hour"): org.apache.spark.sql.streaming.StreamingQuery = {
    val events = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(inputDir)
    windowedCounts(events, windowLength)
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** The event-scale HALF of [[markovAttribution]] as an un-executed
    * plan: truncate each journey at its first conversion, derive
    * `(prev, next)` steps with user-partitioned windows, append the
    * synthetic `__start`/`__null` edges, and reduce to ONE row per
    * (from, to) transition with a keyed count. This is the only part of
    * the operator that touches the corpus — the value iteration runs on
    * the collected ≤ maxStates² table — so this IS the plan the PLANS.md
    * artifact must pin (the full operator plans as `LocalTableScan`
    * after the driver solve, which pins nothing). */
  def markovTransitionCensus(
      events: DataFrame,
      conversionType: String = "purchase",
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id",
      truncateLineage: Boolean = true): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val byUserAll = Window.partitionBy(col(userCol))
    val kept = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("crn",
        min(when(col(typeCol) === lit(conversionType), col("rn")))
          .over(byUserAll))
      .filter(col("crn").isNull || col("rn") <= col("crn"))
    val steppedBase = kept
      .withColumn("prev", lag(col(typeCol), 1).over(
        Window.partitionBy(col(userCol)).orderBy(col("rn"))))
      .withColumn("mrn", max(col("rn")).over(byUserAll))
    // eager truncation: three edge selects share the windows. The plan
    // artifact passes truncateLineage=false so the window half stays
    // visible instead of collapsing to Scan ExistingRDD.
    val stepped =
      if (truncateLineage) steppedBase.localCheckpoint(true) else steppedBase
    stepped.filter(col("prev").isNotNull)
      .select(col("prev").as("f"), col(typeCol).as("t"))
      .unionAll(stepped.filter(col("rn") === 1)
        .select(lit("__start").as("f"), col(typeCol).as("t")))
      .unionAll(stepped.filter(col("crn").isNull && col("rn") === col("mrn"))
        .select(col(typeCol).as("f"), lit("__null").as("t")))
      .groupBy(col("f"), col("t")).agg(count(lit(1)).as("n"))
  }

  /** Markov-chain removal-effect attribution (Anderl, Becker, Wangenheim
    * & Schumann 2014) — the data-driven alternative to
    * [[graft.operators.Joins]]' last-touch rule: model user journeys as
    * a first-order chain over channels with absorbing `conversion` and
    * `null` states, and credit each channel by how much the conversion
    * probability DROPS when that channel is removed (its transitions
    * redirected to null).
    *
    * Event-scale work: journeys truncate at the first conversion (one
    * user-ordered row_number + a per-user conditional min), transitions
    * are one lag window + a keyed count — the [[eventTransitions]]
    * machinery plus synthetic `__start`/`__null` edges. The chain itself
    * is state-space-bounded (≤ `maxStates`, require-guarded), so the
    * transition table collects to the driver (the PCA Jacobi contract:
    * corpus work distributed, d×d finish local) where `iters` rounds of
    * EXACT integer value iteration run in ppm arithmetic —
    * v'(s) = Σⱼ t(s→j)·v(j) div 1e6, v(conv) ≡ 1e6, v(removed) ≡ 0 —
    * replayable verbatim in SQL (the PageRank exact-ppm discipline).
    *
    * @param iters fixed iteration count — both engines run exactly
    *              `iters` rounds, converged or not, so results replay
    * @return (channel, p_conv, removal_effect, attribution) sorted by
    *         channel; attribution = removal effect normalized over
    *         channels from EXACT ppm integers */
  def markovAttribution(
      events: DataFrame,
      conversionType: String = "purchase",
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id",
      iters: Int = 24,
      maxStates: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    val spark = events.sparkSession
    import spark.implicits._
    val edges = markovTransitionCensus(events, conversionType, userCol,
      tsCol, typeCol, idCol)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    require(states.length <= maxStates,
      s"state space ${states.length} exceeds maxStates=$maxStates — " +
        "the chain is meant for bounded channel vocabularies")
    val outTot = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // ppm transition probs, floor division — exact and replayable
    val tppm = edges.map { case (f, t, n) => (f, t, n * 1000000L / outTot(f)) }
    val channels = edges.map(_._1).distinct.filter(_ != "__start").sorted
    def absorb(removed: Option[String]): Long = {
      var v = states.map(s =>
        s -> (if (s == conversionType) 1000000L else 0L)).toMap
      for (_ <- 0 until iters) {
        val sums = tppm.groupBy(_._1).view.mapValues(es =>
          es.map { case (_, t, p) => p * v(t) }.sum / 1000000L).toMap
        v = states.map { s =>
          s -> (if (s == conversionType) 1000000L
                else if (removed.contains(s)) 0L
                else sums.getOrElse(s, 0L))
        }.toMap
      }
      v("__start")
    }
    val p = absorb(None)
    val drops = channels.map(c => (c, p - absorb(Some(c))))
    val totalDrop = drops.map(_._2).sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ratio(num: Long, den: Long): Option[Double] =
      if (den == 0L) None else Some(r6(num.toDouble / den.toDouble))
    drops.toSeq.map { case (c, d) =>
      (c, r6(p.toDouble / 1000000.0), ratio(d, p), ratio(d, totalDrop))
    }.toDF("channel", "p_conv", "removal_effect", "attribution")
  }

  /** Position-based (U-shaped) multi-touch attribution — the rule-based
    * member between lastTouch (one winner) and [[markovAttribution]]
    * (model-based): each conversion's in-window touch path credits 40%
    * to the first touch, 40% to the last, and splits 20% across the
    * middles. Credits are EXACT ppm integers summing to 10⁶ per
    * conversion: n=1 → 10⁶; n=2 → 5·10⁵ each; n≥3 → 4·10⁵ / 4·10⁵ with
    * the middle share 2·10⁵ div (n−2) per middle and the truncation
    * remainder assigned to the FIRST middle (deterministic, documented
    * — no fractional credit leaks).
    *
    * Scale shape: one user-keyed equi-join pairs conversions with their
    * lookback-window touches (fan-out = touches within the window, the
    * same bound as the attribution family's as-of joins); position and
    * path length ride a conversion-partitioned window; the report is
    * one keyed integer agg by the touch's hour-of-day (the stand-in
    * channel on this schema). No doubles anywhere.
    *
    * @return per hour-of-day: (touch_hour, n_touches, credit_ppm) —
    *         Σ credit_ppm = 10⁶ × conversions with ≥1 in-window touch */
  def positionAttribution(
      events: DataFrame,
      conversionType: String = "purchase",
      touchType: String = "click",
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      typeCol: String = "event_type",
      lookbackUs: Long = 3600000000L): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive: $lookbackUs")
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(idCol).as("__pid"), col(userCol).as("__u"),
        col(tsCol).as("__pts"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(idCol).as("__cid"), col(userCol).as("__u"),
        col(tsCol).as("__cts"))
    val paired = conv.join(touch, Seq("__u"))
      .filter(col("__cts") <= col("__pts") &&
        col("__pts") - col("__cts") <= lookbackUs)
    val byConv = Window.partitionBy(col("__pid"))
      .orderBy(col("__cts"), col("__cid"))
    val scored = paired
      .withColumn("__pos", row_number().over(byConv))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__pid"))))
      .withColumn("__mid",
        when(col("__n") > 2, expr("200000L div (__n - 2)")).otherwise(0L))
      .withColumn("__rem",
        when(col("__n") > 2,
          lit(200000L) - col("__mid") * (col("__n") - 2)).otherwise(0L))
      .withColumn("credit_ppm",
        when(col("__n") === 1, lit(1000000L))
          .when(col("__n") === 2, lit(500000L))
          .when(col("__pos") === 1 || col("__pos") === col("__n"),
            lit(400000L))
          .otherwise(col("__mid") +
            when(col("__pos") === 2, col("__rem")).otherwise(0L)))
    scored
      .groupBy(expr("(__cts div 3600000000L) % 24").as("touch_hour"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_ppm")).as("credit_ppm"))
      .orderBy(col("touch_hour"))
  }
}
