package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-pass descriptive-statistics kernel.
  *
  * The reference computes n/sum/min/max/mean/median/variance/stdev with one
  * MongoDB mapReduce job *per metric field* (sentinel
  * `processors/StatsProcessor.scala:76-165`, Chan/Welford pairwise-merge
  * variance in the reduce step). Spark's hash aggregate uses the same
  * partial/merge algebra internally, and we compute *all* metrics of a
  * request in one scan (`agg(m1 exprs ++ m2 exprs ...)`) — a structural win
  * at any scale: k metrics cost one shuffle, not k.
  *
  * Exactness: the reference's variance is the *population* variance
  * (`diff / n`, StatsProcessor.scala:150-152) and its median is the exact
  * sorted-middle (`:154-160`) — so `var_pop`/`stddev_pop`/`percentile(0.5)`,
  * never the sample variants or approximations.
  *
  * For oracle-comparable output (driver hash-compares against DuckDB) the
  * `exact*` variants below avoid float non-associativity entirely: sums are
  * taken over integers or fixed-point decimals (exact, order-independent),
  * and derived stats (mean/variance/stdev) are single IEEE-double
  * expressions over those exact sums — bit-identical in any engine.
  */
object Descriptive {

  /** n/sum/min/max/mean/median/var_pop/stdev for an integer-valued metric.
    * All sums are exact (bigint); mean/var/stdev are doubles derived from
    * exact sums, so they are reproducible bit-for-bit across engines.
    * var_pop = (n*Σx² − (Σx)²) / n² evaluated with exact integer numerator.
    */
  def exactIntStats(metric: Column, prefix: String): Seq[Column] = {
    val x = metric.cast("bigint")
    // Σx² in decimal so it can neither overflow bigint (ANSI throws) nor
    // lose bits in double; the n·Σx² − (Σx)² numerator stays exact in
    // decimal(38,0) and only the final ratio rounds to double.
    val xd = x.cast("decimal(18,0)")
    val n = count(x)
    val s = sum(x)
    val sq = sum(xd * xd)
    val nd = n.cast("decimal(38,0)")
    val numer = (sq * nd - s.cast("decimal(38,0)") * s.cast("decimal(38,0)"))
      .cast("double")
    val varPop = numer / (nd * nd).cast("double")
    Seq(
      n.as(s"${prefix}_n"),
      s.as(s"${prefix}_sum"),
      min(x).as(s"${prefix}_min"),
      max(x).as(s"${prefix}_max"),
      (s.cast("double") / n).as(s"${prefix}_mean"),
      percentile(x, lit(0.5)).as(s"${prefix}_median"),
      varPop.as(s"${prefix}_var_pop"),
      sqrt(varPop).as(s"${prefix}_stdev")
    )
  }

  /** Same for a fixed-point (price-like) metric: sums over DECIMAL are
    * exact and order-independent; final cast to double for a stable
    * cross-engine representation. `scale` must cover the data's true
    * decimal precision. */
  def exactDecimalStats(metric: Column, prefix: String, scale: Int = 2): Seq[Column] = {
    val d = metric.cast(s"decimal(18,$scale)")
    val n = count(d)
    val s = sum(d).cast("double")
    Seq(
      n.as(s"${prefix}_n"),
      s.as(s"${prefix}_sum"),
      min(d).cast("double").as(s"${prefix}_min"),
      max(d).cast("double").as(s"${prefix}_max"),
      (s / n).as(s"${prefix}_mean")
    )
  }

  /** The reference's full per-metric aggregate vocabulary (`AggrStat` enum,
    * sentinel models/package.scala:71-81) using Spark built-ins — the
    * idiomatic form when cross-engine bit-exactness is not required. */
  def sparkNativeStats(metric: Column, prefix: String): Seq[Column] = Seq(
    count(metric).as(s"${prefix}_n"),
    sum(metric).as(s"${prefix}_sum"),
    min(metric).as(s"${prefix}_min"),
    max(metric).as(s"${prefix}_max"),
    avg(metric).as(s"${prefix}_mean"),
    percentile(metric, lit(0.5)).as(s"${prefix}_median"),
    var_pop(metric).as(s"${prefix}_var_pop"),
    stddev_pop(metric).as(s"${prefix}_stdev")
  )

  /** Per-group ROBUST statistics for an integer-valued metric: nearest-rank
    * percentiles (p05/median/p95), winsorized mean (values clamped to
    * [p05, p95]), trimmed mean (values outside [p05, p95] dropped), and the
    * median absolute deviation — the outlier-resistant vocabulary a corpus
    * length/quality audit reads when means are whale-dominated (one 2 GB
    * document should not move the "typical doc" number).
    *
    * Determinism contract (hash-exact in any engine, the exactIntStats
    * discipline): percentiles are TYPE-1 / nearest-rank — the value at
    * sorted position ceil(p·n) computed with exact integer arithmetic
    * ((p·100·n + 99) div 100), never an interpolated quantile whose FP
    * blend engines disagree on. Ties in the sort don't matter: the k-th
    * order STATISTIC is tie-order-invariant even though row_number is not.
    * Winsorized/trimmed sums clamp/filter bigints (exact, order-free);
    * each mean is one IEEE division over exact sums. MAD re-ranks the
    * integer deviations |x − median|, nearest-rank again.
    *
    * Scale shape — the corpus is touched exactly ONCE, by a keyed count
    * into a (group, value) HISTOGRAM; every subsequent step (cumulative
    * ranks, percentile selection, winsorized/trimmed sums, the deviation
    * re-rank for MAD) runs over that compact frame, bounded by value
    * CARDINALITY, not row count. This matters because the group key is
    * typically low-cardinality (languages, sources): a per-ROW window
    * partitioned by 5 languages would serialize a 100 TB sort onto 5
    * tasks, while the histogram's windows order a few thousand distinct
    * values per group. Order statistics over a histogram are identical
    * to order statistics over rows (ties collapse into counts).
    */
  def robustGroupStats(df: DataFrame, groupCol: String, metric: Column): DataFrame = {
    val g = col(groupCol)
    // ceil(p% · n) with exact integer arithmetic; n < 2^50 keeps the
    // double product exact, and the bigint cast truncates (= floor here)
    def kAt(p: Int): Column =
      floor((lit(p) * col("n") + lit(99)) / lit(100)).cast("bigint")
    // the one corpus-scale pass: map-side-combined value histogram,
    // checkpointed because three consumers re-read it
    val hist = df.select(g, metric.cast("bigint").as("v"))
      .groupBy(g, col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val wOrd = Window.partitionBy(g).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(g)))
    // k-th order statistic = smallest value whose cumulative count
    // reaches k
    def atRank(p: Int): Column = min(when(col("cum") >= kAt(p), col("v")))
    val pcts = cum.groupBy(g).agg(
      max(col("n")).as("n"),
      atRank(5).as("p05"),
      atRank(50).as("median"),
      atRank(95).as("p95"))
    val joined = hist.join(pcts, Seq(groupCol))
    val main = joined.groupBy(g).agg(
      max(col("n")).as("n"),
      max(col("p05")).as("p05"),
      max(col("median")).as("median"),
      max(col("p95")).as("p95"),
      (sum(col("c") * greatest(least(col("v"), col("p95")), col("p05")))
        .cast("double") / max(col("n")).cast("double")).as("winsorized_mean"),
      (sum(when(col("v").between(col("p05"), col("p95")),
        col("c") * col("v"))).cast("double") /
        sum(when(col("v").between(col("p05"), col("p95")), col("c")))
          .cast("double")).as("trimmed_mean"))
    // MAD: histogram of |v − median| (distinct deviations merge), same
    // cumulative-rank selection
    val devHist = joined
      .select(g, col("n"), abs(col("v") - col("median")).as("ad"), col("c"))
      .groupBy(g, col("n"), col("ad")).agg(sum(col("c")).as("c"))
    val wDev = Window.partitionBy(g).orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = devHist
      .withColumn("cum", sum(col("c")).over(wDev))
      .groupBy(g)
      .agg(min(when(col("cum") >= kAt(50), col("ad"))).as("mad"))
    main.join(mad, Seq(groupCol))
  }

  /** Binned percentile-rank normalization: map every row's metric to
    * its corpus percentile via a FIXED-GRID histogram — the score-
    * calibration step before mixing quality signals from different
    * sources ("this doc is p92 for its metric" composes across metrics;
    * raw scores don't). The convention is the strictly-below rank:
    * pct_rank = (# rows in strictly lower bins) / n, deterministic at
    * bin granularity (rows sharing a bin share a rank — the documented
    * resolution trade of the binned tier; a finer grid is a knob, not a
    * redesign).
    *
    * Scale shape: pass 1 is one binned keyed count (map-side partials →
    * an ≤ nBins frame); the cumulative-below table comes from an
    * nBins×nBins self-join of that tiny frame (no window, no sort);
    * pass 2 joins each row's bin to the BROADCAST rank table — row-local
    * at any corpus size. Bins clamp at both ends (the [[graft.operators
    * .Reports.driftPsi]] convention). Integer counts are exact; the rank
    * is one IEEE division, 6-rounded.
    *
    * Fractional metrics: the grid is integer-stepped, so a metric in
    * [0, 1) (a score, a rate) must be quantized UP first or every row
    * silently lands in bin 0 — pass `quantScale` (the abTest
    * discipline: the metric is floored at `metric × quantScale` before
    * binning, e.g. quantScale = 10000, width = 100 spreads [0,1)
    * scores over 100 bins).
    *
    * @return input id + (bin, pct_rank) */
  def quantileNormalize(
      df: DataFrame,
      idCol: String,
      metric: Column,
      width: Long = 100L,
      nBins: Int = 100,
      quantScale: Long = 1L): DataFrame = {
    require(width > 0 && nBins > 0 && quantScale > 0,
      "need positive width, nBins and quantScale")
    // quantize BEFORE binning (floor(metric × scale)) — the old
    // cast-to-bigint-then-divide collapsed any sub-integer metric into
    // bin 0 with no warning
    val q = floor(metric * lit(quantScale.toDouble)).cast("long")
    val bin = greatest(
      least(floor(q / lit(width)).cast("bigint"),
        lit(nBins - 1L)),
      lit(0L))
    val binned = df.select(col(idCol), bin.as("bin"))
    val hist = binned.groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // below-join reads it twice + the total once
    val total = hist.agg(sum(col("c")).as("n"))
    // strictly-below cumulative via the tiny self-join (≤ nBins² cells)
    val below = hist.select(col("bin"))
      .join(hist.select(col("bin").as("__b2"), col("c").as("__c2")),
        col("__b2") < col("bin"), "left")
      .groupBy(col("bin"))
      .agg(coalesce(sum(col("__c2")), lit(0L)).as("below"))
    val ranks = below.crossJoin(broadcast(total))
      .select(col("bin"), col("below"),
        round(col("below").cast("double") / col("n").cast("double"), 6)
          .as("pct_rank"))
    binned.join(broadcast(ranks.select(col("bin"), col("pct_rank"))),
      Seq("bin"))
      .select(col(idCol), col("bin"), col("pct_rank"))
  }

  /** The 100 TB tier SURVEY §7.3 anticipates "behind a flag": exact
    * `percentile` is a sort-based aggregate and `count distinct` a full
    * shuffle — at scale swap in the sketch versions. Single pass, bounded
    * memory, tunable error. */
  def approxStats(metric: Column, prefix: String,
      accuracy: Int = 10000, rsd: Double = 0.05): Seq[Column] = Seq(
    count(metric).as(s"${prefix}_n"),
    approx_count_distinct(metric, rsd).as(s"${prefix}_approx_distinct"),
    avg(metric).as(s"${prefix}_mean"),
    percentile_approx(metric, lit(0.5), lit(accuracy)).as(s"${prefix}_median_approx"),
    stddev_pop(metric).as(s"${prefix}_stdev")
  )
}
