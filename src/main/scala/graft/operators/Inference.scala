package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parametric inference and time-series identification — the round-14
  * tier completing the statistical battery: r13 shipped the
  * NONPARAMETRIC tests (Kruskal–Wallis, Brown–Forsythe, KS, Cliff's δ);
  * this file adds their parametric siblings (Welch t, one-way ANOVA F,
  * Bartlett, Cohen's d), the normality/uniformity gates that decide
  * WHICH of the two families applies (Jarque–Bera, Anderson–Darling),
  * the paired-gate and resampling tests (McNemar, hash-deterministic
  * permutation test), and the AR-identification set (Yule–Walker,
  * Durbin–Levinson PACF, Granger F, Hurst R/S).
  *
  * House rules as everywhere in this repo: the corpus-scale stream
  * collapses ONCE to a bounded frame (hourly counts, value counts, or
  * scalar moments) with map-side partial aggregation; every sum that
  * feeds a statistic accumulates EXACT (BIGINT/DECIMAL(38,0)); each
  * statistic is one PINNED IEEE expression from exactly-equal operands
  * so the DuckDB oracle replays it bit-for-bit; folds over per-group
  * rows run in sorted group order behind a census guard.
  */
object Inference {

  private val d = (c: Column) => c.cast("decimal(38,0)")

  /** The shared (group, hour, count) collapse: the ONLY corpus-scale
    * shuffle any of the hourly tests performs. */
  private def hourlyCounts(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      hourUs: Long): DataFrame =
    events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))

  /** Exact integer first/second moments of one sample: one row
    * (n, s, ss) with s = Σv, ss = Σv² in DECIMAL(38,0). */
  private def moments2(df: DataFrame, metric: Column): DataFrame =
    df.select(metric.cast("bigint").as("__v"))
      .agg(count(lit(1)).as("n"),
        sum(d(col("__v"))).as("s"),
        sum(d(col("__v")) * col("__v")).as("ss"))

  /** Sample variance from exact moments, as ONE pinned IEEE chain:
    * (ss − s²/n)/(n−1). Callers gate on n ≥ 2 themselves. */
  private def sampleVar(n: Column, s: Column, ss: Column): Column =
    (ss.cast("double") -
      (d(s) * s).cast("double") / n.cast("double")) /
      (n.cast("double") - lit(1.0))

  /** Welch's unequal-variance two-sample t test (Welch 1947; df by
    * Satterthwaite 1946) — the parametric sibling of [[Reports
    * .ksTwoSample]]/[[Reports.cliffsDelta]] on the same two frames:
    * "are the MEANS distinguishable", with no pooled-variance
    * assumption, so it stays valid when [[Reports.brownForsythe]]
    * rejects equal spreads.
    *
    * Exactness: each side collapses to ONE exact (n, Σv, Σv²) row
    * (map-side partials — the only corpus-scale work); means,
    * variances, t and the Welch–Satterthwaite df are one pinned IEEE
    * chain from those exact operands. NULL t/df when either n < 2 or
    * the variance sum is 0, stated.
    *
    * @return one row: (n_a, n_b, mean_a, mean_b, t_stat, df_welch),
    *         6-rounded */
  def welchTTest(a: DataFrame, b: DataFrame, metric: Column): DataFrame = {
    val ma = moments2(a, metric)
      .select(col("n").as("n_a"), col("s").as("__sa"), col("ss").as("__ssa"))
    val mb = moments2(b, metric)
      .select(col("n").as("n_b"), col("s").as("__sb"), col("ss").as("__ssb"))
    val meanA = col("__sa").cast("double") / col("n_a").cast("double")
    val meanB = col("__sb").cast("double") / col("n_b").cast("double")
    val varA = sampleVar(col("n_a"), col("__sa"), col("__ssa"))
    val varB = sampleVar(col("n_b"), col("__sb"), col("__ssb"))
    val va = varA / col("n_a").cast("double")
    val vb = varB / col("n_b").cast("double")
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && (va + vb) > 0.0
    ma.crossJoin(mb).select(
      col("n_a"), col("n_b"),
      round(meanA, 6).as("mean_a"), round(meanB, 6).as("mean_b"),
      when(ok, round((meanA - meanB) / sqrt(va + vb), 6)).as("t_stat"),
      when(ok, round((va + vb) * (va + vb) /
        (va * va / (col("n_a").cast("double") - lit(1.0)) +
          vb * vb / (col("n_b").cast("double") - lit(1.0))), 6))
        .as("df_welch"))
  }

  /** Cohen's d standardized mean difference with the Hedges' g
    * small-sample correction (Cohen 1988; Hedges 1981) — the parametric
    * effect size next to [[Reports.cliffsDelta]]'s ordinal one: HOW
    * MANY pooled standard deviations apart the two means are, the
    * number a power calculation ([[Reports]]' experiment sizing)
    * consumes directly.
    *
    * Exactness: the same one-exact-moment-row-per-side collapse as
    * [[welchTTest]]; pooled variance ((nA−1)s²A + (nB−1)s²B)/(nA+nB−2),
    * d, and g = d·(1 − 3/(4(nA+nB) − 9)) are one pinned IEEE chain.
    * NULL d/g when either n < 2 or the pooled variance is 0.
    *
    * @return one row: (n_a, n_b, mean_a, mean_b, cohens_d, hedges_g),
    *         6-rounded */
  def cohensD(a: DataFrame, b: DataFrame, metric: Column): DataFrame = {
    val ma = moments2(a, metric)
      .select(col("n").as("n_a"), col("s").as("__sa"), col("ss").as("__ssa"))
    val mb = moments2(b, metric)
      .select(col("n").as("n_b"), col("s").as("__sb"), col("ss").as("__ssb"))
    val meanA = col("__sa").cast("double") / col("n_a").cast("double")
    val meanB = col("__sb").cast("double") / col("n_b").cast("double")
    val varA = sampleVar(col("n_a"), col("__sa"), col("__ssa"))
    val varB = sampleVar(col("n_b"), col("__sb"), col("__ssb"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val pooled = ((nA - lit(1.0)) * varA + (nB - lit(1.0)) * varB) /
      (nA + nB - lit(2.0))
    val dd = (meanA - meanB) / sqrt(pooled)
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && pooled > 0.0
    ma.crossJoin(mb).select(
      col("n_a"), col("n_b"),
      round(meanA, 6).as("mean_a"), round(meanB, 6).as("mean_b"),
      when(ok, round(dd, 6)).as("cohens_d"),
      when(ok, round(dd * (lit(1.0) -
        lit(3.0) / (lit(4.0) * (nA + nB) - lit(9.0))), 6)).as("hedges_g"))
  }

  /** One-way analysis-of-variance F test (Fisher 1925) across groups
    * over hourly event counts — the parametric sibling of [[Reports
    * .kruskalWallis]] on the SAME frame (that one ranks, this one
    * assumes normal residuals and reads the raw counts), plus η² =
    * SSB/SST, the fraction of variance the grouping explains.
    *
    * Exactness: the stream collapses once to (group, hour, count);
    * per-group n/Σx/Σx² are exact BIGINT/DECIMAL; between/within sums
    * fold in PINNED group order with one double division per group
    * (the [[Reports.brownForsythe]] fold); F and η² are one IEEE
    * chain. NULL F/η² when within-spread is 0 or k < 2, stated.
    * Census guard: the fold collects one row per group.
    *
    * @return one row: (n_obs, n_groups, f_stat, eta_sq), 6-rounded */
  def anovaOneWay(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxGroups: Long = 4096L): DataFrame = {
    val groups = hourlyCounts(events, groupCol, tsCol, hourUs)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__x")).as("__sg"),
        sum(d(col("__x")) * col("__x")).as("__ssg"))
      .localCheckpoint(true) // census + the one-row F fold share it
    val nGroups = groups.count()
    require(nGroups <= maxGroups,
      s"anovaOneWay: $nGroups groups exceed maxGroups=$maxGroups — " +
        "the F fold collects one row per group; bucket the group column")
    val folded = groups
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__ng")).as("n_obs"),
        sum(col("__sg")).as("__s"),
        sum(col("__ssg")).as("__sstot"),
        sort_array(collect_list(struct(col("__g"), col("__ng"),
          col("__sg"), col("__ssg")))).as("__gs"))
      .withColumn("__gsum",
        aggregate(col("__gs"), lit(0.0), (acc, c) =>
          acc + (d(c.getField("__sg")) * c.getField("__sg"))
            .cast("double") / c.getField("__ng").cast("double")))
    val cf = (d(col("__s")) * col("__s")).cast("double") /
      col("n_obs").cast("double")
    val between = col("__gsum") - cf
    val within = col("__sstot").cast("double") - col("__gsum")
    val nD = col("n_obs").cast("double")
    val kD = col("n_groups").cast("double")
    val ok = col("n_groups") >= 2L && within > 0.0
    folded.select(col("n_obs"), col("n_groups"),
      when(ok, round((nD - kD) / (kD - lit(1.0)) * (between / within), 6))
        .as("f_stat"),
      when(ok, round(between / (between + within), 6)).as("eta_sq"))
  }

  /** Bartlett's test of equal variances (Bartlett 1937) across groups
    * over hourly event counts — the PARAMETRIC homoscedasticity gate
    * next to [[Reports.brownForsythe]]'s robust one: more powerful
    * when the counts are near-normal, famously fragile otherwise,
    * which is exactly why both ship (run Jarque–Bera first, then pick).
    *
    * Exactness: per-group n/Σx/Σx² exact; each group's ln s²ᵢ and the
    * 1/(nᵢ−1) correction accumulate in PINNED group order; the C
    * correction and the final statistic are one IEEE chain. Groups
    * with n < 2 are EXCLUDED from the test (stated in n_groups); NULL
    * statistic when any used variance is 0 or k < 2.
    *
    * @return one row: (n_obs, n_groups, bartlett_stat), 6-rounded */
  def bartlettVar(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxGroups: Long = 4096L): DataFrame = {
    val groups = hourlyCounts(events, groupCol, tsCol, hourUs)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__x")).as("__sg"),
        sum(d(col("__x")) * col("__x")).as("__ssg"))
      .filter(col("__ng") >= 2L)
      .localCheckpoint(true) // census + the one-row fold share it
    val nGroups = groups.count()
    require(nGroups <= maxGroups,
      s"bartlettVar: $nGroups groups exceed maxGroups=$maxGroups — " +
        "the fold collects one row per group; bucket the group column")
    val varOf = (c: Column) =>
      (c.getField("__ssg").cast("double") -
        (d(c.getField("__sg")) * c.getField("__sg")).cast("double") /
          c.getField("__ng").cast("double")) /
        (c.getField("__ng").cast("double") - lit(1.0))
    val folded = groups
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__ng")).as("n_obs"),
        sort_array(collect_list(struct(col("__g"), col("__ng"),
          col("__sg"), col("__ssg")))).as("__gs"))
      // pooled Σ(nᵢ−1)s²ᵢ, Σ(nᵢ−1)ln s²ᵢ, Σ1/(nᵢ−1), min s²ᵢ — one pass
      // each, all pinned ascending-group folds
      .withColumn("__sp_num",
        aggregate(col("__gs"), lit(0.0), (acc, c) =>
          acc + (c.getField("__ng").cast("double") - lit(1.0)) * varOf(c)))
      .withColumn("__sum_ln",
        aggregate(col("__gs"), lit(0.0), (acc, c) =>
          acc + (c.getField("__ng").cast("double") - lit(1.0)) *
            log(varOf(c))))
      .withColumn("__sum_inv",
        aggregate(col("__gs"), lit(0.0), (acc, c) =>
          acc + lit(1.0) / (c.getField("__ng").cast("double") - lit(1.0))))
      .withColumn("__min_var",
        aggregate(col("__gs"), lit(Double.MaxValue), (acc, c) =>
          least(acc, varOf(c))))
    val nD = col("n_obs").cast("double")
    val kD = col("n_groups").cast("double")
    val sp2 = col("__sp_num") / (nD - kD)
    val num = (nD - kD) * log(sp2) - col("__sum_ln")
    val corr = lit(1.0) +
      (col("__sum_inv") - lit(1.0) / (nD - kD)) / (lit(3.0) * (kD - lit(1.0)))
    folded.select(col("n_obs"), col("n_groups"),
      when(col("n_groups") >= 2L && col("__min_var") > 0.0,
        round(num / corr, 6)).as("bartlett_stat"))
  }

  /** Jarque–Bera normality test (Jarque & Bera 1980) per group over
    * hourly event counts: sample skewness, excess kurtosis, and
    * JB = n/6·(S² + K²/4) — the gate that decides whether the
    * parametric tests in this file apply to a series or the
    * [[Reports]] rank tests should run instead.
    *
    * Exactness: the stream collapses once to (group, hour, count);
    * Σx..Σx⁴ accumulate as exact DECIMAL(38,0); central moments expand
    * from the raw ones in ONE pinned IEEE chain per group (skew uses
    * m₃/(m₂·√m₂) — sqrt, not pow, so both engines round identically).
    * NULL statistics when m₂ = 0 or n < 2, stated.
    *
    * @return per group: (event_type, n_hours, skewness, ex_kurtosis,
    *         jb_stat), 6-rounded */
  def jarqueBera(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val g = hourlyCounts(events, groupCol, tsCol, hourUs)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_hours"),
        sum(d(col("__x"))).as("__s1"),
        sum(d(col("__x")) * col("__x")).as("__s2"),
        sum(d(col("__x")) * col("__x") * col("__x")).as("__s3"),
        sum(d(col("__x")) * col("__x") * col("__x") * col("__x")).as("__s4"))
    val nD = col("n_hours").cast("double")
    val mean = col("__s1").cast("double") / nD
    val m2 = col("__s2").cast("double") / nD - mean * mean
    val m3 = col("__s3").cast("double") / nD -
      lit(3.0) * mean * (col("__s2").cast("double") / nD) +
      lit(2.0) * mean * mean * mean
    val m4 = col("__s4").cast("double") / nD -
      lit(4.0) * mean * (col("__s3").cast("double") / nD) +
      lit(6.0) * mean * mean * (col("__s2").cast("double") / nD) -
      lit(3.0) * mean * mean * mean * mean
    val skew = m3 / (m2 * sqrt(m2))
    val exk = m4 / (m2 * m2) - lit(3.0)
    val ok = col("n_hours") >= 2L && m2 > 0.0
    g.select(col("__g").as(groupCol), col("n_hours"),
      when(ok, round(skew, 6)).as("skewness"),
      when(ok, round(exk, 6)).as("ex_kurtosis"),
      when(ok, round(nD / lit(6.0) *
        (skew * skew + exk * exk / lit(4.0)), 6)).as("jb_stat"))
      .orderBy(col(groupCol))
  }

  /** McNemar's paired test (McNemar 1947) on two boolean gates judged
    * over the SAME rows — "does gate B pass a different FRACTION than
    * gate A", from the discordant cells only. Completes the 2×2 family:
    * Cohen's κ (agreement beyond chance) and odds ratio (association)
    * already ship in [[Reports]]; this one tests marginal homogeneity,
    * the question a gate MIGRATION asks ("is the new quality rule
    * stricter?").
    *
    * Exactness: one conditional-count aggregate (exact longs); the
    * Edwards continuity-corrected χ² = (max(0, |b−c|−1))²/(b+c) keeps
    * an exact integer numerator, one IEEE division — the max(0, ·)
    * clamp is the standard Edwards form: without it, equal discordant
    * cells (|b−c| = 0) would report 1/(b+c) where the correction
    * should bottom out at exactly 0. NULL χ² when b+c = 0 (no
    * discordant pairs), stated.
    *
    * @return one row: (n, n10, n01, chi2_cc), 6-rounded */
  def mcnemar(df: DataFrame, gateA: Column, gateB: Column): DataFrame = {
    val t = df.agg(
      count(lit(1)).as("n"),
      sum(when(gateA && !gateB, 1L).otherwise(0L)).as("n10"),
      sum(when(!gateA && gateB, 1L).otherwise(0L)).as("n01"))
    val diff = greatest(abs(col("n10") - col("n01")) - lit(1L), lit(0L))
    t.select(col("n"), col("n10"), col("n01"),
      when(col("n10") + col("n01") > 0L,
        round((d(diff) * diff).cast("double") /
          (col("n10") + col("n01")).cast("double"), 6)).as("chi2_cc"))
  }

  /** Hash-deterministic two-sample permutation test (Fisher 1935's
    * exact-randomization idea, Monte-Carlo flavored): the observed
    * |mean A − mean B| against `reps` pseudo-random reassignments of
    * rows to sides, each assignment the PARITY of a seeded md5 over
    * (rep, key) — no RNG state, so any engine replays the identical
    * permutation set (the repo's seeded-sampling discipline). p =
    * (1 + #{r : |diff_r| ≥ |observed|}) / (kept + 1), the standard
    * add-one Monte-Carlo estimate (Phipson & Smyth 2010) over the
    * reps actually KEPT (a rep whose hash assignment empties one side
    * has no defined diff and is dropped from both numerator and
    * denominator — counting it as "not ≥ observed" would silently
    * bias p downward on tiny inputs).
    *
    * Scale shape: ONE pass over rows × reps (a sequence explode) into
    * a groupBy(rep) with map-side partials — the shuffle carries ~reps
    * rows per partition, never the corpus; the rep count is the
    * explicit, guarded CPU multiplier. The hash cost does NOT scale
    * with reps: rep r's side is BIT (r mod 128) of md5("seed:block:key")
    * with block = r div 128 — one md5 per key per 128 reps, the
    * 128-bit digest amortized across the rep fan-out (the explode
    * copies the precomputed hex; each rep row does one digit/bit
    * extract, not a fresh digest). Exactness: per-rep sums/counts
    * exact; each diff is one IEEE chain; the ≥ compare runs on
    * identically-constructed doubles both sides. When the OBSERVED
    * split leaves either side empty there is no statistic: obs_diff,
    * n_ge and p_value are NULL, stated; likewise n_ge/p_value when
    * reps_kept = 0 (no rep had both sides populated). Always exactly
    * one row.
    *
    * @return one row: (n, reps, reps_kept, obs_diff, n_ge, p_value),
    *         6-rounded */
  def permutationTest(
      df: DataFrame,
      metric: Column,
      keyCol: String,
      isA: Column,
      reps: Int = 64,
      seed: Long = 14L,
      maxReps: Int = 1024): DataFrame = {
    require(reps >= 1 && reps <= maxReps,
      s"permutationTest: reps=$reps outside [1, $maxReps] — reps " +
        "multiplies one full corpus scan; raise maxReps deliberately")
    val base = df.select(col(keyCol).cast("string").as("__k"),
      metric.cast("bigint").as("__v"), isA.as("__a"))
      .localCheckpoint(true) // observed row + rep explode share it
    val obs = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("__a"), 1L).otherwise(0L)).as("__na"),
      sum(when(col("__a"), d(col("__v"))).otherwise(d(lit(0L)))).as("__sa"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("__nb"),
      sum(when(!col("__a"), d(col("__v"))).otherwise(d(lit(0L)))).as("__sb"))
    val obsDiff = col("__sa").cast("double") / col("__na").cast("double") -
      col("__sb").cast("double") / col("__nb").cast("double")
    val obsValid = col("__na") > 0L && col("__nb") > 0L
    // rep-r side assignment: bit (r mod 128) of md5("seed:blk:key")
    // with blk = r div 128 — ONE digest per key per 128 reps (hex
    // digit (j div 4), bit (j mod 4) of that digit), computed BEFORE
    // the rep explode so the generator copies the hex instead of
    // re-hashing per rep. String-keyed md5 (not the murmur-based
    // hash()) so the oracle replays byte-identically — the bh_fdr
    // noise discipline.
    val nBlocks = (reps + 127) / 128
    val perRep = base
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("__blk"))
      .withColumn("__hex", md5(
        concat(lit(seed.toString), lit(":"), col("__blk").cast("string"),
          lit(":"), col("__k")).cast("binary")))
      .select(col("__v"), col("__blk"), col("__hex"),
        explode(sequence(lit(0),
          least(lit(127), lit(reps - 1) - col("__blk") * lit(128))))
          .as("__j"))
      .select((col("__blk") * lit(128) + col("__j")).cast("int").as("__r"),
        col("__v"),
        expr("(cast(conv(substring(__hex, (__j div 4) + 1, 1), 16, 10) " +
          "as bigint) >> (__j % 4)) & 1").as("__side"))
      .groupBy(col("__r"))
      .agg(
        sum(when(col("__side") === 0L, 1L).otherwise(0L)).as("__pna"),
        sum(when(col("__side") === 0L, d(col("__v")))
          .otherwise(d(lit(0L)))).as("__psa"),
        sum(when(col("__side") === 1L, 1L).otherwise(0L)).as("__pnb"),
        sum(when(col("__side") === 1L, d(col("__v")))
          .otherwise(d(lit(0L)))).as("__psb"))
    val repDiff = col("__psa").cast("double") / col("__pna").cast("double") -
      col("__psb").cast("double") / col("__pnb").cast("double")
    val obsRow = obs.select(col("n"), obsValid.as("__ok"),
      when(obsValid, round(obsDiff, 6)).as("obs_diff"),
      when(obsValid, abs(obsDiff)).as("__absobs"))
    // GLOBAL aggregate over the kept reps (one row even when every rep
    // was dropped — a groupBy on the obs keys would return an EMPTY
    // frame at reps_kept = 0 instead of the documented stated-NULL row,
    // e.g. on an n = 1 input where every assignment empties one side),
    // then one broadcast crossJoin back onto the observed row
    val kept = perRep
      .filter(col("__pna") > 0L && col("__pnb") > 0L)
      .crossJoin(broadcast(obsRow.select(col("__absobs"))))
      .agg(count(lit(1)).as("reps_kept"),
        sum(when(abs(repDiff) >= col("__absobs"), 1L).otherwise(0L))
          .as("__nge"))
    obsRow.crossJoin(broadcast(kept))
      .select(col("n"), lit(reps.toLong).as("reps"), col("reps_kept"),
        col("obs_diff"),
        when(col("__ok") && col("reps_kept") > 0L,
          coalesce(col("__nge"), lit(0L))).as("n_ge"),
        when(col("__ok") && col("reps_kept") > 0L,
          round((coalesce(col("__nge"), lit(0L)).cast("double") + lit(1.0)) /
            (col("reps_kept").cast("double") + lit(1.0)), 6)).as("p_value"))
  }

  /** Shared ACF machinery: per-group exact lag moments over the hourly
    * frame. Returns one row per group with the global exact moments
    * (n, Σx, Σx²) and, for each lag 1..maxLag, the pair moments
    * (n_l, Σxₜxₜ₊ₗ, Σxₜ, Σxₜ₊ₗ) from an equi-join on hour+lag (gap
    * hours simply contribute no pair — the [[Reports]] ljung-box
    * convention). One join, lag extracted as a column. */
  private def acfMoments(
      events: DataFrame,
      groupCol: String,
      tsCol: String,
      hourUs: Long,
      maxLag: Int): DataFrame = {
    val spark = events.sparkSession
    val h = hourlyCounts(events, groupCol, tsCol, hourUs)
      .localCheckpoint(true) // totals + the lag-pair join share it
    val tot = h.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_hours"),
        sum(d(col("__x"))).as("__sx"),
        sum(d(col("__x")) * col("__x")).as("__sxx"))
    // lag pairs via a true EQUI-join on (group, hour + l) — the
    // ljungBox discipline, never a per-group cross product
    val lags = broadcast(spark.range(1, maxLag + 1)
      .select(col("id").as("__l")))
    val lagAgg = h.select(col("__g"), col("__h"), col("__x").as("__xa"))
      .crossJoin(lags)
      .withColumn("__hl", col("__h") + col("__l"))
      .join(h.select(col("__g"), col("__h").as("__hl"),
        col("__x").as("__xb")), Seq("__g", "__hl"))
      .groupBy(col("__g"), col("__l"))
      .agg(count(lit(1)).as("__np"),
        sum(d(col("__xa")) * col("__xb")).as("__sxy"),
        sum(d(col("__xa"))).as("__sa"),
        sum(d(col("__xb"))).as("__sb"))
    (1 to maxLag).foldLeft(tot) { (acc, l) =>
      acc.join(
        lagAgg.filter(col("__l") === l.toLong)
          .select(col("__g"), col("__np").as(s"__np$l"),
            col("__sxy").as(s"__sxy$l"), col("__sa").as(s"__sa$l"),
            col("__sb").as(s"__sb$l")),
        Seq("__g"), "left")
    }
  }

  /** Sample autocorrelation at lag l from the exact moments: one
    * pinned IEEE chain (Σxy − x̄Σxₜ − x̄Σxₜ₊ₗ + nₗx̄²) / (Σx² − (Σx)²/n),
    * with x̄ = Σx/n over the FULL series. */
  private def acf(l: Int): Column = {
    val nD = col("n_hours").cast("double")
    val mean = col("__sx").cast("double") / nD
    val c0 = col("__sxx").cast("double") -
      (col("__sx") * col("__sx")).cast("double") / nD
    (col(s"__sxy$l").cast("double") - mean * col(s"__sa$l").cast("double") -
      mean * col(s"__sb$l").cast("double") +
      col(s"__np$l").cast("double") * mean * mean) / c0
  }

  private def c0Col: Column = {
    val nD = col("n_hours").cast("double")
    col("__sxx").cast("double") -
      (col("__sx") * col("__sx")).cast("double") / nD
  }

  /** Yule–Walker AR(2) fit (Yule 1927; Walker 1931) per group over
    * hourly event counts, with the one-step-ahead forecast from the
    * series frontier — the minimal "does yesterday predict today"
    * autoregressive read next to [[graft.streaming.EventStreams]]'
    * Holt-Winters smoothing (that one tracks level/trend/season; this
    * one identifies the AR structure itself).
    *
    * φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²) — the 2×2 Toeplitz
    * solve in closed form; forecast = x̄ + φ₁(x_T−x̄) + φ₂(x_{T−1}−x̄)
    * when both frontier hours exist (NULL otherwise, stated).
    *
    * Exactness: lag moments exact via [[acfMoments]] (one hour-frame
    * equi-join); r₁, r₂, φ's, forecast are one pinned IEEE chain. NULL
    * fits when n < 3, c₀ = 0, a lag has no pairs, or 1−r₁² = 0.
    *
    * @return per group: (event_type, n_hours, r1, r2, phi1, phi2,
    *         forecast), 6-rounded */
  def yuleWalkerAr2(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val h = hourlyCounts(events, groupCol, tsCol, hourUs)
      .localCheckpoint(true) // moments + the frontier lookups share it
    val m = acfMoments(events, groupCol, tsCol, hourUs, 2)
    // frontier hour and its predecessor — two broadcast-joined lookups
    val front = h.groupBy(col("__g")).agg(max(col("__h")).as("__hT"))
    val xT = h.join(broadcast(front), Seq("__g"))
      .filter(col("__h") === col("__hT"))
      .select(col("__g"), col("__x").as("__xT"), col("__hT"))
    val xT1 = h.join(broadcast(front), Seq("__g"))
      .filter(col("__h") === col("__hT") - 1L)
      .select(col("__g"), col("__x").as("__xT1"))
    val r1 = acf(1)
    val r2 = acf(2)
    val den = lit(1.0) - r1 * r1
    val phi1 = r1 * (lit(1.0) - r2) / den
    val phi2 = (r2 - r1 * r1) / den
    val nD = col("n_hours").cast("double")
    val mean = col("__sx").cast("double") / nD
    val okR = col("n_hours") >= 3L && c0Col > 0.0 &&
      col("__np1").isNotNull && col("__np2").isNotNull
    val okPhi = okR && den =!= 0.0
    m.join(xT, Seq("__g"), "left").join(xT1, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n_hours"),
        when(okR, round(r1, 6)).as("r1"),
        when(okR, round(r2, 6)).as("r2"),
        when(okPhi, round(phi1, 6)).as("phi1"),
        when(okPhi, round(phi2, 6)).as("phi2"),
        when(okPhi && col("__xT").isNotNull && col("__xT1").isNotNull,
          round(mean + phi1 * (col("__xT").cast("double") - mean) +
            phi2 * (col("__xT1").cast("double") - mean), 6)).as("forecast"))
      .orderBy(col(groupCol))
  }

  /** Partial autocorrelation at lags 1–3 via the Durbin–Levinson
    * recursion (Levinson 1947; Durbin 1960) per group over hourly
    * counts — the AR-ORDER read: the lag where the PACF cuts off is
    * the p an AR(p) fit ([[yuleWalkerAr2]]) should use.
    *
    * φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²); φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁) /
    * (1 − φ₂₁r₁ − φ₂₂r₂) with φ₂₁ = r₁(1−φ₂₂) — closed form, one
    * pinned IEEE chain from the exact lag moments. NULLs on n < 4,
    * c₀ = 0, missing lag pairs, or a zero denominator, stated.
    *
    * @return per group: (event_type, n_hours, r1, r2, r3, pacf1,
    *         pacf2, pacf3), 6-rounded */
  def pacfDl(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val m = acfMoments(events, groupCol, tsCol, hourUs, 3)
    val r1 = acf(1)
    val r2 = acf(2)
    val r3 = acf(3)
    val den2 = lit(1.0) - r1 * r1
    val p2 = (r2 - r1 * r1) / den2
    val p21 = r1 * (lit(1.0) - p2)
    val den3 = lit(1.0) - p21 * r1 - p2 * r2
    val p3 = (r3 - p21 * r2 - p2 * r1) / den3
    val okR = col("n_hours") >= 4L && c0Col > 0.0 &&
      col("__np1").isNotNull && col("__np2").isNotNull &&
      col("__np3").isNotNull
    m.select(col("__g").as(groupCol), col("n_hours"),
      when(okR, round(r1, 6)).as("r1"),
      when(okR, round(r2, 6)).as("r2"),
      when(okR, round(r3, 6)).as("r3"),
      when(okR, round(r1, 6)).as("pacf1"),
      when(okR && den2 =!= 0.0, round(p2, 6)).as("pacf2"),
      when(okR && den2 =!= 0.0 && den3 =!= 0.0, round(p3, 6)).as("pacf3"))
      .orderBy(col(groupCol))
  }

  /** Granger-causality F test (Granger 1969), bivariate lag-1: does
    * series x (hourly counts of one event type) improve the one-step
    * prediction of series y (another type) beyond y's own past? OLS of
    * yₜ on (yₜ₋₁) vs (yₜ₋₁, xₜ₋₁), both in closed form from second
    * moments; F = (RSS_r − RSS_f)/(RSS_f/(n−3)) with 1 numerator dof.
    * The lead/lag [[Reports]] cross-correlation says WHERE the
    * association peaks; this one says whether it predicts.
    *
    * Frame: triples (yₜ, yₜ₋₁, xₜ₋₁) from two hour-frame equi-joins —
    * hours where any of the three is unobserved contribute no triple
    * (stated; counts-as-zero densification is the caller's choice via
    * a filled frame). Exactness: all ten second moments accumulate
    * exact DECIMAL; the centered normal-equation solve and F are one
    * pinned IEEE chain. NULLs when n < 4 or a denominator is 0.
    *
    * @return one row: (n_triples, beta_y, beta_x, rss_restricted,
    *         rss_full, f_stat), 6-rounded */
  def grangerF(
      events: DataFrame,
      causeType: String,
      effectType: String,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val h = hourlyCounts(events, typeCol, tsCol, hourUs)
      .localCheckpoint(true) // three aliases of one frame
    val y = h.filter(col("__g") === effectType)
      .select(col("__h"), col("__x").as("__y"))
    val yl = h.filter(col("__g") === effectType)
      .select((col("__h") + 1L).as("__h"), col("__x").as("__y1"))
    val xl = h.filter(col("__g") === causeType)
      .select((col("__h") + 1L).as("__h"), col("__x").as("__x1"))
    val tri = y.join(yl, Seq("__h")).join(xl, Seq("__h"))
    val mo = tri.agg(
      count(lit(1)).as("n_triples"),
      sum(d(col("__y"))).as("__sy"),
      sum(d(col("__y1"))).as("__sy1"),
      sum(d(col("__x1"))).as("__sx1"),
      sum(d(col("__y")) * col("__y")).as("__syy"),
      sum(d(col("__y1")) * col("__y1")).as("__sy1y1"),
      sum(d(col("__x1")) * col("__x1")).as("__sx1x1"),
      sum(d(col("__y")) * col("__y1")).as("__syy1"),
      sum(d(col("__y")) * col("__x1")).as("__syx1"),
      sum(d(col("__y1")) * col("__x1")).as("__sy1x1"))
    val nD = col("n_triples").cast("double")
    def ctr(sab: String, sa: String, sb: String): Column =
      col(sab).cast("double") -
        (col(sa) * col(sb)).cast("double") / nD
    val s11 = ctr("__sy1y1", "__sy1", "__sy1")
    val s22 = ctr("__sx1x1", "__sx1", "__sx1")
    val s12 = ctr("__sy1x1", "__sy1", "__sx1")
    val s1y = ctr("__syy1", "__sy1", "__sy")
    val s2y = ctr("__syx1", "__sx1", "__sy")
    val syy = ctr("__syy", "__sy", "__sy")
    val det = s11 * s22 - s12 * s12
    val bY = (s1y * s22 - s2y * s12) / det
    val bX = (s2y * s11 - s1y * s12) / det
    val rssF = syy - bY * s1y - bX * s2y
    val rssR = syy - s1y * s1y / s11
    val okR = col("n_triples") >= 4L && s11 > 0.0
    val okF = okR && det =!= 0.0 && rssF > 0.0
    mo.select(col("n_triples"),
      when(okF, round(bY, 6)).as("beta_y"),
      when(okF, round(bX, 6)).as("beta_x"),
      when(okR, round(rssR, 6)).as("rss_restricted"),
      when(okF, round(rssF, 6)).as("rss_full"),
      when(okF, round((rssR - rssF) / (rssF / (nD - lit(3.0))), 6))
        .as("f_stat"))
  }

  /** Hurst exponent by rescaled-range analysis (Hurst 1951; Mandelbrot
    * & Wallis 1969) over the global hourly count series: for each
    * window length w, the mean R/S over COMPLETE w-hour blocks (R =
    * range of the mean-adjusted cumulative deviation, S = population
    * std), then H = the least-squares slope of ln(R/S) on ln(w) —
    * H ≈ 0.5 is memoryless, H > 0.5 long-range persistent (bursty
    * traffic), the planning read behind [[Reports]]' burstiness row.
    *
    * Scale shape: the stream collapses once to the calendar-bounded
    * hour frame (census-guarded, the holtWinters discipline); block
    * windows partition by (w, block) with ≤ w rows each; per-w means
    * and the ≤|windows|-point regression fold PINNED. Exactness:
    * per-block Σx/Σx² exact; cumulative deviation Dₜ = cum(x) − t·x̄
    * mixes one exact cumsum with one IEEE product; R/S, per-w means
    * and the slope are pinned IEEE chains.
    *
    * @return per window: (window_h, n_blocks, rs_mean, h_est) with the
    *         fitted H replicated on every row, 6-rounded */
  def hurstExponent(
      events: DataFrame,
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      windows: Seq[Int] = Seq(8, 16, 32, 64),
      maxHours: Long = 200000L): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 2),
      "windows must be >= 2 hours each")
    val spark = events.sparkSession
    import spark.implicits._
    val hourlyAll = events
      .groupBy(expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint(true) // census + the per-window expand share it
    val nHours = hourlyAll.count()
    require(nHours <= maxHours,
      s"hurstExponent: $nHours observed hours exceed maxHours=$maxHours " +
        "— the block windows assume a calendar-bounded series")
    val wDf = windows.map(_.toLong).toDF("__w")
    val blocks = hourlyAll.crossJoin(broadcast(wDf))
      .withColumn("__b", expr("__h div __w"))
      .localCheckpoint(true) // block sums + the deviation walk share it
    // complete blocks only (c == w): a partial trailing block would bias
    // the per-w mean toward short-range behavior
    val blockSums = blocks.groupBy(col("__w"), col("__b"))
      .agg(count(lit(1)).as("__c"),
        sum(d(col("__x"))).as("__bsx"),
        sum(d(col("__x")) * col("__x")).as("__bsxx"))
      .filter(col("__c") === col("__w"))
    val winSpec = Window.partitionBy(col("__w"), col("__b"))
      .orderBy(col("__h"))
    val mean = col("__bsx").cast("double") / col("__c").cast("double")
    val dev = blocks.join(blockSums, Seq("__w", "__b"))
      .withColumn("__cum", sum(col("__x")).over(
        winSpec.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__pos", row_number().over(winSpec))
      .withColumn("__dev",
        col("__cum").cast("double") - col("__pos").cast("double") * mean)
    val rs = dev.groupBy(col("__w"), col("__b"), col("__c"),
      col("__bsx"), col("__bsxx"))
      .agg((max(col("__dev")) - min(col("__dev"))).as("__r"))
      .withColumn("__s", sqrt(
        (col("__bsxx").cast("double") -
          (col("__bsx") * col("__bsx")).cast("double") /
            col("__c").cast("double")) / col("__c").cast("double")))
      .filter(col("__s") > 0.0)
      .withColumn("__rs", col("__r") / col("__s"))
    val perW = rs.groupBy(col("__w"))
      .agg(count(lit(1)).as("n_blocks"),
        sort_array(collect_list(struct(col("__b"), col("__rs"))))
          .as("__bs"))
      .withColumn("rs_mean",
        aggregate(col("__bs"), lit(0.0),
          (a, c) => a + c.getField("__rs")) /
          col("n_blocks").cast("double"))
      .select(col("__w").as("window_h"), col("n_blocks"), col("rs_mean"))
      .localCheckpoint(true) // the H fit + the output rows share it
    // least-squares slope of ln(rs_mean) on ln(w) over the usable
    // points, folded in PINNED ascending-w order
    val usable = (p: Column) =>
      p.getField("rs_mean") > 0.0 && p.getField("n_blocks") >= 1L
    val fit = perW
      .agg(sort_array(collect_list(struct(col("window_h"),
        col("n_blocks"), col("rs_mean")))).as("__ps"))
      .withColumn("__k", aggregate(col("__ps"), lit(0.0),
        (a, p) => a + when(usable(p), 1.0).otherwise(0.0)))
      .withColumn("__lx", aggregate(col("__ps"), lit(0.0),
        (a, p) => a + when(usable(p),
          log(p.getField("window_h").cast("double"))).otherwise(0.0)))
      .withColumn("__ly", aggregate(col("__ps"), lit(0.0),
        (a, p) => a + when(usable(p),
          log(p.getField("rs_mean"))).otherwise(0.0)))
      .withColumn("__lxy", aggregate(col("__ps"), lit(0.0),
        (a, p) => a + when(usable(p),
          log(p.getField("window_h").cast("double")) *
            log(p.getField("rs_mean"))).otherwise(0.0)))
      .withColumn("__lxx", aggregate(col("__ps"), lit(0.0),
        (a, p) => a + when(usable(p),
          log(p.getField("window_h").cast("double")) *
            log(p.getField("window_h").cast("double"))).otherwise(0.0)))
    val slopeDen = col("__k") * col("__lxx") - col("__lx") * col("__lx")
    val hEst = fit.select(
      when(col("__k") >= 2.0 && slopeDen =!= 0.0,
        round((col("__k") * col("__lxy") - col("__lx") * col("__ly")) /
          slopeDen, 6)).as("h_est"))
    perW.crossJoin(broadcast(hEst))
      .select(col("window_h"), col("n_blocks"),
        round(col("rs_mean"), 6).as("rs_mean"), col("h_est"))
      .orderBy(col("window_h"))
  }

  /** Anderson–Darling uniformity test (Anderson & Darling 1952) over
    * the event timestamps' position in the observed span, quantized to
    * `cells` equal-width cells — "is traffic uniform over the window,
    * weighted toward the tails", the distributional sibling of
    * [[Reports]]' runs test (that one reads order, this one reads
    * shape, and AD's tail weight catches edge pile-ups KS misses).
    *
    * The statistic folds entirely on the ≤`cells`-row value frame: for
    * a cell with count c whose members occupy global ranks r+1..r+c,
    * Σ(2i−1) over those ranks is c(2r+c) and the reversed-order weight
    * is c(2n−2r−c) — so A² = −n − (1/n)·Σ_cells [c(2r+c)·ln F +
    * c(2n−2r−c)·ln(1−F)] with F = (cell+0.5)/cells, needing only
    * per-cell counts and an exact prefix sum, NEVER a corpus sort
    * (tie order inside a cell provably cancels in both weights).
    *
    * Exactness: span bounds and cell counts exact; rank coefficients
    * exact DECIMAL; the fold runs in PINNED ascending-cell order with
    * ln/multiply IEEE (the drift_js_hellinger discipline); A² is one
    * final chain, 6-rounded.
    *
    * @return one row: (n, n_cells, span_us, a2_stat) */
  def adUniformity(
      events: DataFrame,
      tsCol: String = "ts",
      cells: Int = 1000): DataFrame = {
    require(cells >= 2 && cells <= 65536,
      s"adUniformity: cells=$cells outside [2, 65536] — the statistic " +
        "folds one row per cell")
    val bounds = events.agg(min(col(tsCol)).as("__tmin"),
      max(col(tsCol)).as("__tmax"))
    // cell = ((ts − tmin) · cells) div (span) with span = tmax−tmin+1:
    // scales the offset INTO the grid so every cell is reachable for
    // any span (the old (span div cells)+1 width under-filled the grid
    // whenever span was a small multiple of cells, overstating the
    // tail deviation). The product runs in DECIMAL(38,0): offset·cells
    // would overflow Long at 65536 cells over a multi-year µs span
    // (span > 2^63/cells ≈ 4.5 years) and wrap to a negative cell with
    // no error — decimal keeps the integral floor-div exact at any
    // representable span.
    val counts = events.crossJoin(broadcast(bounds))
      .select(
        expr(s"cast((cast(`$tsCol` - __tmin as decimal(38,0)) * " +
          s"${cells}L) div (__tmax - __tmin + 1L) as bigint)")
          .as("__cell"),
        (col("__tmax") - col("__tmin") + lit(1L)).as("__span"))
      .groupBy(col("__cell"), col("__span"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // prefix self-join + totals share it
    // exclusive prefix rank from the bounded below-self-join (the
    // wasserstein1 discipline — no single-partition global window)
    val pre = counts
      .join(counts.select(col("__cell").as("__c2"), col("__c").as("__cc2")),
        col("__c2") < col("__cell"), "left")
      .groupBy(col("__cell"), col("__span"), col("__c"))
      .agg(coalesce(sum(col("__cc2")), lit(0L)).as("__r"))
    val tot = broadcast(counts.agg(sum(col("__c")).as("n"),
      count(lit(1)).as("n_cells"), max(col("__span")).as("span_us")))
    val f = (col("__cell").cast("double") + lit(0.5)) / lit(cells.toDouble)
    val terms = pre.crossJoin(tot)
      .select(col("n"), col("n_cells"), col("span_us"), col("__cell"),
        ((d(col("__c")) * (lit(2L) * col("__r") + col("__c")))
          .cast("double") * log(f) +
          (d(col("__c")) *
            (lit(2L) * col("n") - lit(2L) * col("__r") - col("__c")))
            .cast("double") * log(lit(1.0) - f)).as("__t"))
    terms.groupBy(col("n"), col("n_cells"), col("span_us"))
      .agg(sort_array(collect_list(struct(col("__cell"), col("__t"))))
        .as("__ts"))
      .select(col("n"), col("n_cells"), col("span_us"),
        round(-col("n").cast("double") -
          aggregate(col("__ts"), lit(0.0),
            (a, c) => a + c.getField("__t")) / col("n").cast("double"), 6)
          .as("a2_stat"))
  }
}
