package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Sample-based corpus estimation — the round-14 tier for the question
  * a 100 TB corpus forces before any full scan: "what would the
  * expensive number be, estimated from a cheap deterministic sample or
  * an already-bounded spectrum?" Survey-sampling estimators
  * (Horvitz–Thompson, the ratio estimator), capture–recapture
  * population sizing, and the ecology/linguistics richness pair
  * (simple Good–Turing, Chao1) over the token frequency spectrum.
  *
  * House rules: every sample is a SEEDED md5 permille cut
  * ([[graft.functions.HashFunctions.md5Bucket]] — the split/shard
  * primitive), so "the sample" is a pure function of (seed, key) and
  * any engine re-draws it bit-for-bit; all sums accumulate exact
  * (BIGINT/DECIMAL); every estimator is one pinned IEEE chain, folded
  * ascending over a bounded frame where more than one division is
  * involved. Estimator outputs carry the exact target beside the
  * estimate where the test scale affords it — the calibration read is
  * the point of a spec-scale run; production drops the truth column by
  * not computing it (stated per operator).
  */
object Estimation {

  private val d = (c: Column) => c.cast("decimal(38,0)")

  /** Horvitz–Thompson total estimator (Horvitz & Thompson 1952) under
    * deterministic UNEQUAL-probability sampling: each row's inclusion
    * probability πᵢ is supplied in PERMILLE (an integer column — e.g.
    * "sample long documents more"), a row is in the sample iff its
    * seeded md5 permille draw falls below πᵢ, and the total estimate is
    * Σ_sample yᵢ/πᵢ — unbiased for Σ yᵢ however unequal the π's.
    *
    * This is the "estimate the corpus token total by scanning 10% of
    * it, length-weighted" read: y is only computed on sampled rows in
    * production (here the exact total ships beside the estimate as the
    * calibration column — the spec-scale audit).
    *
    * Exactness: the permille column bounds the distinct-π frame at
    * ≤1000 rows; per-π exact Σy fold ascending with one IEEE
    * y·1000/π term per π value. Scale shape: one filtered pass for the
    * sample (map-side partials into ≤1000 groups), one exact count +
    * total pass for the audit columns.
    *
    * @return one row: (n_pop, n_sample, ht_total, exact_total,
    *         rel_err), 6-rounded */
  def htEstimate(
      docs: DataFrame,
      y: Column,
      keyCol: String,
      incProbPermille: Column,
      seed: Long = 7L): DataFrame = {
    val pm = greatest(least(incProbPermille.cast("bigint"), lit(1000L)),
      lit(1L))
    val u = pmod(graft.functions.HashFunctions
      .md5Bucket(seed, col(keyCol).cast("string")), lit(1000L))
    val base = docs.select(col(keyCol).cast("string").as("__k"),
      y.cast("bigint").as("__y"), pm.as("__pm"), u.as("__u"))
      .localCheckpoint(true) // audit totals + the sampled pass share it
    val audit = base.agg(count(lit(1)).as("n_pop"),
      sum(d(col("__y"))).as("__ty"))
    val perPm = base.filter(col("__u") < col("__pm"))
      .groupBy(col("__pm"))
      .agg(count(lit(1)).as("__ns"), sum(d(col("__y"))).as("__sy"))
    val folded = perPm
      .agg(sum(col("__ns")).as("n_sample"),
        sort_array(collect_list(struct(col("__pm"), col("__sy"))))
          .as("__ps"))
      .withColumn("__ht",
        aggregate(col("__ps"), lit(0.0), (acc, c) =>
          acc + c.getField("__sy").cast("double") * lit(1000.0) /
            c.getField("__pm").cast("double")))
    folded.crossJoin(broadcast(audit))
      .select(col("n_pop"), col("n_sample"),
        round(col("__ht"), 6).as("ht_total"),
        col("__ty").cast("bigint").as("exact_total"),
        when(col("__ty") > 0L,
          round((col("__ht") - col("__ty").cast("double")) /
            col("__ty").cast("double"), 6)).as("rel_err"))
  }

  /** Ratio estimator of a total (Cochran 1977, §6): estimate the
    * EXPENSIVE total Σy from a cheap full-scan auxiliary Σx and a
    * seeded Bernoulli sample on which both are measured —
    * Ŷ = (Σ_s y / Σ_s x) · Σ_pop x. Beats the expansion estimator
    * whenever y tracks x (tokens track characters), which is exactly
    * the corpus case: character counts come free from parquet metadata
    * scale, tokenization does not.
    *
    * Exactness: all four sums exact DECIMAL; the estimate is one IEEE
    * chain. NULL ratio/estimate when the sampled Σx is 0 (stated).
    *
    * @return one row: (n_pop, n_sample, x_total, ratio,
    *         ratio_estimate, exact_total, rel_err), 6-rounded */
  def ratioEstimate(
      docs: DataFrame,
      y: Column,
      x: Column,
      keyCol: String,
      samplePermille: Long = 100L,
      seed: Long = 8L): DataFrame = {
    require(samplePermille >= 1 && samplePermille <= 1000,
      s"samplePermille in [1,1000]: $samplePermille")
    val inS = pmod(graft.functions.HashFunctions
      .md5Bucket(seed, col(keyCol).cast("string")), lit(1000L)) <
      lit(samplePermille)
    val mo = docs.select(y.cast("bigint").as("__y"),
      x.cast("bigint").as("__x"), inS.as("__s"))
      .agg(count(lit(1)).as("n_pop"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("n_sample"),
        sum(d(col("__x"))).as("__tx"),
        sum(d(col("__y"))).as("__ty"),
        sum(when(col("__s"), d(col("__y"))).otherwise(d(lit(0L))))
          .as("__sy"),
        sum(when(col("__s"), d(col("__x"))).otherwise(d(lit(0L))))
          .as("__sx"))
    val r = col("__sy").cast("double") / col("__sx").cast("double")
    val est = r * col("__tx").cast("double")
    mo.select(col("n_pop"), col("n_sample"),
      col("__tx").cast("bigint").as("x_total"),
      when(col("__sx") > 0L, round(r, 6)).as("ratio"),
      when(col("__sx") > 0L, round(est, 6)).as("ratio_estimate"),
      col("__ty").cast("bigint").as("exact_total"),
      when(col("__sx") > 0L && col("__ty") > 0L,
        round((est - col("__ty").cast("double")) /
          col("__ty").cast("double"), 6)).as("rel_err"))
  }

  /** Capture–recapture population-size estimate (Chapman 1951's
    * bias-corrected Lincoln–Petersen): two INDEPENDENT seeded samples
    * of the corpus's distinct content fingerprints play the two
    * capture occasions; N̂ = (n₁+1)(n₂+1)/(m+1) − 1 from the overlap m
    * estimates the true distinct count — the "how many distinct
    * documents are really in this 100 TB pile" read from two cheap
    * sample scans, with its standard error (Seber 1982).
    *
    * Exactness: membership is per-fingerprint md5 permille (two
    * seeds), counts exact; N̂ and SE are one IEEE chain. The true
    * distinct count ships beside the estimate (spec-scale audit).
    *
    * @return one row: (n1, n2, m_overlap, chapman_n, se,
    *         exact_distinct), 6-rounded */
  def captureRecapture(
      docs: DataFrame,
      textCol: String = "text",
      ratePermille: Long = 200L,
      seed1: Long = 21L,
      seed2: Long = 22L): DataFrame = {
    require(ratePermille >= 1 && ratePermille <= 1000,
      s"ratePermille in [1,1000]: $ratePermille")
    val fps = docs.select(md5(col(textCol).cast("binary")).as("__fp"))
      .distinct()
    def inS(seed: Long) = pmod(graft.functions.HashFunctions
      .md5Bucket(seed, col("__fp")), lit(1000L)) < lit(ratePermille)
    val mo = fps.agg(count(lit(1)).as("exact_distinct"),
      sum(when(inS(seed1), 1L).otherwise(0L)).as("n1"),
      sum(when(inS(seed2), 1L).otherwise(0L)).as("n2"),
      sum(when(inS(seed1) && inS(seed2), 1L).otherwise(0L))
        .as("m_overlap"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val m = col("m_overlap").cast("double")
    val nh = (n1 + lit(1.0)) * (n2 + lit(1.0)) / (m + lit(1.0)) - lit(1.0)
    val v = (n1 + lit(1.0)) * (n2 + lit(1.0)) * (n1 - m) * (n2 - m) /
      ((m + lit(1.0)) * (m + lit(1.0)) * (m + lit(2.0)))
    mo.select(col("n1"), col("n2"), col("m_overlap"),
      round(nh, 6).as("chapman_n"),
      round(sqrt(v), 6).as("se"),
      col("exact_distinct"))
  }

  /** Simple Good–Turing adjusted counts (Good 1953; the unsmoothed
    * turing estimates of Gale & Sampson 1995 §3) over the token
    * frequency spectrum: r* = (r+1)·S(r+1)/S(r) for the low
    * frequencies where the spectrum is dense, plus the unseen-mass
    * estimate P₀ = S(1)/N — "how much of the language has this corpus
    * NOT seen yet", the sibling read to Heaps-law growth.
    *
    * Exactness: the spectrum (distinct count VALUES — vocab-bounded,
    * never term-bounded) is exact; each r* is one IEEE division, NULL
    * where S(r+1) is absent (the estimate is undefined there — the
    * smoothing-fit regime, stated).
    *
    * @return per frequency r ≤ maxR: (r, n_types, n_types_next,
    *         r_star, p0), r-ascending, 6-rounded, p0 replicated */
  def goodTuring(
      docs: DataFrame,
      textCol: String = "text",
      maxR: Int = 10,
      ngram: Int = 1): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1: $maxR")
    val spec = spectrum(docs, textCol, ngram)
      .localCheckpoint(true) // totals + the shifted self-join share it
    val tot = broadcast(spec.agg(
      sum(d(col("f")) * col("n_terms")).as("__n"),
      max(when(col("f") === 1L, col("n_terms"))).as("__s1")))
    val next = spec.select((col("f") - 1L).as("f"),
      col("n_terms").as("n_types_next"))
    spec.filter(col("f") <= maxR.toLong)
      .join(next, Seq("f"), "left")
      .crossJoin(tot)
      .select(col("f").as("r"), col("n_terms").as("n_types"),
        col("n_types_next"),
        when(col("n_types_next").isNotNull,
          round((col("f").cast("double") + lit(1.0)) *
            col("n_types_next").cast("double") /
            col("n_terms").cast("double"), 6)).as("r_star"),
        when(col("__n") > 0L,
          round(coalesce(col("__s1"), lit(0L)).cast("double") /
            col("__n").cast("double"), 6)).as("p0"))
      .orderBy(col("r"))
  }

  /** Chao1 species-richness estimate (Chao 1984, bias-corrected form):
    * V̂ = V + N₁(N₁−1)/(2(N₂+1)) from the observed vocabulary V and
    * the singleton/doubleton spectrum cells — the lower bound on the
    * TRUE vocabulary size this corpus samples from, next to
    * [[goodTuring]]'s unseen-mass share.
    *
    * @return one row: (v_obs, n1, n2, chao1_est), 6-rounded */
  def chao1(
      docs: DataFrame,
      textCol: String = "text",
      ngram: Int = 1): DataFrame = {
    // coalesce: an empty spectrum (no grams at all) is v_obs = 0 with
    // estimate 0, not a NULL row (the degenerate-input rule)
    val mo = spectrum(docs, textCol, ngram).agg(
      coalesce(sum(col("n_terms")), lit(0L)).as("v_obs"),
      coalesce(max(when(col("f") === 1L, col("n_terms"))), lit(0L))
        .as("n1"),
      coalesce(max(when(col("f") === 2L, col("n_terms"))), lit(0L))
        .as("n2"))
    val n1 = col("n1").cast("double")
    mo.select(col("v_obs"), col("n1"), col("n2"),
      round(col("v_obs").cast("double") +
        n1 * (n1 - lit(1.0)) /
          (lit(2.0) * (col("n2").cast("double") + lit(1.0))), 6)
        .as("chao1_est"))
  }

  /** The shared (frequency, n_terms) spectrum — [[Reports
    * .freqSpectrum]]'s core collapse (distinct count values, bounded
    * by the most frequent term, never the vocabulary). `ngram = 2`
    * pairs ADJACENT filtered tokens row-locally (zip with the
    * 1-shifted slice) — the standard move when the unigram vocabulary
    * is too common to have a rare tail (every Good–Turing use in LM
    * smoothing is over n-grams for exactly this reason). */
  private def spectrum(
      docs: DataFrame,
      textCol: String,
      ngram: Int = 1): DataFrame = {
    require(ngram == 1 || ngram == 2,
      s"spectrum: ngram=$ngram unsupported (1 or 2)")
    val ft = filter(T.tokens(col(textCol)), t => length(t) > 0)
    val grams =
      if (ngram == 1) ft
      else slice(
        zip_with(ft, slice(ft, lit(2), greatest(size(ft) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)),
        lit(1), greatest(size(ft) - 1, lit(0)))
    Fan.spread(docs.select(col(textCol)))
      .select(explode(grams).as("__term"))
      .groupBy(col("__term")).agg(count(lit(1)).as("__f"))
      .groupBy(col("__f").as("f"))
      .agg(count(lit(1)).as("n_terms"))
  }
}
