package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus-level analysis reports — the rollups an operator of a corpus
  * pipeline reads between runs (what changed, what the token
  * distribution looks like, where the quality mass sits). All exact
  * integer/decimal arithmetic so every report replays in plain SQL.
  */
object Reports {

  /** LSH parameter-calibration report: for every MinHash candidate pair,
    * the TRUE char-shingle Jaccard next to the signature estimate,
    * aggregated per estimate level (k slots ⇒ estimates are exact
    * multiples of 1/k, so the estimate itself is the natural group key).
    * This is the measurement loop that tunes (k, bands) on a sample
    * before a 100 TB dedup run: mean true Jaccard per estimate level
    * shows the bias, mean |est − true| the noise, and the pair counts
    * where the banding spends its candidate budget.
    *
    * Scale shape: candidate pairs are already banding-bounded
    * ([[Dedup.minhashLsh]]'s `maxBucketSize` guard); the truth join
    * ships each doc's distinct shingle SET only to its candidate pairs
    * (two keyed joins), and the final rollup is ≤ k+1 rows. Exactness:
    * estimates are exact dyadics, true Jaccard/abs-error are 6-rounded
    * and decimal-summed, means are single IEEE divisions. */
  def lshCalibration(
      docs: DataFrame,
      shingleN: Int = 5,
      k: Int = 8,
      bands: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id",
      tier: Dedup.HashTier = Dedup.PortableMd5): DataFrame = {
    // the candidate pairs arrive on the coalesce-exempt wide pair layout
    // (Dedup.pairsFromSigs repartitions before its distinct — optimization
    // r17), so the truth re-check below — the per-pair Jaccard over ~300-
    // element shingle arrays, this query's hot loop — fuses across the
    // session's parallelism instead of one AQE-coalesced task
    val pairs = Dedup.minhashLsh(docs, textCol, idCol, shingleN, k, bands,
      tier = tier)
    // sorted-distinct per-doc sets + raw sizes: the per-pair truth
    // re-check below uses the allocation-free merge-walk intersect (see
    // [[lshRecall]]'s rationale — per-doc canonicalization, per-pair
    // two-pointer walk, bit-identical ratio)
    val sets = Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__id"),
        T.charShingles(col(textCol), shingleN).as("__s"))
      .select(col("__id"),
        array_sort(array_distinct(col("__s"))).as("__sd"),
        size(col("__s")).as("__n"))
      .localCheckpoint() // two consumers (id_a side and id_b side)
    // explicit broadcast of the shingle-set sides (guide §3.1): the
    // localCheckpoint erased sets' statistics, so the planner would fall
    // back to sort-merge and re-shuffle the pairs by one id — undoing the
    // repartition above. The set table is one row per SAMPLED doc (this
    // is the calibration loop, run on a sample tier by design), so it
    // broadcasts; the Jaccard projection then fuses over the wide pair
    // partitions with no further exchange.
    pairs
      .join(broadcast(sets.select(col("__id").as("id_a"), col("__sd").as("__sda"),
        col("__n").as("__na"))), Seq("id_a"))
      .join(broadcast(sets.select(col("__id").as("id_b"), col("__sd").as("__sdb"),
        col("__n").as("__nb"))), Seq("id_b"))
      // native merge-walk kernel (optimization r17): bit-identical to
      // round(T.jaccard(...), 6) — this projection is the query's hot
      // loop; the two-step select evaluates the count once per pair
      .select(col("est_jaccard"), col("__na"), col("__nb"),
        org.apache.spark.sql.graft.MinhashExpressionFunctions
          .sortedIntersectColumn(col("__sda"), col("__sdb")).cast("double")
          .as("__ic"))
      .select(col("est_jaccard"),
        round(col("__ic") / greatest(
          (col("__na") + col("__nb")).cast("double") - col("__ic"),
          lit(1.0)), 6).as("__tj"))
      .select(col("est_jaccard"), col("__tj"),
        round(abs(col("est_jaccard") - col("__tj")), 6).as("__err"))
      .groupBy(col("est_jaccard"))
      .agg(
        count(lit(1)).as("n_pairs"),
        (sum(col("__tj").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_true_jaccard"),
        (sum(col("__err").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_abs_err"))
  }

  /** LSH RECALL measurement loop — the companion to [[lshCalibration]]'s
    * bias report: calibration shows what the signature estimates MEAN;
    * recall shows what the banding MISSES (pairs above a true-Jaccard
    * threshold that never became candidates — the silent under-dedup a
    * 100 TB run pays for a mis-tuned (k, bands)). Ground truth comes
    * from ALL-PAIRS true Jaccard on a hash-deterministic SAMPLE (the
    * [[graft.functions.HashFunctions.md5Bucket]] cut — replayable), so
    * the quadratic stays sample-bounded while the LSH runs the exact
    * production machinery on the same sample. One row per threshold:
    * (threshold, n_true, n_caught, recall).
    *
    * Scale shape: the sample is a hash-Bernoulli cut (no shuffle); the
    * truth join is sample², explicitly bounded by `sampleFrac` (this is
    * the one deliberately-quadratic measurement op in the catalog — run
    * it on the sample tier, never the corpus); the LSH side is the
    * banded production path. Exactness: counts are exact longs, recall
    * one IEEE division, true Jaccard the same set arithmetic both
    * engines compute from identical shingle lists. */
  def lshRecall(
      docs: DataFrame,
      sampleFrac: Double = 0.2,
      shingleN: Int = 5,
      k: Int = 8,
      bands: Int = 4,
      thresholds: Seq[Double] = Seq(0.2, 0.25, 0.3, 0.5),
      textCol: String = "text",
      idCol: String = "doc_id",
      seed: Long = 13L): DataFrame = {
    require(sampleFrac > 0 && sampleFrac <= 1, s"bad frac: $sampleFrac")
    val sample = docs.filter(
      pmod(graft.functions.HashFunctions.md5Bucket(seed, col(idCol)),
        lit(1000000L)) < lit((sampleFrac * 1000000L).toLong))
    // per-DOC canonicalization (optimization r17, guide §1.2 step 2 —
    // move per-pair work to per-doc): the truth kernel intersects
    // SORTED-DISTINCT sets with an allocation-free merge walk
    // ([[org.apache.spark.sql.graft.SortedIntersectCount]]), so the sort
    // + dedupe happens once per doc here instead of a hash-set build per
    // PAIR in the sample² loop; the RAW size rides along because the
    // jaccard denominator is defined over the original arrays.
    val sets = Fan.spread(sample.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__id"),
        T.charShingles(col(textCol), shingleN).as("__s"))
      .select(col("__id"),
        array_sort(array_distinct(col("__s"))).as("__sd"),
        size(col("__s")).as("__n"))
      .localCheckpoint() // both sides of the truth self-join
    // size prefilter before the per-pair kernel (optimization r17, guide
    // §1.2 step 2 — prune before the expensive inner loop, provably
    // lossless): the kernel's intersection count is ≤ min(n_a, n_b) (raw
    // lengths upper-bound the distinct intersection) and its denominator
    // is ≥ max(n_a, n_b), so jaccard ≤ min/max — a pair with
    // min < t_min · max can never reach the __tj ≥ t_min cut below, and
    // the two-int compare replaces the ~300-element set walk for every
    // size-incompatible pair of the sample² loop (the AllPairs length
    // filter, applied to the truth side). The 1e-6 slack covers __tj's
    // round-half-up at 6 decimals (ADVICE r17): a true ratio within
    // 5e-7 BELOW t_min rounds UP to t_min and must survive the
    // prefilter — subtracting one ulp-of-the-rounding from the cut
    // keeps the prune strictly lossless instead of practically so.
    // the two-step select keeps the merge-walk count evaluated ONCE per
    // pair (inlining it into the ratio would re-evaluate it — interpreted
    // projections have no common-subexpression reuse); the ratio below
    // replicates JaccardHelper's exact IEEE sequence over RAW sizes, so
    // __tj is bit-identical to the hash-kernel formulation (pinned by
    // MinhashExpressionsSpec)
    val truth = sets.select(col("__id").as("id_a"), col("__sd").as("__sda"),
        col("__n").as("__na"))
      .crossJoin(sets.select(col("__id").as("id_b"), col("__sd").as("__sdb"),
        col("__n").as("__nb")))
      .filter(col("id_a") < col("id_b") &&
        least(col("__na"), col("__nb")).cast("double") >=
          lit(thresholds.min - 1e-6) *
            greatest(col("__na"), col("__nb")).cast("double"))
      .select(col("id_a"), col("id_b"), col("__na"), col("__nb"),
        org.apache.spark.sql.graft.MinhashExpressionFunctions
          .sortedIntersectColumn(col("__sda"), col("__sdb"),
            asDeterministic = false).cast("double")
          .as("__ic"))
      .select(col("id_a"), col("id_b"),
        round(col("__ic") / greatest(
          (col("__na") + col("__nb")).cast("double") - col("__ic"),
          lit(1.0)), 6).as("__tj"))
      .filter(col("__tj") >= thresholds.min)
    // explicit co-partitioning of the truth⟕candidates join (optimization
    // r17, guide §2.5): both sides are slim (id, id) rows, so AQE's
    // byte-based coalescing ran the sort-merge — a sort of the full
    // candidate set — on one task. Numbered repartitions on the join key
    // are coalesce-exempt and co-partition the join at the session's
    // parallelism with no further exchange.
    val nPart = docs.sparkSession.sparkContext.defaultParallelism
    val cand = Dedup
      .minhashLsh(sample, textCol, idCol, shingleN, k, bands,
        tier = Dedup.PortableMd5)
      .select(col("id_a"), col("id_b"), lit(1L).as("__hit"))
    val flagged = truth.repartition(nPart, col("id_a"), col("id_b"))
      .join(cand, Seq("id_a", "id_b"), "left")
      .select(col("__tj"), coalesce(col("__hit"), lit(0L)).as("__hit"))
    val tSpine = sample.sparkSession.range(1)
      .select(explode(array(thresholds.sorted.map(lit): _*)).as("threshold"))
    flagged
      .crossJoin(tSpine)
      .filter(col("__tj") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_true"), sum(col("__hit")).as("n_caught"))
      .select(col("threshold"), col("n_true"), col("n_caught"),
        round(col("n_caught").cast("double") /
          col("n_true").cast("double"), 6).as("recall"))
  }

  /** Per-group equi-width histogram of an integer metric: `(group, bin,
    * n_rows)` with `bin = min(v div width, nBins−1)` — the length/size
    * distribution report a corpus audit reads next to the robust stats
    * (a median hides bimodality; the histogram shows it). Exact integer
    * bin math, one keyed aggregation with map-side partials; bins with
    * no mass are absent (sparse output — at 100 TB a dense 0-filled
    * grid is the caller's trivial join against a bin spine). */
  def lengthHistogram(
      df: DataFrame,
      groupCol: String,
      metric: org.apache.spark.sql.Column,
      width: Long = 100L,
      nBins: Int = 10): DataFrame = {
    require(width > 0 && nBins > 0, "need positive width and nBins")
    val v = metric.cast("bigint")
    val bin = least(floor(v / lit(width)).cast("bigint"), lit(nBins - 1L))
    df.select(col(groupCol), bin.as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bin_lo", col("bin") * lit(width))
  }

  /** Cross-source duplicate-overlap matrix: for every source pair, how
    * many distinct normalized-text fingerprints both carry — the
    * syndication / mirror detector (the same article on twenty domains
    * inflates a naive per-source token count and double-trains the
    * model). Keyed by the order/duplication-invariant CONTENT fingerprint
    * ([[T.contentFingerprint]]: sorted distinct tokens), so "overlap"
    * means bag-of-words-identical — reformatted syndication counts.
    *
    * Shape: one fingerprint projection + distinct (source, fp), then a
    * fp-keyed self-join whose per-fp blow-up is bounded by the SOURCE
    * COUNT squared (a fp present in all s sources yields s·(s−1)/2 pair
    * rows — never corpus-scale), and a tiny keyed count. */
  def sourceOverlap(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val keyed = Fan.spread(docs.select(col(sourceCol), col(textCol)))
      .select(col(sourceCol).as("__src"),
        T.contentFingerprint(col(textCol)).as("fp"))
      .distinct()
      .localCheckpoint() // both sides of the self-join
    keyed.select(col("__src").as("source_a"), col("fp"))
      .join(keyed.select(col("__src").as("source_b"), col("fp")), Seq("fp"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Data-quality expectation report (the dbt-tests / Deequ shape): each
    * named row-level predicate is evaluated corpus-wide in ONE scan (the
    * rules explode row-locally, |rules| structs per row) and uniqueness
    * expectations — not expressible per-row — run as count-vs-distinct
    * aggregates unioned on. One row per rule: (rule, n_violations,
    * pass). NULL predicate results count as violations (an expectation
    * that cannot be evaluated is not met). */
  def expectationReport(
      df: DataFrame,
      rowRules: Seq[(String, org.apache.spark.sql.Column)],
      uniqueRules: Seq[(String, org.apache.spark.sql.Column)] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty, "no expectations")
    val parts = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      parts += df
        .select(explode(array(rowRules.map { case (name, pred) =>
          struct(lit(name).as("rule"),
            when(!coalesce(pred, lit(false)), 1L).otherwise(0L).as("v"))
        }: _*)).as("r"))
        .groupBy(col("r.rule").as("rule"))
        .agg(sum(col("r.v")).as("n_violations"))
    }
    uniqueRules.foreach { case (name, c) =>
      parts += df.agg(
        (count(c) - countDistinct(c)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    }
    parts.result().reduce(_ unionByName _)
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** k-anonymity audit (Sweeney 2002): every quasi-identifier
    * combination whose equivalence class holds FEWER than `k` rows — the
    * privacy gate a dataset release runs after PII redaction (redaction
    * removes direct identifiers; small quasi-identifier classes still
    * re-identify). Returns the violating combos with their class sizes;
    * an empty result certifies k-anonymity for the chosen columns.
    *
    * One keyed aggregation with map-side partials + a size filter —
    * the violating set is small by definition (each class < k rows), so
    * the output is bounded even when the input is not. */
  def kAnonymityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** l-diversity audit — [[kAnonymityViolations]]'s companion: a
    * quasi-identifier class can satisfy k-anonymity yet expose its
    * members anyway when every row in it shares the SAME sensitive value
    * (the homogeneity attack). Reports classes whose sensitive column
    * carries fewer than `l` distinct values; empty result certifies
    * l-diversity. One keyed aggregation. */
  def lDiversityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, "need quasi columns and l >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }

  /** Version-to-version corpus diff keyed by the normalized-text
    * fingerprint ([[T.normalizeText]] md5 — same key as exact dedup, so
    * a reformatted-but-identical doc counts as kept): per status
    * (`added`, `removed`, `kept`) the document and token mass. The
    * between-crawls questions — how much is new, how much churned —
    * answered in one full-outer join of two slim (fp, n_tokens)
    * aggregates; the full corpora shuffle once each, keyed by fp.
    * Duplicate fingerprints within a version collapse to one row
    * (min-doc-count semantics would double-count reformatted dups). */
  def corpusDiff(
      oldCorpus: DataFrame,
      newCorpus: DataFrame,
      textCol: String = "text"): DataFrame = {
    def keyed(df: DataFrame) = Fan.spread(df.select(col(textCol)))
      .select(md5(T.normalizeText(col(textCol))).as("fp"),
        size(filter(T.tokens(col(textCol)), t => length(t) > 0))
          .cast("bigint").as("n_tokens"))
      .groupBy(col("fp"))
      .agg(min(col("n_tokens")).as("n_tokens"))
    val o = keyed(oldCorpus).select(col("fp"), col("n_tokens").as("o_tok"))
    val n = keyed(newCorpus).select(col("fp"), col("n_tokens").as("n_tok"))
    o.join(n, Seq("fp"), "full_outer")
      .select(
        when(col("o_tok").isNull, "added")
          .when(col("n_tok").isNull, "removed")
          .otherwise("kept").as("status"),
        coalesce(col("n_tok"), col("o_tok")).as("toks"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
  }

  /** Term-frequency spectrum (the Zipf / count-of-counts report): for
    * each occurrence count f, how many distinct terms occur exactly f
    * times, and the token mass they carry. The curve that diagnoses
    * boilerplate (fat head), OCR noise (fat f=1 tail), and what a
    * min-frequency vocab cut discards. Two keyed aggs — term counts,
    * then counts-of-counts — all integers. */
  def freqSpectrum(
      docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val toks = filter(T.tokens(col(textCol)), t => length(t) > 0)
    Fan.spread(docs.select(col(textCol)))
      .select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n_terms"),
        (col("f") * count(lit(1))).as("token_mass"))
  }

  /** Zipf-fit report: log–log least squares over the FREQUENCY SPECTRUM
    * ([[freqSpectrum]]'s (f, n_terms) rows — for a Zipf-law corpus with
    * exponent s, ln n_f ≈ const − (1 + 1/s)·ln f, so the slope is the
    * one-number "is this corpus natural text?" diagnostic: boilerplate
    * floods shift it shallow, synthetic/templated corpora bend the tail).
    * One row out: (n_points, slope, intercept, r2).
    *
    * Determinism: the OLS sums are FP, so their ADDITION ORDER is pinned
    * the house way — the spectrum (vocab-bounded, thousands of rows at
    * most: distinct COUNT VALUES, not terms) collapses to one sorted
    * array and every Σ folds it in ascending-f order; slope/intercept/r²
    * are then a handful of IEEE expressions on one row. SQL replays the
    * identical list_sort + list_reduce folds.
    *
    * Scale shape: the corpus-scale work is [[freqSpectrum]]'s two keyed
    * aggs; everything after runs on the spectrum frame. */
  def zipfFit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val pts = sort_array(collect_list(struct(col("f"),
      log(col("f").cast("double")).as("x"),
      log(col("n_terms").cast("double")).as("y"))))
    def fold(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(col("__pts"), f), lit(0.0), (a, b) => a + b)
    freqSpectrum(docs, textCol)
      .agg(pts.as("__pts"))
      .select(size(col("__pts")).cast("long").as("n_points"),
        col("__pts"),
        fold(p => p.getField("x")).as("__sx"),
        fold(p => p.getField("y")).as("__sy"),
        fold(p => p.getField("x") * p.getField("y")).as("__sxy"),
        fold(p => p.getField("x") * p.getField("x")).as("__sxx"),
        fold(p => p.getField("y") * p.getField("y")).as("__syy"))
      .select(col("n_points"), col("__sx"), col("__sy"), col("__sxy"),
        col("__sxx"), col("__syy"),
        // nullif on the variance denominators: a degenerate spectrum
        // (single point, or all n_terms equal → zero y-variance) yields
        // NULL slope/r² instead of an ANSI divide-by-zero abort
        ((col("n_points") * col("__sxy") - col("__sx") * col("__sy")) /
          nullif(col("n_points") * col("__sxx") - col("__sx") * col("__sx"),
            lit(0.0)))
          .as("__slope"))
      .select(col("n_points"),
        round(col("__slope"), 6).as("slope"),
        round((col("__sy") - col("__slope") * col("__sx")) / col("n_points"), 6)
          .as("intercept"),
        // explicit square (a*a), not pow(a, 2): pow's rounding is
        // implementation-defined, multiplication is IEEE-pinned
        round(
          (col("n_points") * col("__sxy") - col("__sx") * col("__sy")) *
            (col("n_points") * col("__sxy") - col("__sx") * col("__sy")) /
            nullif(
              (col("n_points") * col("__sxx") - col("__sx") * col("__sx")) *
                (col("n_points") * col("__syy") - col("__sy") * col("__sy")),
              lit(0.0)), 6)
          .as("r2"))
  }

  /** Tokenizer-fertility report: per language, subwords-per-token and
    * chars-per-subword — the cost model for tokenizer/budget planning
    * (fertility ≫ 1 for a language means the subword proxy splits its
    * words hard; budget estimates in tokens must scale accordingly).
    * Counts are the SAME definitions as `text_stats` (whitespace tokens,
    * word-piece-regex subwords), summed exactly per language with one
    * IEEE division per ratio. One keyed agg over a row-local projection. */
  def tokenizerFertility(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    Fan.spread(docs.select(col(langCol), col(textCol)))
      .select(col(langCol),
        T.tokenCount(col(textCol)).cast("long").as("__t"),
        T.subwordCount(col(textCol)).cast("long").as("__s"),
        length(col(textCol)).cast("long").as("__c"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("n_tokens"),
        sum(col("__s")).as("n_subwords"),
        sum(col("__c")).as("n_chars"))
      .select(col(langCol), col("n_docs"), col("n_tokens"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 6).as("fertility"),
        round(col("n_chars").cast("double") /
          greatest(col("n_subwords"), lit(1L)).cast("double"), 6)
          .as("chars_per_subword"))

  /** Quantile release via the EXPONENTIAL mechanism (McSherry & Talwar
    * 2007; the standard DP-quantile instantiation, e.g. Smith 2011):
    * candidates are the observed distinct values, utility u(v) =
    * −|rank(v) − target|, and the release samples v ∝ exp(ε·u/2) —
    * realized deterministically by the Gumbel-max trick with the house
    * md5-uniform (argmax of ε·u/2 + G, G = −ln(−ln U)), so a release
    * replays bit-for-bit in SQL. The release output carries ONLY the
    * selected value (plus ε): the exact quantile, the realized rank
    * error, and the exact group count are all withheld — publishing any
    * of them alongside the noisy pick would void the mechanism (release
    * counts separately through [[dpCounts]], whose ε composes
    * additively). Specs and debugging use [[dpQuantileDebug]] instead.
    *
    * `releaseId` is the per-release nonce, folded into the noise key
    * exactly as in [[dpCounts]]: WITHOUT it, repeat releases over
    * evolving data would reuse Gumbel draws keyed only on
    * (seed, group, value) and expose exact rank movements between
    * snapshots. Every publication MUST carry a fresh releaseId, and ε
    * composes additively across releases. The same seed-secrecy caveat
    * as [[dpCounts]] applies (determinism is the testing contract).
    * Honest-label caveat: the candidate support is the OBSERVED distinct
    * values — a data-dependent set, so the guarantee is the folklore
    * exponential-mechanism-over-observed-support one, not strict ε-DP
    * over neighboring datasets (a strict variant needs a data-independent
    * candidate grid; `quantScale` already defines one if needed).
    *
    * Scale shape: the corpus collapses to the (group, distinct value,
    * count) frame; ranks are the [[trimmedMean]] value-ordered cumsum;
    * scoring and the argmax ride group-partitioned windows. Exact
    * integer utilities; the score is one fixed IEEE expression.
    *
    * @param pPct target quantile in integer percent (exact rank
    *             arithmetic: target = n·pPct div 100)
    * @return one row per group: (group, dp_quantile, epsilon) */
  def dpQuantile(
      events: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value",
      pPct: Int = 50,
      epsilon: Double = 1.0,
      seed: Long = 42L,
      quantScale: Long = 1000L,
      releaseId: String = "r0"): DataFrame =
    dpQuantileDebug(events, groupCol, valueCol, pPct, epsilon, seed,
      quantScale, releaseId)
      .select(col(groupCol), col("dp_quantile"), col("epsilon"))

  /** Diagnostic tier of [[dpQuantile]]: the same mechanism, same noise
    * key, but the output keeps the exact group count, exact quantile and
    * realized rank error NEXT TO the noisy pick. This frame is for specs
    * and utility audits ONLY — it is, by construction, not a private
    * release (the whole point of [[dpQuantile]] is that these columns
    * never ship together).
    *
    * @return one row per group: (group, n, dp_quantile, exact_quantile,
    *         rank_error, epsilon) */
  def dpQuantileDebug(
      events: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value",
      pPct: Int = 50,
      epsilon: Double = 1.0,
      seed: Long = 42L,
      quantScale: Long = 1000L,
      releaseId: String = "r0"): DataFrame = {
    require(pPct >= 1 && pPct <= 99, s"pPct in [1,99]: $pPct")
    require(epsilon > 0 && quantScale > 0, "positive epsilon/quantScale")
    require(releaseId.nonEmpty, "releaseId must be non-empty")
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val vc = events.select(col(groupCol).as("__g"), q.as("__q"))
      .groupBy(col("__g"), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val cum = vc.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__q"))))
    val tot = vc.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
      .withColumn("__target", expr(s"(__n * ${pPct}L) div 100L"))
    val bucket = graft.functions.HashFunctions.md5Bucket(seed,
      concat_ws("|", lit(releaseId), col("__g"), col("__q").cast("string")))
    val scored = cum.join(tot, Seq("__g"))
      .withColumn("__u", -abs(col("__cum") - col("__target")))
      .withColumn("__gum",
        -log(-log((bucket + lit(0.5)) / lit(4294967296.0))))
      .withColumn("__score",
        lit(epsilon / 2.0) * col("__u").cast("double") + col("__gum"))
      .localCheckpoint(true) // argmax + exact-quantile pass share it
    val picked = scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__g"))
          .orderBy(col("__score").desc, col("__q"))))
      .filter(col("__rk") === 1)
    val exact = scored.groupBy(col("__g"))
      .agg(min(when(col("__cum") >= greatest(col("__target"), lit(1L)),
        col("__q"))).as("__eq"))
    picked.join(exact, Seq("__g"))
      .select(col("__g").as(groupCol), col("__n").as("n"),
        round(col("__q").cast("double") / lit(quantScale.toDouble), 6)
          .as("dp_quantile"),
        round(col("__eq").cast("double") / lit(quantScale.toDouble), 6)
          .as("exact_quantile"),
        (-col("__u")).as("rank_error"),
        lit(epsilon).as("epsilon"))
  }

  /** Differentially-private group counts: exact per-group counts plus
    * SEEDED Laplace(1/ε) noise — the privacy-preserving release tier
    * next to [[kAnonymityViolations]]/[[lDiversityViolations]]'s audit
    * tier (publish per-cohort tallies without exposing any individual's
    * membership; ε is the standard privacy-loss knob). The true count
    * column is deliberately absent from the output — releasing it would
    * void the mechanism.
    *
    * Noise is DETERMINISTIC given (seed, group, releaseId): the uniform
    * comes from [[graft.functions.HashFunctions.md5Bucket]] (the
    * sampler/sharder primitive, already engine-portable), inverse-CDF'd
    * into a Laplace draw — so a release replays bit-for-bit in SQL and
    * is reproducible across runs. `releaseId` is the per-release nonce:
    * WITHOUT it, two releases of the same group over evolving data would
    * reuse identical noise and expose the exact count delta (and exact
    * membership changes), voiding the epsilon claim even with a secret
    * seed — every publication of fresh counts MUST carry a fresh
    * releaseId, and epsilon composes additively across releases.
    * (Cryptographic caveat, documented: a published seed lets noise be
    * reconstructed; operationally the seed is a secret — the determinism
    * here is the testing/replay contract, the same trade [[Dedup]]'s
    * portable md5 tier makes.)
    *
    * Scale shape: one keyed count with map-side partials; noise is
    * row-local ON THE GROUP FRAME. */
  def dpCounts(
      df: DataFrame,
      groupCol: String,
      epsilon: Double = 1.0,
      seed: Long = 42L,
      releaseId: String = "r0"): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    require(releaseId.nonEmpty, "releaseId must be non-empty")
    val u = (graft.functions.HashFunctions
      .md5Bucket(seed, concat_ws(":", lit(releaseId), col(groupCol)))
      .cast("double") + 0.5) / 4294967296.0
    val noise = when(u < 0.5, log(u * 2.0) / epsilon)
      .otherwise(-log((lit(1.0) - u) * 2.0) / epsilon)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + noise, 6).as("n_noisy"),
        lit(epsilon).as("epsilon"))
  }

  /** Differentially-private group MEAN with bounded per-unit
    * contribution — the release tier completing [[dpCounts]] (how many)
    * and [[dpQuantile]] (where the middle is) with "how much on
    * average": each unit's value sum CLIPS to [0, clip] (the
    * sensitivity bound every DP aggregate needs — one user, however
    * extreme, moves the sum by at most clip), then the classic
    * noisy-sum / noisy-count Laplace mechanism (Dwork, McSherry,
    * Nissim & Smith 2006) releases mean = (Σclipped + Lap(2·clip/ε)) /
    * (n_units + Lap(2/ε)), ε split evenly across the two queries by
    * sequential composition.
    *
    * Noise determinism, releaseId contract and the secret-seed caveat
    * are EXACTLY [[dpCounts]]' (seeded md5 inverse-CDF, channel-tagged
    * "sum"/"cnt" so the two draws are independent); the exact
    * sum/count/mean are deliberately absent from the output —
    * [[dpMeanDebug]] carries them for specs/audits only and is NOT a
    * private release.
    *
    * Exactness: values quantize like [[abTest]] (floor(v·quantScale) →
    * exact DECIMAL unit sums), the clip applies on the quantized
    * integer domain, and the released mean is one pinned IEEE chain.
    * NULL dp_mean when the noisy count is ≤ 0 (stated — a tiny cohort
    * under heavy noise has no meaningful release).
    *
    * Scale shape: one unit-keyed sum (map-side partials), one group
    * rollup of the unit frame, noise row-local on the group frame. */
  def dpMean(
      events: DataFrame,
      groupCol: String,
      unitCol: String,
      valueCol: String,
      clip: Double = 100.0,
      epsilon: Double = 1.0,
      seed: Long = 42L,
      releaseId: String = "r0",
      quantScale: Long = 1000L): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    require(clip > 0, s"clip must be positive: $clip")
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    require(releaseId.nonEmpty, "releaseId must be non-empty")
    val clipQ = math.floor(clip * quantScale).toLong
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val unit = events
      .select(col(groupCol).as("__g"), col(unitCol).as("__u"), q.as("__q"))
      .groupBy(col("__g"), col("__u"))
      .agg(sum(col("__q").cast("decimal(38,0)")).as("__us"))
    val grp = unit.groupBy(col("__g"))
      .agg(count(lit(1)).as("__nu"),
        sum(greatest(least(col("__us"), lit(clipQ)), lit(0L))).as("__cs"))
    def uDraw(tag: String) = (graft.functions.HashFunctions
      .md5Bucket(seed, concat_ws(":", lit(releaseId), lit(tag), col("__g")))
      .cast("double") + 0.5) / 4294967296.0
    def lap(u: org.apache.spark.sql.Column, b: Double) =
      when(u < 0.5, log(u * 2.0) * b)
        .otherwise(-log((lit(1.0) - u) * 2.0) * b)
    val bSum = 2.0 * clip / epsilon
    val bCnt = 2.0 / epsilon
    val noisySum = col("__cs").cast("double") / lit(quantScale.toDouble) +
      lap(uDraw("sum"), bSum)
    val noisyCnt = col("__nu").cast("double") + lap(uDraw("cnt"), bCnt)
    grp.select(col("__g").as(groupCol),
      when(noisyCnt > 0.0, round(noisySum / noisyCnt, 6)).as("dp_mean"),
      lit(epsilon).as("epsilon"), lit(clip).as("clip"))
  }

  /** [[dpMean]]'s audit twin: the exact clipped mean, unit count and
    * clip-loss share next to the released value. NOT a private
    * release — specs and mechanism audits only (same labeling as
    * [[dpQuantileDebug]]). */
  def dpMeanDebug(
      events: DataFrame,
      groupCol: String,
      unitCol: String,
      valueCol: String,
      clip: Double = 100.0,
      epsilon: Double = 1.0,
      seed: Long = 42L,
      releaseId: String = "r0",
      quantScale: Long = 1000L): DataFrame = {
    val clipQ = math.floor(clip * quantScale).toLong
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val unit = events
      .select(col(groupCol).as("__g"), col(unitCol).as("__u"), q.as("__q"))
      .groupBy(col("__g"), col("__u"))
      .agg(sum(col("__q").cast("decimal(38,0)")).as("__us"))
    val grp = unit.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_units"),
        sum(greatest(least(col("__us"), lit(clipQ)), lit(0L))).as("__cs"),
        sum(when(col("__us") > clipQ, 1L).otherwise(0L)).as("n_clipped"))
    val released = dpMean(events, groupCol, unitCol, valueCol, clip,
      epsilon, seed, releaseId, quantScale)
      .select(col(groupCol).as("__g"), col("dp_mean"))
    grp.join(released, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_units"), col("n_clipped"),
        round(col("__cs").cast("double") / lit(quantScale.toDouble) /
          col("n_units").cast("double"), 6).as("exact_clipped_mean"),
        col("dp_mean"))
  }

  /** Per-hour distribution drift against the corpus-wide reference:
    * each hour's value histogram scored by Jensen–Shannon divergence
    * (bits) against the GLOBAL distribution on the same grid — the
    * hourly "did traffic change shape this hour" monitor feeding the
    * same bins [[driftPsi]]/[[driftDistances]] read snapshot-vs-
    * snapshot, and the batch half of the
    * [[graft.streaming.EventStreams.driftHourlyStream]] twin (which
    * scores each hour the moment the watermark closes it, against the
    * same broadcast reference).
    *
    * Exactness: the stream collapses ONCE to (hour, bin) counts (the
    * only corpus-scale shuffle; census-guarded hour frame); the
    * reference marginal sums that frame; each hour's JSD folds the
    * DENSE nBins grid in pinned ascending-bin order with
    * [[driftDistances]]' exact add-one smoothing and ln(2) literal.
    *
    * @return per hour: (hour_id, n_events, jsd_bits), hour-ascending,
    *         6-rounded */
  def driftHourly(
      events: DataFrame,
      metric: org.apache.spark.sql.Column,
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      width: Long = 100L,
      nBins: Int = 10,
      maxHours: Long = 200000L): DataFrame = {
    require(width > 0 && nBins > 0, "need positive width and nBins")
    val spark = events.sparkSession
    val v = metric.cast("bigint")
    // integer floor-div binning (`div`, not double /): exact at any
    // magnitude, matching the streaming twin's Math.floorDiv — the
    // double path could disagree near bin boundaries for |v| ≥ 2^53
    // (negatives clamp to bin 0 under either rounding mode)
    val hb = events
      .select(expr(s"`$tsCol` div ${hourUs}L").as("__h"), v.as("__v"))
      .select(col("__h"),
        greatest(least(expr(s"__v div ${width}L"),
          lit(nBins - 1L)), lit(0L)).as("bin"))
      .groupBy(col("__h"), col("bin"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // census + reference + hour folds share it
    val nHours = hb.select(col("__h")).distinct().count()
    require(nHours <= maxHours,
      s"driftHourly: $nHours observed hours exceed maxHours=$maxHours — " +
        "the per-hour folds assume a calendar-bounded frame")
    val ref = hb.groupBy(col("bin")).agg(sum(col("__c")).as("__rc"))
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val refGrid = broadcast(spine
      .join(ref, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__rc"), lit(0L)).as("__rc"))
      .crossJoin(broadcast(
        ref.agg(sum(col("__rc")).as("__nr")))))
    val hours = hb.select(col("__h")).distinct()
    val dense = hours.crossJoin(broadcast(spine.select(col("bin"))))
      .join(hb, Seq("__h", "bin"), "left")
      .select(col("__h"), col("bin"),
        coalesce(col("__c"), lit(0L)).as("__c"))
      .join(refGrid, Seq("bin"))
    val lg2 = math.log(2.0)
    dense.groupBy(col("__h"))
      .agg(sum(col("__c")).as("n_events"),
        max(col("__nr")).as("__nr2"),
        sort_array(collect_list(struct(col("bin"), col("__c"),
          col("__rc")))).as("__g"))
      .select(col("__h").as("hour_id"), col("n_events"),
        round(aggregate(col("__g"), lit(0.0), (acc, c) => {
          val pa = (c.getField("__c").cast("double") + 1.0) /
            (col("n_events").cast("double") + lit(nBins.toDouble))
          val pb = (c.getField("__rc").cast("double") + 1.0) /
            (col("__nr2").cast("double") + lit(nBins.toDouble))
          val m = (pa + pb) / 2.0
          acc + (pa * (log(pa / m) / lit(lg2)) +
            pb * (log(pb / m) / lit(lg2))) / 2.0
        }), 6).as("jsd_bits"))
      .orderBy(col("hour_id"))
  }

  /** Population-stability index between two corpus snapshots over one
    * numeric metric — the drift monitor a recurring ingestion runs
    * before retraining (PSI < 0.1: stable; 0.1–0.25: drifting; > 0.25:
    * the distribution moved, investigate). Bins are the fixed-width
    * integer grid of [[lengthHistogram]]; PSI = Σ (p̂ᵃ−p̂ᵇ)·ln(p̂ᵃ/p̂ᵇ)
    * with add-one smoothing over the FULL grid (p̂ = (n+1)/(N+nBins)) so
    * empty bins are defined on both sides — a documented, deterministic
    * convention rather than an ε fudge factor.
    *
    * One row out: (n_bins, n_a, n_b, psi). Counts are exact longs; the
    * IEEE per-bin terms fold in PINNED ascending-bin order over one
    * dense collected grid (the [[zipfFit]] discipline — the grid is
    * `nBins` cells, never corpus-scale), so the report replays exactly
    * in SQL list folds.
    *
    * Scale shape: each snapshot is touched once by a binned keyed count;
    * everything after runs on the ≤nBins-cell frames. */
  def driftPsi(
      a: DataFrame,
      b: DataFrame,
      metric: org.apache.spark.sql.Column,
      width: Long = 100L,
      nBins: Int = 10): DataFrame = {
    require(width > 0 && nBins > 0, "need positive width and nBins")
    def binned(df: DataFrame, nCol: String): DataFrame = {
      val v = metric.cast("bigint")
      // clamp BOTH ends: without the greatest(), a negative metric gets
      // a negative bin that falls off the [0, nBins) spine and silently
      // vanishes from n_a/n_b, skewing the PSI with no signal
      df.select(greatest(
        least(floor(v / lit(width)).cast("bigint"), lit(nBins - 1L)),
        lit(0L)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(nCol))
    }
    val spark = a.sparkSession
    // dense bin spine: every grid cell present on both sides, count 0
    // when empty (add-one smoothing needs the full grid, and the pinned
    // fold needs identical cell lists in both engines)
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val grid = spine
      .join(binned(a, "__na"), Seq("bin"), "left")
      .join(binned(b, "__nb"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    grid.agg(
      count(lit(1)).as("n_bins"),
      sum(col("__na")).as("n_a"),
      sum(col("__nb")).as("n_b"),
      sort_array(collect_list(struct(col("bin"), col("__na"), col("__nb"))))
        .as("__g"))
      .select(col("n_bins"), col("n_a"), col("n_b"),
        round(aggregate(col("__g"), lit(0.0), (acc, c) => {
          val pa = (c.getField("__na").cast("double") + 1.0) /
            (col("n_a").cast("double") + col("n_bins").cast("double"))
          val pb = (c.getField("__nb").cast("double") + 1.0) /
            (col("n_b").cast("double") + col("n_bins").cast("double"))
          acc + (pa - pb) * log(pa / pb)
        }), 6).as("psi"))
  }

  /** Mutual information between two categorical columns — the
    * dependence audit (does source determine language? is the quality
    * tier independent of the crawl?). One row out: (n_cells, n_rows,
    * h_a, h_b, mi, nmi) in nats, NMI = MI/√(H_a·H_b) (NULL when either
    * entropy is 0 — a constant column carries no information to
    * normalize by).
    *
    * Exactness: all counts are exact longs (one keyed cell count + two
    * marginal rollups OF THE CELL FRAME, never a second corpus pass);
    * the IEEE entropy/MI terms are folded in PINNED order — each sum
    * collapses its ≤|A|·|B|-cell frame to ONE sorted array and folds
    * ascending (the [[zipfFit]] discipline), so the report replays
    * bit-for-bit in SQL list folds.
    *
    * Scale shape: the corpus is touched once for the cell count
    * (map-side partials); everything after runs on the cell frame
    * (categorical cardinalities, not corpus-scale). The cell frame is
    * collected into ONE row for the pinned fold, so its size is
    * fail-fast ENFORCED (`maxCells`, the [[Dedup]] `maxDriverEdges`
    * pattern) — pointed at a high-cardinality pair (user_id × url) the
    * census aborts with a clear message instead of building a giant row
    * and dying opaquely in the collect. */
  def mutualInformation(
      df: DataFrame,
      aCol: String,
      bCol: String,
      maxCells: Long = 1L << 20): DataFrame = {
    require(maxCells > 0, s"maxCells must be positive: $maxCells")
    val cells = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__nij"))
      .localCheckpoint() // four consumers: census + joint fold + marginals
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"mutualInformation: $nCells distinct ($aCol, $bCol) cells exceed " +
        s"maxCells=$maxCells — this report folds the full cell table in " +
        s"one row and is meant for CATEGORICAL pairs; pick lower-" +
        s"cardinality columns or raise maxCells only if the cells fit " +
        s"driver memory")
    val aM = cells.groupBy(col("__a")).agg(sum(col("__nij")).as("__ni"))
    val bM = cells.groupBy(col("__b")).agg(sum(col("__nij")).as("__nj"))
    def entropyFold(arr: org.apache.spark.sql.Column,
        nTotal: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0.0), (acc, ni) =>
        acc - (ni.cast("double") / nTotal) * log(ni.cast("double") / nTotal))
    val joined = cells.join(aM, Seq("__a")).join(bM, Seq("__b"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("__nij")).as("n_rows"),
        sort_array(collect_list(struct(
          col("__a"), col("__b"), col("__nij"), col("__ni"), col("__nj"))))
          .as("__cells"))
    val aArr = aM.agg(sort_array(collect_list(struct(col("__a"), col("__ni"))))
      .as("__am"))
    val bArr = bM.agg(sort_array(collect_list(struct(col("__b"), col("__nj"))))
      .as("__bm"))
    val n = col("n_rows").cast("double")
    joined.crossJoin(aArr).crossJoin(bArr)
      .select(col("n_cells"), col("n_rows"),
        entropyFold(transform(col("__am"), _.getField("__ni")), n).as("__ha"),
        entropyFold(transform(col("__bm"), _.getField("__nj")), n).as("__hb"),
        aggregate(col("__cells"), lit(0.0), (acc, c) =>
          acc + (c.getField("__nij").cast("double") / n) *
            log((c.getField("__nij").cast("double") * n) /
              (c.getField("__ni").cast("double") *
                c.getField("__nj").cast("double")))).as("__mi"))
      .select(col("n_cells"), col("n_rows"),
        round(col("__ha"), 6).as("h_a"),
        round(col("__hb"), 6).as("h_b"),
        round(col("__mi"), 6).as("mi"),
        round(col("__mi") /
          nullif(sqrt(col("__ha") * col("__hb")), lit(0.0)), 6).as("nmi"))
  }

  /** Per-group OLS trend of a metric over a coarse integer time axis —
    * the metric-drift report (is `value` for `purchase` events rising
    * week over week? is a source's quality decaying across crawls?).
    * One row per group: (group, n_points, slope, intercept), slope in
    * metric-units per x-unit.
    *
    * Exactness without pinned folds: x is a SMALL integer (e.g. a day
    * index — caller maps the timestamp down) and y is cast to
    * decimal(18,6), so Σx, Σx², Σy, Σxy are all EXACT integer/decimal
    * sums — commutative, no FP addition order to pin — and only the
    * final slope/intercept are IEEE doubles computed from exactly-equal
    * operands in any engine. The magnitudes stay small (day ≤ 10⁴), so
    * the decimal→double conversions sit far from precision edges.
    *
    * Scale shape: one keyed aggregate with map-side partials; nothing
    * collected, nothing windowed — the 100 TB shape for a per-group
    * scalar fit. Degenerate groups (single x value) get NULL slope via
    * nullif, not an ANSI divide-by-zero abort. */
  def groupTrend(
      df: DataFrame,
      groupCol: String,
      x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): DataFrame = {
    val xi = x.cast("bigint")
    val yi = y.cast("decimal(18,6)")
    df.select(col(groupCol), xi.as("__x"), yi.as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_points"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x").cast("decimal(18,0)") * col("__y")).as("__sxy"))
      .select(col(groupCol), col("n_points"),
        col("__sx").cast("double").as("__dsx"),
        col("__sxx").cast("double").as("__dsxx"),
        col("__sy").cast("double").as("__dsy"),
        col("__sxy").cast("double").as("__dsxy"))
      .select(col(groupCol), col("n_points"), col("__dsx"), col("__dsy"),
        ((col("n_points") * col("__dsxy") - col("__dsx") * col("__dsy")) /
          nullif(col("n_points") * col("__dsxx") - col("__dsx") * col("__dsx"),
            lit(0.0))).as("__slope"))
      .select(col(groupCol), col("n_points"),
        round(col("__slope"), 6).as("slope"),
        round((col("__dsy") - col("__slope") * col("__dsx")) /
          col("n_points"), 6).as("intercept"))
  }

  /** Train/val/test leakage report: near-duplicate pairs (MinHash/LSH,
    * est_jaccard >= `minJaccard`) tallied by the split pair they land in
    * — the eval-hygiene check that a random document split silently
    * fails (near-dups of training docs sitting in test inflate eval).
    * Splits come from [[Curation.splitAssign]]'s deterministic hash cut,
    * so the report is a pure function of the corpus. Output one row per
    * unordered split pair: (split_a <= split_b, n_pairs, cross_split).
    * Cost = the LSH pair pass (banded, whale-guarded, never all-pairs)
    * plus two broadcast-sized split joins on the slim pair frame. */
  def splitLeakage(
      docs: DataFrame,
      splits: Seq[(String, Double)],
      minJaccard: Double = 0.5,
      shingleN: Int = 5,
      k: Int = 16,
      bands: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id",
      tier: Dedup.HashTier = Dedup.PortableMd5): DataFrame = {
    val pairs = Dedup.minhashLsh(docs, textCol, idCol, shingleN, k, bands,
      tier = tier)
      .filter(col("est_jaccard") >= minJaccard)
    // splitAssign permits fractions summing below 1.0 and leaves the
    // remainder's split NULL; least/greatest SKIP nulls, which would
    // silently re-label a (train, unassigned) pair as (train, train).
    // Surfacing those pairs under an explicit bucket keeps the report
    // honest for partial split maps.
    val s = Curation.splitAssign(docs, splits, idCol = idCol)
      .select(col(idCol), coalesce(col("split"), lit("unassigned")).as("split"))
    pairs
      .join(s.select(col(idCol).as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(s.select(col(idCol).as("id_b"), col("split").as("sb")), Seq("id_b"))
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_split", col("split_a") =!= col("split_b"))
  }

  /** Per-source quality stratification: each source's documents cut into
    * `n` quantile buckets by (quality, doc_id) — the tie-broken total
    * order both engines replay — with per-bucket size, token mass, and
    * decimal-exact mean quality. Where each domain's quality mass sits
    * before choosing a filter threshold or mixture weight. The `ntile`
    * window is PARTITIONED by source (the whole-suite plan audit bans
    * unpartitioned windows — one skewed source is still bounded by that
    * source's row count, the same contract as sessionize's per-user
    * sort). */
  def qualityDeciles(
      docs: DataFrame,
      n: Int = 10,
      textCol: String = "text",
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(n > 0, "n must be positive")
    val enStop = T.langStopwords("en")
    val scored = Fan.spread(docs.select(col(idCol), col(sourceCol), col(textCol)))
      .select(col(idCol), col(sourceCol),
        T.qualityScore(col(textCol), enStop).as("quality"),
        size(filter(T.tokens(col(textCol)), t => length(t) > 0))
          .cast("bigint").as("n_tokens"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("quality").desc, col(idCol).asc)
    scored
      .withColumn("bucket", ntile(n).over(w).cast("bigint"))
      .groupBy(col(sourceCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        // the corpus_report mean-quality contract: decimal sum (order-
        // blind exact), ONE double division — identical IEEE expression
        // in both engines
        (sum(col("quality").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_quality"))
  }

  /** Column profile (the ANALYZE/profiling staple): one row per column
    * with row count, null count, EXACT distinct count, and min/max
    * rendered as strings. One aggregation pass per column — the exact
    * tier, whose distinct shuffles are the price of oracle-replayable
    * numbers; at 100 TB the one-pass mergeable-sketch tier is the HLL
    * aggregate ([[org.apache.spark.sql.graft.SketchAggregates]]), which
    * profiles every column in a single scan at ±2% error. Min/max are
    * stringified by the engine's canonical integer/string rendering —
    * profile integer and string columns here (float rendering differs
    * across engines). */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** Two-sample A/B z-test per experiment group: deterministic 50/50
    * assignment on the randomization UNIT (md5Bucket parity — the
    * split/shard discipline: stable under retries, portable to SQL, and
    * a user keeps their arm as the corpus grows), Welch's z over the
    * unit-level metric. The analysis every event-pipeline owner runs
    * before trusting a treatment effect.
    *
    * Exactness discipline: the metric is quantized (`floor(value ·
    * quantScale)` — floor of an identical IEEE product, portable), and
    * the per-arm moment sums (n, Σq, Σq²) accumulate as exact decimals —
    * Σq as DECIMAL(28,0) and Σq² as a DECIMAL(19,0)×DECIMAL(19,0)
    * product summed at DECIMAL(38,0): q is a LONG, so |q| < 2⁶³ fits
    * precision 19 exactly (never the silent null an 18-digit cast
    * produces under non-ANSI overflow) and q² < 2¹²⁶ ≈ 8.5e37 fits the
    * 38-digit product — Σq² of a BIGINT-scale metric overflows long at
    * corpus scale, and a double sum is order-dependent. One pinned IEEE
    * expression at the end turns the exact moments into means, sample
    * variances and the Welch z, so the whole report replays hash-exact
    * in SQL (HUGEINT accumulation on the DuckDB side). Groups need ≥ 2
    * units per arm (sample variance).
    *
    * @return (grp, n_a, n_b, mean_qa, mean_qb, var_qa, var_qb, z) on the
    *         quantized scale; z is scale-invariant so it equals the
    *         raw-metric z exactly */
  def abTest(
      events: DataFrame,
      groupCol: String,
      unitCol: String,
      valueCol: String,
      seed: Long = 42L,
      quantScale: Long = 1000L): DataFrame = {
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    val arm = pmod(graft.functions.HashFunctions.md5Bucket(seed, col(unitCol)),
      lit(2L))
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val moments = events
      .select(col(groupCol).as("grp"), arm.as("__arm"), q.as("__q"))
      .groupBy(col("grp"), col("__arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("__q").cast("decimal(28,0)")).as("s"),
        sum((col("__q").cast("decimal(19,0)") *
          col("__q").cast("decimal(19,0)"))).as("ss"))
    def armSide(v: Int, sfx: String) = moments.filter(col("__arm") === v)
      .select(col("grp"), col("n").as(s"n_$sfx"),
        col("s").cast("double").as(s"__s_$sfx"),
        col("ss").cast("double").as(s"__ss_$sfx"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val meanA = col("__s_a") / nA
    val meanB = col("__s_b") / nB
    val varA = (col("__ss_a") - col("__s_a") * col("__s_a") / nA) / (nA - 1.0)
    val varB = (col("__ss_b") - col("__s_b") * col("__s_b") / nB) / (nB - 1.0)
    armSide(0, "a").join(armSide(1, "b"), Seq("grp"))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .select(col("grp"), col("n_a"), col("n_b"),
        meanA.as("mean_qa"), meanB.as("mean_qb"),
        varA.as("var_qa"), varB.as("var_qb"),
        ((meanA - meanB) / sqrt(varA / nA + varB / nB)).as("z"))
  }

  /** Retention cohort matrix over an event stream: cohort = the bucket
    * (default: week) of a user's FIRST activity; each cell counts the
    * cohort's users still active `week_offset` buckets later, with
    * `retention` = cell / cohort size. The product-analytics staple, in
    * the shape that scales: the raw stream collapses to DISTINCT
    * (user, bucket) rows first (one keyed distinct — the only corpus-
    * scale shuffle), the cohort min and the matrix are aggs over that
    * slim frame, and the retention normalizer is a window over the
    * bucket-cardinality matrix, never the events. Exact integer bucket
    * math (`ts div bucketUs`), one IEEE division for the ratio.
    *
    * @param tsCol epoch-micros BIGINT event time
    * @return (cohort_week, week_offset, n_users, retention) */
  def retentionCohorts(
      events: DataFrame,
      bucketUs: Long = 7L * 86400L * 1000000L,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val userWeeks = events
      .select(col(userCol).as("__u"), expr(s"`$tsCol` div ${bucketUs}L").as("__w"))
      .distinct()
    val cohorts = userWeeks.groupBy(col("__u"))
      .agg(min(col("__w")).as("cohort_week"))
    val matrix = userWeeks.join(cohorts, Seq("__u"))
      .groupBy(col("cohort_week"),
        (col("__w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val byCohort = Window.partitionBy(col("cohort_week"))
    matrix.select(col("cohort_week"), col("week_offset"), col("n_users"),
      (col("n_users").cast("double") /
        max(when(col("week_offset") === 0L, col("n_users"))).over(byCohort)
          .cast("double")).as("retention"))
  }

  /** RFM feature table (recency / frequency / monetary — the classic
    * user-segmentation basis) plus tenure and active-day coverage: the
    * per-user feature block every churn model, LTV model and cohort
    * segmentation starts from. ALL-INTEGER output: recency and tenure in
    * whole days (`div` arithmetic), monetary as the `quantScale`-
    * quantized exact sum ([[abTest]]'s discipline) — so the table
    * replays hash-exact and composes into downstream exact pipelines.
    *
    * Shape: ONE user-keyed aggregate over the stream (count, min/max
    * day, conditional sum, distinct-day count — Catalyst's two-phase
    * distinct rewrite keeps it a single pass) plus a 1-row broadcast of
    * the corpus max day for the recency anchor.
    *
    * @return (user_id, recency_days, tenure_days, frequency,
    *         active_days, monetary_q) */
  def rfmFeatures(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      dayUs: Long = 86400000000L,
      quantScale: Long = 1000L): DataFrame = {
    require(dayUs > 0 && quantScale > 0, "need positive dayUs/quantScale")
    val day = expr(s"`$tsCol` div ${dayUs}L")
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val perUser = events
      .select(col(userCol), day.as("__day"), q.as("__q"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("frequency"),
        min(col("__day")).as("__first"),
        max(col("__day")).as("__last"),
        countDistinct(col("__day")).as("active_days"),
        sum(col("__q")).as("monetary_q"))
    val anchor = broadcast(events
      .agg(max(day).as("__maxday")))
    perUser.crossJoin(anchor)
      .select(col(userCol),
        (col("__maxday") - col("__last")).as("recency_days"),
        (col("__last") - col("__first")).as("tenure_days"),
        col("frequency"), col("active_days"), col("monetary_q"))
  }

  /** Traffic-concentration report: what share of all events do the
    * top-k most active users generate — the "1% of users are 40% of
    * load" number that sizes rate limits, caches and the key-skew
    * strategy ([[graft.operators.Joins.keyFrequency]]'s census rolled
    * into one decision scalar).
    *
    * Shape: one user-keyed count (map-side partials — the only corpus
    * shuffle), a top-k cut that plans as `TakeOrderedAndProject` (ties
    * pinned by user id, never a global sort), and exact BIGINT sums on
    * the k-row and 1-row frames; the share is one IEEE division.
    *
    * @return one row (k, n_users, top_events, total_events, share) */
  def topKConcentration(
      events: DataFrame,
      userCol: String = "user_id",
      k: Int = 100): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val counts = events.groupBy(col(userCol).as("__u"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint() // two consumers: top-k cut + corpus totals
    val top = counts.orderBy(col("__n").desc, col("__u")).limit(k)
      .agg(count(lit(1)).as("k"), sum(col("__n")).as("top_events"))
    val total = counts
      .agg(count(lit(1)).as("n_users"), sum(col("__n")).as("total_events"))
    top.crossJoin(broadcast(total))
      .select(col("k"), col("n_users"), col("top_events"),
        col("total_events"),
        round(col("top_events").cast("double") /
          col("total_events").cast("double"), 6).as("share"))
  }

  /** CUSUM change-point statistic (Page 1954) over per-type hourly
    * event counts — the monitoring primitive that catches a SUSTAINED
    * rate shift a per-hour z-score misses (each hour may sit within
    * noise while the cumulative drift compounds). Uses the max(0,·)
    * one-sided CUSUM in its WINDOW form: with dᵗ = nᵗ − (k̄ + slack),
    * Sᵗ = max(0, Sᵗ⁻¹ + dᵗ) ≡ Cᵗ − min(C⁰..Cᵗ) where Cᵗ is the running
    * sum of d — two cumulative window passes instead of a recursion, so
    * the statistic replays in plain SQL window functions.
    *
    * Exactness: k̄ is the per-type mean hourly count FLOORED to an
    * integer (exact `div`), so every dᵗ, Cᵗ, min and Sᵗ is exact BIGINT
    * arithmetic — no FP accumulation anywhere (a double running sum
    * would be engine-summation-order dependent; DuckDB's segment-tree
    * window sums do not add left-to-right).
    *
    * Scale shape: the event stream collapses to the (type, hour) frame
    * first (one keyed count, map-side partials); both cumulative windows
    * are PARTITIONED by event type over that calendar-bounded frame.
    * One type's full history on one task is the [[ewmaSmooth]]-family
    * caveat, bounded by hours-per-type, not events.
    *
    * @param slack per-hour allowance above the mean before drift
    *              accumulates (integer, exactness contract)
    * @return (event_type, hour_id, n_events, cusum) */
  def cusumChangepoint(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      slack: Long = 0L): DataFrame = {
    require(slack >= 0, s"slack must be non-negative: $slack")
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"`$tsCol` div ${hourUs}L").as("hour_id"))
      .agg(count(lit(1)).as("n_events"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("hour_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("__mean",
        expr("sum(n_events) over (partition by event_type) div " +
          "count(1) over (partition by event_type)"))
      .withColumn("__d", col("n_events") - col("__mean") - lit(slack))
      .withColumn("__c", sum(col("__d")).over(cum))
      .withColumn("cusum",
        col("__c") - least(min(col("__c")).over(cum), lit(0L)))
      .select(col("event_type"), col("hour_id"), col("n_events"),
        col("cusum"))
  }

  /** Changepoint ESTIMATION twin of [[cusumChangepoint]]: the single
    * best mean-shift split of each type's hourly count series — the
    * first step of binary segmentation (Scott & Knott 1974; the AMOC
    * model of the changepoint literature). CUSUM says "something
    * drifted"; this says WHERE: the split τ minimizing
    * SSE(τ) = Σ_left (x−μ_L)² + Σ_right (x−μ_R)², with each segment's
    * SSE computed from prefix sums as Σx² − (Σx)²/n.
    *
    * Exactness + scale shape: the event stream collapses once to the
    * calendar-bounded (type, hour, count) frame (map-side partials —
    * the only corpus-scale work); prefix sums ride a type-partitioned
    * cumulative window; every candidate's SSE is ONE fixed IEEE shape
    * over exact integer/decimal prefix sums (x² terms are DECIMAL(19,0)
    * squares summed into DECIMAL(29,0) — a 10⁹-event whale hour squares
    * to 10¹⁸, at the long boundary, so plain long sums would overflow);
    * the argmin row is picked by a type-partitioned
    * row_number over (sse, hour) — the hour tie-break makes the pick
    * deterministic, and both engines compute identical doubles so the
    * order replays. Types with a single active hour have no valid
    * split and are absent from the output.
    *
    * @return per type: (event_type, n_hours, split_hour — the LAST hour
    *         of the left segment, n_left, mean_before, mean_after,
    *         shift, sse_split, sse_pooled), means/SSEs rounded to 6
    */
  def changepointMeanShift(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"`$tsCol` div ${hourUs}L").as("hour_id"))
      .agg(count(lit(1)).as("__x"))
      .withColumn("__x2",
        col("__x").cast("decimal(19,0)") * col("__x").cast("decimal(19,0)"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("hour_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("event_type"))
    val framed = hourly
      .withColumn("__nl", count(lit(1)).over(cum))
      .withColumn("__sl", sum(col("__x")).over(cum))
      .withColumn("__sql", sum(col("__x2")).over(cum))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__st", sum(col("__x")).over(all))
      .withColumn("__sqt", sum(col("__x2")).over(all))
      .filter(col("__nl") < col("__n")) // both segments non-empty
    def segSse(sq: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column) =
      sq.cast("double") - s.cast("double") * s.cast("double") / n.cast("double")
    val scored = framed
      .withColumn("__sse",
        segSse(col("__sql"), col("__sl"), col("__nl")) +
          segSse(col("__sqt") - col("__sql"), col("__st") - col("__sl"),
            col("__n") - col("__nl")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("__sse"), col("hour_id"))))
      .filter(col("__rk") === 1)
    scored.select(
      col("event_type"),
      col("__n").as("n_hours"),
      col("hour_id").as("split_hour"),
      col("__nl").as("n_left"),
      round(col("__sl").cast("double") / col("__nl").cast("double"), 6)
        .as("mean_before"),
      round((col("__st") - col("__sl")).cast("double") /
        (col("__n") - col("__nl")).cast("double"), 6).as("mean_after"),
      round((col("__st") - col("__sl")).cast("double") /
        (col("__n") - col("__nl")).cast("double") -
        col("__sl").cast("double") / col("__nl").cast("double"), 6)
        .as("shift"),
      round(col("__sse"), 6).as("sse_split"),
      round(segSse(col("__sqt"), col("__st"), col("__n")), 6)
        .as("sse_pooled"))
  }

  /** MAD-based robust anomaly detection per event type — the
    * median/median-absolute-deviation twin of the mean/σ z-score
    * detector (window_anomalies): hours where
    * |x − median| > k·MAD flag as anomalies. Robust because one true
    * outage hour inflates σ and masks itself, while the median and MAD
    * barely move (50% breakdown point vs 0% — Hampel's classic
    * argument for MAD).
    *
    * Exactness — the HALF-UNIT trick: an exact interpolated median of
    * BIGINTs is either an integer or ends in .5, so 2·median is an
    * exact integer; deviations dev2 = |2x − med2| are then exact
    * BIGINTs, and their median (the MAD, doubled) is again a
    * percentile of BIGINTs — the one percentile shape already
    * validated bit-identical to DuckDB's quantile_cont
    * (length_quantiles). The flag compares integer dev2 against
    * k·mad2 and the output med/mad divide by 2 once (exact halves).
    * Scale shape: the event stream collapses once to the
    * calendar-bounded hour frame; two percentile aggs per type
    * broadcast back onto it.
    *
    * @param k flag threshold in MAD units
    * @return flagged hours: (event_type, hour_id, n_events, med, mad)
    */
  def madAnomalies(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val hourly = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"`$tsCol` div ${hourUs}L").as("hour_id"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint() // median agg + deviation pass both read it
    val med = hourly.groupBy(col("event_type"))
      .agg((percentile(col("n_events"), lit(0.5)) * 2.0)
        .cast("long").as("__med2"))
    val dev = hourly.join(broadcast(med), Seq("event_type"))
      .withColumn("__dev2", abs(col("n_events") * 2 - col("__med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg((percentile(col("__dev2"), lit(0.5)) * 2.0)
        .cast("long").as("__mad4")) // 4x units: median of 2x-deviations, doubled
    dev.join(broadcast(mad), Seq("event_type"))
      // |x − med| > k·MAD in integers: dev2/2 > k·mad4/4 ⟺ 2·dev2 > k·mad4
      .filter(col("__dev2") * 2 > col("__mad4") * k)
      .select(col("event_type"), col("hour_id"), col("n_events"),
        (col("__med2").cast("double") / 2.0).as("med"),
        (col("__mad4").cast("double") / 4.0).as("mad"))
  }

  /** Exact α-trimmed mean per group — the robust location estimate
    * between the median (α→0.5) and the mean (α=0): drop the k =
    * ⌊α·n⌋ smallest and largest observations, average the rest. Like
    * [[conformalInterval]]'s order statistic, the rank cut is computed
    * DISTRIBUTIVELY with no per-group collect: quantized values
    * collapse to a (group, value, count) frame; a value-ordered
    * cumulative window gives each distinct value its rank interval
    * [cum−c+1, cum]; the kept mass is the interval's overlap with
    * [k+1, n−k] — exact integer arithmetic — and each value
    * contributes kept·q to a decimal sum. One IEEE division per mean.
    *
    * @param trimPct trim fraction per side in PERCENT (integer so k
    *        stays exact: k = n·trimPct div 100)
    * @return (group, n, n_trimmed, mean_raw, mean_trimmed), 6-rounded
    */
  def trimmedMean(
      events: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value",
      trimPct: Int = 10,
      quantScale: Long = 1000L): DataFrame = {
    require(trimPct >= 1 && trimPct <= 49, s"trimPct in [1,49]: $trimPct")
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val vc = events.select(col(groupCol).as("__g"), q.as("__q"))
      .groupBy(col("__g"), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val cum = vc.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__q"))))
    val tot = vc.groupBy(col("__g"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__q").cast("decimal(28,0)") * col("__c")).as("__sq"))
      .withColumn("__k", expr(s"(__n * ${trimPct}L) div 100L"))
    cum.join(tot, Seq("__g"))
      .withColumn("__kept",
        greatest(lit(0L),
          least(col("__cum"), col("__n") - col("__k")) -
            greatest(col("__cum") - col("__c") + 1, col("__k") + 1) + 1))
      .groupBy(col("__g"), col("__n"), col("__sq"), col("__k"))
      .agg(sum(col("__q").cast("decimal(28,0)") * col("__kept"))
        .as("__sqt"))
      .select(col("__g").as(groupCol),
        col("__n").as("n"),
        (col("__n") - lit(2L) * col("__k")).as("n_trimmed"),
        round(col("__sq").cast("double") / col("__n").cast("double") /
          lit(quantScale.toDouble), 6).as("mean_raw"),
        round(col("__sqt").cast("double") /
          (col("__n") - lit(2L) * col("__k")).cast("double") /
          lit(quantScale.toDouble), 6).as("mean_trimmed"))
  }

  /** Winsorized mean — the CLAMPING sibling of [[trimmedMean]] (Tukey
    * 1962): instead of dropping each tail's k = ⌊n·pct/100⌋ values,
    * they are replaced by the nearest kept order statistics (the values
    * at ranks k+1 and n−k) — the estimator of choice when tail mass
    * carries real signal that should saturate rather than vanish
    * (revenue caps, latency SLO clamps).
    *
    * Same scale shape as the trimmed mean: the corpus collapses to ONE
    * (group, distinct-quantized-value, count) frame; ranks are value-
    * ordered cumulative sums over that frame (never a per-row global
    * sort or per-group collect), and the clamp values fall out of the
    * SAME cumsum as conditional minima (first value whose cumulative
    * count reaches rank k+1 / rank n−k). Exactness: integer rank
    * algebra and decimal sums until one IEEE finish per output,
    * 6-rounded.
    *
    * @param winsorPct clamp fraction per side in PERCENT (integer so
    *        k stays exact: k = n·winsorPct div 100)
    * @return (group, n, clamp_lo, clamp_hi, mean_raw,
    *         mean_winsorized), 6-rounded */
  def winsorizedMean(
      events: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value",
      winsorPct: Int = 10,
      quantScale: Long = 1000L): DataFrame = {
    require(winsorPct >= 1 && winsorPct <= 49,
      s"winsorPct in [1,49]: $winsorPct")
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val vc = events.select(col(groupCol).as("__g"), q.as("__q"))
      .groupBy(col("__g"), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val cum = vc.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__q"))))
    val tot = vc.groupBy(col("__g"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__q").cast("decimal(28,0)") * col("__c")).as("__sq"))
      .withColumn("__k", expr(s"(__n * ${winsorPct}L) div 100L"))
    cum.join(tot, Seq("__g"))
      .withColumn("__kept",
        greatest(lit(0L),
          least(col("__cum"), col("__n") - col("__k")) -
            greatest(col("__cum") - col("__c") + 1, col("__k") + 1) + 1))
      .groupBy(col("__g"), col("__n"), col("__sq"), col("__k"))
      .agg(
        sum(col("__q").cast("decimal(28,0)") * col("__kept")).as("__sqm"),
        min(when(col("__cum") >= col("__k") + 1, col("__q"))).as("__qlo"),
        min(when(col("__cum") >= col("__n") - col("__k"), col("__q")))
          .as("__qhi"))
      .select(col("__g").as(groupCol),
        col("__n").as("n"),
        round(col("__qlo").cast("double") / lit(quantScale.toDouble), 6)
          .as("clamp_lo"),
        round(col("__qhi").cast("double") / lit(quantScale.toDouble), 6)
          .as("clamp_hi"),
        round(col("__sq").cast("double") / col("__n").cast("double") /
          lit(quantScale.toDouble), 6).as("mean_raw"),
        round((col("__sqm") +
          col("__k").cast("decimal(28,0)") * col("__qlo") +
          col("__k").cast("decimal(28,0)") * col("__qhi")).cast("double") /
          col("__n").cast("double") / lit(quantScale.toDouble), 6)
          .as("mean_winsorized"))
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978) per group: the
    * classical ACF r_k at lags 1..6 over the hourly series plus
    * Q = n(n+2)·Σ r_k²/(n−k) — "is this series white noise, or does
    * autocorrelation structure remain" (the residual-diagnostic read
    * after a [[graft.streaming.EventStreams.holtWinters]] fit, and the
    * seasonality detector before one).
    *
    * Exactness: with S = Σx and n observed hours, the mean-centered
    * products scale exactly — num_k·n² = Σ(n·x_t − S)(n·x_{t+k} − S)
    * and den·n² = Σ(n·x_t − S)² accumulate in decimal(38,0), the n²
    * cancels in r_k = num_k/den, ONE IEEE division per lag, and Q is a
    * fixed six-term expression in written order. Lag pairs come from an
    * equi-join on hour_id + k (the event_autocorr discipline — never
    * lead()-by-rows, which mispairs across missing hours); gaps in the
    * series simply contribute no pair at that lag, documented.
    *
    * Scale shape: the corpus collapses to the (group, hour, count)
    * frame once (localCheckpoint-ed; the 6-lag join and the global
    * moments share it); everything after is hour-scale.
    *
    * @return (group, n_hours, r1..r6, q_stat), 6-rounded; NULL lags
    *         (no pairs) contribute 0 to Q, and a group with zero pairs
    *         at EVERY lag still emits its row (all-NULL r's, q_stat 0) */
  def ljungBox(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1 && maxLag <= 24, s"maxLag in [1,24]: $maxLag")
    val spark = events.sparkSession
    val h = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint() // lag join + global moments share it
    val tot = h.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val den = h.join(tot, Seq("__g"))
      .groupBy(col("__g"), col("__n"))
      .agg(sum((d(col("__n")) * col("__x") - col("__s")) *
        (d(col("__n")) * col("__x") - col("__s"))).as("__den"))
    val lags = broadcast(spark.range(1, maxLag + 1).select(col("id").as("__k")))
    // lag pairs via a true EQUI-join on (group, hour + k) — never a
    // per-group cross product filtered after the fact
    val nums = h.select(col("__g"), col("__h"), col("__x").as("__xa"))
      .crossJoin(lags)
      .withColumn("__hk", col("__h") + col("__k"))
      .join(h.select(col("__g"), col("__h").as("__hk"),
        col("__x").as("__xb")),
        Seq("__g", "__hk"))
      .join(tot, Seq("__g"))
      .groupBy(col("__g"), col("__k"))
      .agg(sum((d(col("__n")) * col("__xa") - col("__s")) *
        (d(col("__n")) * col("__xb") - col("__s"))).as("__num"))
    // a constant series (den = 0) has no ACF: NULL lags, Q folds to 0.
    // The lag grid is den × lags LEFT-joined to nums (mirroring the SQL
    // oracle) so a degenerate group with ZERO pairs at every lag — one
    // observed hour, or all hours further apart than maxLag — still
    // emits its row with NULL r1..r6 and q_stat 0 instead of vanishing
    val r = den.crossJoin(lags)
      .join(nums, Seq("__g", "__k"), "left")
      .select(col("__g"), col("__k"),
        when(col("__den") > 0,
          col("__num").cast("double") / col("__den").cast("double"))
          .as("__r"),
        col("__n"))
    val lagAggs = (1 to maxLag).map(k =>
      max(when(col("__k") === k, col("__r"))).as(s"__r$k"))
    val wide = r.groupBy(col("__g"), col("__n"))
      .agg(lagAggs.head, lagAggs.tail: _*)
    val nD = col("__n").cast("double")
    val qTerms = (1 to maxLag).map { k =>
      coalesce(col(s"__r$k") * col(s"__r$k") /
        (nD - lit(k.toDouble)), lit(0.0))
    }.reduce(_ + _)
    wide.select(
      (col("__g").as(groupCol) +: col("__n").as("n_hours") +:
        (1 to maxLag).map(k => round(col(s"__r$k"), 6).as(s"r$k")) :+
        round(nD * (nD + lit(2.0)) * qTerms, 6).as("q_stat")): _*)
  }

  /** Lead–lag discovery between every pair of event types: for lags
    * −`maxLagH`..+`maxLagH`, the Pearson correlation of the two hourly
    * series at that offset, keeping each pair's best alignment by
    * |r| — "errors trail clicks by 2 hours" as a table, the
    * cross-metric causality HINT (not proof) an incident review or
    * pipeline-dependency map starts from. [[kendallTau]] reads one
    * chosen pair; this sweeps all pairs × lags.
    *
    * Exactness: per (pair, lag) the five moment sums are exact bigint/
    * decimal over the hour equi-join (h matched to h+lag — gaps simply
    * contribute no pair), r is the one fixed IEEE expression with
    * per-factor casts, and the winner is a deterministic (|r| desc,
    * lag, …) window cut. Scale shape: the corpus collapses to the
    * hour frame once; everything after is (types² × lags) ×
    * calendar-bounded.
    *
    * @return one row per unordered type pair: (type_a, type_b,
    *         best_lag, n_pairs, r), r 6-rounded; positive best_lag =
    *         type_b trails type_a */
  def leadLag(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxLagH: Int = 6): DataFrame = {
    require(maxLagH >= 0 && maxLagH <= 48, s"maxLagH in [0,48]: $maxLagH")
    val spark = events.sparkSession
    val h = events
      .groupBy(col(typeCol).as("__t"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint() // both sides of the lag join share it
    val lags = broadcast(spark.range(-maxLagH, maxLagH + 1L)
      .select(col("id").as("__lag")))
    val a = h.select(col("__t").as("__ta"), col("__h"), col("__x").as("__xa"))
      .crossJoin(lags)
      .withColumn("__hk", col("__h") + col("__lag"))
    val b = h.select(col("__t").as("__tb"), col("__h").as("__hk"),
      col("__x").as("__xb"))
    val paired = a.join(b, Seq("__hk")).filter(col("__ta") < col("__tb"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = paired.groupBy(col("__ta"), col("__tb"), col("__lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__xa")).as("__sx"), sum(col("__xb")).as("__sy"),
        sum(d(col("__xa")) * col("__xb")).as("__sxy"),
        sum(d(col("__xa")) * col("__xa")).as("__sxx"),
        sum(d(col("__xb")) * col("__xb")).as("__syy"))
    val n = d(col("n_pairs"))
    val d1 = (n * col("__sxx") - d(col("__sx")) * col("__sx")).cast("double")
    val d2 = (n * col("__syy") - d(col("__sy")) * col("__sy")).cast("double")
    val r = when(d1 > 0.0 && d2 > 0.0,
      (n * col("__sxy") - d(col("__sx")) * col("__sy")).cast("double") /
        sqrt(d1 * d2))
    val scored = m.select(col("__ta"), col("__tb"), col("__lag"),
      col("n_pairs"), r.as("__r"))
    scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__ta"), col("__tb"))
          .orderBy(abs(col("__r")).desc, col("__lag").asc)))
      .filter(col("__rk") === 1)
      .select(col("__ta").as("type_a"), col("__tb").as("type_b"),
        col("__lag").as("best_lag"), col("n_pairs"),
        round(col("__r"), 6).as("r"))
  }

  /** Hot-streak report: for each group, the LONGEST run of consecutive
    * hours with activity strictly above the group's median hourly count
    * — "how long do surges last", the gaps-and-islands census a
    * capacity planner sizes burst headroom from.
    *
    * Exactness: the median is the exact distinct-value cumsum rank cut
    * ([[trimmedMean]] discipline, doubled to stay integral under even
    * counts: 2x > 2·median ⟺ above); islands come from the classic
    * `hour − row_number()` constant-key trick over the group-partitioned
    * hour window (consecutive OBSERVED hours — a silent hour breaks a
    * streak by definition here, since it cannot be "above median");
    * everything is integer, the winner is a deterministic (len desc,
    * start) cut. Scale shape: corpus → hour frame, then hour-scale
    * windows.
    *
    * @return (group, median2 /2-scaled exact median/, n_streaks,
    *         longest_hours, longest_start, longest_end) */
  def hotStreaks(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val h = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint() // median census + streak pass share it
    // exact median in doubled units via the distinct-value cumsum
    val vc = h.groupBy(col("__g"), col("__x")).agg(count(lit(1)).as("__c"))
    val cum = vc.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__x"))))
    val tot = vc.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val med = cum.join(tot, Seq("__g"))
      .groupBy(col("__g"), col("__n"))
      .agg((min(when(col("__cum") >= expr("(__n + 1) div 2"), col("__x"))) +
        min(when(col("__cum") >= expr("__n div 2 + 1"), col("__x"))))
        .as("__med2"))
    val above = h.join(broadcast(med.select(col("__g"), col("__med2"))),
      Seq("__g"))
      .filter(col("__x") * 2 > col("__med2"))
    val islands = above
      .withColumn("__grp",
        col("__h") - row_number().over(
          Window.partitionBy(col("__g")).orderBy(col("__h"))))
      .groupBy(col("__g"), col("__grp"))
      .agg(count(lit(1)).as("__len"), min(col("__h")).as("__start"),
        max(col("__h")).as("__end"))
    islands
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__g"))
          .orderBy(col("__len").desc, col("__start").asc)))
      .withColumn("__ns", count(lit(1)).over(
        Window.partitionBy(col("__g"))))
      .filter(col("__rk") === 1)
      .join(med.select(col("__g"), col("__med2")), Seq("__g"))
      .select(col("__g").as(groupCol),
        round(col("__med2").cast("double") / lit(2.0), 6).as("median"),
        col("__ns").as("n_streaks"),
        col("__len").as("longest_hours"),
        col("__start").as("longest_start"),
        col("__end").as("longest_end"))
  }

  /** Classical additive seasonal decomposition per group (the
    * moving-average method, Macaulay 1931 — the model STL refines):
    * x = trend + seasonal + residual over the hourly series, with
    * trend = centered (period+1)-hour moving average (emitted only for
    * interior hours whose RANGE window is fully dense — a gapped or
    * edge window would bias the trend), seasonal = the hour-of-period
    * mean of the detrended series re-centered to zero mean, residual =
    * the rest. The decomposition an anomaly detector or capacity
    * planner reads instead of the raw curve.
    *
    * Determinism: the MA is an exact integer window sum with ONE IEEE
    * division; the two cross-row double means (per-(group, phase) and
    * the 24-value re-centering) fold in pinned (hour) / (phase) order —
    * the mutualInformation sorted-fold discipline — so every output
    * replays bit-exact. Scale shape: one corpus-scale keyed count, then
    * hour-scale windows and two tiny keyed folds.
    *
    * @return (group, hour_id, n_events, trend, seasonal, residual) for
    *         interior hours, 6-rounded */
  def seasonalDecompose(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      period: Int = 24): DataFrame = {
    require(period >= 2 && period % 2 == 0, s"even period >= 2: $period")
    val half = period / 2
    val h = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
    val wT = Window.partitionBy(col("__g")).orderBy(col("__h"))
      .rangeBetween(-half, half)
    val tr = h
      .withColumn("__wn", count(lit(1)).over(wT))
      .withColumn("__ws", sum(col("__x")).over(wT))
      .filter(col("__wn") === period + 1)
      .withColumn("__trend",
        col("__ws").cast("double") / lit((period + 1).toDouble))
      .withColumn("__d", col("__x").cast("double") - col("__trend"))
      .withColumn("__hod", pmod(col("__h"), lit(period.toLong)))
      .localCheckpoint(true) // seasonal folds + the output join share it
    val sHod = tr.groupBy(col("__g"), col("__hod"))
      .agg((aggregate(
        sort_array(collect_list(struct(col("__h"), col("__d")))),
        lit(0.0), (acc, x) => acc + x("__d")) /
        count(lit(1)).cast("double")).as("__sraw"))
    val sBar = sHod.groupBy(col("__g"))
      .agg((aggregate(
        sort_array(collect_list(struct(col("__hod"), col("__sraw")))),
        lit(0.0), (acc, x) => acc + x("__sraw")) /
        count(lit(1)).cast("double")).as("__sbar"))
    val seas = sHod.join(sBar, Seq("__g"))
      .select(col("__g"), col("__hod"),
        (col("__sraw") - col("__sbar")).as("__seas"))
    tr.join(broadcast(seas), Seq("__g", "__hod"))
      .select(col("__g").as(groupCol), col("__h").as("hour_id"),
        col("__x").as("n_events"),
        round(col("__trend"), 6).as("trend"),
        round(col("__seas"), 6).as("seasonal"),
        round(col("__d") - col("__seas"), 6).as("residual"))
  }

  /** Coverage-gap census — the COLD sibling of [[hotStreaks]]: per
    * group, how much of the observed hour span is silent, how many
    * distinct gaps there are, and where the longest one sits — the
    * first question after "is the pipeline even delivering" (a stuck
    * upstream shows up here hours before any statistical detector).
    *
    * Exactness: gaps are integer differences of consecutive OBSERVED
    * hours (one group-partitioned lag window over the hour frame); the
    * longest-gap winner is a deterministic (len desc, start) cut; all
    * outputs integral. Scale shape: corpus → hour frame, then
    * hour-scale windows.
    *
    * @return (group, n_hours, span_hours, missing_hours, n_gaps,
    *         max_gap, max_gap_start, max_gap_end); groups with no gap
    *         report zeros and NULL bounds */
  def coverageGaps(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val h = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
    val lagged = h.withColumn("__prev",
      lag(col("__h"), 1).over(
        Window.partitionBy(col("__g")).orderBy(col("__h"))))
    val tot = h.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_hours"),
        (max(col("__h")) - min(col("__h")) + 1L).as("span_hours"))
    val gaps = lagged
      .filter(col("__prev").isNotNull && col("__h") - col("__prev") > 1L)
      .select(col("__g"), (col("__h") - col("__prev") - 1L).as("__len"),
        (col("__prev") + 1L).as("__start"), (col("__h") - 1L).as("__end"))
    val best = gaps
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__g"))
          .orderBy(col("__len").desc, col("__start").asc)))
      .withColumn("__ng", count(lit(1)).over(
        Window.partitionBy(col("__g"))))
      .filter(col("__rk") === 1)
      .select(col("__g"), col("__ng"), col("__len"), col("__start"),
        col("__end"))
    tot.join(best, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n_hours"), col("span_hours"),
        (col("span_hours") - col("n_hours")).as("missing_hours"),
        coalesce(col("__ng"), lit(0L)).as("n_gaps"),
        coalesce(col("__len"), lit(0L)).as("max_gap"),
        col("__start").as("max_gap_start"),
        col("__end").as("max_gap_end"))
  }

  /** Weekday-vs-weekend contrast per group: Welch's unequal-variance t
    * (Welch 1947) between the two classes of hourly counts, with the
    * Welch–Satterthwaite df — "does this metric actually behave
    * differently on weekends", the covariate contrast the hash-armed
    * [[abTest]] cannot ask. Weekend = (epoch-day + 3) mod 7 ∈ {5, 6}:
    * epoch day 0 (1970-01-01) is a THURSDAY, so the +3 shift maps real
    * Saturday/Sunday onto classes {5, 6} — the contrast is calendar-
    * true on real epoch-microsecond timestamps, not just a stable
    * relabeling of synthetic streams (UTC day boundaries, documented).
    *
    * Exactness: per-class n/Σx/Σx² are exact integers; sample
    * variances use the n-scaled form (n·Σx² − (Σx)²)/(n·(n−1)) as ONE
    * IEEE expression each, then t and df are fixed IEEE chains over
    * them — identical textual shape in the SQL replay. Degenerate
    * classes (n < 2 or both variances zero) emit stated NULLs.
    *
    * @return (group, n_wd, n_we, mean_wd, mean_we, t_welch, df),
    *         6-rounded */
  def weekendEffect(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val h = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      // epoch day 0 is a Thursday: +3 puts real Sat/Sun at {5, 6}
      .withColumn("__we", expr("((__h div 24) + 3) % 7") >= 5L)
    def side(flag: Boolean, sfx: String) = Seq(
      sum(when(col("__we") === flag, 1L).otherwise(0L)).as(s"n_$sfx"),
      sum(when(col("__we") === flag, col("__x")).otherwise(0L))
        .as(s"__s_$sfx"),
      sum(when(col("__we") === flag,
        col("__x").cast("decimal(19,0)") * col("__x")).otherwise(lit(0)))
        .as(s"__ss_$sfx"))
    val aggs = side(false, "wd") ++ side(true, "we")
    val m = h.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    def nD(s: String) = col(s"n_$s").cast("double")
    def mean(s: String) = col(s"__s_$s").cast("double") / nD(s)
    // sample variance from exact sums: (n·Σx² − (Σx)²) / (n·(n−1))
    def vOver(s: String) = // v/n in one shape
      (nD(s) * col(s"__ss_$s").cast("double") -
        col(s"__s_$s").cast("double") * col(s"__s_$s").cast("double")) /
        (nD(s) * (nD(s) - lit(1.0))) / nD(s)
    val se2 = vOver("wd") + vOver("we")
    val ok = col("n_wd") >= 2L && col("n_we") >= 2L && se2 > 0.0
    val t = (mean("wd") - mean("we")) / sqrt(se2)
    val df = se2 * se2 /
      (vOver("wd") * vOver("wd") / (nD("wd") - lit(1.0)) +
        vOver("we") * vOver("we") / (nD("we") - lit(1.0)))
    m.select(col("__g").as(groupCol), col("n_wd"), col("n_we"),
      when(col("n_wd") > 0L, round(mean("wd"), 6)).as("mean_wd"),
      when(col("n_we") > 0L, round(mean("we"), 6)).as("mean_we"),
      when(ok, round(t, 6)).as("t_welch"),
      when(ok, round(df, 6)).as("df"))
  }

  /** Ingest freshness report: per group, the last observed hour, how
    * many hours it trails the stream's frontier, and the final-day
    * volume beside the lifetime total — the staleness dashboard row
    * ("source X stopped 6 hours ago; source Y is alive but thin").
    * All-integer: two keyed aggs plus a 1-row frontier broadcast.
    *
    * @return (group, last_hour, hours_behind, n_last_24h, n_total) */
  def freshness(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val e = events.select(col(groupCol).as("__g"),
      expr(s"`$tsCol` div ${hourUs}L").as("__h"))
    val frontier = broadcast(e.agg(max(col("__h")).as("__front")))
    e.crossJoin(frontier)
      .groupBy(col("__g"), col("__front"))
      .agg(max(col("__h")).as("last_hour"),
        sum(when(col("__h") > col("__front") - 24L, 1L).otherwise(0L))
          .as("n_last_24h"),
        count(lit(1)).as("n_total"))
      .select(col("__g").as(groupCol), col("last_hour"),
        (col("__front") - col("last_hour")).as("hours_behind"),
        col("n_last_24h"), col("n_total"))
  }

  /** Seasonality-aware anomaly detection: hours whose
    * [[seasonalDecompose]] RESIDUAL deviates from the residual median
    * by more than `k`× the residual MAD — the detector that stays
    * quiet through the nightly lull and the weekday peak the plain
    * z-score detectors ([[graft.SparkEntry]]'s window_anomalies family)
    * must alert through, because trend and season are subtracted
    * before scoring.
    *
    * Determinism: residuals are the decomposition's 6-rounded doubles;
    * median and MAD are exact rank selections over them (rows at ranks
    * ⌊(n+1)/2⌋ and ⌊n/2⌋+1 averaged, (value, hour) total order), and
    * the cut `dev > k·MAD` is one IEEE comparison — all replayed by
    * the same SQL. A zero-MAD group (over half its residuals
    * identical) flags every nonzero deviation, the standard MAD-filter
    * degeneracy, documented.
    *
    * @return flagged hours: (group, hour_id, n_events, residual,
    *         med_resid, mad_resid) */
  def seasonalAnomalies(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      period: Int = 24,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val dec = seasonalDecompose(events, groupCol, tsCol, hourUs, period)
      .localCheckpoint(true) // median, MAD and the cut share it
    val wAll = Window.partitionBy(col(groupCol))
    def medianOf(df: DataFrame, valueCol: String, outCol: String) =
      df.withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col(valueCol), col("hour_id"))))
        .withColumn("__n", count(lit(1)).over(wAll))
        .groupBy(col(groupCol))
        .agg(((max(when(col("__rn") === expr("(__n + 1) div 2"),
          col(valueCol))) +
          max(when(col("__rn") === expr("__n div 2 + 1"), col(valueCol)))) /
          lit(2.0)).as(outCol))
    val med = medianOf(dec, "residual", "__medr")
    val dv = dec.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col("residual") - col("__medr")))
    val mad = medianOf(dv, "__dev", "__madr")
    dv.join(broadcast(mad), Seq(groupCol))
      .filter(col("__dev") > lit(k) * col("__madr"))
      .select(col(groupCol), col("hour_id"), col("n_events"),
        col("residual"),
        round(col("__medr"), 6).as("med_resid"),
        round(col("__madr"), 6).as("mad_resid"))
  }

  /** Per-day exact quantile trend: p50/p90 of the value column for
    * every (group, day) — "how is the metric's distribution drifting
    * day over day", the banded sibling of [[graft.stats.Descriptive]]'s
    * corpus percentiles. Ranks come from the [[trimmedMean]]
    * distinct-value cumsum (quantized values collapse first; the
    * cumulative window partitions by (group, day) — never a global
    * sort), and each quantile is the minimal value whose cumulative
    * count reaches the exact integer target rank n·p div 100 (floored
    * at 1). All-integer selection; the only IEEE step is the final
    * unit rescale.
    *
    * @return (group, day_id, n, p50, p90), 6-rounded */
  def dailyQuantiles(
      events: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value",
      tsCol: String = "ts",
      dayUs: Long = 86400000000L,
      quantScale: Long = 1000L): DataFrame = {
    require(quantScale > 0, "positive quantScale")
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val vc = events
      .select(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${dayUs}L").as("__day"), q.as("__q"))
      .groupBy(col("__g"), col("__day"), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val cum = vc.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__g"), col("__day")).orderBy(col("__q"))))
    val tot = vc.groupBy(col("__g"), col("__day"))
      .agg(sum(col("__c")).as("__n"))
    def rankCut(pPct: Int) =
      min(when(col("__cum") >=
        greatest(expr(s"(__n * ${pPct}L) div 100L"), lit(1L)),
        col("__q")))
    cum.join(tot, Seq("__g", "__day"))
      .groupBy(col("__g"), col("__day"), col("__n"))
      .agg(rankCut(50).as("__p50"), rankCut(90).as("__p90"))
      .select(col("__g").as(groupCol), col("__day").as("day_id"),
        col("__n").as("n"),
        round(col("__p50").cast("double") / lit(quantScale.toDouble), 6)
          .as("p50"),
        round(col("__p90").cast("double") / lit(quantScale.toDouble), 6)
          .as("p90"))
  }

  /** Theil–Sen robust trend (Theil 1950, Sen 1968): per-group slope =
    * the MEDIAN of all pairwise slopes (x_j−x_i)/(h_j−h_i) over the
    * hourly series, intercept = the median residual under that slope —
    * the trend estimate that shrugs off the outlier hours OLS chases
    * (up to ~29% contamination).
    *
    * Scale shape: the corpus collapses to the (group, hour, count)
    * frame first (the only corpus-scale agg, map-side partials), so the
    * pairwise expansion is CALENDAR-bounded — ⌊n_h²/2⌋ pairs per group
    * for n_h observed hours, never data-bounded — behind a fail-fast
    * `maxHours` census (the [[Banded]] guard discipline: a caller
    * feeding sub-hour buckets or years of data learns the cost up
    * front). Medians ride group-partitioned rank windows over the pair
    * frame; no global sort, no collect beyond the 1-row census.
    *
    * Determinism: each pairwise slope is ONE IEEE division of integer
    * deltas (bit-identical cross-engine); median selection is exact
    * integer rank arithmetic — rows at ranks ⌊(n+1)/2⌋ and ⌊n/2⌋+1
    * averaged, which for equal ranks folds to the value itself; the
    * slope is 6-rounded BEFORE residuals so the intercept replays.
    *
    * @return (group, n_hours, n_pairs, slope_per_hour, intercept),
    *         6-rounded */
  def theilSenTrend(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxHours: Long = 5000L): DataFrame = {
    require(maxHours >= 2, s"maxHours must be >= 2: $maxHours")
    val hourly = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint() // census + pair join + residual pass share it
    val widest = hourly.groupBy(col("__g")).agg(count(lit(1)).as("__nh"))
      .agg(max(col("__nh")).as("__w"), sum(col("__nh")).as("__tot"))
      .collect()(0)
    val span = if (widest.isNullAt(0)) 0L else widest.getLong(0)
    val totalHours = if (widest.isNullAt(1)) 0L else widest.getLong(1)
    require(span <= maxHours,
      s"theilSenTrend: $span observed hours in one group exceed " +
        s"maxHours=$maxHours (~${span * span / 2} pairs) — widen the " +
        "bucket, shorten the window, or raise maxHours deliberately")
    // Pair generation (optimization r17, guide §2.5 + §3.1): the old
    // equi-join on __g alone hash-partitioned BY GROUP, so each group's
    // entire hours² fan-out + slope arithmetic ran on one task (4-5 tasks
    // total at any parallelism). Repartitioning the left side by
    // (__g, __h) and BROADCASTING the right side keeps the fan-out on
    // the wide layout — pair generation parallelizes over left hours,
    // and only the per-group median windows below are group-bounded.
    // The broadcast is safe by the operator's own contract: the hourly
    // rollup is census-bounded (maxHours per group; `totalHours` rows in
    // all, checked against the same order of magnitude as ONE group's
    // pair budget) — above the bound, fall back to the keyed join.
    val nPart = events.sparkSession.sparkContext.defaultParallelism
    val a = hourly.repartition(nPart, col("__g"), col("__h"))
      .select(col("__g"), col("__h").as("__h1"),
        col("__x").as("__x1"))
    val b = hourly.select(col("__g"), col("__h").as("__h2"),
      col("__x").as("__x2"))
    val bSide = if (totalHours <= 2000000L) broadcast(b) else b
    val pairs = a.join(bSide, Seq("__g")).filter(col("__h2") > col("__h1"))
      .select(col("__g"), col("__h1"), col("__h2"),
        ((col("__x2") - col("__x1")).cast("double") /
          (col("__h2") - col("__h1")).cast("double")).as("__s"))
    // Slope median via a DISTINCT-SLOPE census (optimization r17, guide
    // §2.3 "aggregate before you shuffle" + §2.5): the old row_number
    // window sorted every group's full hours²/2 pair stream on ONE task
    // per group (the query's two dominant stages — parallelism was
    // structurally #groups). Slopes repeat heavily (integer count deltas
    // over integer hour deltas), so a (group, slope)-keyed count — fully
    // parallel, map-side partials — collapses the stream ~10×, and the
    // rank selection walks the small sorted census. Value-identical: the
    // old rank's (__s, __h1, __h2) tie-break never crosses a VALUE
    // boundary, so the element at rank r has the same __s as the census
    // row whose cumulative count first reaches r; slopes are
    // 0-or-finite/positive divisions (h2 > h1), never -0.0 or NaN, so
    // double-key grouping cannot merge distinguishable sort keys.
    val wAll = Window.partitionBy(col("__g"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val med = pairs
      .groupBy(col("__g"), col("__s")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__np", sum(col("__c")).over(wAll))
      .groupBy(col("__g"))
      .agg(max(col("__np")).as("n_pairs"),
        round((max(when(col("__cum") - col("__c") < expr("(__np + 1) div 2") &&
          col("__cum") >= expr("(__np + 1) div 2"), col("__s"))) +
          max(when(col("__cum") - col("__c") < expr("__np div 2 + 1") &&
            col("__cum") >= expr("__np div 2 + 1"), col("__s")))) /
          lit(2.0), 6).as("slope_per_hour"))
    val resid = hourly
      .join(broadcast(med.select(col("__g"), col("slope_per_hour"))),
        Seq("__g"))
      .select(col("__g"),
        (col("__x").cast("double") -
          col("slope_per_hour") * col("__h").cast("double")).as("__r"),
        col("__h"))
    val wR = Window.partitionBy(col("__g")).orderBy(col("__r"), col("__h"))
    val intercept = resid
      .withColumn("__rk", row_number().over(wR))
      .withColumn("__nr", count(lit(1)).over(wAll))
      .groupBy(col("__g"))
      .agg(max(col("__nr")).as("n_hours"),
        round((max(when(col("__rk") === expr("(__nr + 1) div 2"),
          col("__r"))) +
          max(when(col("__rk") === expr("__nr div 2 + 1"), col("__r")))) /
          lit(2.0), 6).as("intercept"))
    med.join(intercept, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_hours"), col("n_pairs"),
        col("slope_per_hour"), col("intercept"))
  }

  /** Day-of-week × hour-of-day seasonal traffic profile: the weekly
    * template every capacity planner and anomaly detector normalizes
    * against. `dow` is the epoch-day index mod 7 (a stable weekday
    * labeling for epoch-µs streams — calendar alignment is a rename).
    *
    * Exactness: the event stream collapses to (hour_id, n) once (the
    * only corpus-scale shuffle, map-side partials), the 168-cell profile
    * aggregates that calendar-bounded frame, and the mean is ONE IEEE
    * division per cell, 6-rounded.
    *
    * @return (dow, hod, n_hours, total_events, avg_events) — 168 rows */
  def seasonalProfile(
      events: DataFrame,
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .groupBy(expr(s"`$tsCol` div ${hourUs}L").as("hour_id"))
      .agg(count(lit(1)).as("n"))
    hourly
      .groupBy(expr("(hour_id div 24) % 7").as("dow"),
        expr("hour_id % 24").as("hod"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("n")).as("total_events"))
      .select(col("dow"), col("hod"), col("n_hours"), col("total_events"),
        round(col("total_events").cast("double") /
          col("n_hours").cast("double"), 6).as("avg_events"))
  }

  /** Pearson χ² test of independence between two categorical columns —
    * [[mutualInformation]]'s frequentist sibling (MI measures HOW MUCH
    * dependence; χ²/dof against its null distribution says whether the
    * dependence is distinguishable from sampling noise). One row out:
    * (n_cells, n_rows, dof, chi2) with expected counts eᵢⱼ = nᵢ·nⱼ/n and
    * χ² = Σ (oᵢⱼ−eᵢⱼ)²/eᵢⱼ over the OBSERVED cells plus the structural
    * zero cells' contribution Σeᵢⱼ (absent cells contribute eᵢⱼ exactly),
    * computed as χ² = Σ_observed (oᵢⱼ²/eᵢⱼ) − n — the algebraic identity
    * that needs no dense cell grid.
    *
    * Exactness: counts are exact longs; the IEEE fold runs in PINNED
    * ascending cell order over one collected array (the
    * [[mutualInformation]] discipline, same `maxCells` fail-fast guard).
    * dof = (|A|−1)(|B|−1) from exact marginal cardinalities. */
  def chiSquareIndependence(
      df: DataFrame,
      aCol: String,
      bCol: String,
      maxCells: Long = 1L << 20): DataFrame =
    chi2Folded(df, aCol, bCol, maxCells, "chiSquareIndependence")
      .select(col("n_cells"), col("n_rows"),
        ((col("__ka") - 1L) * (col("__kb") - 1L)).as("dof"),
        round(col("__chi2"), 6).as("chi2"))

  /** Cramér's V association strength (Cramér 1946, §21.9) for the same
    * contingency pair — [[chiSquareIndependence]]'s EFFECT SIZE: χ²
    * says whether the dependence beats sampling noise, V = √(χ²/(n·
    * min(kₐ−1, k_b−1))) says how strong it is on the comparable [0,1]
    * scale (the categorical sibling of [[Inference.cohensD]]). Shares
    * the exact cell machinery, fold and guard with the χ² report —
    * ONE more IEEE chain on the same folded row. NULL V when either
    * cardinality is 1 (no association is defined), stated.
    *
    * @return one row: (n_cells, n_rows, dof, chi2, cramers_v),
    *         6-rounded */
  def cramersV(
      df: DataFrame,
      aCol: String,
      bCol: String,
      maxCells: Long = 1L << 20): DataFrame = {
    val f = chi2Folded(df, aCol, bCol, maxCells, "cramersV")
    val minK = least(col("__ka") - 1L, col("__kb") - 1L)
    f.select(col("n_cells"), col("n_rows"),
      ((col("__ka") - 1L) * (col("__kb") - 1L)).as("dof"),
      round(col("__chi2"), 6).as("chi2"),
      when(minK >= 1L && col("n_rows") > 0L,
        round(sqrt(col("__chi2") / col("n_rows").cast("double") /
          minK.cast("double")), 6)).as("cramers_v"))
  }

  /** The shared χ² cell collapse + pinned fold: one row with
    * (n_cells, n_rows, __ka, __kb, __chi2 UNROUNDED) — both public
    * views round the identical double, so the refactor cannot move a
    * published value. */
  private def chi2Folded(
      df: DataFrame,
      aCol: String,
      bCol: String,
      maxCells: Long,
      opName: String): DataFrame = {
    require(maxCells > 0, s"maxCells must be positive: $maxCells")
    val cells = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__nij"))
      .localCheckpoint()
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"$opName: $nCells distinct ($aCol, $bCol) cells " +
        s"exceed maxCells=$maxCells — this report folds the full cell " +
        s"table in one row and is meant for CATEGORICAL pairs")
    val aM = cells.groupBy(col("__a")).agg(sum(col("__nij")).as("__ni"))
    val bM = cells.groupBy(col("__b")).agg(sum(col("__nij")).as("__nj"))
    val n = col("n_rows").cast("double")
    cells.join(aM, Seq("__a")).join(bM, Seq("__b"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("__nij")).as("n_rows"),
        countDistinct(col("__a")).as("__ka"),
        countDistinct(col("__b")).as("__kb"),
        sort_array(collect_list(struct(
          col("__a"), col("__b"), col("__nij"), col("__ni"), col("__nj"))))
          .as("__cells"))
      .withColumn("__chi2",
        aggregate(col("__cells"), lit(0.0), (acc, c) =>
          acc + (c.getField("__nij").cast("double") *
            c.getField("__nij").cast("double") * n) /
            (c.getField("__ni").cast("double") *
              c.getField("__nj").cast("double")))
          - n)
  }

  /** Naive-forecast error baseline per group over hourly counts — the
    * DENOMINATOR every forecast evaluation divides by: Theil's U2
    * (Theil 1966) benchmarks a model against the no-change forecast
    * x̂ₜ = xₜ₋₁, and MASE (Hyndman & Koehler 2006) scales absolute
    * errors by exactly this naive MAE. One row per group:
    * (n_hours, n_pairs, naive_rmse, naive_mae) — compare
    * holtWintersBacktest's one-step errors against these to decide
    * whether the smoother earns its keep.
    *
    * Exactness: consecutive-hour pairs from ONE equi-join on hour+1
    * (gap hours contribute no pair, the ljungBox convention); squared
    * and absolute diffs accumulate exact DECIMAL/BIGINT; rmse/mae are
    * one IEEE chain each. NULLs when a group has no pairs, stated.
    *
    * @return per group: (event_type, n_hours, n_pairs, naive_rmse,
    *         naive_mae), 6-rounded */
  def forecastBaseline(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      lagHours: Long = 1L): DataFrame = {
    require(lagHours >= 1L, s"lagHours must be >= 1: $lagHours")
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val h = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint(true) // totals + the pair join share it
    val tot = h.groupBy(col("__g")).agg(count(lit(1)).as("n_hours"))
    // lagHours = 1 is Theil/MASE's no-change forecast; lagHours = m
    // (e.g. 24) is the SEASONAL naive x̂ₜ = xₜ₋ₘ — the denominator
    // Hyndman & Koehler recommend for seasonal series (a smoother must
    // beat "same hour yesterday", a far stronger baseline than
    // "last hour", or it adds nothing)
    val pairs = h.select(col("__g"), (col("__h") + lit(lagHours)).as("__h"),
      col("__x").as("__prev"))
      .join(h, Seq("__g", "__h"))
      .select(col("__g"), (col("__x") - col("__prev")).as("__df"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(d(col("__df")) * col("__df")).as("__sse"),
        sum(abs(col("__df"))).as("__sae"))
    val np = col("n_pairs").cast("double")
    tot.join(pairs, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n_hours"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("n_pairs") >= 1L,
          round(sqrt(col("__sse").cast("double") / np), 6))
          .as("naive_rmse"),
        when(col("n_pairs") >= 1L,
          round(col("__sae").cast("double") / np, 6)).as("naive_mae"))
      .orderBy(col(groupCol))
  }

  /** CUPED variance-reduced A/B z-test (Deng, Xu, Kohavi & Walker 2013,
    * "Improving the sensitivity of online controlled experiments"):
    * [[abTest]] plus the industry-standard pre-period adjustment. Each
    * unit gets a covariate x (its pre-period metric sum) and an outcome
    * y (its post-period sum); θ = cov(x,y)/var(x) is estimated POOLED
    * across arms (CUPED's unbiasedness condition — x predates
    * assignment), and the test runs on ŷ = y − θ·(x − x̄). When pre-
    * behavior predicts post-behavior (returning users), var(ŷ) shrinks
    * by the squared correlation and the same effect needs far less
    * traffic.
    *
    * Pre/post split: day parity of `ts div dayUs` (even days → x, odd →
    * y) — deterministic, calendar-free, replayable. Exactness: per-unit
    * sums quantize like [[abTest]]; ALL second moments (Σx², Σy², Σxy per
    * arm) accumulate as exact DECIMAL(19,0)² products; θ, the adjusted
    * means/variances and both z's are one pinned IEEE expression from
    * exactly-equal operands. Output carries z_raw next to z_cuped — the
    * variance reduction is the visible deliverable.
    *
    * Scale shape: one unit-keyed conditional-sum aggregate over the
    * stream (map-side partials), one (grp, arm)-keyed moment rollup of
    * the UNIT frame, one 1-row-per-group finish. Groups need ≥ 2 units
    * per arm.
    *
    * @return (grp, n_a, n_b, theta, z_raw, z_cuped) */
  def cupedAbTest(
      events: DataFrame,
      groupCol: String,
      unitCol: String,
      valueCol: String,
      tsCol: String = "ts",
      dayUs: Long = 86400000000L,
      seed: Long = 42L,
      quantScale: Long = 1000L): DataFrame = {
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    val arm = pmod(
      graft.functions.HashFunctions.md5Bucket(seed, col(unitCol)), lit(2L))
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val pre = expr(s"(`$tsCol` div ${dayUs}L) % 2") === 0L
    // per-unit covariate/outcome sums (exact longs; a unit's event count
    // times the quantized metric stays far below 2^63)
    val units = events
      .select(col(groupCol).as("grp"), arm.as("__arm"),
        col(unitCol).as("__u"), q.as("__q"), pre.as("__pre"))
      .groupBy(col("grp"), col("__arm"), col("__u"))
      .agg(sum(when(col("__pre"), col("__q")).otherwise(0L)).as("__x"),
        sum(when(!col("__pre"), col("__q")).otherwise(0L)).as("__y"))
    def d19sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      a.cast("decimal(19,0)") * b.cast("decimal(19,0)")
    val moments = units.groupBy(col("grp"), col("__arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(28,0)")).as("sx"),
        sum(col("__y").cast("decimal(28,0)")).as("sy"),
        sum(d19sq(col("__x"), col("__x"))).as("sxx"),
        sum(d19sq(col("__y"), col("__y"))).as("syy"),
        sum(d19sq(col("__x"), col("__y"))).as("sxy"))
      .localCheckpoint() // two consumers: pooled theta + per-arm sides
    // pooled θ from exact decimal sums: cov(x,y)/var(x) over ALL units
    val pooled = moments.groupBy(col("grp"))
      .agg(sum(col("n")).as("__np"),
        sum(col("sx")).as("__sxp"), sum(col("sy")).as("__syp"),
        sum(col("sxx")).as("__sxxp"), sum(col("sxy")).as("__sxyp"))
      .select(col("grp"),
        ((col("__np") * col("__sxyp") - col("__sxp") * col("__syp"))
          .cast("double") /
          nullif((col("__np") * col("__sxxp") - col("__sxp") * col("__sxp"))
            .cast("double"), lit(0.0))).as("theta"))
    def armSide(v: Int, sfx: String) = moments.filter(col("__arm") === v)
      .select(col("grp"), col("n").as(s"n_$sfx"),
        col("sx").cast("double").as(s"__sx_$sfx"),
        col("sy").cast("double").as(s"__sy_$sfx"),
        col("sxx").cast("double").as(s"__sxx_$sfx"),
        col("syy").cast("double").as(s"__syy_$sfx"),
        col("sxy").cast("double").as(s"__sxy_$sfx"))
    def nD(sfx: String) = col(s"n_$sfx").cast("double")
    def meanY(sfx: String) = col(s"__sy_$sfx") / nD(sfx)
    def meanX(sfx: String) = col(s"__sx_$sfx") / nD(sfx)
    // per-arm sample variance of the ADJUSTED metric ŷ = y − θx:
    // var(ŷ) = [Σy² − 2θΣxy + θ²Σx² − n·(ȳ−θx̄)²] / (n−1)
    def varAdj(sfx: String) = {
      val t = col("theta")
      val mAdj = meanY(sfx) - t * meanX(sfx)
      (col(s"__syy_$sfx") - lit(2.0) * t * col(s"__sxy_$sfx") +
        t * t * col(s"__sxx_$sfx") - nD(sfx) * mAdj * mAdj) / (nD(sfx) - 1.0)
    }
    def varRaw(sfx: String) =
      (col(s"__syy_$sfx") - col(s"__sy_$sfx") * col(s"__sy_$sfx") / nD(sfx)) /
        (nD(sfx) - 1.0)
    val adjA = meanY("a") - col("theta") * meanX("a")
    val adjB = meanY("b") - col("theta") * meanX("b")
    armSide(0, "a").join(armSide(1, "b"), Seq("grp"))
      .join(pooled, Seq("grp"))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .select(col("grp"), col("n_a"), col("n_b"),
        round(col("theta"), 6).as("theta"),
        round((meanY("a") - meanY("b")) /
          sqrt(varRaw("a") / nD("a") + varRaw("b") / nD("b")), 6)
          .as("z_raw"),
        round((adjA - adjB) /
          sqrt(varAdj("a") / nD("a") + varAdj("b") / nD("b")), 6)
          .as("z_cuped"))
  }

  /** Difference-in-differences estimate (Card & Krueger 1994's
    * workhorse design) — the third member of the experimentation tier:
    * [[abTest]] compares arms, [[cupedAbTest]] sharpens with a
    * pre-period covariate, DiD measures a treatment applied AT A POINT
    * IN TIME by differencing out both the stable arm gap and the shared
    * time trend: DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre),
    * z from the four-cell pooled variance.
    *
    * Same determinism contract as [[abTest]]: md5Bucket-parity arms,
    * floor-quantized values, exact decimal moment sums per
    * (group, arm, period) cell — period splits at the corpus midpoint
    * day (one 1-row min/max anchor broadcast) — and one IEEE finish per
    * output. One corpus-scale keyed agg; cells with n < 2 drop the
    * group.
    *
    * @return (grp, n_t_pre, n_t_post, n_c_pre, n_c_post, did, z) */
  def didEstimate(
      events: DataFrame,
      groupCol: String,
      unitCol: String,
      tsCol: String,
      valueCol: String,
      seed: Long = 42L,
      quantScale: Long = 1000L,
      dayUs: Long = 86400000000L): DataFrame = {
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    val arm = pmod(graft.functions.HashFunctions.md5Bucket(seed, col(unitCol)),
      lit(2L))
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val base = events.select(col(groupCol).as("grp"), arm.as("__arm"),
      expr(s"$tsCol div $dayUs").as("__day"), q.as("__q"))
    val anchor = base.agg(
      ((min(col("__day")) + max(col("__day")) + lit(1L)) / lit(2L))
        .cast("long").as("__mid"))
    val moments = base.crossJoin(broadcast(anchor))
      .select(col("grp"), col("__arm"),
        when(col("__day") >= col("__mid"), lit(1L)).otherwise(lit(0L))
          .as("__post"),
        col("__q"))
      .groupBy(col("grp"), col("__arm"), col("__post"))
      .agg(count(lit(1)).as("n"),
        sum(col("__q").cast("decimal(28,0)")).as("s"),
        sum((col("__q").cast("decimal(19,0)") *
          col("__q").cast("decimal(19,0)"))).as("ss"))
    def cell(a: Int, p: Int, sfx: String) = moments
      .filter(col("__arm") === a && col("__post") === p)
      .select(col("grp"), col("n").as(s"n_$sfx"),
        col("s").cast("double").as(s"__s_$sfx"),
        col("ss").cast("double").as(s"__ss_$sfx"))
    def nD(sfx: String) = col(s"n_$sfx").cast("double")
    def mean(sfx: String) = col(s"__s_$sfx") / nD(sfx)
    def svar(sfx: String) =
      (col(s"__ss_$sfx") - col(s"__s_$sfx") * col(s"__s_$sfx") / nD(sfx)) /
        (nD(sfx) - 1.0)
    val did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    val se = sqrt(svar("t1") / nD("t1") + svar("t0") / nD("t0") +
      svar("c1") / nD("c1") + svar("c0") / nD("c0"))
    cell(1, 0, "t0").join(cell(1, 1, "t1"), Seq("grp"))
      .join(cell(0, 0, "c0"), Seq("grp"))
      .join(cell(0, 1, "c1"), Seq("grp"))
      .filter(col("n_t0") >= 2 && col("n_t1") >= 2 &&
        col("n_c0") >= 2 && col("n_c1") >= 2)
      .select(col("grp"), col("n_t0").as("n_t_pre"),
        col("n_t1").as("n_t_post"), col("n_c0").as("n_c_pre"),
        col("n_c1").as("n_c_post"),
        round(did, 6).as("did"), round(did / se, 6).as("z"))
  }

  /** Mann–Whitney U test (Mann & Whitney 1947), tie-corrected — the
    * nonparametric companion to [[abTest]]: rank-based, so a heavy-
    * tailed or bounded metric (latency, counts, satisfaction scores)
    * needs no normality assumption. Per group, U for the arm-0 sample
    * against arm 1 with midrank ties and the normal approximation
    * z = (U − n_a·n_b/2) / σ, σ² = n_a·n_b/12 · [(n+1) − Σ(t³−t)/(n(n−1))].
    *
    * Exactness discipline: ranks never materialize per ROW — the stream
    * collapses to per-(group, value) counts first (the only corpus-scale
    * agg), midranks come from the [[revenueGini]] banded two-pass prefix
    * sum (per-band counts to the driver, in-band exclusive window), and
    * every statistic folds DOUBLED integer forms (2·avg-rank = 2s+c−1)
    * in decimal(38,0), so U and the tie term are exact until the one
    * IEEE z at the end. No global sort, no per-row rank window.
    *
    * @return (grp, n_a, n_b, u, z) — u is arm 0's U statistic */
  def mannWhitneyU(
      events: DataFrame,
      groupCol: String,
      unitCol: String,
      valueCol: String,
      seed: Long = 42L,
      quantScale: Long = 1000L,
      bandWidth: Long = 10000L,
      maxBands: Long = 1000000L): DataFrame = {
    require(quantScale > 0 && bandWidth > 0, "positive scales")
    val spark = events.sparkSession
    import spark.implicits._
    val arm = pmod(graft.functions.HashFunctions.md5Bucket(seed, col(unitCol)),
      lit(2L))
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val perVal = events
      .select(col(groupCol).as("grp"), arm.as("__arm"), q.as("__q"))
      .groupBy(col("grp"), col("__q"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("__arm") === 0L, lit(1L)).otherwise(lit(0L))).as("ca"))
      .withColumn("__band", expr("__q div " + bandWidth))
      .localCheckpoint(true) // band census + ranked pass share it
    // shared guarded census (Banded owns the maxBands fail-fast)
    val (offRows, _) = Banded.bandCensus(
      perVal.select(col("grp").cast("string").as("grp"),
        col("__band"), col("c")),
      Seq("grp"), "c", maxBands)
    val offsets = offRows
      .map { case (g, b, off) => (g.head.asInstanceOf[String], b, off) }
      .toDF("grp", "__band", "__off")
    val exc = sum(col("c")).over(
      Window.partitionBy(col("grp"), col("__band")).orderBy(col("__q"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val stats = perVal
      .join(broadcast(offsets), Seq("grp", "__band"))
      .select(col("grp"), col("c"), col("ca"),
        (coalesce(exc, lit(0L)) + col("__off") + lit(1L)).as("s"))
      // doubled midrank 2s+c−1 keeps everything integral under ties
      .groupBy(col("grp"))
      .agg(
        sum(col("ca")).as("n_a"),
        (sum(col("c")) - sum(col("ca"))).as("n_b"),
        sum(col("ca").cast("decimal(38,0)") *
          (lit(2L) * col("s") + col("c") - lit(1L)).cast("decimal(38,0)"))
          .as("__r2a"),
        sum((col("c").cast("decimal(38,0)") * col("c") * col("c") -
          col("c")).cast("decimal(38,0)")).as("__tie"))
      .filter(col("n_a") >= 1 && col("n_b") >= 1)
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = nA + nB
    // 2U = R2A − 2·n_a(n_a+1)/2 = R2A − n_a(n_a+1), exact in decimal
    val u2 = (col("__r2a") -
      (col("n_a").cast("decimal(38,0)") * (col("n_a") + lit(1L))
        .cast("decimal(38,0)"))).cast("double")
    val varU = nA * nB / lit(12.0) *
      ((n + lit(1.0)) - col("__tie").cast("double") / (n * (n - lit(1.0))))
    stats.select(col("grp"), col("n_a"), col("n_b"),
      round(u2 / lit(2.0), 6).as("u"),
      round((u2 - nA * nB) / (lit(2.0) * sqrt(varU)), 6).as("z"))
  }

  /** Doubled midranks (2s + c + 1 for a value with c occurrences and s
    * strictly-smaller rows) for one quantized metric column — the
    * tie-exact rank primitive [[mannWhitneyU]] and [[spearmanCorr]]
    * share. Doubling keeps midranks INTEGRAL under ties (a .5 midrank
    * becomes an odd integer), so every downstream moment accumulates in
    * decimals with no FP until the caller's one finish. Ranks come from
    * the banded two-pass prefix sum ([[Banded.bandCensus]], which owns
    * the maxBands fail-fast): per-distinct-value counts band by value
    * range, offsets collect once, in-band exclusive cumsums ride a
    * band-partitioned window — no global sort, no unpartitioned window.
    *
    * @param perVal one row per distinct value: (`qCol` long, `__c`
    *               count), localCheckpoint-ed by the caller
    * @return (`qCol`, `outCol` = doubled midrank) */
  private def doubledMidranks(
      perVal: DataFrame,
      qCol: String,
      outCol: String,
      bandWidth: Long,
      maxBands: Long): DataFrame = {
    val banded = perVal
      .withColumn("__band", expr(s"`$qCol` div ${bandWidth}L"))
      .localCheckpoint(true) // census + ranked pass share it
    val (offRows, _) = Banded.bandCensus(
      banded.select(col("__band"), col("__c")), Seq(), "__c", maxBands)
    val spark = perVal.sparkSession
    import spark.implicits._
    val offsets = offRows.map { case (_, bnd, off) => (bnd, off) }
      .toDF("__band", "__off")
    val exc = sum(col("__c")).over(
      Window.partitionBy(col("__band")).orderBy(col(qCol))
        .rowsBetween(Window.unboundedPreceding, -1))
    banded.join(broadcast(offsets), Seq("__band"))
      .select(col(qCol),
        (lit(2L) * (coalesce(exc, lit(0L)) + col("__off")) + col("__c") +
          lit(1L)).as(outCol))
  }

  /** Spearman rank correlation between per-unit ACTIVITY (event count)
    * and VALUE MASS (quantized value sum) — "do heavy users spend
    * more?" as a tie-exact rank statistic (Spearman 1904), robust to
    * the monotone-but-nonlinear relationships Pearson understates.
    *
    * Exactness: Spearman = Pearson over midranks, and midranks double
    * to integers ([[doubledMidranks]] — scale cancels exactly in the
    * correlation), so all five moment sums accumulate in decimal(38,0)
    * and the output is ONE IEEE expression — num/√(d1·d2) with each
    * factor cast to double separately (their decimal product would
    * overflow 38 digits at 10⁹ units; the SQL replay casts the same
    * HUGEINTs at the same points).
    *
    * Scale shape: one user-keyed agg (the only corpus-scale shuffle),
    * two distinct-value rank passes on the collapsed (value, count)
    * frames (banded, guarded), two rank joins (un-hinted: AQE
    * broadcasts the small rank tables at runtime; the y-rank table can
    * scale with distinct sums), one global moment agg. No global sort,
    * no collect beyond the band censuses.
    *
    * @return one row (n_units, rho), rho 6-rounded */
  def spearmanCorr(
      events: DataFrame,
      unitCol: String = "user_id",
      valueCol: String = "value",
      quantScale: Long = 100L,
      bandWidth: Long = 1000L,
      maxBands: Long = 1000000L): DataFrame = {
    require(quantScale > 0 && bandWidth > 0, "positive scales")
    val per = events
      .select(col(unitCol).as("__u"),
        floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
          .as("__qv"))
      .groupBy(col("__u"))
      .agg(count(lit(1)).as("__x"), sum(col("__qv")).as("__y"))
      .localCheckpoint(true) // two rank passes + the moment agg share it
    val xVals = per.groupBy(col("__x")).agg(count(lit(1)).as("__c"))
    val yVals = per.groupBy(col("__y")).agg(count(lit(1)).as("__c"))
    val rx = doubledMidranks(xVals, "__x", "__rx", bandWidth, maxBands)
    val ry = doubledMidranks(yVals, "__y", "__ry", bandWidth, maxBands)
    // rank-table joins stay UN-hinted: __x ranks are few (distinct
    // activity counts) but __y ranks scale with distinct value sums —
    // potentially units-scale — so AQE picks broadcast only when the
    // runtime size warrants it
    val ranked = per
      .join(rx, Seq("__x"))
      .join(ry, Seq("__y"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    val m = ranked.agg(
      count(lit(1)).as("n_units"),
      sum(d(col("__rx"))).as("__sx"),
      sum(d(col("__ry"))).as("__sy"),
      sum(d(col("__rx")) * d(col("__ry"))).as("__sxy"),
      sum(d(col("__rx")) * d(col("__rx"))).as("__sxx"),
      sum(d(col("__ry")) * d(col("__ry"))).as("__syy"))
    val n = d(col("n_units"))
    val d1 = (n * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val d2 = (n * col("__syy") - col("__sy") * col("__sy")).cast("double")
    // a degenerate margin (zero rank variance on either side) has no
    // rank correlation: NULL, stated — not a DIVIDE_BY_ZERO crash under
    // ANSI mode, not a NaN that poisons downstream sorts
    m.select(col("n_units"),
      when(d1 > 0.0 && d2 > 0.0,
        round((n * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
          sqrt(d1 * d2), 6))
        .as("rho"))
  }

  /** Experiment sizing report — the pre-registration answer to "how
    * many users per arm do we need": for each event type, the baseline
    * participation rate p₁ (distinct users with the event / all users)
    * and the classical two-proportion sample size (Fleiss 1981) to
    * detect an absolute lift `mde` at α/power encoded by the z
    * literals:
    *
    *   n = (z_{α/2}·√(2p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))² / (p₂−p₁)²
    *
    * Exactness: the only corpus-scale work is two distinct-user counts
    * (keyed + 1-row broadcast); the formula is one fixed IEEE
    * expression over their exact ratio, with z quantiles as full-
    * precision literals — the SQL replay evaluates the identical
    * textual shape. p₂ clamps at 1.0; a clamped-to-degenerate lift
    * (p₁ = 1) emits stated NULLs.
    *
    * @return (event_type, n_users_type, n_users_total, p1, p2,
    *         n_per_arm, n_total), rates 6-rounded */
  def experimentSizing(
      events: DataFrame,
      typeCol: String = "event_type",
      userCol: String = "user_id",
      mde: Double = 0.02,
      zAlpha: Double = 1.959963984540054,
      zBeta: Double = 0.8416212335729143): DataFrame = {
    require(mde > 0 && mde < 1, s"mde in (0,1): $mde")
    val perType = events
      .select(col(typeCol).as("event_type"), col(userCol).as("__u"))
      .distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users_type"))
    val tot = broadcast(events
      .agg(countDistinct(col(userCol)).as("n_users_total")))
    val p1 = col("n_users_type").cast("double") /
      col("n_users_total").cast("double")
    val p2 = least(p1 + lit(mde), lit(1.0))
    val pbar = lit(0.5) * (p1 + p2)
    val num = lit(zAlpha) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
      lit(zBeta) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    val nArm = when(p2 > p1,
      ceil(num * num / ((p2 - p1) * (p2 - p1))))
    perType.crossJoin(tot)
      .select(col("event_type"), col("n_users_type"), col("n_users_total"),
        round(p1, 6).as("p1"), round(p2, 6).as("p2"),
        nArm.as("n_per_arm"),
        (nArm * lit(2L)).as("n_total"))
  }

  /** Kendall τ-b concordance between TWO event types' hourly series
    * (Kendall 1938) — "do these metrics move together hour over hour"
    * as an exact pair statistic, the tie-corrected complement to
    * [[spearmanCorr]] (rank-moment) and [[theilSenTrend]] (slope):
    * over all hour pairs, C = concordant, D = discordant,
    * τ_b = (C−D)/√((C+D+Tx)(C+D+Ty)).
    *
    * Scale shape: the corpus collapses to (type, hour, count) first —
    * the pairwise expansion is CALENDAR-bounded behind the same
    * `maxHours` fail-fast census as [[theilSenTrend]]; every count is
    * an exact integer and the finish is one IEEE expression over one
    * cast product. Hours where either series is absent are excluded
    * (inner hour join — the compared series must both observe the
    * hour); a degenerate series (all ties) emits stated NULL.
    *
    * @return one row (n_hours, n_pairs, concordant, discordant,
    *         tau_b), 6-rounded */
  def kendallTau(
      events: DataFrame,
      typeA: String,
      typeB: String,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxHours: Long = 5000L): DataFrame = {
    require(typeA != typeB, "need two distinct series")
    val h = events
      .filter(col(typeCol).isin(typeA, typeB))
      .groupBy(expr(s"`$tsCol` div ${hourUs}L").as("__h"),
        col(typeCol).as("__t"))
      .agg(count(lit(1)).as("__x"))
    val joined = h.filter(col("__t") === typeA)
      .select(col("__h"), col("__x").as("__xa"))
      .join(h.filter(col("__t") === typeB)
        .select(col("__h"), col("__x").as("__xb")), Seq("__h"))
      .localCheckpoint() // census + pair join share it
    val nHours = joined.count()
    require(nHours <= maxHours,
      s"kendallTau: $nHours shared hours exceed maxHours=$maxHours " +
        s"(~${nHours * nHours / 2} pairs) — widen the bucket or raise " +
        "maxHours deliberately")
    val a = joined.select(col("__h").as("__h1"), col("__xa").as("__a1"),
      col("__xb").as("__b1"))
    val b = joined.select(col("__h").as("__h2"), col("__xa").as("__a2"),
      col("__xb").as("__b2"))
    val dx = col("__a2") - col("__a1")
    val dy = col("__b2") - col("__b1")
    // the pair expansion is a guarded ≤ maxHours² broadcast nested loop
    // — b is the calendar-bounded hour frame, never corpus-scale
    val agg = a.crossJoin(broadcast(b)).filter(col("__h2") > col("__h1"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(dx * dy > 0, lit(1L)).otherwise(lit(0L)))
          .as("concordant"),
        sum(when(dx * dy < 0, lit(1L)).otherwise(lit(0L)))
          .as("discordant"),
        sum(when(dx === 0 && dy =!= 0, lit(1L)).otherwise(lit(0L)))
          .as("__tx"),
        sum(when(dy === 0 && dx =!= 0, lit(1L)).otherwise(lit(0L)))
          .as("__ty"))
    val den = (col("concordant") + col("discordant") + col("__tx")) *
      (col("concordant") + col("discordant") + col("__ty"))
    agg.select(lit(nHours).as("n_hours"), col("n_pairs"),
      col("concordant"), col("discordant"),
      when(den > 0L,
        round((col("concordant") - col("discordant")).cast("double") /
          sqrt(den.cast("double")), 6)).as("tau_b"))
  }

  /** Revenue-concentration report: exact Gini coefficient and
    * top-decile share of per-customer revenue — the inequality rollup
    * behind "how concentrated is our revenue" (and, on a corpus, "how
    * concentrated are tokens per source"). Gini from the rank form
    * G = 2·Σᵢ rᵢqᵢ / (n·Σq) − (n+1)/n over ascending ranks rᵢ (Lerman &
    * Yitzhaki 1984), which needs ONE global rank — produced with the
    * banded two-pass prefix-sum discipline ([[graft.streaming
    * .EventStreams.userGrowth]]): band per-customer totals by value
    * range, collect per-band COUNTS to the driver (bounded by value
    * range / `bandWidth`, never by customers), then rank inside each
    * band with a partitioned window plus the band's exclusive offset.
    * No global `Window.orderBy`, no full sort.
    *
    * Exactness: quantized amounts, Σrᵢqᵢ accumulated in decimal(38,0)
    * (HUGEINT in the SQL replay), one IEEE finish per output. Ties in
    * revenue rank by customer id — both engines pin the same total
    * order. n is driver-known after pass 1, so the top-decile rank
    * threshold ships as a literal.
    *
    * @return one row (n_customers, total_q, gini, top_decile_share) */
  def revenueGini(
      orders: DataFrame,
      custCol: String = "o_custkey",
      amtCol: String = "o_totalprice",
      quantScale: Long = 100L,
      bandWidth: Long = 1000000L,
      maxBands: Long = 1000000L): DataFrame = {
    require(quantScale > 0 && bandWidth > 0, "positive scales")
    val spark = orders.sparkSession
    import spark.implicits._
    val per = orders
      .select(col(custCol).as("cust"),
        // floor-quantize a DOUBLE amount: cast-to-bigint truncates in
        // Spark but rounds in DuckDB — floor is the one portable form
        floor(col(amtCol) * lit(quantScale.toDouble)).as("q"))
      .groupBy(col("cust")).agg(sum(col("q")).as("q"))
      .withColumn("__band", expr(s"q div $bandWidth"))
      .localCheckpoint(true) // band census + ranked pass share the agg
    // shared guarded census (Banded owns the maxBands fail-fast)
    val (offRows, totals) = Banded.bandCensus(
      per.select(col("__band"), lit(1L).as("__w")), Seq(), "__w", maxBands)
    val n = totals.getOrElse(Seq(), 0L)
    val offsets = offRows.map { case (_, b, off) => (b, off) }
    val topThreshold = n - n / 10 // rank > threshold ⇒ top decile
    val ranked = per
      .join(broadcast(offsets.toDF("__band", "__off")), Seq("__band"))
      .select(col("q"),
        (row_number().over(Window.partitionBy(col("__band"))
          .orderBy(col("q"), col("cust"))).cast("long") + col("__off"))
          .as("r"))
    ranked
      .agg(
        sum(col("q")).as("__tq"),
        sum((col("r").cast("decimal(38,0)") * col("q"))
          .cast("decimal(38,0)")).as("__srq"),
        sum(when(col("r") > lit(topThreshold), col("q"))
          .otherwise(lit(0L))).as("__topq"))
      .select(
        lit(n).as("n_customers"),
        col("__tq").cast("bigint").as("total_q"),
        round(lit(2.0) * col("__srq").cast("double") /
          (lit(n.toDouble) * col("__tq").cast("double")) -
          (lit(n.toDouble) + lit(1.0)) / lit(n.toDouble), 6).as("gini"),
        round(col("__topq").cast("double") / col("__tq").cast("double"), 6)
          .as("top_decile_share"))
  }

  /** Benford first-digit audit (Benford 1938; Nigrini 1996's fraud
    * screen): observed leading-digit distribution of an amount column
    * against log₁₀(1+1/d), with a per-digit standard z. The classic
    * anomaly sweep over financial/count data — fabricated or capped
    * values flatten the curve.
    *
    * Leading digit by INTEGER arithmetic (quantize, then first char of
    * the integer's decimal rendering — both engines render integers
    * identically), never floor(log10(x)) whose FP misclassifies exact
    * powers of ten. One 9-group keyed agg + a 1-row total broadcast;
    * expected/z are single IEEE expressions per output row.
    *
    * @return 9 rows (digit, n_obs, freq, expected, z) ordered by digit */
  def benfordDigits(
      rows: DataFrame,
      amtCol: String,
      quantScale: Long = 100L): DataFrame = {
    // floor, not cast: see revenueGini's quantization note
    val q = floor(col(amtCol) * lit(quantScale.toDouble))
    val byDigit = rows.select(q.as("q")).filter(col("q") > 0)
      .select(substring(col("q").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = byDigit.agg(sum(col("n_obs")).as("__n"))
    val p = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    byDigit.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("__n").cast("double"), 6)
          .as("freq"),
        round(p, 6).as("expected"),
        round((col("n_obs").cast("double") - col("__n").cast("double") * p) /
          sqrt(col("__n").cast("double") * p * (lit(1.0) - p)), 6).as("z"))
      .orderBy(col("digit"))
  }

  /** Kaplan–Meier survival over user lifetimes (Kaplan & Meier 1958):
    * per-user duration = last − first active day; a user still active
    * within `censorDays` of the corpus end is CENSORED (their true
    * lifetime is only known to exceed the observation). Product-limit
    * estimator S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over distinct event
    * durations, with censored users leaving the risk set without an
    * event — the churn curve a retention dashboard plots.
    *
    * Scale shape: the only event-scale work is ONE keyed agg per user;
    * the duration table is calendar-bounded (≤ observed day span), so
    * the ordered product folds a tiny frame in pinned ascending-duration
    * order inside one row (the [[zipfFit]] discipline — each fold step
    * builds a FRESH struct from the previous accumulator, so the
    * survival factor always reads the pre-step risk count). Replays in
    * SQL as a recursive CTE carrying (at_risk, survival).
    *
    * @param events epoch-µs `ts` BIGINT + `user_id`
    * @return (duration, n_at_risk, d_events, n_censored, survival)
    *         one row per distinct duration, ascending */
  def survivalKm(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      censorDays: Int = 7,
      dayUs: Long = 86400000000L): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(min(expr(s"$tsCol div $dayUs")).as("f"),
        max(expr(s"$tsCol div $dayUs")).as("l"))
    val anchor = perUser.agg(max(col("l")).as("__mx"))
    val byDur = perUser.crossJoin(broadcast(anchor))
      .select((col("l") - col("f")).as("dur"),
        when(col("l") < col("__mx") - lit(censorDays.toLong), lit(1L))
          .otherwise(lit(0L)).as("ev"))
      .groupBy(col("dur"))
      .agg(sum(col("ev")).as("d"),
        (count(lit(1)) - sum(col("ev"))).as("c"))
    val emptyOut = array().cast(
      "array<struct<duration:bigint,n_at_risk:bigint,d_events:bigint," +
        "n_censored:bigint,survival:double>>")
    byDur
      .agg(sort_array(collect_list(struct(col("dur"), col("d"), col("c"))))
        .as("__a"))
      .select(col("__a"),
        aggregate(col("__a"), lit(0L), (a, x) =>
          a + x.getField("d") + x.getField("c")).as("__n"))
      .select(aggregate(col("__a"),
        struct(col("__n").as("atrisk"), lit(1.0).as("s"), emptyOut.as("out")),
        (acc, x) => {
          val sNew = acc.getField("s") *
            (lit(1.0) - x.getField("d").cast("double") /
              acc.getField("atrisk").cast("double"))
          struct(
            (acc.getField("atrisk") - x.getField("d") - x.getField("c"))
              .as("atrisk"),
            sNew.as("s"),
            concat(acc.getField("out"), array(struct(
              x.getField("dur").as("duration"),
              acc.getField("atrisk").as("n_at_risk"),
              x.getField("d").as("d_events"),
              x.getField("c").as("n_censored"),
              sNew.as("survival")))).as("out"))
        }).getField("out").as("__out"))
      .select(explode(col("__out")).as("r"))
      .select(col("r.duration").as("duration"),
        col("r.n_at_risk").as("n_at_risk"),
        col("r.d_events").as("d_events"),
        col("r.n_censored").as("n_censored"),
        round(col("r.survival"), 6).as("survival"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * member of the privacy family after [[kAnonymityViolations]] and
    * [[lDiversityViolations]]: a class can be k-anonymous AND l-diverse
    * yet still leak when its sensitive DISTRIBUTION skews far from the
    * corpus-wide one (the skewness attack — "this zip code is mostly
    * high-income"). Per quasi-identifier class, the Earth Mover's
    * Distance between the class's bucketed sensitive distribution and
    * the global one, in the ordered-attribute form: EMD =
    * Σᵢ |CumP(i) − CumQ(i)| / (m−1) over the m-bucket spine.
    *
    * Scale shape: one corpus pass into (class × bucket) cells plus one
    * into per-class totals; the bucket spine with its cumulative global
    * counts is value-range-bounded (`require`-guarded census, the
    * [[mutualInformation]] discipline) and broadcast. Cumulative class
    * counts are a class-partitioned window over the grid. Exactness:
    * cumulative-difference terms are |cumG·N − cumB·nG| in
    * decimal(38,0) (HUGEINT in the replay), one IEEE finish per class.
    *
    * @param sensitiveCol numeric ordered sensitive attribute
    * @return (quasiCols..., n_rows, t_emd) one row per class */
  def tClosenessReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      bucketWidth: Long = 500L,
      maxBuckets: Int = 100000): DataFrame = {
    require(quasiCols.nonEmpty && bucketWidth > 0, "need quasi cols + width")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(quasiCols.map(col) :+
      expr(s"$sensitiveCol div $bucketWidth").as("__b"): _*)
      .localCheckpoint(true) // cells, spine and class totals share it
    val spineRows = base.groupBy(col("__b"))
      .agg(count(lit(1)).as("__nb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(spineRows.length <= maxBuckets,
      s"bucket spine ${spineRows.length} exceeds maxBuckets=$maxBuckets — " +
        "raise bucketWidth (the spine is broadcast and driver-collected)")
    require(spineRows.length >= 2,
      "t-closeness needs at least 2 sensitive buckets")
    val n = spineRows.map(_._2).sum
    val m = spineRows.length
    val spine = spineRows
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      .drop(1).toSeq.toDF("__b", "__cumb")
    val cells = base.groupBy(quasiCols.map(col) :+ col("__b"): _*)
      .agg(count(lit(1)).as("__ngb"))
    val classes = base.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__ng"))
    val grid = classes.crossJoin(broadcast(spine))
      .join(cells, quasiCols :+ "__b", "left")
      .na.fill(0L, Seq("__ngb"))
    val cumg = sum(col("__ngb")).over(
      Window.partitionBy(quasiCols.map(col): _*).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grid
      .select(quasiCols.map(col) :+ col("__ng") :+ col("__cumb") :+
        cumg.as("__cumg"): _*)
      .groupBy(quasiCols.map(col): _*)
      .agg(first(col("__ng")).as("__ng"),
        sum(abs(col("__cumg").cast("decimal(38,0)") * lit(n) -
          col("__cumb").cast("decimal(38,0)") * col("__ng")))
          .as("__sd"))
      .select(quasiCols.map(col) :+ col("__ng").as("n_rows") :+
        round(col("__sd").cast("double") /
          (col("__ng").cast("double") * lit(n.toDouble) *
            (lit(m.toDouble) - lit(1.0))), 6).as("t_emd"): _*)
  }

  /** Poisson(1) CDF thresholds scaled to 2³², for the hash-bootstrap
    * multiplicity draw: a 32-bit uniform u maps to multiplicity k = #
    * thresholds ≤ u (inverse CDF; tail truncated at 6, P ≈ 8·10⁻⁵).
    * Shared verbatim by the SQL oracle — integer compares only. */
  private[graft] val PoissonThresholds: Seq[Long] =
    Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L)

  /** Seeded hash-bootstrap confidence interval for a column mean
    * (Efron 1979, in the Poissonized form distributed engines use —
    * Chamandy et al., Google 2012: resample multiplicities drawn
    * per (row, replicate) instead of sampling n-out-of-n, so every
    * replicate is one map-side-combinable aggregate). Multiplicity is
    * the inverse-CDF Poisson(1) draw on the [[graft.functions
    * .HashFunctions.md5Bucket]] uniform — deterministic, seeded, and
    * replayable in SQL, the [[graft.operators.Curation.hashSample]]
    * contract.
    *
    * Scale shape: the corpus passes ONCE through a `nResamples`-way
    * explode into B keyed partial sums (map-side combine leaves B rows
    * per task); the percentile finish sorts the B replicate means in
    * one pinned-order row. B is the cost knob: work is B× one scan's
    * map work, shuffle is B rows per task.
    *
    * @return one row (n_rows, mean, n_resamples, ci_lo, ci_hi) */
  def bootstrapCi(
      rows: DataFrame,
      idCol: String,
      valCol: String,
      nResamples: Int = 64,
      seed: Long = 42L,
      alpha: Double = 0.05): DataFrame = {
    require(nResamples >= 4, s"nResamples >= 4: $nResamples")
    val u = graft.functions.HashFunctions.md5Bucket(seed,
      concat_ws("#", col("b"), col("id")))
    val w = PoissonThresholds.zipWithIndex
      .foldRight(lit(6)) { case ((t, k), e) =>
        when(col("__u") < lit(t), lit(k)).otherwise(e) }
    val loIdx = (math.floor(alpha / 2 * nResamples) + 1).toInt
    val hiIdx = nResamples - loIdx + 1
    val base = Fan.spread(rows.select(col(idCol).cast("string").as("id"),
      col(valCol).cast("bigint").as("q")))
      .localCheckpoint(true) // full-sample moments + B-way explode
    val reps = base
      .select(col("id"), col("q"),
        explode(sequence(lit(0), lit(nResamples - 1))).as("b"))
      .select(col("q"), col("b"), u.as("__u"))
      .select(col("q"), col("b"), w.cast("long").as("__w"))
      .groupBy(col("b"))
      .agg(sum(col("__w")).as("__nb"), sum(col("__w") * col("q")).as("__sb"))
      .select(col("b"),
        (col("__sb").cast("double") / col("__nb").cast("double")).as("m"))
      .agg(sort_array(collect_list(struct(col("m"), col("b")))).as("__ms"))
    base.agg(count(lit(1)).as("n_rows"), sum(col("q")).as("__s"))
      .crossJoin(broadcast(reps))
      .select(col("n_rows"),
        round(col("__s").cast("double") / col("n_rows").cast("double"), 6)
          .as("mean"),
        lit(nResamples.toLong).as("n_resamples"),
        round(element_at(col("__ms"), loIdx).getField("m"), 6).as("ci_lo"),
        round(element_at(col("__ms"), hiIdx).getField("m"), 6).as("ci_hi"))
  }

  /** Post-stratified average-treatment-effect estimate (blocked
    * difference-in-means, Imbens–Rubin ch. 9): units stratify on a
    * unit-level covariate — the user's lexicographically-first event
    * type, a deterministic "primary activity" proxy — and the overall
    * effect is the stratum-size-weighted sum of within-stratum mean
    * differences, ATE = Σ_s (n_s/N)·(ȳ_{t,s} − ȳ_{c,s}). This removes
    * the between-strata outcome variance from the comparison — the
    * design-based cousin of [[cupedAbTest]]'s regression adjustment
    * (and, with the arms read as corpora, a composition-adjusted
    * corpus-mean diff: what [[abTest]] reports once the lang/source mix
    * is held fixed).
    *
    * Exactness: unit outcomes are quantized exact-long sums; stratum
    * moments are exact decimal sums; each stratum's weightᐧdiff term is
    * a fixed IEEE shape over exact numbers; and the CROSS-STRATUM sum
    * folds in pinned stratum order over a sort_array'd struct list (the
    * [[mutualInformation]] discipline), so the single final row replays
    * bit-exactly in SQL. Strata are bounded by the covariate's
    * cardinality and the same fail-fast census guard applies
    * (`maxStrata`).
    *
    * Strata where either arm is empty are DROPPED (standard practice —
    * no within-stratum contrast exists) and excluded from N, so weights
    * sum to 1 over the estimable strata; `n_strata_dropped` reports how
    * many. Scale shape: the event-scale work is ONE keyed agg per unit;
    * everything after runs on the unit frame and then the
    * stratum-bounded frame.
    *
    * @return one row: (n_strata, n_strata_dropped, n_units, ate_raw,
    *         ate_stratified), effects on the metric's original scale,
    *         rounded to 6 places
    */
  def postStratifiedAte(
      events: DataFrame,
      unitCol: String = "user_id",
      stratumSourceCol: String = "event_type",
      valueCol: String = "value",
      seed: Long = 42L,
      quantScale: Long = 1000L,
      maxStrata: Long = 100000L): DataFrame = {
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    require(maxStrata > 0, s"maxStrata must be positive: $maxStrata")
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val units = events
      .select(col(unitCol).as("__u"), col(stratumSourceCol).as("__sc"), q.as("__q"))
      .groupBy(col("__u"))
      .agg(min(col("__sc")).as("__stratum"), sum(col("__q")).as("__y"))
      .select(col("__u"), col("__stratum"), col("__y"),
        pmod(graft.functions.HashFunctions.md5Bucket(seed, col("__u")), lit(2L))
          .as("__arm"))
    val cells = units.groupBy(col("__stratum"), col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__y").cast("decimal(28,0)")).as("__sy"))
      .localCheckpoint() // census + both arm sides read it
    val nStrataTotal = cells.select(col("__stratum")).distinct().count()
    require(nStrataTotal <= maxStrata,
      s"postStratifiedAte: $nStrataTotal distinct strata exceed " +
        s"maxStrata=$maxStrata — the estimate folds one term per stratum " +
        s"in a single row and is meant for CATEGORICAL covariates")
    def side(v: Int, sfx: String) = cells.filter(col("__arm") === v)
      .select(col("__stratum"), col("__n").as(s"n_$sfx"),
        col("__sy").as(s"sy_$sfx"))
    val kept = side(0, "a").join(side(1, "b"), Seq("__stratum"))
    val packed = kept.agg(
      count(lit(1)).as("n_strata"),
      sum(col("n_a") + col("n_b")).as("__nn"),
      sum(col("sy_a")).as("__sya"), sum(col("sy_b")).as("__syb"),
      sum(col("n_a")).as("__na"), sum(col("n_b")).as("__nb"),
      sort_array(collect_list(struct(
        col("__stratum"), col("n_a"), col("n_b"),
        col("sy_a"), col("sy_b")))).as("__cells"))
    // pinned-order fold: Σ_s (n_s/N) · (mean_a,s − mean_b,s), each term a
    // fixed IEEE shape over exact decimal/long stratum sums
    val ateQ = aggregate(col("__cells"), lit(0.0), (acc, c) =>
      acc + ((c.getField("n_a") + c.getField("n_b")).cast("double") /
        col("__nn").cast("double")) *
        (c.getField("sy_a").cast("double") / c.getField("n_a").cast("double") -
          c.getField("sy_b").cast("double") / c.getField("n_b").cast("double")))
    packed.crossJoin(broadcast(
      cells.select(col("__stratum")).distinct()
        .agg(count(lit(1)).as("__tot"))))
      .select(
        col("n_strata"),
        (col("__tot") - col("n_strata")).as("n_strata_dropped"),
        col("__nn").as("n_units"),
        round((col("__sya").cast("double") / col("__na").cast("double") -
          col("__syb").cast("double") / col("__nb").cast("double")) /
          lit(quantScale.toDouble), 6).as("ate_raw"),
        round(ateQ / lit(quantScale.toDouble), 6).as("ate_stratified"))
  }

  /** Split-conformal prediction interval per event type (Vovk's
    * inductive conformal; Lei et al. 2018, "Distribution-Free
    * Predictive Inference for Regression"): hash-split events into a
    * TRAIN part that fits the predictor — here the floored integer mean
    * of the quantized metric; ANY fixed predictor inherits the
    * guarantee — and a CALIBRATION part whose absolute residuals' k-th
    * order statistic, k = ⌈(1−α)(n_cal+1)⌉, is the radius q̂. The
    * interval [μ−q̂, μ+q̂] then covers a fresh exchangeable point with
    * probability ≥ 1−α, no distributional assumptions.
    *
    * Exactness + scale shape: residuals are exact longs (quantized
    * metric minus the integer-div mean), so the order statistic is
    * selected DISTRIBUTIVELY with no per-group collect: count per
    * distinct residual VALUE (a keyed agg — the frame is bounded by
    * distinct residual magnitudes, far below row count), a cumulative
    * count window PARTITIONED by type over that slim frame, then
    * min r with cum ≥ k. k is exact integer arithmetic
    * ((9·(n+1)+9) div 10 for α=0.1), clamped to n_cal (the k > n_cal
    * case means "no finite radius at this α"; the max residual is the
    * honest clamp). One IEEE division per output column, so the row
    * replays bit-exactly in SQL.
    *
    * @param alphaTenths miscoverage α in tenths (1 = 0.1 → 90%
    *        intervals) — integer so k stays exact arithmetic
    * @return per type: (event_type, n_train, n_cal, mu, q_radius, lo,
    *         hi) on the metric's original scale, rounded to 6
    */
  def conformalInterval(
      events: DataFrame,
      typeCol: String = "event_type",
      valueCol: String = "value",
      idCol: String = "event_id",
      alphaTenths: Int = 1,
      seed: Long = 7L,
      quantScale: Long = 1000L): DataFrame = {
    require(alphaTenths >= 1 && alphaTenths <= 9,
      s"alphaTenths in [1,9]: $alphaTenths")
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    val keep = 10 - alphaTenths // coverage numerator in tenths
    val q = floor(col(valueCol) * lit(quantScale.toDouble)).cast("long")
    val base = events.select(col(typeCol).as("__t"), q.as("__q"),
      (pmod(graft.functions.HashFunctions.md5Bucket(seed, col(idCol)),
        lit(5L)) === 0L).as("__cal"))
      .localCheckpoint() // train agg + calibration residuals read it
    val mu = base.filter(!col("__cal"))
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("n_train"),
        sum(col("__q").cast("decimal(28,0)")).as("__sq"))
      .select(col("__t"), col("n_train"),
        expr("__sq div n_train").cast("long").as("__mu"))
    val res = base.filter(col("__cal"))
      .join(broadcast(mu), Seq("__t"))
      .select(col("__t"), abs(col("__q") - col("__mu")).as("__r"))
      .groupBy(col("__t"), col("__r"))
      .agg(count(lit(1)).as("__c"))
    val cum = res.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__t")).orderBy(col("__r"))))
    val nCal = res.groupBy(col("__t"))
      .agg(sum(col("__c")).as("n_cal"))
      .withColumn("__k",
        least(col("n_cal"),
          expr(s"($keep * (n_cal + 1) + 9) div 10")))
    val radius = cum.join(nCal, Seq("__t"))
      .filter(col("__cum") >= col("__k"))
      .groupBy(col("__t"), col("n_cal"))
      .agg(min(col("__r")).as("__qhat"))
    val s = lit(quantScale.toDouble)
    mu.join(radius, Seq("__t"))
      .select(col("__t").as(typeCol), col("n_train"), col("n_cal"),
        round(col("__mu").cast("double") / s, 6).as("mu"),
        round(col("__qhat").cast("double") / s, 6).as("q_radius"),
        round((col("__mu") - col("__qhat")).cast("double") / s, 6).as("lo"),
        round((col("__mu") + col("__qhat")).cast("double") / s, 6).as("hi"))
  }

  // ------------------------------------------------------------------
  // Round-13 statistical-testing / distribution-distance tier
  // ------------------------------------------------------------------

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) per group over
    * the hourly count series — the nonparametric "is this metric
    * monotonically trending" companion to [[theilSenTrend]] (Theil–Sen
    * estimates the slope; Mann–Kendall decides whether a trend exists
    * at all, robust to outliers and any monotone transform).
    *
    * Exactness: S = Σ sign(x_j − x_i) over hour pairs j > i is an exact
    * integer; the tie-corrected 18·Var(S) = n(n−1)(2n+5) − Σ t(t−1)(2t+5)
    * is exact BIGINT (n ≤ maxHours = 5000 keeps n³ far under 2⁶³); the
    * continuity-corrected z = (S∓1)/√(Var) is ONE fixed IEEE chain.
    * The pairwise expansion is calendar-bounded behind the same
    * fail-fast `maxHours` census as [[theilSenTrend]].
    *
    * @return per group: (group, n_hours, s_stat, var_s18, z, trend)
    *         with z 6-rounded and NULL (trend `too_short`) when
    *         Var = 0 or n < 2; trend ∈ increasing/decreasing/no_trend
    *         at the two-sided 5% gate (|z| > 1.96) */
  def mannKendall(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxHours: Long = 5000L): DataFrame = {
    require(maxHours >= 2, s"maxHours must be >= 2: $maxHours")
    val hourly = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint() // census + tie agg + pair join share it
    val widest = hourly.groupBy(col("__g")).agg(count(lit(1)).as("__nh"))
      .agg(max(col("__nh")).as("__w")).collect()(0)
    val span = if (widest.isNullAt(0)) 0L else widest.getLong(0)
    require(span <= maxHours,
      s"mannKendall: $span observed hours in one group exceed " +
        s"maxHours=$maxHours (~${span * span / 2} pairs) — widen the " +
        "bucket, shorten the window, or raise maxHours deliberately")
    // tie census: groups of equal counts within a group's series
    val ties = hourly.groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("__g"))
      .agg(sum(col("__t")).as("__n"),
        sum(col("__t") * (col("__t") - 1L) * (col("__t") * 2L + 5L))
          .as("__tiecorr"))
    val a = hourly.select(col("__g"), col("__h").as("__h1"),
      col("__x").as("__x1"))
    val b = hourly.select(col("__g"), col("__h").as("__h2"),
      col("__x").as("__x2"))
    val s = a.join(b, Seq("__g")).filter(col("__h2") > col("__h1"))
      .groupBy(col("__g"))
      .agg(sum(when(col("__x2") > col("__x1"), 1L)
        .when(col("__x2") < col("__x1"), -1L).otherwise(0L)).as("s_stat"))
    val joined = ties.join(s, Seq("__g"), "left")
      .select(col("__g"), col("__n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        (col("__n") * (col("__n") - 1L) * (col("__n") * 2L + 5L) -
          col("__tiecorr")).as("var_s18"))
    val sd = sqrt(col("var_s18").cast("double") / lit(18.0))
    val z = when(col("s_stat") > 0L,
      (col("s_stat") - lit(1L)).cast("double") / sd)
      .when(col("s_stat") < 0L,
        (col("s_stat") + lit(1L)).cast("double") / sd)
      .otherwise(lit(0.0))
    joined.select(col("__g").as(groupCol), col("__n").as("n_hours"),
      col("s_stat"), col("var_s18"),
      when(col("var_s18") > 0L, round(z, 6)).as("z"),
      when(col("var_s18") <= 0L, lit("too_short"))
        .when(round(z, 6) > 1.96, lit("increasing"))
        .when(round(z, 6) < -1.96, lit("decreasing"))
        .otherwise(lit("no_trend")).as("trend"))
  }

  /** Wald–Wolfowitz runs test per group: is the hourly series random
    * around its own median, or does it cluster (regimes, slow drifts)
    * / alternate (oscillation) more than chance allows — the
    * randomness gate an on-call runs BEFORE trusting a z-score
    * detector that assumes independent observations.
    *
    * Signs are above/below the group's exact median hourly count
    * (equal-to-median hours are discarded, the standard convention);
    * the run count folds from ONE group-partitioned lag window over
    * the hour order (no unpartitioned window); n₊/n₋ and R are exact
    * integers, and E[R] = 1 + 2n₊n₋/n, Var[R] = 2n₊n₋(2n₊n₋−n)/
    * (n²(n−1)) and z = (R−E)/√Var are one fixed IEEE chain.
    *
    * @return per group: (group, n_signed, n_above, n_below, n_runs, z)
    *         z 6-rounded, NULL when Var degenerates (n₊ or n₋ < 1,
    *         or n < 2) */
  def runsTest(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L): DataFrame = {
    val hourly = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint() // median ranks + the sign walk share it
    // exact median per group: value at rank ceil(n/2) and n/2+1 averaged
    // (the theilSenTrend selection, on the value-ordered cum frame)
    val vc = hourly.groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).as("__c"))
    val cum = vc.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__x"))))
    val med = cum
      .join(vc.groupBy(col("__g")).agg(sum(col("__c")).as("__n")), Seq("__g"))
      .groupBy(col("__g"))
      .agg((min(when(col("__cum") >= expr("(__n + 1) div 2"), col("__x")))
        + min(when(col("__cum") >= expr("__n div 2 + 1"), col("__x"))))
        .as("__med2")) // doubled median: stays integral under ties
    val signed = hourly.join(broadcast(med), Seq("__g"))
      .withColumn("__s",
        when(col("__x") * 2L > col("__med2"), 1)
          .when(col("__x") * 2L < col("__med2"), -1))
      .filter(col("__s").isNotNull)
    val byHour = Window.partitionBy(col("__g")).orderBy(col("__h"))
    val runs = signed
      .withColumn("__chg",
        when(lag(col("__s"), 1).over(byHour).isNull, 1L)
          .when(lag(col("__s"), 1).over(byHour) =!= col("__s"), 1L)
          .otherwise(0L))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("__s") === -1, 1L).otherwise(0L)).as("n_below"),
        sum(col("__chg")).as("n_runs"))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val nD = col("__n").cast("double")
    val eR = lit(1.0) + lit(2.0) * n1 * n2 / nD
    val varR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nD) /
      (nD * nD * (nD - lit(1.0)))
    val ok = col("n_above") >= 1L && col("n_below") >= 1L &&
      col("__n") >= 2L
    runs.select(col("__g").as(groupCol), col("__n").as("n_signed"),
      col("n_above"), col("n_below"), col("n_runs"),
      when(ok && varR > 0.0,
        round((col("n_runs").cast("double") - eR) / sqrt(varR), 6)).as("z"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between snapshots `a` and
    * `b` over one integer-quantized metric: D = sup_v |F_a(v) − F_b(v)|
    * — the distribution-drift test that sees SHAPE changes PSI's
    * coarse bins blur ([[driftPsi]] reads decile mass shifts; KS reads
    * the worst pointwise ECDF gap, at full value resolution).
    *
    * Exactness: per distinct value the scaled gap |cumA·n_b − cumB·n_a|
    * is an exact DECIMAL(38,0) (no rank arithmetic overflows at any
    * corpus size); D is its max over values, ONE final IEEE division
    * by n_a·n_b. ECDFs are banded prefix sums ([[Banded.bandCensusN]]
    * carrying both sides' weights through one guarded census — no
    * unpartitioned window at any value-domain size); `at_value` pins
    * the smallest value attaining the sup, deterministic under ties.
    *
    * @param metric non-negative integer-valued column (quantize floats
    *               upstream; `width` > 1 coarsens the value grid and
    *               tests the width-quantized metric, documented)
    * @return one row: (n_a, n_b, d_stat, at_value); empty input on
    *         either side yields an empty frame (no ECDF exists) */
  def ksTwoSample(
      a: DataFrame,
      b: DataFrame,
      metric: org.apache.spark.sql.Column,
      width: Long = 1L,
      bandWidth: Long = 1024L,
      maxBands: Long = 1000000L): DataFrame = {
    require(width > 0 && bandWidth > 0, "positive width/bandWidth")
    def counted(df: DataFrame, nCol: String): DataFrame =
      df.select(floor(metric.cast("bigint") / lit(width))
        .cast("bigint").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as(nCol))
    val grid = counted(a, "__ca")
      .join(counted(b, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .withColumn("__band", expr(s"__v div ${bandWidth}L"))
      .localCheckpoint(true) // census + ranked pass + argmax share it
    val (offRows, totals) = Banded.bandCensusN(
      grid.select(col("__band"), col("__ca"), col("__cb")),
      Seq.empty, Seq("__ca", "__cb"), maxBands)
    val Seq(nA, nB) = totals.getOrElse(Seq.empty, Seq(0L, 0L))
    val spark = a.sparkSession
    import spark.implicits._
    // documented contract: no ECDF exists for an empty side, so the result
    // is an EMPTY frame (not a degenerate NaN/NULL row) — the census just
    // paid for the totals, so the short-circuit is driver-side and free
    if (nA == 0L || nB == 0L)
      return spark.range(0).select(lit(0L).as("n_a"), lit(0L).as("n_b"),
        lit(0.0).as("d_stat"), lit(0L).as("at_value"))
    val offsets = offRows.map { case (_, bd, offs) => (bd, offs(0), offs(1)) }
      .toDF("__band", "__offA", "__offB")
    val w = Window.partitionBy(col("__band")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val gaps = grid.join(broadcast(offsets), Seq("__band"))
      .select(col("__v"),
        (d(sum(col("__ca")).over(w) + col("__offA")) * lit(nB) -
          d(sum(col("__cb")).over(w) + col("__offB")) * lit(nA))
          .as("__gap"))
      .select(col("__v"), abs(col("__gap")).as("__gap"))
      .localCheckpoint(true) // max + argmax share it
    val top = gaps.agg(max(col("__gap")).as("__maxgap"))
    gaps.crossJoin(broadcast(top))
      .filter(col("__gap") === col("__maxgap"))
      .agg(min(col("__v")).as("__atv"), max(col("__maxgap")).as("__d"))
      .select(lit(nA).as("n_a"), lit(nB).as("n_b"),
        round(col("__d").cast("double") /
          (lit(nA).cast("double") * lit(nB).cast("double")), 6)
          .as("d_stat"),
        (col("__atv") * lit(width)).as("at_value"))
  }

  /** Cliff's delta ordinal effect size (Cliff 1993) between snapshots
    * `a` and `b`: δ = (#{x>y} − #{x<y}) / (n_a·n_b) over all cross
    * pairs — "HOW MUCH bigger does a tend to be", the magnitude read
    * next to [[ksTwoSample]]'s is-it-different verdict (a huge corpus
    * makes any KS gap "significant"; δ says whether anyone should
    * care). Romano et al. 2006 magnitude labels ship with the number.
    *
    * Exactness: pair counts never enumerate pairs — on the distinct-
    * value grid, #{x>y} = Σ_v ca_v · (#b strictly below v) from the
    * same banded ECDF prefix sums as [[ksTwoSample]]
    * ([[Banded.bandCensusN]], no unpartitioned window); every count is
    * DECIMAL(38,0) exact at any corpus size, and δ is ONE final IEEE
    * division. The dominance counts stay internal (they overflow
    * BIGINT at whale scale — the gate-type rule); δ, n_a, n_b and the
    * label ship.
    *
    * @return one row: (n_a, n_b, cliffs_delta 6-rounded, magnitude ∈
    *         negligible/small/medium/large at |δ| ≥ .147/.33/.474);
    *         cliffs_delta AND magnitude are stated NULLs when either
    *         side is empty (no pair exists to dominate). Scale:
    *         `StressScale`'s `cliffs_delta_2m` row (2M rows, 100k-value
    *         grid) pins the banded-ECDF shape */
  def cliffsDelta(
      a: DataFrame,
      b: DataFrame,
      metric: org.apache.spark.sql.Column,
      width: Long = 1L,
      bandWidth: Long = 1024L,
      maxBands: Long = 1000000L): DataFrame = {
    require(width > 0 && bandWidth > 0, "positive width/bandWidth")
    def counted(df: DataFrame, nCol: String): DataFrame =
      df.select(floor(metric.cast("bigint") / lit(width))
        .cast("bigint").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as(nCol))
    val grid = counted(a, "__ca")
      .join(counted(b, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .withColumn("__band", expr(s"__v div ${bandWidth}L"))
      .localCheckpoint(true) // census + the dominance pass share it
    val (offRows, totals) = Banded.bandCensusN(
      grid.select(col("__band"), col("__ca"), col("__cb")),
      Seq.empty, Seq("__ca", "__cb"), maxBands)
    val Seq(nA, nB) = totals.getOrElse(Seq.empty, Seq(0L, 0L))
    val spark = a.sparkSession
    import spark.implicits._
    val offsets = offRows.map { case (_, bd, offs) => (bd, offs(1)) }
      .toDF("__band", "__offB")
    val w = Window.partitionBy(col("__band")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val doms = grid.join(broadcast(offsets), Seq("__band"))
      .select(col("__ca"), col("__cb"),
        (sum(col("__cb")).over(w) + col("__offB")).as("__cumB"))
      .agg(
        sum(d(col("__ca")) * (col("__cumB") - col("__cb"))).as("__gt"),
        sum(d(col("__ca")) * (lit(nB) - col("__cumB"))).as("__lt"))
    val delta = round((col("__gt") - col("__lt")).cast("double") /
      (lit(nA).cast("double") * lit(nB).cast("double")), 6)
    // degenerate gate: with an empty side the dominance sums are NULL (or
    // the divisor zero) and NO pair exists — δ and its label must BOTH be
    // stated NULLs, not the `otherwise` branch of the when-chain (abs(NULL)
    // compares false at every tier and used to fall through to 'large')
    val valid = lit(nA > 0L && nB > 0L)
    doms.select(lit(nA).as("n_a"), lit(nB).as("n_b"),
      when(valid, delta).as("cliffs_delta"),
      when(valid && delta.isNotNull,
        when(abs(delta) < 0.147, lit("negligible"))
          .when(abs(delta) < 0.33, lit("small"))
          .when(abs(delta) < 0.474, lit("medium"))
          .otherwise(lit("large"))).as("magnitude"))
  }

  /** 2×2 association report between two boolean exposures: odds ratio,
    * risk ratio and the log-OR standard error (Woolf 1955) — the
    * epidemiology-standard effect read over the same table
    * [[cohensKappa]] scores for agreement ("docs failing gate A are
    * 3.2× as likely to fail gate B").
    *
    * Exactness: the table is one keyed agg of exact BIGINTs; OR =
    * (n11·n00)/(n10·n01) and RR = (n11/(n11+n10))/(n01/(n01+n00)) are
    * fixed IEEE chains over DECIMAL(38,0) products; se_log_or =
    * √(1/a+1/b+1/c+1/d). Degenerate cells (any zero for OR/SE, empty
    * rows for RR) emit stated NULLs.
    *
    * @return one row: (n, n11, n10, n01, n00, odds_ratio, risk_ratio,
    *         se_log_or), 6-rounded */
  def oddsRatio(
      df: DataFrame,
      exposure: org.apache.spark.sql.Column,
      outcome: org.apache.spark.sql.Column): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = df.select(exposure.as("__e"), outcome.as("__o"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__e") && col("__o"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)).as("n00"))
    val allPos = col("n11") > 0L && col("n10") > 0L &&
      col("n01") > 0L && col("n00") > 0L
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      when(allPos,
        round((d(col("n11")) * col("n00")).cast("double") /
          (d(col("n10")) * col("n01")).cast("double"), 6))
        .as("odds_ratio"),
      when(col("n11") + col("n10") > 0L && col("n01") + col("n00") > 0L &&
        col("n01") > 0L,
        round((col("n11").cast("double") /
          (col("n11") + col("n10")).cast("double")) /
          (col("n01").cast("double") /
            (col("n01") + col("n00")).cast("double")), 6))
        .as("risk_ratio"),
      when(allPos,
        round(sqrt(lit(1.0) / col("n11").cast("double") +
          lit(1.0) / col("n10").cast("double") +
          lit(1.0) / col("n01").cast("double") +
          lit(1.0) / col("n00").cast("double")), 6)).as("se_log_or"))
  }

  /** Kruskal–Wallis H test (Kruskal & Wallis 1952) across groups over
    * the hourly count series — the k-group generalization of
    * [[mannWhitneyU]]: "do these event types draw their hourly volumes
    * from the same distribution", rank-based so heavy tails and
    * outliers don't fake a difference.
    *
    * Exactness: pooled ranks are [[doubledMidranks]] (tie-exact
    * integers); each group's rank sum R2_g = Σ c_gv·rank2(v) and n_g
    * are exact BIGINT/DECIMAL; with doubled ranks H = 3/(N(N+1)) ·
    * Σ R2_g²/n_g − 3(N+1) (the 12 becomes 3 — the 2² cancels), folded
    * in PINNED group order with one double division per group. The tie
    * correction 1 − Σ(t³−t)/(N³−N) uses exact decimal sums; corrected
    * H is one IEEE chain, NULL when every observation ties (zero
    * divisor, stated).
    *
    * Scale: `StressScale`'s `kruskal_wallis_2m` row pins the shape at
    * 2M events x 20 types (sub-linear: the cost is the hourly collapse).
    *
    * @return one row: (n_obs, n_groups, h_stat, h_corrected),
    *         6-rounded */
  def kruskalWallis(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      bandWidth: Long = 1024L,
      maxBands: Long = 1000000L,
      maxGroups: Long = 4096L): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val hourly = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
    val gv = hourly.groupBy(col("__g"), col("__x").as("__q"))
      .agg(count(lit(1)).as("__cg"))
      .localCheckpoint(true) // pooled ranks + group sums share it
    val perVal = gv.groupBy(col("__q")).agg(sum(col("__cg")).as("__c"))
      .localCheckpoint(true) // rank pass + tie census share it
    val ranks = doubledMidranks(perVal, "__q", "__r2", bandWidth, maxBands)
    val groups = gv.join(ranks, Seq("__q"))
      .groupBy(col("__g"))
      .agg(sum(col("__cg")).as("__ng"),
        sum(d(col("__cg")) * col("__r2")).as("__r2g"))
      .localCheckpoint(true) // census + the one-row H fold share it
    // census the EXACT frame the fold collects (one row per group — the
    // transitionEntropy discipline), not a separate distinct() pass that
    // could diverge from the fold input
    val nGroups = groups.count()
    require(nGroups <= maxGroups,
      s"kruskalWallis: $nGroups groups exceed maxGroups=$maxGroups — " +
        "the H fold collects one row per group; bucket the group column")
    val ties = perVal.agg(
      sum(col("__c")).as("__n"),
      sum(d(col("__c")) * col("__c") * col("__c") - col("__c"))
        .as("__tsum"))
    val nD = col("__n").cast("double")
    val folded = groups.crossJoin(broadcast(ties))
      .groupBy(col("__n"), col("__tsum"))
      .agg(count(lit(1)).as("n_groups"),
        sort_array(collect_list(struct(col("__g"), col("__ng"),
          col("__r2g")))).as("__gs"))
      .withColumn("__sum",
        aggregate(col("__gs"), lit(0.0), (acc, c) =>
          acc + (d(c.getField("__r2g")) * c.getField("__r2g"))
            .cast("double") / c.getField("__ng").cast("double")))
    val h = lit(3.0) / (nD * (nD + lit(1.0))) * col("__sum") -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) - col("__tsum").cast("double") /
      (d(col("__n")) * col("__n") * col("__n") - col("__n")).cast("double")
    folded.select(col("__n").as("n_obs"), col("n_groups"),
      round(h, 6).as("h_stat"),
      when(corr > 0.0, round(h / corr, 6)).as("h_corrected"))
  }

  /** Brown–Forsythe variance-equality test (Brown & Forsythe 1974):
    * the one-way ANOVA F statistic over MEDIAN-centered absolute
    * deviations — "do these groups have the same spread", the
    * robust homoscedasticity gate a pooled-variance test
    * ([[weekendEffect]], [[abTest]]) assumes and this checks.
    *
    * Exactness: deviations double to integers (z2 = |2x − med2| with
    * the doubled exact group median, so .5 medians stay integral);
    * per-group n/Σz2/Σz2² are exact BIGINT/DECIMAL; between/within
    * sums fold in PINNED group order with one double division per
    * group, and F = ((N−k)/(k−1))·(num/den) is one IEEE chain (the
    * doubling cancels in the ratio). NULL F when the within-spread is
    * zero or k < 2, stated.
    *
    * Scale: `StressScale`'s `brown_forsythe_2m` row pins the shape at
    * 2M events x 20 types (sub-linear: the cost is the hourly collapse).
    *
    * @return one row: (n_obs, n_groups, f_stat), 6-rounded */
  def brownForsythe(
      events: DataFrame,
      groupCol: String = "event_type",
      tsCol: String = "ts",
      hourUs: Long = 3600000000L,
      maxGroups: Long = 4096L): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val hourly = events
      .groupBy(col(groupCol).as("__g"),
        expr(s"`$tsCol` div ${hourUs}L").as("__h"))
      .agg(count(lit(1)).as("__x"))
      .localCheckpoint(true) // median ranks + deviation pass share it
    val vc = hourly.groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).as("__c"))
    val cum = vc.withColumn("__cum",
      sum(col("__c")).over(
        Window.partitionBy(col("__g")).orderBy(col("__x"))))
    val med = cum
      .join(vc.groupBy(col("__g")).agg(sum(col("__c")).as("__ng")),
        Seq("__g"))
      .groupBy(col("__g"))
      .agg((min(when(col("__cum") >= expr("(__ng + 1) div 2"), col("__x")))
        + min(when(col("__cum") >= expr("__ng div 2 + 1"), col("__x"))))
        .as("__med2"))
    val z = hourly.join(broadcast(med), Seq("__g"))
      .select(col("__g"),
        abs(col("__x") * lit(2L) - col("__med2")).as("__z2"))
    val groups = z.groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__z2")).as("__sg"),
        sum(d(col("__z2")) * col("__z2")).as("__ssg"))
      .localCheckpoint(true) // census + the one-row F fold share it
    // census the EXACT frame the fold collects (one row per group — the
    // transitionEntropy discipline), not a separate distinct() pass
    val nGroups = groups.count()
    require(nGroups <= maxGroups,
      s"brownForsythe: $nGroups groups exceed maxGroups=$maxGroups — " +
        "the F fold collects one row per group; bucket the group column")
    val folded = groups
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__ng")).as("n_obs"),
        sum(col("__sg")).as("__s"),
        sort_array(collect_list(struct(col("__g"), col("__ng"),
          col("__sg"), col("__ssg")))).as("__gs"))
      .withColumn("__between",
        aggregate(col("__gs"), lit(0.0), (acc, c) =>
          acc + (d(c.getField("__sg")) * c.getField("__sg"))
            .cast("double") / c.getField("__ng").cast("double")) -
          (d(col("__s")) * col("__s")).cast("double") /
            col("n_obs").cast("double"))
      .withColumn("__within",
        aggregate(col("__gs"), lit(0.0), (acc, c) =>
          acc + (c.getField("__ssg").cast("double") -
            (d(c.getField("__sg")) * c.getField("__sg")).cast("double") /
              c.getField("__ng").cast("double"))))
    val nD = col("n_obs").cast("double")
    val kD = col("n_groups").cast("double")
    folded.select(col("n_obs"), col("n_groups"),
      when(col("n_groups") >= 2L && col("__within") > 0.0,
        round((nD - kD) / (kD - lit(1.0)) *
          (col("__between") / col("__within")), 6)).as("f_stat"))
  }

  /** Multi-window SLO error-budget burn rate (the Google SRE workbook's
    * public multiwindow alerting shape): for each trailing window
    * ending at the stream frontier, the exact error share in ppm, its
    * ratio to the budget (burn = 1.0 means "spending budget exactly as
    * fast as allowed"), and the breach flag — the on-call's "is this
    * outage eating the month's budget in an hour" read, next to
    * [[freshness]]'s staleness row.
    *
    * Exactness: the stream collapses ONCE to the (hour, total, errors)
    * frame (map-side partials); windows join the calendar-bounded hour
    * frame against a broadcast window list; error_ppm is exact integer
    * div and burn one IEEE division.
    *
    * @param budgetPpm allowed error rate in ppm (SLO 99.9% → 1000)
    * @return per window: (window_h, n_total, n_errors, error_ppm,
    *         burn_rate, breached 0/1), burn 6-rounded */
  def sloBurn(
      events: DataFrame,
      typeCol: String = "event_type",
      errorType: String = "error",
      tsCol: String = "ts",
      budgetPpm: Long = 1000L,
      windowsH: Seq[Long] = Seq(1L, 6L, 24L, 168L),
      hourUs: Long = 3600000000L): DataFrame = {
    require(budgetPpm > 0 && windowsH.nonEmpty, "budget and windows")
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = events
      .select(expr(s"`$tsCol` div ${hourUs}L").as("__h"),
        (col(typeCol) === errorType).as("__e"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__e"), 1L).otherwise(0L)).as("__err"))
      .localCheckpoint(true) // frontier + the window join share it
    val front = broadcast(hourly.agg(max(col("__h")).as("__front")))
    val wins = broadcast(windowsH.toDF("window_h"))
    hourly.crossJoin(front).crossJoin(wins)
      .filter(col("__h") > col("__front") - col("window_h"))
      .groupBy(col("window_h"))
      .agg(sum(col("__n")).as("n_total"), sum(col("__err")).as("n_errors"))
      .withColumn("error_ppm", expr("(n_errors * 1000000L) div n_total"))
      .select(col("window_h"), col("n_total"), col("n_errors"),
        col("error_ppm"),
        round(col("error_ppm").cast("double") / lit(budgetPpm.toDouble), 6)
          .as("burn_rate"),
        when(col("error_ppm") > budgetPpm, 1L).otherwise(0L).as("breached"))
  }

  /** Jensen–Shannon divergence (bits) and Hellinger distance between
    * two corpus snapshots over one binned metric — the bounded,
    * symmetric drift pair next to [[driftPsi]]'s unbounded
    * likelihood-ratio score (JSD ∈ [0,1] bit, Hellinger ∈ [0,1]: safe
    * to threshold and compare across metrics; PSI explodes on
    * disjoint supports).
    *
    * Bins, add-one smoothing and the PINNED ascending-bin fold are
    * exactly [[driftPsi]]'s (identical p̂ definitions, so the three
    * scores are comparable); JSD folds 0.5·[KL(p̂ᵃ‖m) + KL(p̂ᵇ‖m)] with
    * m = (p̂ᵃ+p̂ᵇ)/2 in log₂; Hellinger folds Σ(√p̂ᵃ−√p̂ᵇ)² and takes
    * √(·/2) once. One row out, 6-rounded.
    *
    * @return (n_bins, n_a, n_b, jsd_bits, hellinger) */
  def driftDistances(
      a: DataFrame,
      b: DataFrame,
      metric: org.apache.spark.sql.Column,
      width: Long = 100L,
      nBins: Int = 10): DataFrame = {
    require(width > 0 && nBins > 0, "need positive width and nBins")
    def binned(df: DataFrame, nCol: String): DataFrame = {
      val v = metric.cast("bigint")
      df.select(greatest(
        least(floor(v / lit(width)).cast("bigint"), lit(nBins - 1L)),
        lit(0L)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(nCol))
    }
    val spark = a.sparkSession
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val grid = spine
      .join(binned(a, "__na"), Seq("bin"), "left")
      .join(binned(b, "__nb"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val lg2 = math.log(2.0)
    grid.agg(
      count(lit(1)).as("n_bins"),
      sum(col("__na")).as("n_a"),
      sum(col("__nb")).as("n_b"),
      sort_array(collect_list(struct(col("bin"), col("__na"), col("__nb"))))
        .as("__g"))
      .select(col("n_bins"), col("n_a"), col("n_b"),
        round(aggregate(col("__g"), lit(0.0), (acc, c) => {
          val pa = (c.getField("__na").cast("double") + 1.0) /
            (col("n_a").cast("double") + col("n_bins").cast("double"))
          val pb = (c.getField("__nb").cast("double") + 1.0) /
            (col("n_b").cast("double") + col("n_bins").cast("double"))
          val m = (pa + pb) / 2.0
          acc + (pa * (log(pa / m) / lit(lg2)) +
            pb * (log(pb / m) / lit(lg2))) / 2.0
        }), 6).as("jsd_bits"),
        round(sqrt(aggregate(col("__g"), lit(0.0), (acc, c) => {
          val pa = (c.getField("__na").cast("double") + 1.0) /
            (col("n_a").cast("double") + col("n_bins").cast("double"))
          val pb = (c.getField("__nb").cast("double") + 1.0) /
            (col("n_b").cast("double") + col("n_bins").cast("double"))
          acc + (sqrt(pa) - sqrt(pb)) * (sqrt(pa) - sqrt(pb))
        }) / lit(2.0)), 6).as("hellinger"))
  }

  /** Cohen's κ inter-rater agreement (Cohen 1960) between two boolean
    * verdict columns — "do these two quality gates actually agree
    * beyond chance", the calibration read before treating one labeler
    * as ground truth for the other (κ ≈ 0: agreement is what two
    * coins would produce; ≥ 0.6: substantial).
    *
    * Exactness: the 2×2 table is one keyed agg of exact BIGINTs;
    * p_o, p_e and κ = (n·agree − Σ marginal products)/(n² − Σ) are
    * each ONE fixed IEEE expression over DECIMAL(38,0) products (no
    * n² overflow at any corpus size).
    *
    * @return one row: (n, n_both_pos, n_both_neg, n_a_only, n_b_only,
    *         po, pe, kappa), 6-rounded; NULL κ when p_e = 1 (both
    *         raters constant) */
  def cohensKappa(
      df: DataFrame,
      raterA: org.apache.spark.sql.Column,
      raterB: org.apache.spark.sql.Column): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = df.select(raterA.as("__ra"), raterB.as("__rb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ra") && col("__rb"), 1L).otherwise(0L))
          .as("n_both_pos"),
        sum(when(!col("__ra") && !col("__rb"), 1L).otherwise(0L))
          .as("n_both_neg"),
        sum(when(col("__ra") && !col("__rb"), 1L).otherwise(0L))
          .as("n_a_only"),
        sum(when(!col("__ra") && col("__rb"), 1L).otherwise(0L))
          .as("n_b_only"))
    val a1 = col("n_both_pos") + col("n_a_only")
    val b1 = col("n_both_pos") + col("n_b_only")
    val a0 = col("n_both_neg") + col("n_b_only")
    val b0 = col("n_both_neg") + col("n_a_only")
    val agree = col("n_both_pos") + col("n_both_neg")
    val peNum = d(a1) * b1 + d(a0) * b0 // n² scale, exact
    m.select(col("n"), col("n_both_pos"), col("n_both_neg"),
      col("n_a_only"), col("n_b_only"),
      round(agree.cast("double") / col("n").cast("double"), 6).as("po"),
      round(peNum.cast("double") /
        (d(col("n")) * col("n")).cast("double"), 6).as("pe"),
      when(d(col("n")) * col("n") - peNum > 0,
        round((d(col("n")) * agree - peNum).cast("double") /
          (d(col("n")) * col("n") - peNum).cast("double"), 6))
        .as("kappa"))
  }

  /** Benjamini–Hochberg FDR control (Benjamini & Hochberg 1995) over a
    * battery of p-values: rank p ascending, find the largest k with
    * p_(k) ≤ k·q/m, reject ranks 1..k — the multiple-comparison gate
    * an experimentation platform MUST put between "we ran m tests" and
    * "these are significant" (at m = 200 metrics, q = 5%, raw
    * thresholds would hallucinate ~10 winners from pure noise).
    *
    * Ranks are banded prefix sums over the quantized p domain
    * ([[Banded.bandCensus]] — no unpartitioned window over the
    * battery); ties pin by (p, key). The threshold compare
    * p·(1000·m) ≤ rank·q‰ is ONE fixed IEEE shape; k broadcasts back
    * as a 1-row frame. q is taken in PERMILLE so the rational side of
    * the compare stays exact integer arithmetic.
    *
    * Scale: `StressScale`'s `bh_fdr_2m` row runs the gate over 2M
    * hypotheses (banded p-ranks at corpus scale).
    *
    * @return per test: (key, p, p_rank, rejected 0/1) */
  def bhFdr(
      pvals: DataFrame,
      keyCol: String = "key",
      pCol: String = "p",
      qPermille: Long = 50L,
      maxBands: Long = 1000000L): DataFrame = {
    require(qPermille >= 1 && qPermille <= 999,
      s"qPermille in [1,999]: $qPermille")
    val base = pvals.select(col(keyCol).as("__k"),
      col(pCol).cast("double").as("__p"))
      .withColumn("__band",
        greatest(least(floor(col("__p") * lit(1000.0)).cast("bigint"),
          lit(1000L)), lit(0L)))
      .withColumn("__one", lit(1L))
      .localCheckpoint(true) // census + ranked pass share it
    val (offRows, totals) = Banded.bandCensus(
      base.select(col("__band"), col("__one")),
      Seq.empty, "__one", maxBands)
    val m = totals.getOrElse(Seq.empty, 0L)
    val spark = pvals.sparkSession
    import spark.implicits._
    val offsets = offRows.map { case (_, bd, off) => (bd, off) }
      .toDF("__band", "__off")
    val w = Window.partitionBy(col("__band"))
      .orderBy(col("__p"), col("__k"))
    val ranked = base.join(broadcast(offsets), Seq("__band"))
      .select(col("__k"), col("__p"),
        (row_number().over(w) + col("__off")).as("p_rank"))
      .localCheckpoint(true) // k-scan + the verdict pass share it
    val kRow = ranked.agg(
      max(when(col("__p") * lit(1000.0 * m) <=
        (col("p_rank") * lit(qPermille)).cast("double"), col("p_rank")))
        .as("__kmax"))
    ranked.crossJoin(broadcast(kRow))
      .select(col("__k").as(keyCol), col("__p").as(pCol), col("p_rank"),
        when(col("__kmax").isNotNull && col("p_rank") <= col("__kmax"),
          lit(1L)).otherwise(lit(0L)).as("rejected"))
  }

  /** 1-Wasserstein (earth-mover) distance between snapshots `a` and
    * `b` over one binned metric: W₁ = Σ_bins |F_a − F_b| · width — the
    * "how much mass moved, and how far" magnitude that complements
    * [[ksTwoSample]]'s worst-point gap and [[driftPsi]]'s
    * likelihood-ratio mass score (KS can be large on a hairline shift;
    * W₁ weighs shifts by distance).
    *
    * Exactness: on the dense `nBins` grid (the [[driftPsi]] spine;
    * clamped bins, so all mass stays on the grid) the per-bin scaled
    * gap |cumA·n_b − cumB·n_a| is exact DECIMAL(38,0); cumulative
    * sums come from the bounded below-self-join (the hopHistogram
    * shape — the grid is nBins cells, never corpus-scale, and there is
    * NO window anywhere); the decimal gap-sum is order-blind, and W₁
    * is ONE final IEEE expression.
    *
    * Scale: `StressScale`'s `wasserstein_2m` row pins the
    * collapse-to-spine shape at 2M rows.
    *
    * @return one row: (n_bins, width, n_a, n_b, w1) with
    *         w1 = Σ·width/(n_a·n_b), 6-rounded */
  def wasserstein1(
      a: DataFrame,
      b: DataFrame,
      metric: org.apache.spark.sql.Column,
      width: Long = 100L,
      nBins: Int = 64): DataFrame = {
    require(width > 0 && nBins > 0, "need positive width and nBins")
    def binned(df: DataFrame, nCol: String): DataFrame = {
      val v = metric.cast("bigint")
      df.select(greatest(
        least(floor(v / lit(width)).cast("bigint"), lit(nBins - 1L)),
        lit(0L)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(nCol))
    }
    val spark = a.sparkSession
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val grid = spine
      .join(binned(a, "__na"), Seq("bin"), "left")
      .join(binned(b, "__nb"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
      .localCheckpoint(true) // totals + the below-self-join share it
    val cum = grid
      .join(grid.select(col("bin").as("__b2"), col("__na").as("__na2"),
        col("__nb").as("__nb2")), col("__b2") <= col("bin"), "left")
      .groupBy(col("bin"))
      .agg(sum(col("__na2")).as("__cumA"), sum(col("__nb2")).as("__cumB"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val tot = grid.agg(sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(abs(d(col("__cumA")) * col("n_b") -
          d(col("__cumB")) * col("n_a"))).as("__s"))
      .select(lit(nBins.toLong).as("n_bins"), lit(width).as("width"),
        col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          round(col("__s").cast("double") * lit(width.toDouble) /
            (col("n_a").cast("double") * col("n_b").cast("double")), 6))
          .as("w1"))
  }
}
