package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Document-quality scoring beyond the row-local heuristics in
  * [[graft.functions.TextFunctions]]: the Gopher-style rule battery
  * (Rae et al. 2021, "Scaling Language Models", appendix A1.1) and a
  * corpus-trained bigram language-model scorer (the classic
  * perplexity-proxy filter: CCNet/RedPajama-style pipelines gate on LM
  * NLL; here the LM is trained on the corpus itself in the same job).
  *
  * Both operators are one declarative plan: the rule battery is one token
  * explode + one keyed aggregation (line-level metrics stay row-local and
  * ride through the explode as constants), the LM scorer is the token
  * explode plus two keyed count aggregations re-joined to the bigram
  * stream. Nothing iterates, nothing collects.
  */
object Quality {

  /** Gopher's "contains at least two of these" English function words. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality-rule battery. One row per document with every
    * metric the rules read plus the combined `pass` verdict, so the
    * caller can re-threshold without recomputing:
    *
    * - `n_words`, `mean_word_len` — word count in [minWords, maxWords],
    *   mean word length in [3, 10]
    * - `frac_alpha_words` — fraction of words containing a letter (> 0.8)
    * - `n_stop_words` — distinct hits in `stopwords` (>= 2)
    * - `frac_bullet_lines` (< 0.9), `frac_ellipsis_lines` (< 0.3)
    * - `symbol_ratio` — `#`/ellipsis occurrences per word (< 0.1)
    *
    * Scale shape: line metrics are per-row expressions over the line
    * vector (never exploded); word metrics explode once and aggregate
    * with map-side partials; the line metrics ride through the explode as
    * tiny long columns recovered by `first()` (constant within a doc).
    * One shuffle total, keyed by `idCol`. */
  def gopherRules(
      docs: DataFrame,
      minWords: Int = 50,
      maxWords: Int = 100000,
      stopwords: Seq[String] = gopherStopwords,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(minWords >= 0 && maxWords >= minWords, "need 0 <= minWords <= maxWords")
    val text = col(textCol)
    val lines = split(text, "\n")
    // LIKE-pattern flags (not regex): the patterns are literal prefixes /
    // suffixes and LIKE replays identically in any SQL engine
    val pre = docs.select(
      col(idCol),
      text.as("__text"),
      size(lines).as("n_lines"),
      size(filter(lines, l =>
        l.like("- %") || l.like("* %") || l.like("• %"))).as("n_bullet_lines"),
      size(filter(lines, l =>
        l.like("%...") || l.like("%…"))).as("n_ellipsis_lines"),
      ((length(text) - length(regexp_replace(text, "#", ""))) +
        (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3 +
        (length(text) - length(regexp_replace(text, "…", "")))).as("n_symbols"))
    // explode_outer over the cleaned token array: an all-whitespace doc
    // yields ONE null-token row instead of vanishing from the groupBy —
    // "one row per document" holds for exactly the garbage docs the
    // rules most need to report (null-safe counts below ignore the null)
    val toks = Fan.spread(pre)
      .select(col(idCol), col("n_lines"), col("n_bullet_lines"),
        col("n_ellipsis_lines"), col("n_symbols"),
        explode_outer(array_remove(T.tokens(col("__text")), "")).as("tok"))
    val agg = toks.groupBy(col(idCol)).agg(
      count(col("tok")).as("n_words"),
      coalesce(sum(length(col("tok")).cast("long")), lit(0L)).as("__sum_len"),
      sum(when(col("tok").rlike("[a-zA-Z]"), 1L).otherwise(0L)).as("__n_alpha"),
      countDistinct(when(col("tok").isin(stopwords: _*), col("tok"))).as("n_stop_words"),
      first(col("n_lines")).as("__n_lines"),
      first(col("n_bullet_lines")).as("__n_bullet"),
      first(col("n_ellipsis_lines")).as("__n_ellipsis"),
      first(col("n_symbols")).as("__n_symbols"))
    // every ratio is ONE double division of exact integers — deterministic
    // bit-for-bit in any engine, so no rounding is needed; zero-word docs
    // get explicit 0.0 ratios (never NaN) and always fail `pass`
    val nW = col("n_words").cast("double")
    val nL = greatest(col("__n_lines"), lit(1L)).cast("double")
    def zeroGuard(x: Column): Column =
      when(col("n_words") > 0, x).otherwise(lit(0.0))
    val meanLen = zeroGuard(col("__sum_len").cast("double") / nW)
    val fracAlpha = zeroGuard(col("__n_alpha").cast("double") / nW)
    val fracBullet = col("__n_bullet").cast("double") / nL
    val fracEllipsis = col("__n_ellipsis").cast("double") / nL
    val symbolRatio = zeroGuard(col("__n_symbols").cast("double") / nW)
    agg.select(
      col(idCol),
      col("n_words"),
      meanLen.as("mean_word_len"),
      fracAlpha.as("frac_alpha_words"),
      col("n_stop_words"),
      fracBullet.as("frac_bullet_lines"),
      fracEllipsis.as("frac_ellipsis_lines"),
      symbolRatio.as("symbol_ratio"),
      (col("n_words").between(minWords, maxWords) &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        fracAlpha > 0.8 &&
        col("n_stop_words") >= 2 &&
        fracBullet < 0.9 &&
        fracEllipsis < 0.3 &&
        symbolRatio < 0.1).as("pass"))
  }

  /** Bigram language-model scoring: train add-one-smoothed bigram
    * probabilities on the corpus, score every document by its mean
    * negative log-likelihood — the perplexity-proxy quality signal
    * (low NLL = fluent/common phrasing, high NLL = noise).
    *
    *   p(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + V)
    *   nll(doc)   = -(Σ ln p over the doc's bigrams, in position order)
    *                / n_bigrams
    *
    * Train and score are the SAME pass over the data: the bigram stream
    * (tokenize → position window → lead) feeds two keyed count
    * aggregations — c(w1,w2) and the context total c(w1·) — which join
    * straight back onto the stream; V (distinct unigrams) is a broadcast
    * one-row frame. Documents with fewer than two tokens have no bigrams
    * and drop out.
    *
    * Determinism: the per-document Σ ln p is an ascending-position fold
    * over a sorted array (`sort_array` + `aggregate`), NOT a float `sum()`
    * — FP addition is order-sensitive and a hash-exact oracle replay
    * needs one defined order. Rounded to 6 decimals like the other FP
    * scores. The per-doc array is bounded by document length, the same
    * contract the chunker relies on. */
  def lmScore(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(filter(T.tokens(col(textCol)), t => length(t) > 0))
          .as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // The bigram stream has two consumers (the count-table aggregation
    // and the scoring join), so it IS recomputed — deliberately NOT
    // localCheckpoint'd like minhashLsh's signatures: the checkpoint
    // would materialize a TOKEN-scale frame (it grows exactly as fast as
    // the recompute it saves, unlike the slim per-doc frames bm25Search
    // checkpoints), and an A/B at sf0.1 measured the checkpointed form
    // ~8% slower. Recompute-vs-materialize is a wash that tips toward
    // recompute when the intermediate is as big as the input.
    val bi = toks
      .withColumn("w2", lead(col("tok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col(idCol), col("pos"), col("tok").as("w1"), col("w2"))
    val cb = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    // context totals derive from the bigram-count TABLE (c(w1·) = Σ_w2
    // c(w1,w2)): aggregating |vocab|² rows instead of re-shuffling the
    // full N-token bigram stream a second time
    val cu = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    val vocab = broadcast(toks.agg(countDistinct(col("tok")).as("v")))
    val scored = bi
      .join(cb, Seq("w1", "w2"))
      .join(cu, Seq("w1"))
      .crossJoin(vocab)
      .select(col(idCol), col("pos"),
        log((col("cb").cast("double") + 1.0) /
          (col("cu").cast("double") + col("v").cast("double"))).as("lnp"))
    scored.groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("pos"), col("lnp")))).as("__xs"),
        count(lit(1)).as("n_bigrams"))
      .select(
        col(idCol),
        col("n_bigrams"),
        round(
          negate(aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("lnp"))) /
            col("n_bigrams").cast("double"), 6).as("nll"))
  }

  /** Attach the within-group ECDF (percent_rank) of `valueCol` to every
    * row of `scored` — WITHOUT a per-row window. percent_rank is a pure
    * function of (group, value) — ties share one rank — so it computes on
    * the (group, value) HISTOGRAM: rank_first = 1 + Σ counts of smaller
    * values, pct = (rank_first − 1)/(n − 1), joined back onto the rows by
    * (group, value). The corpus is touched by one keyed count and one
    * keyed join; the window orders distinct VALUES per group, so a
    * low-cardinality group key (5 languages at 100 TB) never serializes
    * the sort onto a handful of tasks. Singleton groups report 0.0 (the
    * percent_rank convention). Identical values to
    * `percent_rank().over(partitionBy(group).orderBy(value))`, rounded
    * to 6. */
  def ecdfByGroup(
      scored: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val hist = scored.groupBy(g, v).agg(count(lit(1)).as("__c"))
    val wBefore = Window.partitionBy(g).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("__before", coalesce(sum(col("__c")).over(wBefore), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(g)))
      .select(g, v,
        when(col("__n") > 1,
          round(col("__before").cast("double") /
            (col("__n") - lit(1L)).cast("double"), 6))
          .otherwise(lit(0.0)).as("pct_rank"))
    scored.join(ranked, Seq(groupCol, valueCol))
  }

  /** Trigram language model with STUPID BACKOFF (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the score web-scale
    * pipelines use precisely because it needs no discounting pass):
    *
    *   S(w3|w1w2) = c(w1w2w3)/c(w1w2)                    if the trigram is seen
    *              = 0.4 · c(w2w3)/c(w2)                  else if the bigram is
    *              = 0.4² · (c(w3)+1)/(N+V)               else (add-one unigram)
    *
    * trained on `train` and scoring `score` — the held-out split is what
    * makes the backoff tiers real (training on the scored corpus itself
    * would make every trigram seen, reducing this to [[lmScore]]'s shape).
    * Per doc: n_trigrams and the mean negative log-score.
    *
    * Determinism: every S is a short fixed chain of IEEE ops over exact
    * integer counts (one division; backoff adds one multiply), `ln` on
    * top, and the per-doc sum is the position-ordered fold the other LM
    * scorers use; rounded to 6. Seen-trigram implies c(w1w2) > 0 and
    * seen-bigram implies c(w2) > 0, so no division ever sees zero.
    *
    * Scale shape: count tables are keyed aggregations of the train
    * corpus' gram streams (map-side partials); scoring is four equi-joins
    * of the score-side trigram stream against those tables (trigram,
    * context-bigram, skip-bigram, unigram) plus a broadcast 1-row (N, V)
    * rollup. Gram tables are vocab-scale, not corpus-scale — they shuffle
    * once each and AQE broadcasts them when small. Nothing iterates. */
  def lmScoreBackoff(
      score: DataFrame,
      train: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def toks(df: DataFrame, keyAlias: String): DataFrame =
      graft.operators.Fan.spread(
        df.select(col(idCol).as(keyAlias), col(textCol)))
        .select(Seq(col(keyAlias), posexplode(filter(T.tokens(col(textCol)),
          t => length(t) > 0)).as(Seq("pos", "tok"))): _*)
    // train-side gram tables, each one keyed agg over the token stream;
    // the gram-building window is PER-DOCUMENT so no gram spans two docs
    val trainTok = toks(train, "__tid")
    val wDoc = Window.partitionBy(col("__tid")).orderBy(col("pos"))
    val trainGrams = trainTok
      .withColumn("w2", lead(col("tok"), 1).over(wDoc))
      .withColumn("w3", lead(col("tok"), 2).over(wDoc))
    val c3 = trainGrams.filter(col("w3").isNotNull)
      .groupBy(col("tok").as("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    val c2 = trainGrams.filter(col("w2").isNotNull)
      .groupBy(col("tok").as("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val c1 = trainTok.groupBy(col("tok").as("w1"))
      .agg(count(lit(1)).as("c1"))
    val nv = broadcast(trainTok.agg(
      count(lit(1)).as("__n"), countDistinct(col("tok")).as("__v")))
    // score-side trigram stream
    val tri = toks(score, idCol)
      .withColumn("w2", lead(col("tok"), 1).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .withColumn("w3", lead(col("tok"), 2).over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("w3").isNotNull)
      .select(col(idCol), col("pos"), col("tok").as("w1"), col("w2"), col("w3"))
    val joined = tri
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2.select(col("w1"), col("w2"), col("c2").as("c2ctx")),
        Seq("w1", "w2"), "left")
      .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2skip")), Seq("w2", "w3"), "left")
      .join(c1.select(col("w1").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left")
      .join(c1.select(col("w1").as("w3"), col("c1").as("c1w3")),
        Seq("w3"), "left")
      .crossJoin(nv)
    val s = when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2ctx").cast("double"))
      .when(col("c2skip").isNotNull,
        lit(0.4) * (col("c2skip").cast("double") / col("c1w2").cast("double")))
      .otherwise(lit(0.16) *
        ((coalesce(col("c1w3"), lit(0L)).cast("double") + lit(1.0)) /
          (col("__n").cast("double") + col("__v").cast("double"))))
    joined
      .select(col(idCol), col("pos"), log(s).as("lns"),
        when(col("c3").isNotNull, 0L)
          .when(col("c2skip").isNotNull, 1L).otherwise(2L).as("tier"))
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("pos"), col("lns")))).as("__xs"),
        count(lit(1)).as("n_trigrams"),
        sum(when(col("tier") > 0, 1L).otherwise(0L)).as("n_backoff"))
      .select(col(idCol), col("n_trigrams"), col("n_backoff"),
        round(
          negate(aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("lns"))) /
            col("n_trigrams").cast("double"), 6).as("nll"))
  }

  /** Hashed-feature linear quality classifier — the fastText-style gate
    * (Joulin et al. 2016) most production corpus pipelines run after the
    * rule batteries: tokens hash into `nBuckets` feature buckets, each
    * bucket carries a fixed weight, and the document score is the mean
    * bucket weight. Here the weight vector is itself md5-derived (a
    * frozen random-projection model), which keeps the operator fully
    * deterministic AND cross-engine replayable; swapping in trained
    * weights is a one-line change (join or literal map over the same
    * bucket id).
    *
    * Determinism contract (what makes the double hash-exact in any
    * engine): bucket = first 8 md5 hex digits of the token, mod
    * `nBuckets` — exact integer ops; weight = first 8 md5 hex digits of
    * `"w:" + bucket` / 2^32 − 0.5 — a dyadic rational with ≤ 32
    * significant bits, so the double is exact; the per-doc sum folds
    * left-to-right over token positions (`aggregate`, not a float
    * `sum()`), one defined order every engine replays; the final mean is
    * a single IEEE division. No rounding needed anywhere.
    *
    * Scale shape: one row-local projection — no explode, no join, no
    * shuffle; the scan's column pruning survives. */
  /** The classifier score as a reusable column over a pre-cleaned token
    * array (see [[linearClassifier]] for the full contract). */
  def classifierScoreOnTokens(toks: Column, nBuckets: Int = 1024): Column = {
    require(nBuckets > 0, "nBuckets must be positive")
    def weight(tok: Column): Column =
      conv(substring(md5(concat(lit("w:"),
        (conv(substring(md5(tok), 1, 8), 16, 10).cast("bigint") %
          nBuckets).cast("string"))), 1, 8), 16, 10).cast("bigint") /
        lit(4294967296.0) - lit(0.5)
    aggregate(toks, lit(0.0), (acc, t) => acc + weight(t)) /
      greatest(size(toks), lit(1))
  }

  def linearClassifier(
      docs: DataFrame,
      nBuckets: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        array_remove(T.tokens(col(textCol)), "").as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("bigint").as("n_tokens"),
        classifierScoreOnTokens(col("__toks"), nBuckets).as("qscore"))
      .select(col(idCol), col("n_tokens"), col("qscore"),
        (col("qscore") >= 0).as("keep"))

  /** Calibration table for the hashed classifier against the rule-based
    * composite quality score: classifier scores cut into `nBins`
    * equal-width bins over [-0.5, 0.5], each bin reporting how often the
    * INDEPENDENT rule signal agrees (quality >= `qualityCut`) — the
    * reliability diagram that decides whether a learned gate's threshold
    * can replace the rule battery. Both signals are row-local, so the
    * whole table is ONE corpus projection + one nBins-keyed aggregation;
    * exact integer counts, one IEEE division per rate. */
  def classifierCalibration(
      docs: DataFrame,
      stopwords: Seq[String],
      nBins: Int = 20,
      qualityCut: Double = 0.5,
      nBuckets: Int = 1024,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins out of range: $nBins")
    val scored = docs
      .select(col(idCol), col(textCol), T.tokens(col(textCol)).as("__raw"))
      .select(col(idCol),
        classifierScoreOnTokens(array_remove(col("__raw"), ""), nBuckets)
          .as("__c"),
        T.qualityScoreOnTokens(col(textCol), col("__raw"), stopwords)
          .as("__q"))
    scored
      .select(
        least(greatest(floor((col("__c") + lit(0.5)) * lit(nBins.toDouble))
          .cast("bigint"), lit(0L)), lit(nBins - 1L)).as("bin"),
        col("__q"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__q") >= qualityCut, 1L).otherwise(0L)).as("n_pass"))
      .select(col("bin"),
        (col("bin").cast("double") / lit(nBins.toDouble) - lit(0.5))
          .as("bin_lo"),
        col("n_docs"), col("n_pass"),
        (col("n_pass").cast("double") / col("n_docs").cast("double"))
          .as("pass_rate"))
  }

  /** Blocklist gate — the C4-style banned-terms filter every public
    * corpus pipeline runs (C4 dropped pages containing any "bad words"
    * list entry; Gopher and successors keep a variant): per document,
    * the number of token OCCURRENCES matching the term list, the number
    * of blocked PHRASES present in the normalized text, and the combined
    * pass verdict. Both tiers are row-local projections riding the
    * shared tokenize — zero shuffle, the list folds into the generated
    * code as literals (the broadcast-variable shape for a list of this
    * size; a million-entry list would become a broadcast join instead).
    * Case-insensitive via the shared lower-casing in [[T.tokens]] /
    * [[T.normalizeText]]; terms must be single lower-case tokens and
    * phrases lower-case normalized strings. */
  def blocklistGate(
      docs: DataFrame,
      terms: Seq[String],
      phrases: Seq[String] = Nil,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty || phrases.nonEmpty, "empty blocklist")
    val toks = array_remove(T.tokens(col(textCol)), "")
    val nTerms: Column =
      if (terms.isEmpty) lit(0L)
      else size(filter(toks, t => t.isin(terms: _*))).cast("bigint")
    val nPhrases: Column =
      if (phrases.isEmpty) lit(0L)
      else phrases.map(p =>
          when(T.normalizeText(col(textCol)).contains(p), 1L).otherwise(0L))
        .reduce(_ + _)
    docs.select(col(idCol),
        nTerms.as("n_blocked_terms"),
        nPhrases.as("n_blocked_phrases"))
      .withColumn("pass",
        col("n_blocked_terms") === 0 && col("n_blocked_phrases") === 0)
  }

  /** The dictionary-scale tier of [[blocklistGate]]: Aho–Corasick
    * multi-pattern matching ([[org.apache.spark.sql.graft.AhoCorasick]])
    * counts every occurrence of every pattern in ONE pass per document —
    * O(|text| + matches) per row however large the dictionary, where the
    * `contains`-chain tier re-scans the text once per phrase (a 10,000-
    * entry production blocklist is 10,000 scans/doc there). Substring
    * semantics, case-sensitive, ALL occurrence positions counted
    * (overlaps and sub-patterns included — the automaton's output
    * function, and what the SQL oracle replays position by position).
    *
    * @return (idCol, n_matches, n_patterns_hit, pass) */
  def blocklistGateAc(
      docs: DataFrame,
      patterns: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(patterns.nonEmpty, "empty blocklist")
    docs.select(col(idCol),
        org.apache.spark.sql.graft.MultiPatternFunctions
          .multiMatchCounts(col(textCol), patterns).as("__c"))
      .select(col(idCol),
        aggregate(col("__c"), lit(0L), (a, x) => a + x).as("n_matches"),
        size(filter(col("__c"), c => c > 0L)).cast("bigint")
          .as("n_patterns_hit"))
      .withColumn("pass", col("n_matches") === 0L)
  }

  /** Isotonic (monotone) calibration of a score→label curve — the
    * nonparametric upgrade of [[classifierCalibration]]'s raw
    * reliability diagram (Zadrozny & Elkan 2002): the weighted
    * pool-adjacent-violators fit (Ayer et al. 1955) over the score
    * bins, computed via the minimax characterization
    * iso(i) = max_{k≤i} min_{j≥i} rate(k..j) (Robertson, Wright & Dykstra
    * 1988, §1.2) — every fitted value is a contiguous-range positive
    * rate, chosen by one max-of-mins, so the whole fit is three
    * bounded joins on the ≤nBins bin frame instead of an iterative
    * pool loop. The fitted curve is nondecreasing by construction and
    * equals PAV's output exactly.
    *
    * Exactness: bin counts/positives are exact BIGINTs; range rates
    * are exact-integer ratios (one IEEE division each); min/max over
    * doubles are order-free. Empty bins carry no evidence and are
    * absent from the output (the isotonic fit interpolates over
    * OBSERVED bins). Scale shape: one binned keyed count over the
    * corpus, then everything runs on the ≤nBins²·nBins/6 bounded
    * range frame.
    *
    * @return per observed bin: (bin, n, n_pos, raw_rate, iso_rate),
    *         bin-ascending, 6-rounded */
  def isotonicCalibration(
      docs: DataFrame,
      score: Column,
      label: Column,
      nBins: Int = 20): DataFrame = {
    require(nBins >= 2 && nBins <= 256,
      s"isotonicCalibration: nBins=$nBins outside [2, 256] — the range " +
        "frame is cubic in the bin count")
    val bin = greatest(least(floor(score * lit(nBins.toDouble))
      .cast("bigint"), lit(nBins - 1L)), lit(0L))
    val bins = docs
      .select(bin.as("bin"), when(label, 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      .localCheckpoint(true) // prefix join + range rates share it
    // inclusive prefixes via the bounded below-self-join (the
    // adUniformity discipline — no single-partition window)
    val pref = bins
      .join(bins.select(col("bin").as("__b2"), col("n").as("__w2"),
        col("n_pos").as("__p2")), col("__b2") <= col("bin"), "left")
      .groupBy(col("bin"), col("n"), col("n_pos"))
      .agg(sum(col("__w2")).as("__cw"), sum(col("__p2")).as("__cp"))
      .localCheckpoint(true) // k-side and j-side of the range join
    // contiguous-range rates r(k..j) = (P(j)−P(k)+pos(k)) / (...) from
    // inclusive prefixes; ≤ nBins² ranges
    val rates = pref.select(col("bin").as("__k"), col("__cw").as("__cwk"),
      col("__cp").as("__cpk"), col("n").as("__wk"), col("n_pos").as("__pk"))
      .join(pref.select(col("bin").as("__j"), col("__cw").as("__cwj"),
        col("__cp").as("__cpj")), col("__k") <= col("__j"))
      .select(col("__k"), col("__j"),
        ((col("__cpj") - col("__cpk") + col("__pk")).cast("double") /
          (col("__cwj") - col("__cwk") + col("__wk")).cast("double"))
          .as("__rate"))
    // iso(i) = max over k≤i of (min over j≥i of rate(k,j))
    val iso = rates
      .join(bins.select(col("bin").as("__i")),
        col("__k") <= col("__i") && col("__i") <= col("__j"))
      .groupBy(col("__i"), col("__k"))
      .agg(min(col("__rate")).as("__minr"))
      .groupBy(col("__i"))
      .agg(max(col("__minr")).as("__iso"))
    bins.join(iso, col("bin") === col("__i"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("raw_rate"),
        round(col("__iso"), 6).as("iso_rate"))
      .orderBy(col("bin"))
  }
}
