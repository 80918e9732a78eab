package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus curation: the composite filter → dedup → score → sample pipeline
  * a training-data run actually executes, assembled from the library's
  * oracle-checked primitives. One declarative plan — Catalyst fuses the
  * scoring projections into the scan, the dedup is one hash-agg shuffle,
  * and nothing materializes until the sink.
  *
  * Stage order matters at scale: cheap row-local filters (length, langId,
  * quality — all codegen'd projections) run BEFORE the dedup shuffle so
  * the only wide exchange sees pre-shrunk data.
  */
object Curation {

  final case class Config(
      minChars: Int = 50,
      maxChars: Int = 1 << 20,
      languages: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      stopwords: Seq[String] = T.langStopwords("en"))

  /** Score + filter + exact-dedup (keep smallest id per content
    * fingerprint). Output: one row per surviving doc with its quality
    * metrics attached.
    *
    * Token statistics use the explode → codegen'd flags → partial-agg
    * shape rather than the per-column array combinators in
    * [[T]]: `filter(toks, _.isin(...))` is an interpreted lambda per doc
    * per language, while an exploded `IN` predicate is whole-stage
    * codegen'd and partial-aggregates map-side. Results are identical —
    * same counts, same ratios, same fingerprint — just a plan that holds
    * at 100 TB. Row-local scores (length, punctuation) stay row-level. */
  def curate(
      docs: DataFrame,
      cfg: Config = Config(),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filtered = gatedFrame(docs, cfg, textCol, idCol)
    // keep-first exact dedup on the order/duplication-robust fingerprint,
    // as a partitioned-window pick, NOT a min-id census joined back: the
    // census and join branches would be two consumers of `filtered` with
    // non-collapsible exchanges, executing the whole scoring pipeline
    // twice (the same trap pairsFromSigs documents). One shuffle on fp,
    // one row per group out.
    val rn = row_number().over(Window.partitionBy(col("fp")).orderBy(col(idCol)))
    filtered.withColumn("__rn", rn).filter(col("__rn") === 1)
      .drop("__rn", "fp")
  }

  /** The quality GATE alone — score + filter, NO dedup stage: the frame
    * [[curate]] exact-dedups on the content fingerprint and the
    * semantic-dedup composite prunes by embedding neighborhood instead
    * (swapping the dedup stage is exactly why the gate is exposed
    * separately). Columns: (idCol, textCol, n_chars, n_tokens, lang_id,
    * quality). */
  def gate(
      docs: DataFrame,
      cfg: Config = Config(),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    gatedFrame(docs, cfg, textCol, idCol).drop("fp")

  /** [[gate]] with the dedup fingerprint still attached (what
    * [[curate]]'s keep-first window consumes). */
  private def gatedFrame(
      docs: DataFrame,
      cfg: Config,
      textCol: String,
      idCol: String): DataFrame =
    scoredFrame(docs, cfg, textCol, idCol).filter(
      col("n_chars").between(cfg.minChars, cfg.maxChars) &&
        col("lang_id").isin(cfg.languages: _*) &&
        col("quality") >= cfg.minQuality)

  /** Scored, unfiltered frame: every doc with its n_chars/n_tokens/
    * lang_id/quality/fingerprint — the input both [[curate]]'s gates and
    * [[funnel]]'s accounting read. */
  private def scoredFrame(
      docs: DataFrame,
      cfg: Config,
      textCol: String,
      idCol: String): DataFrame = {
    val text = col(textCol)
    val langs = T.langStopwords.toSeq.sortBy(_._1)

    // ONE pass over docs: row-local metrics (n_chars, punct ratio, the
    // text itself) ride through the token explode and re-emerge from the
    // group-by via first() — constant within a doc's group, so first is
    // deterministic. This removes the second docs scan and the
    // rowLocal⋈tokenStats shuffle join the two-branch formulation needs.
    // Fan.spread: the token explode multiplies rows ~100x — a compact
    // input must not run the scoring hot loop on one core (see [[Fan]])
    // NULL text must still COUNT as an input doc (it fails the gates, it
    // does not vanish): tokens of NULL would explode to zero rows and the
    // funnel would silently under-report n_input
    val safeText = coalesce(text, lit(""))
    val tokenRows = Fan.spread(docs
      .select(col(idCol), safeText.as("__text"),
        length(safeText).as("__n_chars"), T.punctRatio(safeText).as("__punct")))
      .select(col(idCol), col("__text"), col("__n_chars"), col("__punct"),
        explode(T.tokens(col("__text"))).as("tok"))
    val langHitAggs = langs.map { case (lang, words) =>
      sum(when(col("tok").isin(words: _*), 1L).otherwise(0L)).as(s"hits_$lang")
    }
    val tokenAggs = Seq(
      first(col("__text")).as("__text"),
      first(col("__n_chars")).as("n_chars"),
      first(col("__punct")).as("punct_ratio"),
      count(lit(1)).as("n_tokens"),
      sum(when(col("tok").isin(cfg.stopwords: _*), 1L).otherwise(0L)).as("stop_hits"),
      md5(concat_ws(" ", array_sort(collect_set(col("tok"))))).as("fp")
    ) ++ langHitAggs
    val tokenStats = tokenRows.groupBy(col(idCol))
      .agg(tokenAggs.head, tokenAggs.tail: _*)

    // argmax over the aggregated hit counts — tiny struct-least, same
    // tie-break as T.langId (alphabetical)
    val best = least(langs.map { case (lang, _) =>
      struct((-col(s"hits_$lang")).as("negHits"), lit(lang).as("lang"))
    }: _*)
    val langId = when(best.getField("negHits") < 0, best.getField("lang"))
      .otherwise(lit("und"))

    val lenScore = least(col("n_chars").cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(
      (col("stop_hits").cast("double") / greatest(col("n_tokens"), lit(1))) * 4.0,
      lit(1.0))
    val quality = round(
      lenScore * lit(0.4) + (lit(1.0) - col("punct_ratio")) * lit(0.3) +
        stopScore * lit(0.3), 6)

    tokenStats
      .select(col(idCol), col("__text").as(textCol), col("n_chars"),
        col("n_tokens"), langId.as("lang_id"), quality.as("quality"), col("fp"))
  }

  /** Stage-loss accounting for the curation pipeline: how many documents
    * survive each gate (length → language → quality → dedup) and how many
    * tokens the survivors carry. ONE row out, ONE pass over the scored
    * frame (conditional aggregates instead of per-stage jobs) plus the
    * dedup survivor count — the funnel report every production curation
    * run ships with, oracle-checked like any other query. */
  def funnel(
      docs: DataFrame,
      cfg: Config = Config(),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = scoredFrame(docs, cfg, textCol, idCol)
    val lenOk = col("n_chars").between(cfg.minChars, cfg.maxChars)
    val langOk = lenOk && col("lang_id").isin(cfg.languages: _*)
    val qualOk = langOk && col("quality") >= cfg.minQuality
    // dedup-survivor flag WITHOUT re-running the scoring pipeline through
    // curate(): the keeper of a fingerprint group is the minimum id among
    // its gate-surviving rows, computable as a conditional window min —
    // one scan, one fp-partitioned window, one aggregate
    val minQualId = min(when(qualOk, col(idCol)))
      .over(Window.partitionBy(col("fp")))
    val survivor = qualOk && col(idCol) === minQualId
    scored
      .withColumn("__surv", survivor)
      .agg(
        count(lit(1)).as("n_input"),
        sum(lenOk.cast("long")).as("n_len_ok"),
        sum(langOk.cast("long")).as("n_lang_ok"),
        sum(qualOk.cast("long")).as("n_qual_ok"),
        sum(col("__surv").cast("long")).as("n_dedup"),
        // no otherwise(0): with zero survivors the sum must be NULL (the
        // oracle aggregates an empty CTE), not 0
        sum(when(col("__surv"), col("n_tokens"))).as("kept_tokens"))
  }

  /** Sequence packing: lay the chunk stream end-to-end in deterministic
    * (doc, chunk) order and cut it into fixed-`binTokens` training bins —
    * the "concatenate then chunk" batch-prep step of LLM pretraining.
    * Emits each chunk's `bin_id` and its token offset `bin_pos` inside
    * the bin (a chunk straddling a boundary starts in its `bin_id` bin).
    *
    * Scale shape: the global prefix sum uses the same two-pass banded
    * pattern as [[sampleToTokenBudget]] — band on doc-id ranges (monotone
    * with the pack order), per-band partitioned running sums, broadcast
    * cumulative band offsets. No global window, no single-partition
    * stage; identical output to the naive `Window.orderBy` form. */
  def packSequences(
      chunks: DataFrame,
      binTokens: Long,
      docsPerBand: Long = 10000L,
      idCol: String = "doc_id",
      idxCol: String = "chunk_idx"): DataFrame = {
    require(binTokens > 0 && docsPerBand > 0, "positive bin/band sizes")
    require(chunks.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packSequences bands on floor($idCol / docsPerBand): '$idCol' must be " +
        s"numeric, got ${chunks.schema(idCol).dataType.simpleString}")
    import org.apache.spark.sql.expressions.Window
    // eager localCheckpoint, not persist: pass 1's collect and pass 2 both
    // read the materialized blocks, which are NOT registered in the SQL
    // cache (nothing for a long-lived session to leak — blocks are freed
    // by the ContextCleaner once the result frame is unreachable)
    val banded = chunks
      .withColumn("__band", floor(col(idCol) / docsPerBand).cast("long"))
      .localCheckpoint()
    val totals = banded.groupBy(col("__band"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val row = (b, acc); acc += t; row }
    val spark = chunks.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("__band", "__offset")
    val w = Window.partitionBy(col("__band"))
      .orderBy(col(idCol), col(idxCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    banded
      .join(broadcast(offsetsDf), Seq("__band"))
      .withColumn("__start",
        sum(col("n_tokens")).over(w) + col("__offset") - col("n_tokens"))
      .withColumn("bin_id", floor(col("__start") / binTokens).cast("bigint"))
      .withColumn("bin_pos", (col("__start") - col("bin_id") * binTokens).cast("bigint"))
      .drop("__band", "__offset", "__start")
  }

  /** Distinct word-n-gram stream of `df` — the ONE construction both
    * decontamination tiers key on (a semantic drift between them would
    * silently break the exact-vs-bloom superset property CurationSpec
    * pins). Emits `s` (the shingle) plus `id` when requested. */
  private def shingleStream(
      df: DataFrame, textCol: String, shingleN: Int,
      id: Option[String]): DataFrame = {
    // drop the phantom empty token a leading-whitespace text produces:
    // shingles like " a b" would otherwise pollute the overlap sets.
    // Spread the RAW text, tokenize AFTER (optimization r17): the
    // repartition is a plan barrier, so tokenize-then-spread ran the
    // split/lower/array_remove pass fused onto the (often 1-partition)
    // file scan — the minhashSignaturesSpec trap, ~1 s on one task at
    // sf0.1 for the exact-decontamination stream.
    val base = Fan.spread(df.select(
      (id.map(c => Seq(col(c).as("id"))).getOrElse(Seq.empty) :+
        col(textCol).as("__t")): _*))
      .select((id.map(_ => col("id")).toSeq :+
        array_remove(T.tokens(col("__t")), "").as("toks")): _*)
    base
      .select((id.map(_ => col("id")).toSeq :+ col("toks") :+
        explode(sequence(lit(1),
          greatest(size(col("toks")) - lit(shingleN - 1), lit(1)))).as("p")): _*)
      .select((id.map(_ => col("id")).toSeq :+
        concat_ws(" ", slice(col("toks"), col("p"), lit(shingleN))).as("s")): _*)
      .distinct()
  }

  /** Benchmark decontamination — the gate every pretraining corpus runs
    * before release: a training document sharing too many n-grams with an
    * evaluation/benchmark document leaks the test set into the training
    * set. Returns per-doc overlap counts:
    * (idCol, n_shingles, n_hits, contaminated), where `n_hits` counts the
    * doc's DISTINCT n-grams that appear anywhere in the benchmark and
    * `contaminated` marks docs with `n_hits / n_shingles >= maxOverlap`
    * (single-shingle docs with any hit included).
    *
    * Scale shape: the benchmark's distinct shingle set is usually tiny
    * relative to the corpus (eval suites are MBs, corpora are TBs), so
    * the plan is corpus-explode → LEFT SEMI-shape join against the
    * benchmark shingle set on the shingle key (AQE broadcasts it when it
    * fits) → per-doc conditional count. The corpus is never pairwise
    * compared with anything; cost is O(corpus tokens) + one keyed join. */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      shingleN: Int = 3,
      maxOverlap: Double = 0.5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val benchShingles = shingleStream(benchmark, textCol, shingleN, None)
    val corpusShingles = shingleStream(corpus, textCol, shingleN, Some(idCol))
    val flagged = corpusShingles
      .join(benchShingles.withColumn("__hit", lit(1)), Seq("s"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
    flagged.select(col(idCol), col("n_shingles"), col("n_hits"),
      (col("n_hits").cast("double") / col("n_shingles") >= maxOverlap)
        .as("contaminated"))
  }

  /** Bloom-tier decontamination — [[decontaminate]]'s semantics with the
    * benchmark side compiled into ONE ~MB Bloom filter instead of a
    * shuffle join: the benchmark's distinct n-grams fold into a
    * [[org.apache.spark.sql.graft.BloomBuildAgg]] partial aggregate
    * (buffers bit-or on merge; only buffers cross the wire), the
    * serialized filter is a bounded driver probe (like the k-means cell
    * moments and the BPE vocab probe), and the corpus side counts
    * overlaps ROW-LOCALLY with a codegen'd
    * [[org.apache.spark.sql.graft.BloomMightContain]] probe inside one
    * projection — the 100 TB corpus never shuffles at all (the exact
    * variant shuffles its full n-gram stream). False positives only ever
    * OVER-count hits by ~`fpp`, so the gate over-flags, never leaks a
    * contaminated doc ([[CurationSpec]] pins the superset property
    * against [[decontaminate]]). */
  def decontaminateBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      shingleN: Int = 3,
      maxOverlap: Double = 0.5,
      fpp: Double = 0.001,
      expectedItems: Long = 1L << 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.graft.BloomFunctions
    val benchGrams = shingleStream(benchmark, textCol, shingleN, None)
    val built = benchGrams
      .agg(count(lit(1)).as("__n"),
        BloomFunctions.bloomBuild(col("s"), expectedItems, fpp).as("__bloom"))
      .collect()(0)
    // saturation guard: past expectedItems the filter overfills and the
    // real FP rate climbs without bound — the documented "over-flags by
    // ~fpp" contract would silently break, so fail loudly instead
    val nGrams = built.getAs[Long]("__n")
    require(nGrams <= expectedItems,
      s"benchmark has $nGrams distinct ${shingleN}-grams > expectedItems=" +
        s"$expectedItems; raise expectedItems to keep the fpp contract")
    val bloom = built.getAs[Array[Byte]]("__bloom")
    Fan.spread(corpus.select(col(idCol), col(textCol)))
      // tokenize + gram build + the per-gram bloom probes below are the
      // row-local hot loop — they must run above the spread barrier,
      // not fused onto a 1-partition scan (optimization r17)
      .select(col(idCol), array_remove(T.tokens(col(textCol)), "").as("__toks"))
      .select(col(idCol), array_distinct(transform(
        sequence(lit(1),
          greatest(size(col("__toks")) - lit(shingleN - 1), lit(1))),
        p => concat_ws(" ", slice(col("__toks"), p, lit(shingleN)))))
        .as("__grams"))
      .select(col(idCol),
        size(col("__grams")).cast("long").as("n_shingles"),
        size(filter(col("__grams"),
          g => BloomFunctions.bloomContains(g, bloom))).cast("long")
          .as("n_hits"))
      .select(col(idCol), col("n_shingles"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_shingles") >= maxOverlap)
          .as("contaminated"))
  }

  /** Fuzzy-tier decontamination — [[decontaminate]]'s n-gram-overlap gate
    * relaxed to MinHash/LSH near-duplicate similarity: a training doc
    * whose estimated Jaccard against ANY benchmark doc reaches
    * `minJaccard` is flagged. This catches paraphrased or lightly-edited
    * benchmark leakage (reformatted whitespace, shuffled sentences,
    * small wording drift) that exact n-gram membership misses, at the
    * price of being a similarity gate rather than a containment gate —
    * a short verbatim quote inside a long doc is the EXACT tier's job
    * (low Jaccard), near-whole-document leakage is this one's.
    *
    * Output: (idCol, max_est_jaccard, contaminated) for EVERY corpus
    * doc. Plan: [[Dedup.minhashLshCross]] — banded corpus×benchmark
    * join, never corpus×corpus, benchmark-side bucket guard — then a
    * per-doc max and a left join back to the corpus ids. At 100 TB the
    * corpus contributes one signature scan plus slim (band, id) rows;
    * the benchmark side broadcasts. */
  def decontaminateFuzzy(
      corpus: DataFrame,
      benchmark: DataFrame,
      shingleN: Int = 5,
      k: Int = 8,
      bands: Int = 4,
      minJaccard: Double = 0.5,
      maxBucketSize: Int = 1000,
      textCol: String = "text",
      idCol: String = "doc_id",
      tier: Dedup.HashTier = Dedup.PortableMd5): DataFrame = {
    val scored = Dedup.minhashLshCross(corpus, benchmark, textCol, idCol,
        shingleN, k, bands, maxBucketSize, tier)
      .groupBy(col("id_l").as(idCol))
      .agg(max(col("est_jaccard")).as("__mj"))
    corpus.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__mj"), lit(0.0)).as("max_est_jaccard"),
        (coalesce(col("__mj"), lit(0.0)) >= minJaccard).as("contaminated"))
  }

  /** Corpus n-gram vocabulary: the `topK` most frequent token n-grams with
    * their occurrence and document-frequency counts — the corpus-analysis
    * pass behind tokenizer training, stop-list construction, and the
    * boilerplate lists the dedup layer consumes. Deterministic order:
    * count desc, then n-gram asc.
    *
    * Shape: tokenize → explode positions → codegen'd slice/concat (no
    * interpreted HOF) → one hash-agg keyed by the n-gram (map-side
    * partial counts) → `TakeOrderedAndProject` for the top-k (never a
    * global sort). */
  def ngramVocabulary(
      docs: DataFrame,
      shingleN: Int = 1,
      topK: Int = 100,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(topK > 0, "topK must be positive")
    // array_remove: the phantom empty token from leading whitespace must
    // not become a vocabulary entry ("" for n=1, " tok" inside bigrams) —
    // same hazard tfidfTopTerms filters per-term
    // spread raw text, tokenize after the barrier (the shingleStream
    // rationale — tokenize must not fuse onto a 1-partition scan)
    val ex = Fan.spread(docs
      .select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), array_remove(T.tokens(col("__t")), "").as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .select(col("id"),
        explode(sequence(lit(1), size(col("toks")) - lit(shingleN - 1))).as("p"),
        col("toks"))
      .select(col("id"),
        concat_ws(" ", slice(col("toks"), col("p"), lit(shingleN))).as("gram"))
    ex.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(topK)
  }

  /** Per-document vocabulary coverage against the corpus's own top-`topK`
    * unigram vocabulary — the OOV-rate signal tokenizer-budget planning
    * and quality gating read (a doc whose tokens mostly miss the corpus
    * vocabulary is boilerplate, another language, or noise). Vocabulary =
    * [[ngramVocabulary]] at n=1 (count desc, token asc tie-break, so the
    * top-K cut is deterministic in every engine).
    *
    * Shape: the corpus vocab pass is one keyed agg + `TakeOrderedAndProject`
    * (topK rows, broadcast); the per-doc pass is one explode + broadcast
    * hash join + one keyed agg. The big side shuffles once, keyed by doc. */
  def vocabCoverage(
      docs: DataFrame,
      topK: Int = 500,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val vocab = ngramVocabulary(docs, shingleN = 1, topK = topK,
      textCol = textCol, idCol = idCol).select(col("gram").as("__vtok"))
    val ex = Fan.spread(docs.select(col(idCol).as("id"),
        col(textCol).as("__t")))
      .select(col("id"),
        explode(array_remove(T.tokens(col("__t")), "")).as("tok"))
    ex.join(broadcast(vocab), col("tok") === col("__vtok"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__vtok").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** Temperature-weighted domain mixture (α = 0.5): the resampling-weight
    * table multilingual/multi-domain training runs use to up-weight small
    * sources (Devlin et al. 2019 exponentiated-share sampling; the
    * Pile/ROOTS mixture recipe). Per source: document and token counts,
    * the natural token share, and the α=0.5 temperature share
    * √tokens / Σ√tokens. α is fixed at 0.5 because `sqrt` is
    * correctly-rounded IEEE in every engine while `pow(x, α)` is not —
    * the one exponent that keeps the operator hash-exact cross-engine.
    * The normalizer folds over sources in sorted order (FP addition is
    * order-sensitive; ~dozens of sources, so the fold is trivially
    * driver-bounded — it lives in a 1-row broadcast frame).
    *
    * Shape: one keyed agg over the corpus (map-side partials), a 1-row
    * all-sources rollup, and a broadcast join back — the corpus scans
    * once. */
  def temperatureMix(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val per = docs.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(T.tokenCount(col(textCol)).cast("bigint")).as("n_tokens"))
    val z = broadcast(per.agg(
      sum(col("n_tokens")).as("__total"),
      aggregate(
        transform(
          array_sort(collect_list(struct(
            col(sourceCol).as("s"),
            sqrt(col("n_tokens").cast("double")).as("q")))),
          x => x.getField("q")),
        lit(0.0), (a, b) => a + b).as("__z")))
    per.crossJoin(z)
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("__total")).as("natural_share"),
        (sqrt(col("n_tokens").cast("double")) / col("__z")).as("temp_share"))
  }

  /** Skip-gram training-pair extraction (word2vec-style, Mikolov et al.
    * 2013): every (center, context) token pair within a ±`window`
    * offset, counted corpus-wide, low-frequency pairs cut at `minCount`.
    * The co-occurrence table embedding trainers and PMI/collocation
    * analyses consume.
    *
    * Shape: pair GENERATION is row-local (a nested HOF over each doc's
    * own token array — 2·window pairs per position, no self-join on the
    * token stream, which is how a naive formulation accidentally goes
    * quadratic in document length); the only shuffle is the final
    * (center, context)-keyed count with map-side partials, bounded by
    * distinct-pair vocabulary, not corpus size. */
  def skipgramPairs(
      docs: DataFrame,
      window: Int = 2,
      minCount: Long = 5L,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(window >= 1 && window <= 16, s"window out of range: $window")
    val toks = filter(T.tokens(col(textCol)), t => length(t) > 0)
    val pairs = Fan.spread(docs.select(col(textCol)))
      .select(toks.as("__toks"))
      // empty docs out BEFORE sequence(1, size): sequence with an
      // inverted range counts DOWN and would fabricate positions
      .filter(size(col("__toks")) > 0)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("__toks"))),
        i => transform(
          filter(sequence(i - window, i + window),
            j => j >= 1 && j <= size(col("__toks")) && j =!= i),
          j => struct(
            element_at(col("__toks"), i).as("center"),
            element_at(col("__toks"), j).as("context")))))).as("p"))
    pairs
      .groupBy(col("p.center").as("center"), col("p.context").as("context"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minCount)
  }

  /** PMI collocations from the [[skipgramPairs]] co-occurrence table:
    * pmi(c, x) = ln( n(c,x) · N / (n(c,·) · n(·,x)) ) with every count
    * drawn from the pair table itself (marginals are per-side sums, N
    * the total pair mass) — the association measure that surfaces real
    * collocations ("new york") over merely-frequent pairs ("of the").
    * Top-`topK` by (pmi desc, center, context) under a total order.
    *
    * Shape: the pair table is vocab²-bounded; marginals are two keyed
    * sums re-joined onto it (AQE broadcasts them when small), the 1-row
    * total broadcasts, and the cut is TakeOrderedAndProject. Exactness:
    * one ln over a ratio of exact integer products, rounded to 6. */
  def pmiCollocations(
      docs: DataFrame,
      window: Int = 2,
      minCount: Long = 5L,
      topK: Int = 100,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val pairs = skipgramPairs(docs, window, minCount = 1L, textCol, idCol)
      .localCheckpoint() // four consumers: marginals ×2, total, the join
    val cm = pairs.groupBy(col("center")).agg(sum(col("n_pairs")).as("n_center"))
    val xm = pairs.groupBy(col("context")).agg(sum(col("n_pairs")).as("n_context"))
    val total = broadcast(pairs.agg(sum(col("n_pairs")).as("n_total")))
    pairs.filter(col("n_pairs") >= minCount)
      .join(cm, Seq("center"))
      .join(xm, Seq("context"))
      .crossJoin(total)
      .select(col("center"), col("context"), col("n_pairs"),
        round(log((col("n_pairs") * col("n_total")).cast("double") /
          (col("n_center") * col("n_context")).cast("double")), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("center").asc, col("context").asc)
      .limit(topK)
  }

  /** PPMI + spectral-factorization word embeddings (Levy & Goldberg
    * 2014, "Neural Word Embedding as Implicit Matrix Factorization":
    * SGNS implicitly factorizes the shifted PPMI matrix, so the
    * classical pipeline — co-occurrence counts → positive PMI →
    * eigendecomposition — yields dense word vectors with no training
    * loop). Vectors are the top-`dim` eigenvectors of the symmetric
    * PPMI matrix, columns scaled by √max(λ,0).
    *
    * Scale shape: the corpus-scale work is [[skipgramPairs]]' ONE keyed
    * count; the factorized matrix is VOCAB-BOUNDED — the top
    * `vocabSize` terms by pair mass under a deterministic (mass, term)
    * cut — and collected as ≤ V² cells (the mutualInformation
    * bounded-collect pattern, V ≤ 256 enforced); the eigen solve is the
    * same driver-side Jacobi that powers embed_pca
    * ([[Similarity.jacobiEigen]]). PPMI marginals are computed FROM the
    * restricted cell table so the matrix is self-consistent.
    *
    * no_oracle by design (FP Jacobi iteration has no SQL replay);
    * pinned by a planted co-occurrence spec: words that share contexts
    * embed close, words that never co-occur embed orthogonal.
    *
    * @return one row per (vocab term, component): (term, pair_mass,
    *         component 0..dim-1, value) — flattened scalars, never an
    *         array column (gate-facing row-sorters can't order those) */
  def ppmiSvdEmbeddings(
      docs: DataFrame,
      window: Int = 2,
      minCount: Long = 5L,
      vocabSize: Int = 64,
      dim: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (vocab, evals, evecs, _) =
      ppmiEigenCore(docs, window, minCount, vocabSize, dim)
    val terms = vocab.map(_._1)
    // gate-facing outputs carry no array columns (the embed_pca
    // discipline: downstream row-sorters can't order those) — one row
    // per (term, component) scalar instead of a vector column
    val rows = for {
      t <- terms.indices
      k <- 0 until dim
    } yield (terms(t), vocab(t)._2, k.toLong,
      evecs(k)(t) * math.sqrt(math.max(evals(k), 0.0)))
    rows.toDF("term", "pair_mass", "component", "value")
  }

  /** Shared corpus→PPMI→eigen core of [[ppmiSvdEmbeddings]] and
    * [[ppmiSvdVerdict]]: skipgram pair count (the one corpus-scale job),
    * deterministic (mass desc, term) vocab cut, bounded ≤V² cell
    * collect, PPMI matrix, driver Jacobi. Returns (vocab with masses,
    * eigenvalues desc, eigenvectors-as-rows, the symmetrized PPMI
    * matrix). */
  private def ppmiEigenCore(
      docs: DataFrame,
      window: Int,
      minCount: Long,
      vocabSize: Int,
      dim: Int): (Array[(String, Long)], Array[Double],
        Array[Array[Double]], Array[Array[Double]]) = {
    require(vocabSize >= 2 && vocabSize <= 256,
      s"vocabSize in [2,256]: $vocabSize")
    require(dim >= 1 && dim <= vocabSize, s"dim in [1,vocabSize]: $dim")
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = skipgramPairs(docs, window, minCount).localCheckpoint()
    val vocab = pairs.groupBy(col("center"))
      .agg(sum(col("n_pairs")).as("__mass"))
      .orderBy(col("__mass").desc, col("center"))
      .limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val terms = vocab.map(_._1)
    val index = terms.zipWithIndex.toMap
    val vdf = terms.toSeq.toDF("__term")
    val cells = pairs
      .join(broadcast(vdf.select(col("__term").as("center"))), Seq("center"))
      .join(broadcast(vdf.select(col("__term").as("context"))), Seq("context"))
      .select(col("center"), col("context"), col("n_pairs"))
      .collect() // bounded: <= vocabSize^2 <= 65536 cells
      .map(r => (index(r.getString(1)), index(r.getString(0)), r.getLong(2)))
    val v = terms.length
    val nij = Array.ofDim[Long](v, v)
    cells.foreach { case (i, j, c) => nij(i)(j) = c }
    val rowMass = Array.tabulate(v)(i => nij(i).sum)
    val total = rowMass.sum.toDouble
    val m = Array.tabulate(v, v) { (i, j) =>
      if (nij(i)(j) == 0L || rowMass(i) == 0L || rowMass(j) == 0L) 0.0
      else math.max(0.0, math.log(
        nij(i)(j).toDouble * total /
          (rowMass(i).toDouble * rowMass(j).toDouble)))
    }
    // the pair table is symmetric by construction; enforce exactly so
    // Jacobi's symmetric contract holds under any FP asymmetry
    for (i <- 0 until v; j <- i + 1 until v) {
      val avg = 0.5 * (m(i)(j) + m(j)(i)); m(i)(j) = avg; m(j)(i) = avg
    }
    // jacobiEigen returns eigenpairs sorted by descending eigenvalue
    // with vecs(k)(t) = component t of eigenvector k, canonical sign
    val (evals, evecs) = graft.operators.Similarity.jacobiEigen(m)
    (vocab, evals, evecs, m)
  }

  /** Driver-gradable verdict twin of [[ppmiSvdEmbeddings]] (VERDICT r15
    * #1): one row per vocab term carrying the two columns an exact SQL
    * oracle CAN replay — the term and its skipgram pair mass under the
    * deterministic (mass desc, term) top-`vocabSize` cut — next to
    * boolean invariants of a correct factorization that the oracle pins
    * as TRUE literals:
    *  - `evecs_orthonormal`: max |eᵢ·eⱼ − δᵢⱼ| ≤ 1e-6,
    *  - `evals_descending`: the declared jacobiEigen sort order,
    *  - `recon_le_norm`: ‖M − Σ_{k<dim} λ⁺ₖ eₖeₖᵀ‖_F ≤ ‖M‖_F + 1e-9.
    *    With an orthonormal basis the truncated-spectrum residual is
    *    Σ_{dropped} λ², never more than the full spectrum's Σλ² = ‖M‖²_F
    *    — a factorization that inflates the residual is wrong.
    * The corpus-scale work (skipgram count + vocab cut) is identical to
    * the embeddings path, so a green row here pins that whole pipeline
    * plus the eigen contracts; only the FP eigenVALUES themselves stay
    * spec-pinned (CurationSpec's planted co-occurrence geometry). */
  def ppmiSvdVerdict(
      docs: DataFrame,
      window: Int = 2,
      minCount: Long = 5L,
      vocabSize: Int = 64,
      dim: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (vocab, evals, evecs, m) =
      ppmiEigenCore(docs, window, minCount, vocabSize, dim)
    val v = vocab.length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val ortho = (0 until v).forall { i =>
      (i until v).forall { j =>
        math.abs(dot(evecs(i), evecs(j)) - (if (i == j) 1.0 else 0.0)) <= 1e-6
      }
    }
    val desc = (1 until v).forall(i => evals(i - 1) >= evals(i) - 1e-9)
    // rank-dim reconstruction with the λ⁺ clamp the embedding uses
    val recon = Array.tabulate(v, v) { (i, j) =>
      (0 until dim).map(k => math.max(evals(k), 0.0) * evecs(k)(i) * evecs(k)(j)).sum
    }
    var err = 0.0
    var norm = 0.0
    for (i <- 0 until v; j <- 0 until v) {
      val d0 = m(i)(j) - recon(i)(j)
      err += d0 * d0
      norm += m(i)(j) * m(i)(j)
    }
    val reconOk = math.sqrt(err) <= math.sqrt(norm) + 1e-9
    vocab.toSeq.toDF("term", "pair_mass")
      .select(col("term"), col("pair_mass"),
        lit(ortho).as("evecs_orthonormal"),
        lit(desc).as("evals_descending"),
        lit(reconOk).as("recon_le_norm"))
  }

  /** Difficulty-proportional domain reweighting (a deterministic
    * DoReMi-flavoured heuristic, Xie et al. 2023: upweight the domains
    * the reference LM finds hardest): per-source mean NLL under the
    * corpus-trained bigram LM ([[Quality.lmScore]]), normalized into
    * mixture weights w_s = nll̄_s / Σ nll̄. Reweighting toward high-loss
    * sources is the excess-loss signal without the proxy-model training
    * loop — swap in real proxy losses by replacing the scorer.
    *
    * Exactness: per-doc nll is lmScore's 6-rounded fold; the per-source
    * mean is a DECIMAL sum over those rounded values with one IEEE
    * division; the normalizer folds over sources in sorted order
    * (broadcast 1-row frame). One scorer pass + one slim join + two
    * tiny aggs. */
  def domainReweight(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nll = graft.operators.Quality.lmScore(docs, textCol, idCol)
    val per = nll
      .join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("nll").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_nll"))
    val z = broadcast(per.agg(
      aggregate(
        transform(
          array_sort(collect_list(struct(
            col(sourceCol).as("s"), col("mean_nll").as("q")))),
          x => x.getField("q")),
        lit(0.0), (a, b) => a + b).as("__z")))
    per.crossJoin(z)
      .select(col(sourceCol), col("n_docs"), col("mean_nll"),
        (col("mean_nll") / col("__z")).as("weight"))
  }

  /** Epoch plan: turn the [[temperatureMix]] weight table into the
    * actionable per-source schedule a training run consumes — how many
    * EPOCHS (repeats) of each source fill its temperature-weighted slice
    * of a global token budget. Small sources get up-weighted by the α=0.5
    * share and would repeat many times; `maxEpochs` caps the repeat count
    * (the standard guard against memorizing a tiny source), and the
    * `capped` flag tells the operator which sources the cap bit so the
    * budget owner can re-allocate the shortfall.
    *
    * Determinism: epochs_raw = temp_share · budget / tokens is a single
    * IEEE expression chain over the mix table's doubles (which are
    * themselves exact-sum-derived); the cap is `least`, the reported
    * token plan floors raw·tokens into a bigint. No new shuffle: one
    * projection over the mix frame (itself one keyed agg + broadcast). */
  def epochPlan(
      docs: DataFrame,
      budgetTokens: Long,
      maxEpochs: Double = 4.0,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0, "need positive budget and cap")
    val mix = temperatureMix(docs, sourceCol, textCol)
    val raw = (col("temp_share") * lit(budgetTokens.toDouble)) /
      col("n_tokens").cast("double")
    mix.select(col(sourceCol), col("n_tokens"), col("temp_share"),
      round(least(raw, lit(maxEpochs)), 6).as("epochs"),
      (raw > lit(maxEpochs)).as("capped"),
      floor(least(raw, lit(maxEpochs)) * col("n_tokens").cast("double"))
        .cast("bigint").as("planned_tokens"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus: the fraction
    * of a doc's distinct token n-grams never seen in the reference — the
    * inverse of the decontamination overlap, used to score candidate data
    * for how much NEW text it adds to what a model has already trained on
    * (novelty ≈ 0 → the doc is re-hashed existing content).
    *
    * Shape: both sides tokenize once and explode to distinct grams; the
    * membership test is one gram-keyed equi-join (corpus-novel grams
    * survive a left join with a null probe), then one keyed agg per doc.
    * The reference side ships only DISTINCT grams. At 100 TB the same
    * semantics can run corpus-shuffle-free through the Bloom tier
    * ([[decontaminateBloom]]'s filter aggregate) at the price of a
    * one-sided false-positive rate on `n_novel`. Docs shorter than `n`
    * tokens have no grams: they report n_grams = 0 and a NULL novelty
    * (not 0 or 1 — the signal is undefined, and the caller's threshold
    * should not silently keep or drop them). */
  def ngramNovelty(
      corpus: DataFrame,
      reference: DataFrame,
      n: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    def withGrams(df: DataFrame, cols: Seq[Column]): DataFrame = {
      val toks = filter(T.tokens(col(textCol)), t => length(t) > 0)
      df.select(cols :+ toks.as("__toks"): _*)
        .select(cols :+ explode(
          when(size(col("__toks")) >= n,
            transform(sequence(lit(1), size(col("__toks")) - (n - 1)),
              i => array_join(slice(col("__toks"), i, lit(n)), " ")))
            .otherwise(array())).as("gram"): _*)
    }
    val evalGrams = withGrams(corpus, Seq(col(idCol))).distinct()
    val refGrams = withGrams(reference, Seq.empty)
      .distinct().withColumn("__hit", lit(1))
    val perDoc = evalGrams.join(refGrams, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_novel"))
    corpus.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
          .as("novelty"))
  }

  /** Neyman-allocation stratified sampling (Neyman 1934): draw a target
    * of `nTarget` rows total, allocating each stratum n_h ∝ N_h·σ_h —
    * the minimum-variance design for estimating the population mean
    * (variable strata get sampled hard, homogeneous strata barely),
    * versus [[hashSample]]'s caller-chosen fractions. The curation use:
    * sample a quality-audit set where the budget concentrates on the
    * sources whose quality actually varies.
    *
    * Two passes: (1) per-stratum exact moments — n as BIGINT, Σq and Σq²
    * as exact decimals over the `quantScale`-quantized metric (the
    * [[graft.operators.Reports.abTest]] discipline) — then σ_h, the
    * weight N_h·σ_h, the total weight W via a PINNED stratum-ordered
    * fold (strata-cardinality array, never row-scale), and
    * rate_h = min(1, nTarget·w_h/W / N_h); (2) the [[hashSample]]
    * deterministic md5 cut at rate_h. A zero-variance stratum gets rate
    * 0 — textbook Neyman: its mean is already exact from any single row
    * (callers wanting floor coverage compose with [[samplePerGroup]]).
    *
    * Sample size is EXPECTED nTarget (hash-Bernoulli, the [[hashSample]]
    * contract), deterministic per (seed, id) — stable under retries and
    * corpus appends.
    *
    * @return sampled rows (idCol, strataCol, stratum_rate 6-rounded) */
  def neymanSample(
      docs: DataFrame,
      strataCol: String,
      valueCol: org.apache.spark.sql.Column,
      nTarget: Long,
      seed: Long = 42L,
      quantScale: Long = 1L,
      idCol: String = "doc_id"): DataFrame = {
    require(nTarget > 0 && quantScale > 0, "need positive nTarget/quantScale")
    val q = floor(valueCol * lit(quantScale.toDouble)).cast("long")
    val m = docs
      .select(col(strataCol).as("__st"), q.as("__q"))
      .groupBy(col("__st"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__q").cast("decimal(28,0)")).as("__s"),
        sum(col("__q").cast("decimal(19,0)") *
          col("__q").cast("decimal(19,0)")).as("__ss"))
    val nD = col("__n").cast("double")
    val sigma = when(col("__n") >= 2,
      sqrt((col("__ss").cast("double") -
        col("__s").cast("double") * col("__s").cast("double") / nD) /
        (nD - 1.0))).otherwise(lit(0.0))
    val weighted = m.select(col("__st"), col("__n"),
      (nD * sigma).as("__w"))
    // total weight W: strata-cardinality frame folded in PINNED stratum
    // order (an unpinned double SUM would be engine-order dependent)
    val total = weighted
      .agg(sort_array(collect_list(struct(col("__st"), col("__w"))))
        .as("__ws"))
      .select(aggregate(col("__ws"), lit(0.0),
        (acc, c) => acc + c.getField("__w")).as("__tw"))
    // W = 0 (every stratum zero-variance) would make the rate 0/0 = NaN,
    // and Spark's NaN-is-largest ordering turns least(1.0, NaN) into 1.0
    // — sample everything. Guard so the documented contract holds: a
    // zero-weight allocation samples NOTHING (rate 0).
    val rates = weighted.crossJoin(broadcast(total))
      .select(col("__st"),
        when(col("__tw") > 0.0,
          least(lit(1.0),
            (lit(nTarget.toDouble) * col("__w") / col("__tw")) / nD))
          .otherwise(lit(0.0))
          .as("__rate"))
    val bucket = pmod(
      graft.functions.HashFunctions.md5Bucket(seed, col(idCol)),
      lit(1000000L))
    docs.select(col(idCol), col(strataCol))
      .join(broadcast(rates),
        col(strataCol) === col("__st"))
      .filter(bucket < (col("__rate") * 1000000L))
      .select(col(idCol), col(strataCol),
        round(col("__rate"), 6).as("stratum_rate"))
  }

  /** Deterministic stratified sampling by content hash — mixture
    * weighting (e.g. 80% web, 20% code) the reproducible way: a row is
    * kept iff `hash(seed, id) mod 1e6 < fraction(stratum) * 1e6`. Unlike
    * `rand()`-based sampling this is stable under task retries, partition
    * reshuffles, AND across engines (md5 is portable), so the same seed
    * always yields the same corpus — a property training-data pipelines
    * need for auditability. Strata without a configured fraction are
    * dropped. Pure per-row predicate: no shuffle, pushes past column
    * pruning like any filter. */
  def hashSample(
      docs: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions in [0,1]")
    val bucket = pmod(
      graft.functions.HashFunctions.md5Bucket(seed, col(idCol)),
      lit(1000000L))
    val fracOf = fractions.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (k, f)) => when(col(strataCol) === k, f).otherwise(acc)
    }
    docs.filter(bucket < (fracOf * 1000000L)) // null fraction ⇒ dropped
  }

  /** Fixed-size token chunking with overlap — the sequence-prep step
    * between curation and tokenizer: split each document into windows of
    * `chunkSize` tokens advancing by `stride = chunkSize - overlap`, so
    * consecutive chunks share `overlap` tokens of context. One row out
    * per (doc, chunk), original order preserved by `chunk_idx`.
    *
    * Pure per-row plan: tokenize once, `explode` a chunk-index sequence,
    * `slice` the token array — no shuffle at all; the fan-out stays
    * pipelined inside the scan stage. A short document yields exactly one
    * (possibly short) chunk. */
  def chunkTokens(
      docs: DataFrame,
      chunkSize: Int = 512,
      overlap: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = T.tokens(col(textCol))
    val spreadDocs = Fan.spread(docs.select(col(idCol), col(textCol)))
    // number of stride steps whose window still contains a fresh token:
    // ceil((n - overlap) / stride), floored at 1 for short docs
    val nChunks = greatest(
      ceil((size(col("__toks")) - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    spreadDocs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize))
          .as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", col("__chunk")).as("chunk_text"),
        size(col("__chunk")).cast("bigint").as("n_tokens"))
  }

  /** Per-term relevance scoring: TF-IDF and BM25 for every (doc, term),
    * keeping each document's `topK` terms — the keyword-extraction /
    * doc-representation pass behind sparse retrieval and topic labeling.
    *
    * Shape: tokenize → explode → (doc, term) hash-agg for term frequency
    * (map-side partial counts, the only pass over the token stream) →
    * per-doc length via a partitioned window over the much smaller tf
    * frame → term-keyed equi-join against the document-frequency
    * aggregate. The df side is keyed by term — vocabulary-sized, NOT
    * broadcastable at corpus scale, so it stays a shuffled equi-join and
    * the corpus-level constants (N, avgdl) ride in via a broadcast
    * single-row cross join. Top-k per doc is a partitioned window, never
    * a global sort.
    *
    * Scores are rounded to 6 places and ordered (score desc, term asc) so
    * the per-doc top-k is deterministic across engines. */
  def tfidfTopTerms(
      docs: DataFrame,
      topK: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK > 0, "topK must be positive")
    // spread the RAW text before tokenizing: the tokens projection is the
    // hot loop, and computing it pre-spread would run it inside the
    // (possibly single-task) scan stage
    val tokenRows = Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      // \s+-split emits an empty token for leading whitespace / empty
      // text; a phantom '' term would enter tf/df and the BM25 length
      .filter(length(col("term")) > 0)
    val tf = tokenRows.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = sum(col("tf")).over(Window.partitionBy(col(idCol)))
    val tfDl = tf.withColumn("dl", dl)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("d"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("d")).cast("double") / count(lit(1))).as("avgdl"))
    val joined = tfDl.join(df, "term").crossJoin(broadcast(corpus))

    // both scores written as the exact expression trees the oracle
    // replays (same operand order: FP addition/multiplication is not
    // associative, and the compare is bit-hash after round-6)
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val nD = col("n_docs").cast("double")
    val idf = log((nD + 1.0) / (dfD + 1.0)) + 1.0
    val tfidf = round(tfD * idf, 6)
    val bm25Idf = log(lit(1.0) + (nD - dfD + 0.5) / (dfD + 0.5))
    val bm25 = round(
      bm25Idf * (tfD * (k1 + 1.0)) /
        (tfD + (lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / col("avgdl")))), 6)

    val scored = joined.select(col(idCol), col("term"), col("tf"), col("df"),
      tfidf.as("tfidf"), bm25.as("bm25"))
    val rank = row_number().over(
      Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term").asc))
    scored.withColumn("__rank", rank).filter(col("__rank") <= topK).drop("__rank")
  }

  /** Stratified mixture sampling to per-stratum token budgets — domain
    * mixing ("30 B web tokens, 10 B code, 5 B books") with the greedy
    * quality-first fill of [[sampleToTokenBudget]] applied independently
    * inside every stratum. Strata without a budget are dropped.
    *
    * Scale shape: the per-stratum running sum reuses the banded two-pass
    * prefix sum — bands on `orderCol` value ranges WITHIN each stratum,
    * so no window ever spans a whole stratum (strata are few and huge: a
    * per-stratum window would put all of "web" through one task). Pass 1
    * collects ≤ |budgets|×bands (stratum, band) token totals; pass 2 runs
    * partitioned running sums plus broadcast cumulative offsets. Bands
    * whose stratum budget is already exhausted by preceding bands are
    * pruned before the window. `orderCol` must lie in [0, 1] (a quality
    * score); higher values are kept first, ties broken by `idCol`. */
  def mixtureSample(
      docs: DataFrame,
      strataCol: String,
      budgets: Map[String, Long],
      orderCol: String = "quality",
      idCol: String = "doc_id",
      tokenCol: String = "n_tokens",
      bandsPerStratum: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgets.nonEmpty, "need at least one stratum budget")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    require(docs.schema(strataCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"mixtureSample strata must be strings (budget keys are): '$strataCol' " +
        s"is ${docs.schema(strataCol).dataType.simpleString}")
    val bandCol = least(
      greatest(floor((lit(1.0) - col(orderCol)) * bandsPerStratum), lit(0.0)),
      lit((bandsPerStratum - 1).toDouble)).cast("int")
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (k, t)) =>
        when(col(strataCol) === k, t).otherwise(acc)
      }
    val banded = docs
      .filter(col(strataCol).isin(budgets.keys.toSeq: _*))
      .withColumn("__band", bandCol)
      .localCheckpoint() // eager: pass 1's collect + pass 2 share the blocks

    val totals = banded.groupBy(col(strataCol), col("__band"))
      .agg(sum(col(tokenCol)).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy { case (s, b, _) => (s, b) }
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (stratum, rows) =>
      var acc = 0L
      rows.sortBy(_._2).flatMap { case (_, band, t) =>
        val keep = if (acc <= budgets(stratum)) Some((stratum, band, acc)) else None
        acc += t
        keep
      }
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF(strataCol, "__band", "__offset")
    val w = Window.partitionBy(col(strataCol), col("__band"))
      .orderBy(col(orderCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    banded
      .join(broadcast(offsetsDf), Seq(strataCol, "__band"))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w) + col("__offset"))
      .filter(col("cum_tokens") <= budgetCol)
      .drop("__band", "__offset")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): item i gets key `ln(u_i) / w_i` with `u_i` a
    * deterministic md5-uniform in (0, 1); the k largest keys are exactly
    * a w-weighted sample without replacement. Same auditability story as
    * [[hashSample]] — retry-stable, partition-order-independent, and the
    * identical arithmetic replays in SQL — but with per-row weights
    * (sample long documents proportionally more often) and an exact
    * sample SIZE instead of an expected rate.
    *
    * Scale shape: the key is a per-row projection and the top-k compiles
    * to `TakeOrderedAndProject` (per-partition heaps + driver merge of k
    * rows), never a global sort. Rows with non-positive weight are
    * excluded (they'd get key NaN/∞). */
  def weightedSample(
      docs: DataFrame,
      weightCol: String,
      k: Int,
      seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val bucket = graft.functions.HashFunctions.md5Bucket(seed, col(idCol))
    // (bucket + 0.5) / 2^32: exact in IEEE double (power-of-two divisor),
    // strictly inside (0, 1) so ln never sees 0
    val u = (bucket.cast("double") + 0.5) / 4294967296.0
    docs.filter(col(weightCol) > 0)
      .withColumn("__es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__es_key").desc, col(idCol).asc)
      .limit(k)
      .drop("__es_key")
  }

  /** Deterministic token-budget sample: highest-quality docs first (ties
    * by id) until the running token budget is exhausted.
    *
    * The naive form is a running sum over ONE global window
    * (`Window.orderBy(quality desc, id)`) — every row moves to a single
    * partition and the whole corpus serializes through one task. This
    * implementation is the scale-safe two-pass prefix sum instead:
    *
    *  1. bucket rows into disjoint quality-value bands (a pure per-row
    *     expression — band order equals quality order across bands);
    *  2. aggregate per-band token totals (map-side partial agg, ≤
    *     `qualityBands` result rows), collect that tiny table and turn it
    *     into cumulative band offsets on the driver;
    *  3. running sum per band — a PARTITIONED window, every band in
    *     parallel — plus the broadcast band offset = the identical global
    *     prefix sum.
    *
    * Bands whose offset already exceeds the budget are pruned before the
    * window (their rows can never be selected), so the expensive pass
    * touches only candidate bands. The banded input is materialized once
    * via eager `localCheckpoint` so pass 2 reads pass 1's blocks instead
    * of recomputing the upstream curation pipeline; unlike a `persist`,
    * nothing is registered in the SQL cache, so a long-lived session holds
    * no cached entries once the result frame is dropped. */
  def sampleToTokenBudget(
      curated: DataFrame,
      tokenBudget: Long,
      idCol: String = "doc_id",
      qualityBands: Int = 1024): DataFrame =
    // exactly the single-stratum case of [[mixtureSample]] — one shared
    // implementation of the banded prefix-sum machinery
    mixtureSample(
      curated.withColumn("__stratum", lit("all")),
      "__stratum", Map("all" -> tokenBudget),
      orderCol = "quality", idCol = idCol, tokenCol = "n_tokens",
      bandsPerStratum = qualityBands)
      .drop("__stratum")

  /** Deterministic train/val/test assignment: hash every unit into the
    * [0, 1e6) bucket space ([[graft.functions.HashFunctions.md5Bucket]],
    * the same portable md5 arithmetic the samplers and the shard assigner
    * use) and cut it at the cumulative split fractions, in declaration
    * order. Stable under retries/reshuffles and across engines, and —
    * unlike a `rand()` split — a document keeps its split when the corpus
    * around it grows, which is what keeps eval sets uncontaminated across
    * dataset versions. Pure per-row projection: no shuffle, no state.
    *
    * `splits` are (name, fraction) in order; fractions must be positive
    * and sum to at most 1 (+ FP slack). Rows past the last cut (when the
    * sum is < 1) get a null split — callers usually treat that as "drop".
    * Cut points are computed as exact integer thresholds so the same
    * literals replay in SQL. */
  def splitAssign(
      docs: DataFrame,
      splits: Seq[(String, Double)],
      seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits need positive fractions")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val bucket = pmod(
      graft.functions.HashFunctions.md5Bucket(seed, col(idCol)),
      lit(1000000L))
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => math.round(c * 1000000L))
    val label = splits.zip(cuts).foldLeft(Option.empty[Column]) {
      case (None, ((name, _), cut)) => Some(when(bucket < cut, name))
      case (Some(c), ((name, _), cut)) => Some(c.when(bucket < cut, name))
    }.get.otherwise(lit(null).cast("string"))
    docs.withColumn("split", label)
  }

  /** BM25 retrieval: score every document against a fixed bag of query
    * terms and return the top `topK` by total BM25 — the classic inverted
    * index probe, expressed as a filtered aggregation instead of an index
    * lookup.
    *
    * Scale shape: the token stream is filtered to the query terms BEFORE
    * the tf aggregation (an `IN` predicate over the explode — the shuffle
    * only ever carries query-term hits, the analogue of reading |terms|
    * posting lists), while document lengths are a ROW-LOCAL array-length
    * projection (never a second explode of the corpus: BM25's dl needs a
    * count, not a stream) and the corpus stats aggregate those counts.
    * Per-document scores sum the per-term BM25 contributions with an
    * ascending-term fold over a sorted array (FP addition order is
    * defined, so the score replays hash-exact in SQL); the final top-k is
    * an `orderBy().limit()` → `TakeOrderedAndProject`, never a global
    * sort. Ties break by id ascending. */
  def bm25Search(
      docs: DataFrame,
      terms: Seq[String],
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty && topK > 0, "need query terms and topK > 0")
    val (docLens, corpus, tf) = bm25Frames(docs, terms, textCol, idCol)
    bm25ScoreTail(docLens, corpus, tf, topK, k1, b, idCol)
  }

  /** Several [[bm25Search]] variants (e.g. b on/off for ranker A/B
    * comparison) over ONE shared tokenize/docLens/tf pass (optimization
    * r17, guide §1.2 step 1): the corpus frames depend only on the query
    * TERMS, not on (k1, b), so n independent bm25Search calls rebuilt n
    * identical checkpoint sets. Scores are bit-identical to independent
    * calls — same expression trees over the same frames. */
  def bm25SearchVariants(
      docs: DataFrame,
      terms: Seq[String],
      bs: Seq[Double],
      topK: Int = 10,
      k1: Double = 1.2,
      textCol: String = "text",
      idCol: String = "doc_id"): Seq[DataFrame] = {
    require(terms.nonEmpty && topK > 0, "need query terms and topK > 0")
    val (docLens, corpus, tf) = bm25Frames(docs, terms, textCol, idCol)
    bs.map(b => bm25ScoreTail(docLens, corpus, tf, topK, k1, b, idCol))
  }

  /** The shared BM25 corpus frames: doc length as a per-row count over
    * the (empty-filtered) token vector (docs with zero tokens still
    * count toward n_docs/avgdl), tf filtered to the query terms BEFORE
    * aggregation. Eager localCheckpoints (the minhashLsh policy):
    * docLens feeds both the corpus rollup and the scoring join, tf both
    * the df aggregation and the join — without them each consumer
    * re-scans and re-tokenizes the full corpus (4 text passes instead of
    * 2); both frames are slim (2-3 columns, docs/terms rows, never
    * token-scale). */
  private def bm25Frames(
      docs: DataFrame,
      terms: Seq[String],
      textCol: String,
      idCol: String): (DataFrame, DataFrame, DataFrame) = {
    val base = Fan.spread(docs.select(col(idCol), col(textCol)))
    val docLens = base.select(col(idCol),
      size(filter(T.tokens(col(textCol)), tk => length(tk) > 0))
        .cast("long").as("dl"))
      .localCheckpoint()
    val corpus = broadcast(docLens.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")))
    val tf = base
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0 && col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    (docLens, corpus, tf)
  }

  private def bm25ScoreTail(
      docLens: DataFrame,
      corpus: DataFrame,
      tf: DataFrame,
      topK: Int,
      k1: Double,
      b: Double,
      idCol: String): DataFrame = {
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val joined = tf.join(broadcast(df), "term")
      .join(docLens, idCol).crossJoin(corpus)
    // the exact expression tree tfidfTopTerms commits to (same operand
    // order — the oracle replays it verbatim)
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val nD = col("n_docs").cast("double")
    val bm25Idf = log(lit(1.0) + (nD - dfD + 0.5) / (dfD + 0.5))
    val contrib = bm25Idf * (tfD * (k1 + 1.0)) /
      (tfD + (lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / col("avgdl"))))
    joined
      .select(col(idCol), col("term"), contrib.as("s"))
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("term"), col("s")))).as("__xs"),
        count(lit(1)).as("n_hit_terms"))
      .select(col(idCol), col("n_hit_terms"),
        round(aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("s")), 6)
          .as("bm25"))
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Keyword KEYNESS per source via Dunning's log-likelihood ratio
    * (Dunning 1993) — "which terms characterize this source against the
    * rest of the corpus", the corpus-linguistics standard that stays
    * calibrated on rare terms where χ² and PMI explode:
    *
    *   G² = 2·(a·ln(a/E₁) + b·ln(b/E₂)),  E₁ = c·(a+b)/(c+d),
    *   E₂ = d·(a+b)/(c+d)
    *
    * for a = term count in the source, b = in the rest, c/d = token
    * totals. The per-source signature the mixture planner reads before
    * deciding what a source actually contributes.
    *
    * Scale shape: ONE tokenize pass collapses the corpus to the
    * (source, term, count) frame (the only corpus-scale shuffle,
    * map-side partials); source totals, term totals and the grand total
    * are keyed aggs of that frame; scoring is a term-keyed join plus a
    * source-partitioned top-k window. `minCount` bounds the scored
    * vocabulary. Exactness: all censuses integral; G² is one fixed IEEE
    * expression (b = 0 folds its term to 0 — the x·ln x → 0 limit);
    * `overused` compares exact decimal cross-products, never rates.
    *
    * @return (source, term, tf_source, tf_rest, llr, overused) — top
    *         `topK` terms per source by (G² desc, term) */
  def keynessLlr(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text",
      minCount: Long = 5L,
      topK: Int = 5): DataFrame = {
    require(minCount >= 1 && topK > 0, "need minCount >= 1 and topK > 0")
    val base = Fan.spread(docs.select(col(sourceCol), col(textCol)))
    val st = base
      .select(col(sourceCol).as("__src"),
        explode(T.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("__src"), col("term")).agg(count(lit(1)).as("a"))
      .localCheckpoint() // source totals + term totals + score join
    val srcTot = st.groupBy(col("__src")).agg(sum(col("a")).as("c"))
    val termTot = st.groupBy(col("term")).agg(sum(col("a")).as("t"))
    val grand = broadcast(srcTot.agg(sum(col("c")).as("n")))
    val j = st.join(termTot, "term").join(srcTot, Seq("__src"))
      .crossJoin(grand)
      .filter(col("t") >= minCount)
      .withColumn("b", col("t") - col("a"))
      .withColumn("d", col("n") - col("c"))
    val aD = col("a").cast("double")
    val bD = col("b").cast("double")
    val e1 = col("c").cast("double") * col("t").cast("double") /
      col("n").cast("double")
    val e2 = col("d").cast("double") * col("t").cast("double") /
      col("n").cast("double")
    val llr = lit(2.0) * (aD * log(aD / e1) +
      when(col("b") === 0L, lit(0.0)).otherwise(bD * log(bD / e2)))
    val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(19,0)")
    import org.apache.spark.sql.expressions.Window
    val scored = j.select(col("__src").as(sourceCol), col("term"),
      col("a").as("tf_source"), col("b").as("tf_rest"),
      round(llr, 6).as("llr"),
      (dec(col("a")) * dec(col("d")) > dec(col("b")) * dec(col("c")))
        .as("overused"))
    scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(col("llr").desc, col("term").asc)))
      .filter(col("__rk") <= topK)
      .drop("__rk")
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Ponte &
    * Croft 1998; Zhai & Lafferty 2001) — the language-modeling
    * counterpart to [[bm25Search]]:
    *
    *   score(d|Q) = Σ_t log((tf_t,d + μ·p(t|C)) / (dl_d + μ))
    *
    * decomposed the standard way so only HIT terms need doc-level work:
    * Σ_hits log(1 + tf/(μ·p_t)) + |Q|·(log μ − log(dl+μ)) + Σ_t log p_t
    * (the last term is doc-constant; it ships so the score is the real
    * log-likelihood, not just a rank key). Query terms absent from the
    * corpus (p_t = 0) are dropped — the standard practical treatment.
    *
    * Scale shape: the [[bm25Search]] posting-sliver discipline — the
    * token stream filters to query terms BEFORE the tf aggregation,
    * doc length is a row-local token count (no second corpus explode),
    * collection stats ride 1-row/|Q|-row broadcasts. Candidates are
    * docs with ≥ 1 hit (the inverted-index contract). Determinism: per-
    * term contributions and the query constant both fold in sorted term
    * order; one 6-round per score.
    *
    * @return (doc_id, dl, n_hit_terms, qlm) top-K by (score desc, id) */
  def qlmSearch(
      docs: DataFrame,
      terms: Seq[String],
      topK: Int = 10,
      mu: Double = 2000.0,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty && topK > 0 && mu > 0,
      "need query terms, topK > 0, mu > 0")
    val base = Fan.spread(docs.select(col(idCol), col(textCol)))
    val docLens = base.select(col(idCol),
      size(filter(T.tokens(col(textCol)), tk => length(tk) > 0))
        .cast("long").as("dl"))
      .localCheckpoint()
    val corpus = broadcast(docLens.agg(
      sum(col("dl")).as("c_total")))
    val tf = base
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0 && col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    // |Q_eff| and the doc-constant Σ log p_t, folded in sorted term
    // order on a 1-row broadcast frame
    val qstats = broadcast(cf.crossJoin(corpus)
      .select(col("term"),
        log(col("cf").cast("double") / col("c_total").cast("double"))
          .as("__lp"))
      .agg(count(lit(1)).as("n_q"),
        aggregate(
          sort_array(collect_list(struct(col("term"), col("__lp")))),
          lit(0.0), (acc, x) => acc + x("__lp")).as("const_q")))
    val joined = tf.join(broadcast(cf), "term")
      .join(docLens, idCol).crossJoin(corpus)
    val contrib = log(lit(1.0) + col("tf").cast("double") /
      (lit(mu) * (col("cf").cast("double") / col("c_total").cast("double"))))
    joined
      .select(col(idCol), col("dl"), col("term"), contrib.as("s"))
      .groupBy(col(idCol), col("dl"))
      .agg(sort_array(collect_list(struct(col("term"), col("s"))))
        .as("__xs"),
        count(lit(1)).as("n_hit_terms"))
      .crossJoin(qstats)
      .select(col(idCol), col("dl"), col("n_hit_terms"),
        round(aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("s")) +
          col("n_q").cast("double") *
            (log(lit(mu)) - log(col("dl").cast("double") + lit(mu))) +
          col("const_q"), 6).as("qlm"))
      .orderBy(col("qlm").desc, col(idCol).asc)
      .limit(topK)
  }

  /** BM25 with pseudo-relevance feedback (Rocchio 1971 / the RM-style
    * two-round loop): run [[bm25Search]], treat its top `nFeedback`
    * documents as relevant, mine them for expansion terms, and re-score
    * with the expanded weighted query — the classic recall lever when
    * the seed terms under-describe the information need.
    *
    * Expansion selection is INTEGER-exact on purpose: candidates are
    * ranked by total term frequency inside the feedback docs (ties by
    * term), never by an FP score, so the chosen term set is trivially
    * engine-portable; a document-frequency cap (`maxDfFrac`) keeps
    * stopwords out, `minTermLen` drops debris. The round-2 score is
    * Σ w_t · contrib_t with the EXACT [[bm25Search]] contribution tree
    * and w = 1 for seeds, `expandWeight` for mined terms, folded in
    * pinned term order.
    *
    * Scale shape: round 1 is [[bm25Search]]; the feedback ids (≤
    * nFeedback) and expansion terms (≤ nExpand) are driver-bounded
    * collects (the ANN anchor contract); candidate df needs one
    * semi-joined distinct-(doc, term) pass over the corpus and round 2
    * one more tf pass over ~|seeds|+nExpand terms — both keyed aggs
    * with map-side partials.
    *
    * @return (doc_id, n_hit_terms, bm25) top-K by (score desc, id) */
  def bm25PrfSearch(
      docs: DataFrame,
      terms: Seq[String],
      topK: Int = 10,
      nFeedback: Int = 5,
      nExpand: Int = 8,
      expandWeight: Double = 0.4,
      maxDfFrac: Double = 0.2,
      minTermLen: Int = 3,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(nFeedback > 0 && nExpand > 0, "need feedback and expansion > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE corpus materialization + ONE doc-length frame for BOTH rounds
    // (optimization r17, guide §1.2 step 1): round 1 previously ran the
    // full [[bm25Search]] from the raw input — its own parquet scan chain,
    // its own docLens checkpoint and corpus rollup — and round 2 rebuilt
    // the identical docLens/corpus frames from this checkpoint. The
    // expression trees below are bm25Search's verbatim (same operand
    // order), so round-1 scores — and therefore the feedback set, the
    // expansion terms, and the final ranking — are bit-identical.
    val base = Fan.spread(docs.select(col(idCol), col(textCol)))
      .localCheckpoint(true) // round-1 tf + feedback mine + df census + round-2 tf
    val tok = base
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val nDocs = base.count()
    val docLens = base.select(col(idCol),
      size(filter(T.tokens(col(textCol)), tk => length(tk) > 0))
        .cast("long").as("dl"))
      .localCheckpoint() // corpus rollup + both scoring joins
    val corpus = broadcast(docLens.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl")))
    // the exact bm25Search contribution tree, shared by both rounds
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val nD = col("n_docs").cast("double")
    val bm25Idf = log(lit(1.0) + (nD - dfD + 0.5) / (dfD + 0.5))
    val contrib = bm25Idf * (tfD * (k1 + 1.0)) /
      (tfD + (lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) /
        col("avgdl"))))
    // round 1: bm25Search's plan over the shared frames
    val tf1 = tok.filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df1 = tf1.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val fbIds = tf1.join(broadcast(df1), "term")
      .join(docLens, idCol).crossJoin(corpus)
      .select(col(idCol), col("term"), contrib.as("s"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("term"), col("s")))).as("__xs"))
      .select(col(idCol),
        round(aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("s")), 6)
          .as("bm25"))
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(nFeedback)
      .select(col(idCol)).collect().map(_.getLong(0)).toSeq
    // candidate mining: total tf inside the feedback docs, integer-exact
    val cand = tok
      .filter(col(idCol).isin(fbIds: _*))
      .filter(length(col("term")) >= minTermLen &&
        !col("term").isin(terms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("stf"))
    // corpus df per candidate, stopword cap
    val candDf = tok
      .join(broadcast(cand.select(col("term"))), Seq("term"), "left_semi")
      .select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("cdf"))
    val expansion = cand.join(candDf, Seq("term"))
      .filter(col("cdf").cast("double") <=
        lit(maxDfFrac) * lit(nDocs.toDouble))
      .orderBy(col("stf").desc, col("term").asc)
      .limit(nExpand)
      .select(col("term")).collect().map(_.getString(0)).toSeq
    val weights = (terms.map((_, 1.0)) ++ expansion.map((_, expandWeight)))
      .toDF("term", "w")
    // round 2: the bm25Search expression tree times the term weight, over
    // the SAME docLens/corpus frames round 1 scored with
    val tf = tok.join(broadcast(weights), Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val joined = tf.join(broadcast(df), "term")
      .join(broadcast(weights), "term")
      .join(docLens, idCol).crossJoin(corpus)
    joined
      .select(col(idCol), col("term"), (contrib * col("w")).as("s"))
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("term"), col("s")))).as("__xs"),
        count(lit(1)).as("n_hit_terms"))
      .select(col(idCol), col("n_hit_terms"),
        round(aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("s")), 6)
          .as("bm25"))
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(topK)
  }

  /** TF-IDF "more-like-this": the top-k documents most cosine-similar
    * to a QUERY DOCUMENT over the sparse TF-IDF space — the
    * query-by-example retrieval leg ([[bm25Search]] answers term
    * queries; this answers "find documents like this one", the
    * curation/recommendation staple).
    *
    * Weights w = tf · ln(n_docs/df); candidates come from the POSTING
    * SLIVER of the query doc's terms (the corpus never cross-joins —
    * only docs sharing ≥ 1 query term are touched), with terms of
    * df > `maxDf` skipped for candidate generation AND scoring
    * (ubiquitous terms carry ~zero idf and their postings are the
    * whale; the skip is the standard stop-term trade, exact while the
    * guard is idle). Norms fold each doc's (term, w) list in PINNED
    * term order; the dot folds shared terms likewise, so every cosine
    * replays bit-for-bit in SQL list folds.
    *
    * @return (doc_id, n_shared_terms, cosine) top-k by cosine desc,
    *         ties by id; the query doc itself is excluded */
  def docSimilarity(
      docs: DataFrame,
      queryDocId: Long,
      topK: Int = 10,
      maxDf: Long = 1000000L,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(topK > 0 && maxDf > 0, "need positive topK/maxDf")
    val base = Fan.spread(docs.select(col(idCol), col(textCol)))
    val tf = base
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // df census + weights share the token pass
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val nDocs = broadcast(base.agg(count(lit(1)).as("n_docs")))
    val w = tf.join(dfc.hint("broadcast"), Seq("term")).crossJoin(nDocs)
      .select(col(idCol), col("term"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("w"))
      .localCheckpoint() // norms + query vector + dot all read it
    val norms = w.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("term"), col("w"))))
        .as("__ws"))
      .select(col(idCol),
        sqrt(aggregate(col("__ws"), lit(0.0),
          (acc, x) => acc + x.getField("w") * x.getField("w"))).as("norm"))
      .localCheckpoint() // query norm + candidate norms
    val qv = broadcast(w.filter(col(idCol) === queryDocId)
      .select(col("term"), col("w").as("qw")))
    val qn = broadcast(norms.filter(col(idCol) === queryDocId)
      .select(col("norm").as("qnorm")))
    val dots = w.join(qv, Seq("term"))
      .filter(col(idCol) =!= queryDocId)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_terms"),
        sort_array(collect_list(struct(col("term"),
          (col("w") * col("qw")).as("p")))).as("__ps"))
      .select(col(idCol), col("n_shared_terms"),
        aggregate(col("__ps"), lit(0.0),
          (acc, x) => acc + x.getField("p")).as("__dot"))
    dots.join(norms, Seq(idCol)).crossJoin(qn)
      .select(col(idCol), col("n_shared_terms"),
        round(col("__dot") / (col("qnorm") * col("norm")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(topK)
  }

  /** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    * sample raw-corpus docs whose hashed-n-gram profile looks like a
    * TARGET domain. The published recipe, Spark-shaped:
    *
    *  1. Feature space = unigrams+bigrams hashed into `buckets` buckets
    *     (portable md5 hash, so the whole computation replays in SQL).
    *  2. Fit two bag-of-grams distributions in ONE keyed aggregation over
    *     one scan: p̂ from the target docs (`source = targetSource`), q̂
    *     from the rest, both add-one smoothed. The totals derive from the
    *     ≤`buckets`-row count table (the lmScore cu-from-cb trick), not a
    *     second pass over the stream.
    *  3. Per-doc importance weight w = mean over the doc's grams of
    *     log p̂[h(g)] − log q̂[h(g)], folded in gram position order so the
    *     double replays hash-exact (the lm_score pattern).
    *  4. Gumbel top-n WITHOUT replacement: key = w + Gumbel(0,1) with the
    *     Gumbel drawn from the doc-id's md5-uniform — deterministic,
    *     seed-stable, and equivalent to softmax-weighted sampling without
    *     replacement (Vieira 2014).
    *
    * Scale shape: the log-ratio table is ≤`buckets` rows and BROADCASTS
    * to the probe join, so scoring is explode → broadcast-join → one
    * per-doc aggregation; the only wide shuffles touch bucket counts
    * (bounded) and per-doc rows. Docs with no grams (empty text) carry no
    * signal and are excluded by construction.
    *
    * Reference surface: none (beyond-reference curation op per the
    * brief); the sampling determinism matches the engine-portable
    * md5-uniform contract of [[hashSample]] / [[weightedSample]].
    */
  def dsirSample(
      docs: DataFrame,
      targetSource: String = "src0",
      buckets: Int = 1024,
      n: Int = 100,
      hashSeed: Long = 17L,
      gumbelSeed: Long = 19L,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    import graft.functions.{HashFunctions => H}
    val spark = docs.sparkSession
    val toks = filter(T.tokens(col(textCol)), t => length(t) > 0)
    // eager localCheckpoint (optimization r17): hb has TWO consumers — the
    // bucket census and the per-doc scoring join — whose exchanges differ,
    // so without materialization the tokenize → gram-explode → md5 hot
    // loop executes twice (measured as two ~1 s duplicate stages at
    // sf0.1). The checkpointed frame is slim: (id, source, pos, bucket).
    val hb = Fan.spread(docs.select(col(idCol), col(sourceCol), col(textCol)))
      .select(col(idCol), col(sourceCol),
        posexplode(Frequency.gramsArray(toks)).as(Seq("pos", "gram")))
      .select(col(idCol), col(sourceCol), col("pos"),
        pmod(H.md5Bucket(hashSeed, col("gram")), lit(buckets.toLong)).as("b"))
      .localCheckpoint()
    val isTarget = col(sourceCol) === targetSource
    val counts = hb
      .groupBy(col("b"))
      .agg(
        sum(when(isTarget, 1L).otherwise(0L)).as("cp"),
        sum(when(isTarget, 0L).otherwise(1L)).as("cq"))
    val totals = broadcast(counts.agg(
      sum(col("cp")).as("tp"), sum(col("cq")).as("tq")))
    val bD = buckets.toDouble
    val lr = broadcast(
      spark.range(buckets).select(col("id").as("b"))
        .join(counts, Seq("b"), "left")
        .crossJoin(totals)
        .select(col("b"),
          (log((coalesce(col("cp"), lit(0L)).cast("double") + 1.0) /
               (col("tp").cast("double") + bD)) -
           log((coalesce(col("cq"), lit(0L)).cast("double") + 1.0) /
               (col("tq").cast("double") + bD))).as("lr")))
    val uniform =
      (H.md5Bucket(gumbelSeed, col(idCol)).cast("double") + 0.5) / 4294967296.0
    hb.filter(col(sourceCol) =!= targetSource)
      .join(lr, Seq("b"))
      .groupBy(col(idCol), col(sourceCol))
      .agg(
        sort_array(collect_list(struct(col("pos"), col("lr")))).as("__xs"),
        count(lit(1)).as("ng"))
      .select(col(idCol), col(sourceCol),
        (aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("lr")) /
          col("ng").cast("double")).as("w"))
      .withColumn("gkey", round(col("w") + -log(-log(uniform)), 6))
      .orderBy(col("gkey").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col(sourceCol),
        round(col("w"), 6).as("dsir_w"), col("gkey"))
  }

  /** Content-defined chunking via winnowing boundaries: split every
    * document at the positions its winnowing sketch selects
    * ([[org.apache.spark.sql.graft.WinnowFingerprints]] — robust local
    * hash minima), emitting (chunk_idx, start_pos, chunk_len, chunk_md5)
    * per chunk. Because boundaries are CONTENT-defined, an insertion
    * early in a document shifts only the chunks it touches — later
    * chunk hashes are unchanged, which is the property that makes
    * sub-document dedup across near-identical docs work (fixed-size
    * chunking re-keys everything after an edit). Chunk md5s are the
    * dedup keys; [[Dedup.exact]]-style grouping on `chunk_md5` then
    * finds shared runs across documents.
    *
    * Zero shuffle: the boundary array, the chunk fan-out, and the chunk
    * hashes are all row-local codegen projections (one native winnow
    * pass + array HOFs + substr/md5). Documents shorter than `k` produce
    * one whole-document chunk (the winnow array is empty, the prepended
    * doc-start boundary remains). */
  def cdcChunks(
      docs: DataFrame,
      k: Int = 5,
      w: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val wfs = org.apache.spark.sql.graft.TextExpressionFunctions
      .winnowColumn(col(textCol), k, w)
    // 1-based char boundaries: doc start + each selected gram start
    // (winnow positions are 0-based)
    val bounds = array_sort(array_distinct(concat(
      array(lit(1L)),
      transform(wfs, x => x("pos").cast("long") + 1L))))
    val chunks = transform(
      sequence(lit(0), size(col("__b")) - 1),
      j => struct(
        (j + 1).cast("long").as("chunk_idx"),
        element_at(col("__b"), j + 1).as("start_pos"),
        // try_element_at: the last chunk's j+2 lookup is past the end
        // (ANSI element_at throws there) and falls back to doc end
        (coalesce(try_element_at(col("__b"), j + 2),
          length(col(textCol)).cast("long") + 1L)
          - element_at(col("__b"), j + 1)).as("chunk_len")))
    Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), col(textCol), bounds.as("__b"))
      .select(col(idCol), col(textCol), explode(chunks).as("c"))
      .select(col(idCol),
        col("c.chunk_idx").as("chunk_idx"),
        col("c.start_pos").as("start_pos"),
        col("c.chunk_len").as("chunk_len"),
        md5(col(textCol).substr(
          col("c.start_pos").cast("int"),
          col("c.chunk_len").cast("int"))).as("chunk_md5"))
  }

  /** Chunk-level duplication score — the consumer [[cdcChunks]] exists
    * for: every chunk whose md5 appears in MORE THAN ONE document is
    * duplicated sub-document content, and each document is scored by the
    * fraction of its character mass such chunks carry. Catches partial
    * copies (quoted passages, syndicated boilerplate, template middles)
    * that document-level dedup misses entirely and line-level dedup only
    * catches when the copy aligns with line breaks. One keyed agg over
    * the slim (md5, doc, len) chunk frame + one join back — the chunk
    * frame itself is the zero-shuffle [[cdcChunks]] projection. */
  def chunkDupScore(
      docs: DataFrame,
      k: Int = 5,
      w: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // eager localCheckpoint (the minhashLsh policy): three differently-
    // shaped consumers (md5 census, semi-join probe, per-doc totals)
    // would otherwise each re-run the winnow pass + chunk fan-out —
    // exchange reuse cannot collapse them
    val chunks = cdcChunks(docs, k, w, textCol, idCol)
      .select(col(idCol), col("chunk_len"), col("chunk_md5"))
      .localCheckpoint()
    val shared = chunks
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("chunk_md5"))
    chunks
      .join(shared, Seq("chunk_md5"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_chunks"),
        sum(col("chunk_len")).as("dup_len"))
      .join(
        chunks.groupBy(col(idCol))
          .agg(count(lit(1)).as("n_chunks"),
            sum(col("chunk_len")).as("total_len")),
        Seq(idCol), "right")
      .select(col(idCol),
        col("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        col("total_len"),
        coalesce(col("dup_len"), lit(0L)).as("dup_len"),
        (coalesce(col("dup_len"), lit(0L)).cast("double") /
          greatest(col("total_len"), lit(1L)).cast("double")).as("dup_frac"))
  }

  /** Gini–Simpson diversity of the token distribution per language —
    * the "how repetitive is this slice of the corpus" scalar (1 − the
    * probability two random tokens coincide): near 1 for rich natural
    * text, collapsing toward 0 for template/boilerplate floods. The
    * vocabulary-size companion ([[vocabTopK]] names the heavy tokens;
    * this says how much mass they hoard), and the unbiased finite-sample
    * form 1 − Σ nₜ(nₜ−1)/(N(N−1)).
    *
    * Shape + exactness: one (lang, term) keyed count over the exploded
    * token stream (map-side partials — the only corpus-scale shuffle),
    * then a per-lang rollup of the vocab frame. nₜ(nₜ−1) accumulates as
    * the exact DECIMAL(19,0)² product (a whale token's count squares
    * past 2⁶³ at corpus scale); the final index is one IEEE expression
    * from exact operands. Languages need N ≥ 2.
    *
    * @return (lang, n_tokens, vocab, simpson), 6-rounded */
  def tokenSimpsonDiversity(
      docs: DataFrame,
      langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val tf = Fan.spread(docs.select(col(langCol).as("lang"), col(textCol)))
      .select(col("lang"),
        explode(filter(T.tokens(col(textCol)), t => length(t) > 0))
          .as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("__nt"))
    val byLang = tf.groupBy(col("lang"))
      .agg(sum(col("__nt")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("__nt").cast("decimal(19,0)") *
          (col("__nt") - 1L).cast("decimal(19,0)")).as("__s2"))
      .filter(col("n_tokens") >= 2)
    byLang.select(col("lang"), col("n_tokens"), col("vocab"),
      round(lit(1.0) - col("__s2").cast("double") /
        (col("n_tokens").cast("double") *
          (col("n_tokens").cast("double") - lit(1.0))), 6).as("simpson"))
  }

  /** Cumulative vocabulary-growth curve (the Heaps-law report): for every
    * document in id order, the running token total and the running
    * DISTINCT-term total V(n) — the curve that tells a corpus run whether
    * its vocabulary is still growing (fresh content) or saturating
    * (duplication / template text), and what a tokenizer's vocab budget
    * buys at each corpus size.
    *
    * Shape: per-doc token counts are a row-local projection (no explode);
    * the distinct-term side explodes ONCE into a (term → min doc_id)
    * keyed agg — a term contributes to the curve exactly at its first
    * document — then collapses to one slim row per first-seen doc. The
    * two running sums use the same two-pass banded prefix pattern as
    * [[packSequences]] (per-band partitioned windows + broadcast band
    * offsets): no global single-partition window at any corpus size.
    * Integer sums only, so the whole curve replays exactly in SQL. */
  def vocabGrowth(
      docs: DataFrame,
      docsPerBand: Long = 10000L,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(docsPerBand > 0, "positive band size")
    import org.apache.spark.sql.expressions.Window
    val toks = filter(T.tokens(col(textCol)), t => length(t) > 0)
    val firstSeen = Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(toks).as("term"))
      .groupBy(col("term")).agg(min(col(idCol)).as("__fd"))
    val newPerDoc = firstSeen.groupBy(col("__fd"))
      .agg(count(lit(1)).as("new_terms"))
      .withColumnRenamed("__fd", idCol)
    val base = docs.select(col(idCol),
        size(toks).cast("bigint").as("n_tokens"))
      .join(newPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .withColumn("__band", floor(col(idCol) / docsPerBand).cast("long"))
      .localCheckpoint() // pass 1's collect + pass 2 share the blocks
    // pass 1: the shared guarded census (Banded owns the maxBands
    // fail-fast); both running sums ride ONE collect + prefix scan
    val (offRows, _) = Banded.bandCensusN(
      base.select(col("__band"), col("n_tokens"), col("new_terms")),
      Seq.empty, Seq("n_tokens", "new_terms"))
    val offsets = offRows.map { case (_, b, offs) => (b, offs(0), offs(1)) }
    val spark = docs.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF("__band", "__offT", "__offV")
    val w = Window.partitionBy(col("__band")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsetsDf), Seq("__band"))
      .select(col(idCol), col("n_tokens"), col("new_terms"),
        (sum(col("n_tokens")).over(w) + col("__offT")).as("cum_tokens"),
        (sum(col("new_terms")).over(w) + col("__offV")).as("cum_vocab"))
  }

  /** Heaps'-law fit V ≈ k·Tᵝ over the [[vocabGrowth]] curve — the
    * scaling-law companion of [[graft.operators.Reports.zipfFit]] (Zipf
    * describes the frequency spectrum at one corpus size; Heaps predicts
    * how the VOCABULARY grows as the corpus does — the number every
    * tokenizer-budget and dedup-rate extrapolation to 100 TB rests on;
    * β ≈ 0.4–0.6 for natural text, → 1 for id-like token floods).
    *
    * Scale shape: the fit reads the growth curve only at doc positions
    * where `doc_id + 1` is a power of two — ≤ 64 GEOMETRICALLY-spaced
    * points at ANY corpus size (log-log OLS wants them uniform in log T
    * anyway; dense sampling would over-weight the tail AND make the fold
    * corpus-scale). OLS runs the [[graft.operators.Reports.zipfFit]]
    * discipline: one sorted ≤64-point array, per-moment pinned folds,
    * IEEE finish with nullif-guarded denominators, explicit a·a squares.
    *
    * @return one row (n_points, beta, k, r2), 6-rounded; NULL beta on a
    *         degenerate (< 2 distinct points) curve */
  def heapsFit(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val curve = vocabGrowth(docs, textCol = textCol, idCol = idCol)
      .filter(expr(s"(($idCol + 1) & $idCol) = 0"))
      .filter(col("cum_tokens") > 0 && col("cum_vocab") > 0)
    val pts = sort_array(collect_list(struct(col(idCol),
      log(col("cum_tokens").cast("double")).as("x"),
      log(col("cum_vocab").cast("double")).as("y"))))
    def fold(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(col("__pts"), f), lit(0.0), (a, b) => a + b)
    curve.agg(pts.as("__pts"))
      .select(size(col("__pts")).cast("long").as("n_points"),
        fold(p => p.getField("x")).as("__sx"),
        fold(p => p.getField("y")).as("__sy"),
        fold(p => p.getField("x") * p.getField("y")).as("__sxy"),
        fold(p => p.getField("x") * p.getField("x")).as("__sxx"),
        fold(p => p.getField("y") * p.getField("y")).as("__syy"))
      .select(col("n_points"), col("__sx"), col("__sy"), col("__sxy"),
        col("__sxx"), col("__syy"),
        ((col("n_points") * col("__sxy") - col("__sx") * col("__sy")) /
          nullif(col("n_points") * col("__sxx") - col("__sx") * col("__sx"),
            lit(0.0))).as("__beta"))
      .select(col("n_points"),
        round(col("__beta"), 6).as("beta"),
        round(exp((col("__sy") - col("__beta") * col("__sx")) /
          col("n_points")), 6).as("k"),
        round(
          (col("n_points") * col("__sxy") - col("__sx") * col("__sy")) *
            (col("n_points") * col("__sxy") - col("__sx") * col("__sy")) /
            nullif(
              (col("n_points") * col("__sxx") - col("__sx") * col("__sx")) *
                (col("n_points") * col("__syy") - col("__sy") * col("__sy")),
              lit(0.0)), 6).as("r2"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    * the word co-occurrence graph — the unsupervised keyword ranker
    * that beats raw frequency by rewarding words that co-occur with
    * other WELL-CONNECTED words. Edges are [[skipgramPairs]]' window-2
    * co-occurrence table (symmetric by construction: (a,b) and (b,a)
    * both materialize, so the directed walk IS the undirected one);
    * ranks are [[graft.operators.Graphs.pageRank]]'s EXACT-integer ppm
    * semantics (truncating div, no FP fold to pin), so the top-k
    * replays as unrolled SQL CTEs.
    *
    * Scale shape: one corpus-scale keyed pair count, then every
    * iteration runs on the vocab²-bounded edge frame; the cut plans as
    * TakeOrderedAndProject under the (rank desc, term) total order.
    *
    * @return top-`topK` rows: (term, rank_ppm) */
  def textRank(
      docs: DataFrame,
      window: Int = 2,
      iters: Int = 3,
      topK: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val pairs = skipgramPairs(docs, window, minCount = 1L, textCol, idCol)
      .localCheckpoint() // edges + the node census share it
    val edges = pairs.select(col("center").as("src"),
      col("context").as("dst"))
    // skipgram pairs are symmetric, so the center set IS the node set
    val nodes = pairs.select(col("center").as("id")).distinct()
    Graphs.pageRank(edges, nodes, iters)
      .orderBy(col("rank_ppm").desc, col("id").asc)
      .limit(topK)
      .select(col("id").as("term"), col("rank_ppm"))
  }

  /** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010):
    * candidate phrases are maximal runs of non-stopword tokens; each
    * word scores deg(w)/freq(w) over the phrase table (deg = Σ phrase
    * length across the word's phrase occurrences — co-occurrence-
    * weighted; freq = plain occurrence count), and a phrase scores the
    * sum of its members' scores. Multi-word technical terms ("sort
    * merge join") outrank bare frequent words — the cheap,
    * language-agnostic keyword tier under [[textRank]]'s graph one.
    *
    * Shape: one posexplode + ONE doc-partitioned window builds the
    * phrase islands (gaps-and-islands: pos − row_number over non-stop
    * rows); word stats are two keyed aggs over the phrase-member frame
    * (vocab-bounded); phrase scores fold member scores in PINNED
    * position order so the IEEE sum replays; the final cut is
    * TakeOrderedAndProject under (score desc, phrase).
    *
    * @param maxPhraseLen longer runs are DROPPED (RAKE's degenerate
    *        tail: a stopword-free document would otherwise be one
    *        giant phrase)
    * @return top-`topK` rows: (phrase, n_words, n_occurrences,
    *         rake_score), score 6-rounded */
  def rakeKeywords(
      docs: DataFrame,
      stopwords: Seq[String],
      maxPhraseLen: Int = 3,
      topK: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(stopwords.nonEmpty, "RAKE needs a stopword set")
    require(maxPhraseLen >= 1, s"maxPhraseLen must be >= 1: $maxPhraseLen")
    import org.apache.spark.sql.expressions.Window
    val toks = Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__doc"),
        posexplode(filter(T.tokens(col(textCol)), t0 => length(t0) > 0))
          .as(Seq("__pos", "__w")))
      .filter(!col("__w").isInCollection(stopwords))
    val byDoc = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
    val members = toks
      .withColumn("__isl", col("__pos") - row_number().over(byDoc))
      .localCheckpoint(true) // phrase agg + word stats share it
    val phrases = members
      .groupBy(col("__doc"), col("__isl"))
      .agg(count(lit(1)).as("__len"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("__pos"), col("__w")))),
          s0 => s0.getField("__w"))).as("phrase"))
      .filter(col("__len") <= maxPhraseLen)
      .localCheckpoint(true) // member re-join + occurrence agg share it
    // word stats over PHRASE members (RAKE scores words by the company
    // they keep inside phrases, not raw corpus frequency)
    val stats = members
      .join(phrases.select(col("__doc"), col("__isl"), col("__len")),
        Seq("__doc", "__isl"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("__w"),
        (col("__deg").cast("double") / col("__freq").cast("double"))
          .as("__score"))
    val phraseScores = members
      .join(phrases.select(col("__doc"), col("__isl"), col("__len"),
        col("phrase")), Seq("__doc", "__isl"))
      .join(stats, Seq("__w"))
      .groupBy(col("__doc"), col("__isl"), col("phrase"), col("__len"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("__pos"), col("__score")))),
        lit(0.0), (acc, c) => acc + c.getField("__score")).as("__ps"))
    phraseScores
      .groupBy(col("phrase"), col("__len"))
      .agg(count(lit(1)).as("n_occurrences"), max(col("__ps")).as("__s"))
      .select(col("phrase"), col("__len").as("n_words"),
        col("n_occurrences"), round(col("__s"), 6).as("rake_score"))
      .orderBy(col("rake_score").desc, col("phrase").asc)
      .limit(topK)
  }
}
