package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Affinity, Curation, Dedup, Joins}

/** Scale-up stress: synthesize an n-doc corpus engine-side (no driver
  * data, fully codegen'd generation) and run the heavy operators,
  * printing one JSON line of wall times. Used to sanity-check that the
  * operator plans survive 10–40× the bench scale factor —
  * `sbt "runMain graft.tools.StressScale 50000"`. */
object StressScale {

  private val words = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "join", "query", "batch",
    "window", "spark", "order", "data", "column", "small", "line",
    "customer", "filter", "the", "a", "of", "and", "index", "plan", "sort")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = Tables.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    import spark.implicits._

    val vocab = array(words.map(lit): _*)
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 50).map(i =>
        element_at(vocab,
          (pmod(xxhash64(col("id"), lit(i)), lit(words.size)) + 1).cast("int"))): _*)
        .as("text"),
      (col("id") % 20).cast("string").as("source"))
      .persist()
    docs.count()

    def time(label: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      (label, (System.nanoTime() - t0) / 1e9, rows)
    }

    // noop-sink timing (count() would let Catalyst prune the projections
    // being measured); the untimed count afterwards is only the row tally.
    // BY-NAME df: several operators do real work at DataFrame CONSTRUCTION
    // (eager localCheckpoints of shared frames, driver-side codebook /
    // anchor training) — a by-value parameter would evaluate all of that
    // before the timer starts and under-report exactly the operators
    // whose materialization discipline is the point being measured.
    def timeNoop(label: String)(dfThunk: => org.apache.spark.sql.DataFrame): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val df = dfThunk
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      (label, secs, df.count())
    }

    // synthetic event stream at the same row scale: ~100 events/user
    // spread over 30 days (µs), split into two interleaved streams
    val spanUs = 30L * 24 * 3600 * 1000000L
    val events = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % greatest(lit(n / 100L), lit(1L))).as("user_id"),
      pmod(xxhash64(col("id")), lit(spanUs)).as("ts"))
      .persist()
    events.count()
    // deterministic 64-dim embeddings in [-1, 1) for the int8 ANN path
    val emb = spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => ((pmod(xxhash64(col("id"), i), lit(2000)) - 1000)
          .cast("double") / 1000.0).cast("float")).as("embedding"))
      .persist()
    emb.count()
    // adversarially SKEWED embeddings: half the corpus collapses into one
    // semantic cluster (first coord ~1, tiny noise elsewhere) — one whale
    // cell that no anchor count can split; the other half stays uniform
    val embSkew = spark.range(n).select(
      col("id").as("vec_id"),
      when(col("id") % 2 === 0,
        transform(sequence(lit(0), lit(63)),
          i => (when(i === lit(0), lit(1000.0))
            .otherwise((pmod(xxhash64(col("id"), i), lit(20)) - 10).cast("double"))
            / 1000.0).cast("float")))
        .otherwise(transform(sequence(lit(0), lit(63)),
          i => ((pmod(xxhash64(col("id"), i), lit(2000)) - 1000)
            .cast("double") / 1000.0).cast("float"))).as("embedding"))
      .persist()
    embSkew.count()

    // scratch warehouse for the persisted-graph amortization rows
    val stressWhDir =
      java.nio.file.Files.createTempDirectory("graft_stress_wh").toString

    // family-structured hash-word corpus for the EXACT set-similarity
    // join (the StressPipeline construction): 5-member families sharing
    // 50 tokens except one salted position per member — cross-family
    // word-shingle Jaccard ≈ 0, so candidates stay pinned to the planted
    // families. The uniform 30-word corpus above would instead be one
    // giant prefix-df whale (that guard regime is covered by the
    // DedupSpec subset test, not a timing row).
    val famDocs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 50).map { i =>
        val fam = floor(col("id") / lit(5)).cast("long")
        val member = (col("id") % 5L).cast("int")
        val base = concat(lit("w"),
          pmod(xxhash64(fam, lit(i)), lit(1000000L)).cast("string"))
        if (i % 9 == 0)
          when(member === lit(i / 9),
            concat(base, lit("_"), member.cast("string"))).otherwise(base)
        else base
      }: _*).as("text"))
      .persist()
    famDocs.count()

    // shared-shingle adversary corpus: the first 1000 docs are IDENTICAL
    // (one 1000-strong duplicate family — every shingle df=1000), the
    // rest carry unique hash words. Built for the prefix-filter guard
    // pair below; sized so the exact run's C(1000,2) verification stays
    // a timing row, not a hang
    val advDocs = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") < 1000L,
        concat_ws(" ", (0 until 50).map(i => lit(s"dup$i")): _*))
        .otherwise(concat_ws(" ", (0 until 50).map(i =>
          concat(lit("u"), pmod(xxhash64(col("id"), lit(i)),
            lit(100000000L)).cast("string"))): _*))
        .as("text"))
      .persist()
    advDocs.count()

    // 2M-event stream (10x the corpus row scale) for the DAU/WAU
    // expansion claim: ~20k users over the same 30-day span
    val events2m = spark.range(2000000L).select(
      col("id").as("event_id"),
      (col("id") % 20000L).as("user_id"),
      pmod(xxhash64(col("id")), lit(30L * 24 * 3600 * 1000000L)).as("ts"))
      .persist()
    events2m.count()

    // 2M-doc corpus on the SAME 30-word vocabulary as `docs` (10x the
    // corpus tier): the 2M tier for the corpus-scale text operators
    // whose working frames are vocabulary-bounded (text_rank's word
    // graph, rake's word-score table) — the measured cost is the token
    // explode, which is what must scale
    val docs2mVocab = spark.range(2000000L).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 50).map(i =>
        element_at(vocab,
          (pmod(xxhash64(col("id"), lit(i)), lit(words.size)) + 1).cast("int"))): _*)
        .as("text"),
      (col("id") % 20).cast("string").as("source"))
      .persist()
    docs2mVocab.count()

    val lhs = events.filter(col("event_id") % 2 === 0)
    val rhs = events.filter(col("event_id") % 2 === 1)
      .select(col("event_id").as("rid"), col("user_id"), col("ts"))
    val pts = events.filter(col("event_id") % 10 === 0)
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val ivs = events.filter(col("event_id") % 10 === 5)
      .select(col("event_id").as("i_id"),
        (col("ts") - 300000000L).as("w_start"), (col("ts") + 300000000L).as("w_end"))

    val results = Seq(
      time("dedup_exact")(Dedup.exact(docs).count()),
      time("minhash_fast")(
        Dedup.minhashLsh(docs, k = 16, bands = 4, tier = Dedup.FastXx).count()),
      time("simhash_hamming")(Dedup.simhashNearDup(docs, maxHamming = 2).count()),
      time("curate")(Curation.curate(docs).count()),
      time("clusters_fast")(
        Dedup.connectedComponents(
          Dedup.minhashLsh(docs, k = 16, bands = 4, tier = Dedup.FastXx)).count()),
      // the two applyClusters regimes at stress scale (optimization r18,
      // VERDICT r17 #1): identical cluster build, broadcast anti-join vs
      // the FORCED loser-id Bloom route — the pair shows the bloom tier's
      // cost stays in the broadcast tier's ballpark while its plan keeps
      // the anti-join exchange to the bloom-positive sliver
      timeNoop("dedup_apply_bcast")(Dedup.applyClusters(docs,
        Dedup.connectedComponents(
          Dedup.minhashLsh(docs, k = 16, bands = 4, tier = Dedup.FastXx)))),
      timeNoop("dedup_apply_bloom")(Dedup.applyClusters(docs,
        Dedup.connectedComponents(
          Dedup.minhashLsh(docs, k = 16, bands = 4, tier = Dedup.FastXx)),
        maxBroadcastLosers = 0L)),
      timeNoop("asof_join")(
        Joins.asOfJoin(lhs, rhs, Seq("user_id"), "ts", "rid", Seq("rid"))),
      timeNoop("asof_join_forward")(
        Joins.asOfJoinForward(lhs, rhs, Seq("user_id"), "ts", "rid",
          Seq("rid"), maxHorizon = Some(86400000000L))),
      timeNoop("range_join")(
        Joins.rangeJoin(pts, ivs, "p_ts", "w_start", "w_end",
          binWidth = 600000000L)),
      timeNoop("tfidf_topk")(Curation.tfidfTopTerms(docs)),
      timeNoop("weighted_sample")(
        Curation.weightedSample(
          docs.withColumn("w", col("doc_id") % 97 + 1), "w", k = 1000)),
      // adversarial for substring spans: 3-grams over the 30-word vocab
      // (27k possible grams ≪ corpus grams) make nearly every position a
      // repeated hit, so the span-merge window sees ~n*48 rows and every
      // doc collapses to one wall-to-wall span — the worst case for the
      // gram join AND the merge window
      timeNoop("substring_spans")(
        Dedup.repeatedSubstringSpans(docs, gramN = 3)),
      // exact tier over the same corpus: 5-grams over a 30-word vocab
      // give ~2M random cross-doc gram collisions — a full-weight pair
      // join whose aligned runs then (correctly) almost never reach
      // minLen, so the census + join stages carry the cost
      timeNoop("substring_exact")(
        Dedup.repeatedSubstringSpansExact(docs, minLen = 10, gramN = 5)),
      // int8 retrieval at corpus scale: 32 queries against all n docs
      // (embeddings pre-materialized so generation isn't timed)
      timeNoop("knn_int8")(graft.operators.Similarity.bruteForceTopKInt8(
        emb, emb.filter(col("vec_id") < 32), k = 10)),
      // corpus-trained bigram LM over every doc: the heaviest token-stream
      // op (explode + window + two keyed counts + re-join)
      timeNoop("lm_score")(graft.operators.Quality.lmScore(docs)),
      timeNoop("gopher_rules")(graft.operators.Quality.gopherRules(docs)),
      // kNN graph with cells sized n/256: per-cell quadratic at its
      // contract boundary (anchors = first 256 vectors)
      timeNoop("knn_graph") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        graft.operators.Similarity.knnGraph(emb, anchors, k = 5)
      },
      // the SAME graph over the skewed corpus with the subSplit guard at
      // 1000: the n/2-row whale cell hash-splits into ~n/2000 sub-cells,
      // so wall time stays linear-ish instead of quadratic in the whale
      timeNoop("knn_graph_skew") {
        val anchors = embSkew.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        graft.operators.Similarity.knnGraph(embSkew, anchors, k = 5,
          maxCellSize = 1000)
      },
      timeNoop("bm25_search")(
        Curation.bm25Search(docs, Seq("spark", "merge", "customer"), topK = 100)),
      // PQ at corpus scale: encode is a zero-shuffle projection; topk
      // joins the code stream against a broadcast 32x8x16 distance table
      timeNoop("pq_encode") {
        val cb = graft.operators.Similarity.pqTrainSeed(emb, m = 8, kPerSub = 16, dim = 64)
        graft.operators.Similarity.pqEncode(emb, cb)
      },
      timeNoop("pq_topk_rerank") {
        val cb = graft.operators.Similarity.pqTrainSeed(emb, m = 8, kPerSub = 16, dim = 64)
        graft.operators.Similarity.pqTopKRerank(
          emb, emb.filter(col("vec_id") < 32), cb, k = 10, shortlist = 100)
      },
      // the trained tier end-to-end: m × iters Lloyd passes + the same
      // ADC/re-rank retrieval (training dominates; it amortizes over
      // every query the codebook serves)
      timeNoop("pq_kmeans_rerank") {
        val cb = graft.operators.Similarity.pqTrainKmeans(
          emb, m = 8, kPerSub = 16, dim = 64, iters = 2)
        graft.operators.Similarity.pqTopKRerank(
          emb, emb.filter(col("vec_id") < 32), cb, k = 10, shortlist = 100)
      },
      // IVF-PQ (IVFADC) at corpus scale: 256-cell coarse quantizer,
      // residual codebook, 32 queries probing 8 cells each — the scored
      // stream is ~n/32 of the corpus' code rows, everything else is
      // projections + broadcast joins
      timeNoop("ivfpq_topk") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        val res = graft.operators.Similarity.ivfResiduals(emb, anchors)
        val cb = graft.operators.Similarity.pqTrainSeed(
          res, m = 8, kPerSub = 16, dim = 64, vecCol = "rv")
        graft.operators.Similarity.ivfPqTopK(
          emb, emb.filter(col("vec_id") < 32), anchors, cb, k = 10, nProbe = 8)
      },
      timeNoop("semantic_dedup") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        graft.operators.Dedup.semanticDedup(emb, anchors, 0.9)
      },
      // winnowing at ~250 chars/doc: the native one-pass selection (no
      // shuffle; only survivors explode)
      timeNoop("winnow_fp") {
        docs.filter(length(col("text")) >= 5)
          .select(col("doc_id"),
            explode(org.apache.spark.sql.graft.TextExpressionFunctions
              .winnowColumn(col("text"), 5, 4)).as("w"))
          .select(col("doc_id"), col("w.pos").as("pos"), col("w.fp").as("fp"))
      },
      // ...and the MOSS pair-join step over those fingerprints
      timeNoop("winnow_pairs")(
        Dedup.winnowPairs(docs, k = 5, w = 4, minShared = 8, maxFpDf = 200)),
      timeNoop("quality_classifier")(
        graft.operators.Quality.linearClassifier(docs)),
      // CMS heavy hitters: the fused summary pass (MG + CMS in one job)
      // + the bounded-candidate recount — two corpus scans total
      timeNoop("cms_heavy_hitters")(
        graft.operators.Frequency.cmsHeavyHitters(docs, k = 512)),
      // PageRank over the 200k-vector kNN graph: 3 iterations over ~1M
      // edges after the one-time checkpoint of the edge frame
      timeNoop("pagerank_knn") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        val edges = graft.operators.Similarity.knnGraph(emb, anchors, k = 5)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        graft.operators.Graphs.pageRank(edges,
          emb.select(col("vec_id").as("id")), iters = 3)
      },
      // vocab growth: one explode + first-seen agg + banded prefix sums
      timeNoop("vocab_growth")(
        graft.operators.Curation.vocabGrowth(docs)),
      // the corpus reports: diff (two keyed aggs + full-outer), spectrum
      // (two keyed aggs), per-source deciles (partitioned ntile)
      timeNoop("corpus_diff")(
        graft.operators.Reports.corpusDiff(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 7 =!= 0))),
      timeNoop("freq_spectrum")(
        graft.operators.Reports.freqSpectrum(docs)),
      timeNoop("quality_deciles")(
        graft.operators.Reports.qualityDeciles(docs)),
      // CDC chunk fan-out + the chunk-level dup census at dedup-tier
      // parameters (k=8/w=16): the chunk frame is a zero-shuffle
      // projection; the census is one keyed agg over slim rows
      timeNoop("chunk_cdc")(
        graft.operators.Curation.cdcChunks(docs, k = 8, w = 16)),
      timeNoop("dedup_chunks")(
        graft.operators.Curation.chunkDupScore(docs, k = 8, w = 16)),
      timeNoop("blocklist_gate")(
        graft.operators.Quality.blocklistGate(docs,
          terms = Seq("merge", "window"), phrases = Seq("fast table"))),
      // production tier (xxhash64) at the QUERY's banding (k=8, bands=4):
      // this 30-word-vocab corpus is the adversarial everything-collides
      // case — the bucket guard bounds candidates near minhash_fast's
      // ~25M pairs, and bands=8 doubled that into heap territory (the
      // md5 oracle tier measured 63.6 s at bands=8 before OOM margins)
      timeNoop("split_leakage")(
        graft.operators.Reports.splitLeakage(docs,
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
          minJaccard = 0.5, k = 8, bands = 4,
          tier = graft.operators.Dedup.FastXx)),
      timeNoop("hard_negatives") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        graft.operators.Similarity.hardNegatives(emb, anchors, k = 5,
          dupThreshold = 0.9)
      },
      timeNoop("vocab_coverage")(Curation.vocabCoverage(docs)),
      // bloom decontamination: benchmark = 1/20 of the corpus; the corpus
      // side must stay shuffle-free at any n
      timeNoop("decon_bloom")(Curation.decontaminateBloom(
        docs.filter(col("source") =!= "0"), docs.filter(col("source") === "0"),
        shingleN = 3, maxOverlap = 0.2)),
      timeNoop("cluster_topics") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        graft.operators.Similarity.clusterTopics(docs, emb, anchors, topK = 5)
      },
      // HLL sketch over the event stream: 16 groups, n/100 distinct users
      timeNoop("hll_distinct")(
        events.groupBy((col("event_id") % 16).as("etype"))
          .agg(org.apache.spark.sql.graft.SketchFunctions
            .hllCount(when(col("user_id").isNotNull,
              xxhash64(col("user_id")))).as("hll_users"))),
      // robust stats: two per-group window sorts + two keyed aggs over
      // the 20-source corpus — the sorts partition by source
      timeNoop("robust_stats")(
        graft.stats.Descriptive.robustGroupStats(
          docs.select(col("source"), length(col("text")).as("len")),
          "source", col("len"))),
      // ECDF normalization on the value histogram (no per-row window)
      timeNoop("quality_ecdf")(
        graft.operators.Quality.ecdfByGroup(
          graft.operators.Fan.spread(docs)
            .select(col("doc_id"), col("source"),
              length(col("text")).cast("double").as("q")),
          "source", "q")),
      // 5-gram novelty: distinct-gram left join, ref = 1/10 of corpus
      timeNoop("ngram_novelty")(
        Curation.ngramNovelty(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0), n = 5)),
      // backoff LM: gram tables from the 1/10 train slice, four
      // vocab-scale joins over the 9/10 scored trigram stream
      timeNoop("lm_backoff")(
        graft.operators.Quality.lmScoreBackoff(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0))),
      // hybrid fusion: both legs run at corpus scale, fusion is
      // shortlist-scale on top
      timeNoop("rrf_fusion") {
        val sparse = Curation.bm25Search(docs,
          Seq("spark", "merge", "customer"), topK = 100)
          .select(col("doc_id"), col("bm25").as("score"))
        val dense = graft.operators.Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 0), 100)
          .select(col("neighbor_id").as("doc_id"), col("cosine").as("score"))
        graft.operators.Retrieval.rrfFuse(
          Seq(("bm25", sparse), ("dense", dense)), k = 60, topK = 10)
      },
      // MMR: 32 queries × 100-candidate shortlists, 10 unrolled greedy
      // iterations — must stay shortlist-scale whatever n is
      timeNoop("mmr_rerank") {
        val cand = graft.operators.Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 32), 100)
          .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
            Seq("neighbor_id"))
        graft.operators.Retrieval.mmrRerank(cand, k = 10, lambda = 0.7)
      },
      // label propagation over the 200k-node kNN graph: 3 iterations of
      // (join + mode-count + windowed argmax) over ~1M symmetrized edges
      timeNoop("label_prop") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        val edges = graft.operators.Similarity.knnGraph(emb, anchors, k = 5)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        graft.operators.Graphs.labelPropagation(edges,
          emb.select(col("vec_id").as("id")), iters = 3)
      },
      // z-order index: a pure projection — this row exists to prove the
      // layout math itself never becomes a shuffle at any n
      timeNoop("zorder_layout")(
        graft.operators.Layout.zOrderLayout(events,
          pmod(col("user_id"), lit(256L)),
          pmod(expr("ts div 3600000000"), lit(256L)),
          bits = 8, nBuckets = 32)),
      // row-local projections at corpus scale: entropy's per-doc HOF
      // quadratic and the 64-dim sketch fold are the CPU-bound pair
      timeNoop("text_entropy")(
        docs.select(col("doc_id"),
          graft.functions.TextFunctions.tokenEntropyOnTokens(
            split(lower(col("text")), "\\s+")).as("h"))),
      timeNoop("embed_hash")(
        docs.select(col("doc_id"),
          graft.functions.TextFunctions.hashSketchOnTokens(
            split(lower(col("text")), "\\s+"), 64).as("v"))),
      timeNoop("hist_lengths")(
        graft.operators.Reports.lengthHistogram(
          docs, "source", length(col("text")), width = 50L, nBins = 10)),
      // LSH calibration runs on a 1/10 SAMPLE by design (it is a tuning
      // measurement, not a corpus pass): the truth join ships shingle
      // SETS onto every candidate pair, so sampling is its scale shape
      timeNoop("lsh_calibration")(
        graft.operators.Reports.lshCalibration(
          docs.filter(col("doc_id") % 10 === 0),
          shingleN = 5, k = 8, bands = 4,
          tier = graft.operators.Dedup.FastXx)),
      // EWMA: one keyed agg folding each user's ~100-event array
      timeNoop("ewma_smooth")(
        graft.streaming.EventStreams.ewmaSmooth(
          events.withColumn("value",
            pmod(xxhash64(col("event_id")), lit(1000)).cast("double")))),
      // skip-gram pairs: row-local fan-out (~4 pairs/token ⇒ 40M pair
      // instances at 200k×50) into one keyed count
      timeNoop("skipgram_pairs")(
        Curation.skipgramPairs(docs, window = 2, minCount = 5L)),
      timeNoop("k_anonymity")(
        graft.operators.Reports.kAnonymityViolations(
          events.select((col("user_id") % 64).as("ub"),
            (expr("ts div 3600000000") % 24).as("hour")),
          Seq("ub", "hour"), k = 100L)),
      // PMI over the 40M-instance pair stream (vocab-bounded table)
      timeNoop("pmi_collocations")(
        Curation.pmiCollocations(docs, window = 2, minCount = 5L, topK = 100)),
      // domain reweight = the full bigram-LM pass + two tiny aggs
      timeNoop("domain_reweight")(
        Curation.domainReweight(docs)),
      timeNoop("quality_calibration")(
        graft.operators.Quality.classifierCalibration(docs,
          graft.functions.TextFunctions.langStopwords("en"))),
      timeNoop("source_overlap")(
        graft.operators.Reports.sourceOverlap(docs)),
      timeNoop("dq_expectations")(
        graft.operators.Reports.expectationReport(docs,
          rowRules = Seq(
            ("text_nonempty", length(col("text")) > 0),
            ("source_domain", col("source").isin((0 to 19).map(_.toString): _*))),
          uniqueRules = Seq(("doc_id_unique", col("doc_id")))),
      ),
      // ---- round-9 continuation-wave coverage ------------------------
      // OLAP cube: one Expand (4 grouping sets) + one keyed shuffle over
      // the raw event stream — the cube_revenue plan shape at corpus n
      timeNoop("cube_revenue")(
        events.select((col("user_id") % 64).as("ub"),
            (expr("ts div 3600000000") % 24).as("hour"))
          .cube(col("ub"), col("hour"))
          .agg(grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"), sum(col("hour")).as("s"))),
      // pivot on an EXPLICIT value list (never a key-domain collect):
      // per-source length-bucket mix — the pivot_langs plan shape
      timeNoop("pivot_langs")(
        docs.groupBy(col("source"))
          .pivot(pmod(length(col("text")), lit(5)), Seq(0, 1, 2, 3, 4))
          .agg(count(lit(1)))
          .na.fill(0L)),
      // lag-1..6 autocorrelation of the hourly series: the join runs on
      // the PRE-AGGREGATED ~720-row hour frame, so corpus n only pays
      // the initial keyed count
      timeNoop("event_autocorr") {
        val h = events
          .groupBy(expr("ts div 3600000000").as("hour_id"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val lags = broadcast(spark.range(1, 7).select(col("id").as("lag")))
        h.select(col("hour_id"), col("n").as("xv"))
          .crossJoin(lags)
          .join(h.select(col("hour_id").as("__yh"), col("n").as("yv")),
            col("__yh") === col("hour_id") + col("lag"))
          .groupBy(col("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("xv") * col("yv")).as("sxy"),
            sum(col("xv")).as("sx"), sum(col("yv")).as("sy"),
            sum(col("xv") * col("xv")).as("sxx"),
            sum(col("yv") * col("yv")).as("syy"))
      },
      // the 10⁹-row-group shape the native bounded top-k exists for: ONE
      // whale group, fixed at 5M rows regardless of corpus n (at corpus
      // scale both tiers are trivially fast and the comparison says
      // nothing). The window tier must sort all 5M rows in that single
      // partition; the aggregate tier shuffles k pairs per task — the
      // pair of timings IS the claim
      timeNoop("per_group_topk_window") {
        import org.apache.spark.sql.expressions.Window
        spark.range(5000000L).select(lit("g").as("gg"), col("id").as("doc_id"))
          .withColumn("rk", row_number().over(Window.partitionBy(col("gg"))
            .orderBy(xxhash64(col("doc_id")), col("doc_id"))))
          .filter(col("rk") <= 5)
      },
      timeNoop("sample_per_group_agg")(
        spark.range(5000000L).select(lit("g").as("gg"), col("id").as("doc_id"))
          .groupBy(col("gg"))
          .agg(org.apache.spark.sql.graft.TopKFunctions.topKByKey(
            xxhash64(col("doc_id")), col("doc_id"), 5).as("__p"))
          .select(col("gg"), posexplode(col("__p")))),
      timeNoop("epoch_plan")(
        Curation.epochPlan(docs, budgetTokens = n * 20L, maxEpochs = 4.0)),
      // SNM with the default band cap (vocab-spread prefixes: no split)
      timeNoop("dedup_sorted_neighborhood")(
        Dedup.sortedNeighborhood(docs, window = 5, minJaccard = 0.3)),
      // adversarial SNM: EVERY key shares a 14-char prefix, so the band
      // census must recursively extend through 13 identical levels before
      // the corpus spreads — the enforced-guard worst case (r8's `weak`)
      timeNoop("snm_shared_prefix")(
        Dedup.sortedNeighborhood(
          docs.withColumn("text", concat(lit("thesameprefix "), col("text"))),
          window = 5, minJaccard = 0.3, maxBandSize = math.max(n / 10, 1000L).toInt)),
      // EWMA whale key: 10⁶ events on ONE user — the bounded last-64
      // suffix aggregate must hold task memory flat (the r8 collect_list
      // fold buffered all 10⁶ structs in one aggregation row)
      timeNoop("ewma_whale")(
        graft.streaming.EventStreams.ewmaSmooth(
          spark.range(1000000L).select(
            col("id").as("event_id"), lit(0L).as("user_id"),
            pmod(xxhash64(col("id")), lit(spanUs)).as("ts"),
            pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double")
              .as("value")))),
      // triangle counting over the same kNN topology as pagerank_knn —
      // build-inclusive, the degree-ordered-orientation O(√m) claim
      timeNoop("graph_triangles") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        val edges = graft.operators.Similarity.knnGraph(emb, anchors, k = 5)
          .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        graft.operators.Graphs.triangles(edges,
          emb.select(col("vec_id").as("id")))
      },
      // persisted-graph amortization: ONE build+save, then each graph
      // algorithm on the LOADED edges — compare against the
      // build-inclusive pagerank_knn / label_prop / graph_triangles rows
      time("knn_graph_build_save") {
        val anchors = emb.filter(col("vec_id") < 256)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        graft.store.AnnArtifacts.saveKnnGraph(wh, "g", emb, anchors, k = 5)
        wh.read("g").count()
      },
      timeNoop("pagerank_loaded") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        val (edges, _) = graft.store.AnnArtifacts.loadKnnGraph(wh, "g")
        graft.operators.Graphs.pageRank(edges.select(col("src"), col("dst")),
          emb.select(col("vec_id").as("id")), iters = 3)
      },
      timeNoop("label_prop_loaded") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        val (edges, _) = graft.store.AnnArtifacts.loadKnnGraph(wh, "g")
        graft.operators.Graphs.labelPropagation(
          edges.select(col("src"), col("dst")),
          emb.select(col("vec_id").as("id")), iters = 3)
      },
      timeNoop("triangles_loaded") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        val (edges, _) = graft.store.AnnArtifacts.loadKnnGraph(wh, "g")
        graft.operators.Graphs.triangles(edges.select(col("src"), col("dst")),
          emb.select(col("vec_id").as("id")))
      },
      // ---- round-9 wave ---------------------------------------------
      // Aho–Corasick dictionary gate: one automaton walk per doc, cost
      // independent of dictionary size (vs contains-chain scan-per-term)
      timeNoop("blocklist_ac")(
        graft.operators.Quality.blocklistGateAc(docs,
          patterns = Seq("merge", "window", "fast table", "ta", "able"))),
      // JL projection 64 → 16: row-local codegen'd dots, zero shuffle
      timeNoop("embed_rp")(
        graft.operators.Similarity.randomProjection(emb, dim = 64, outDim = 16)),
      // perceptual dHash + Hamming band join over the text-backed media
      timeNoop("multimodal_neardup")(
        graft.operators.Multimodal.perceptualNearDup(
          graft.operators.Multimodal.fakeMediaTable(docs), maxHamming = 3)),
      timeNoop("retention_cohorts")(
        graft.operators.Reports.retentionCohorts(
          events.withColumn("ts", col("ts")))),
      timeNoop("join_salted") {
        val dim = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        graft.operators.Joins.saltedJoin(
          docs.select(col("doc_id"), col("source")), dim, "source",
          saltFactor = 8)
      },
      // bloom reduction: 0.1% of keys survive to the join shuffle
      timeNoop("join_bloom_reduced") {
        val dim = docs.filter(col("doc_id") % 1000 === 0)
          .select(col("doc_id"), col("source").as("dim_source"))
        graft.operators.Joins.bloomFilteredJoin(
          docs.select(col("doc_id"), col("text")), dim, "doc_id", fpp = 0.01)
      },
      // Markov transition matrix: one user-partitioned lag window over
      // the stream, probabilities on the tiny matrix frame
      timeNoop("event_transitions")(
        graft.streaming.EventStreams.eventTransitions(
          // per-event (not per-user) types so the matrix is dense
          events.withColumn("event_type",
            pmod(xxhash64(col("event_id")), lit(5)).cast("string")))),
      timeNoop("retention_plus_skew") {
        graft.operators.Joins.keyFrequency(events, "user_id", topN = 20)
      },
      // LPA communities + modularity terms over the kNN graph (loaded
      // edges — the amortized topology the graph family shares)
      timeNoop("graph_communities") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        val (edges, _) = graft.store.AnnArtifacts.loadKnnGraph(wh, "g")
        graft.operators.Graphs.communityStats(
          edges.select(col("src"), col("dst")),
          emb.select(col("vec_id").as("id")), iters = 3)
      },
      // code-space centroids: explode 200k×64 into one keyed agg
      timeNoop("embed_centroids")(
        emb.withColumn("label", (col("vec_id") % 16).cast("long"))
          .withColumn("__s", graft.functions.VectorFunctions.quantScale(col("embedding")))
          .select(col("label"),
            posexplode(graft.functions.VectorFunctions.quantize(
              col("embedding"), col("__s"))).as(Seq("dim", "q")))
          .groupBy(col("label"), col("dim"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("q").cast("long")).as("sum_q"))),
      timeNoop("profile_table")(
        graft.operators.Reports.profileColumns(
          docs, Seq("doc_id", "source", "text"))),
      // sparse-retrieval amortization: ONE corpus tokenization into the
      // persisted postings, then BM25 touches only the terms' sliver —
      // compare against the from-text bm25_search row
      time("sparse_index_build_save") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        graft.store.SparseIndex.save(wh, "sp", docs)
        wh.read("sp").count()
      },
      timeNoop("bm25_search_indexed") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        graft.store.SparseIndex.bm25(wh, "sp",
          Seq("merge", "window", "fast"), topK = 10)
      },
      // incremental rollup: three deltas absorbed into persisted partials
      timeNoop("rollup_incremental") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        val name = "rollup_" + System.nanoTime()
        val ev = events
          .withColumn("event_type", (col("user_id") % 4).cast("string"))
          .withColumn("value",
            pmod(xxhash64(col("event_id")), lit(1000)).cast("double") / 10.0)
        (0 until 3).foreach { i =>
          graft.store.Rollups.upsertHourly(wh, name,
            ev.filter(pmod(col("event_id"), lit(3)) === i))
        }
        graft.store.Rollups.hourlyView(wh.read(name))
      },
      // ---- round-10 wave ----------------------------------------------
      // last-touch attribution at corpus scale: the asOfJoin machinery
      // under its marketing shape (staleness-bounded, purchase ⋈ click)
      timeNoop("attribution_last_touch") {
        val typed = events.withColumn("event_type",
          when(pmod(xxhash64(col("event_id")), lit(10)) === 0, "purchase")
            .otherwise("click"))
        val purchases = typed.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = typed.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
        Joins.asOfJoin(purchases, clicks, Seq("user_id"), "ts",
          seqCol = "click_id", attach = Seq("click_id"), prefix = "touch_",
          maxStaleness = Some(3600L * 1000000L))
      },
      // as-of WHALE: the full event history on ONE key serializes onto
      // one (spillable) sort task — the documented caveat, measured
      timeNoop("asof_whale") {
        val whale = spark.range(1000000L).select(
          col("id").as("event_id"), lit(0L).as("user_id"),
          pmod(xxhash64(col("id")), lit(spanUs)).as("ts"))
        val wl = whale.filter(col("event_id") % 2 === 0)
        val wr = whale.filter(col("event_id") % 2 === 1)
          .select(col("event_id").as("rid"), col("user_id"), col("ts"))
        Joins.asOfJoin(wl, wr, Seq("user_id"), "ts", "rid", Seq("rid"),
          maxStaleness = Some(86400000000L))
      },
      // ...and the banding escape hatch on the SAME whale: the shuffle
      // key picks up a 1-day time band (30 bands over the span), so the
      // single key parallelizes — the pair of timings is the contract
      timeNoop("asof_whale_banded") {
        val whale = spark.range(1000000L).select(
          col("id").as("event_id"), lit(0L).as("user_id"),
          pmod(xxhash64(col("id")), lit(spanUs)).as("ts"))
        val wl = whale.filter(col("event_id") % 2 === 0)
        val wr = whale.filter(col("event_id") % 2 === 1)
          .select(col("event_id").as("rid"), col("user_id"), col("ts"))
        Joins.asOfJoinBanded(wl, wr, Seq("user_id"), "ts", "rid", Seq("rid"),
          staleness = 86400000000L)
      },
      // key-skew census + share: two slim keyed aggs over the stream
      timeNoop("key_skew_report") {
        Joins.keyFrequency(events, "user_id", topN = 20)
          .crossJoin(broadcast(events.agg(count(lit(1)).as("__total"))))
          .select(col("user_id"), col("n"),
            (col("n").cast("double") / col("__total").cast("double")).as("share"))
      },
      // l-diversity audit: one keyed agg with a countDistinct expand
      timeNoop("l_diversity")(
        graft.operators.Reports.lDiversityViolations(
          events.select((col("user_id") % 64).as("ub"),
            (expr("ts div 3600000000") % 24).as("hour"),
            pmod(xxhash64(col("event_id")), lit(3)).cast("string").as("etype")),
          Seq("ub", "hour"), "etype", l = 3L)),
      // co-bucketed join: bucketed writes (one shuffle each, WRITE-time
      // cost) then the exchange-free join — the repeated-join amortization
      timeNoop("bucket_join") {
        val left = events.select(col("event_id"), col("user_id"))
        val right = events.select(col("event_id"), col("ts"))
        Joins.writeBucketed(left, "stress_bj_l", "event_id", 16,
          path = Some(s"$stressWhDir/stress_bj_l"))
        Joins.writeBucketed(right, "stress_bj_r", "event_id", 16,
          path = Some(s"$stressWhDir/stress_bj_r"))
        spark.table("stress_bj_l").join(spark.table("stress_bj_r"), Seq("event_id"))
      },
      // per-label code-space outliers: quantize + exploded centroid agg +
      // broadcast-back scoring + label-partitioned top-k window
      timeNoop("embed_outliers")(
        graft.operators.Similarity.codeSpaceOutliers(
          emb.withColumn("label", (col("vec_id") % 16).cast("long")),
          topK = 5)),
      // exact 64-dim co-moment matrix: ONE corpus pass, one fixed
      // ~17 KB gram buffer per task (2080 integer MACs per row)
      timeNoop("embed_covariance")(
        graft.operators.Similarity.gramMatrix(emb, d = 64)),
      // PCA projection: the gram pass + driver Jacobi + one row-local
      // projection pass through the codegen'd dot kernel
      timeNoop("embed_pca")(
        graft.operators.Similarity.pcaProject(emb, d = 64, k = 8)),
      // per-user trigram paths over the event stream: one user-keyed
      // window + one path-keyed distinct-agg + TakeOrderedAndProject
      timeNoop("event_paths")(
        graft.streaming.EventStreams.eventPaths(
          events.withColumn("event_type",
            pmod(xxhash64(col("event_id")), lit(5)).cast("string")))),
      // k-core peeling on a synthetic avg-degree-8 random graph (node
      // scale = corpus scale): per-round degree agg + two semi-joins,
      // driver reads one count per round
      timeNoop("graph_kcore")(
        graft.operators.Graphs.kCore(
          spark.range(n).select(col("id").as("src"),
            explode(transform(sequence(lit(0), lit(3)),
              j => pmod(xxhash64(col("id"), j), lit(n)))).as("dst")),
          k = 5)),
      // per-group OLS drift: one keyed agg of exact integer/decimal sums
      timeNoop("event_trend")(
        graft.operators.Reports.groupTrend(
          events.withColumn("event_type",
            pmod(xxhash64(col("event_id")), lit(5)).cast("string"))
            .withColumn("value",
              (pmod(xxhash64(col("event_id"), lit(7)), lit(10000))
                .cast("double") / 100.0)),
          "event_type", expr("ts div 86400000000"), col("value"))),
      // MI dependence audit: one corpus-pass cell count + cell-frame folds
      timeNoop("mi_report")(
        graft.operators.Reports.mutualInformation(
          docs.withColumn("lang",
            pmod(xxhash64(col("doc_id")), lit(12)).cast("string")),
          "lang", "source")),
      // DP release: keyed count + row-local seeded Laplace on the group frame
      timeNoop("dp_counts")(
        graft.operators.Reports.dpCounts(docs, "source")),
      // PSI drift: two binned keyed counts + a 10-cell grid fold
      timeNoop("drift_psi")(
        graft.operators.Reports.driftPsi(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          length(col("text")), width = 40L, nBins = 10)),
      // LSH recall loop at corpus scale: the deliberately-quadratic
      // truth join stays SAMPLE-bounded (0.5% of 200k → ~1000 docs →
      // ~500k truth pairs) while the banding runs the production path
      timeNoop("lsh_recall")(
        graft.operators.Reports.lshRecall(docs, sampleFrac = 0.005)),
      // seed expansion: personalized PageRank over the synthetic graph
      timeNoop("ppr_expansion")(
        graft.operators.Graphs.personalizedPageRank(
          spark.range(n).select(col("id").as("src"),
            explode(transform(sequence(lit(0), lit(3)),
              j => pmod(xxhash64(col("id"), j), lit(n)))).as("dst")),
          spark.range(n).select(col("id")),
          spark.range(n).filter(col("id") % 97 === 0).select(col("id")),
          iters = 3)),
      // grid resample: two composed as-of joins (backward + forward) +
      // one row-local interpolation; grid = users × span/step, never
      // event-scale
      timeNoop("event_resample")(
        graft.operators.Joins.resampleInterpolate(
          events.withColumn("value",
            (pmod(xxhash64(col("event_id")), lit(1000)).cast("double")
              / 10.0)),
          Seq("user_id"), "ts", "value", "event_id",
          stepUs = 21600000000L)),
      // acquisition curve: two keyed aggs + a banded day-frame prefix sum
      timeNoop("user_growth")(
        graft.streaming.EventStreams.userGrowth(events)),
      // blocked record linkage: 2000 blocks × ~n/2000 rows → ~n²/2000/2
      // candidate pairs (20M at 200k), each scored once by the native
      // Jaro-Winkler kernel; hash-hex names keep the result set sparse
      timeNoop("fuzzy_join")(
        Joins.fuzzyJoin(
          events.select(col("event_id").as("id"),
            pmod(xxhash64(col("user_id")), lit(2000)).as("blk"),
            concat(lit("n"),
              conv(pmod(xxhash64(col("event_id")), lit(100000000000L))
                .cast("string"), 10, 16)).as("nm")),
          "blk", "id", "nm", threshold = 0.9)),
      // exact set-similarity self-join over the family corpus: prefix
      // join fan-out pinned to family size, one verification per
      // surviving candidate
      timeNoop("jaccard_prefix")(
        Dedup.prefixFilterJaccardPairs(famDocs, threshold = 0.5)),
      // market-basket pairs: n/5 baskets × ~5 items over a 1000-item
      // catalog — keyed shuffles only, pair fan-out C(5,2) per basket
      timeNoop("basket_affinity")(
        Affinity.basketPairs(
          events.select((col("event_id") % lit(math.max(n / 5L, 1L))).as("bk"),
            pmod(xxhash64(col("event_id")), lit(1000)).as("it")),
          "bk", "it", minPairCount = 2L)),
      // exact DAU/WAU: one event-scale distinct, then a 7x explode of
      // the DAU-bounded presence frame
      timeNoop("rolling_active")(
        graft.streaming.EventStreams.rollingActiveUsers(events)),
      // A/B report: one keyed moment aggregate over the stream + a
      // 10-row arm join
      timeNoop("ab_test")(
        graft.operators.Reports.abTest(
          events.select(pmod(col("user_id"), lit(5)).cast("string").as("grp"),
            col("user_id"),
            (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
              / 100.0).as("value")),
          "grp", "user_id", "value")),
      // ---- round-11 adversarial wave ----------------------------------
      // fuzzy-join WHALE: 20k rows land in ONE block (the low-cardinality
      // linkage key at 100 TB); maxBlockSize=4096 sub-splits the whale
      // into hash cells, bounding pair work at Σ cell²/2 (~42M JW
      // comparisons) instead of 20k²/2 per candidate generation — the
      // guard is what makes the block feasible at all
      timeNoop("fuzzy_whale")(
        Joins.fuzzyJoin(
          events.select(col("event_id").as("id"),
            when(col("event_id") < 20000L, lit(0L))
              .otherwise(pmod(xxhash64(col("user_id")), lit(2000)) + 1L)
              .as("blk"),
            concat(lit("n"),
              conv(pmod(xxhash64(col("event_id")), lit(100000000000L))
                .cast("string"), 10, 16)).as("nm")),
          "blk", "id", "nm", threshold = 0.9)),
      // ...the same whale under a 4x tighter cap: cells quarter the
      // per-cell pair count — the knob is the wall-clock lever (and the
      // in-whale recall trade is the documented price)
      timeNoop("fuzzy_whale_tight")(
        Joins.fuzzyJoin(
          events.select(col("event_id").as("id"),
            when(col("event_id") < 20000L, lit(0L))
              .otherwise(pmod(xxhash64(col("user_id")), lit(2000)) + 1L)
              .as("blk"),
            concat(lit("n"),
              conv(pmod(xxhash64(col("event_id")), lit(100000000000L))
                .cast("string"), 10, 16)).as("nm")),
          "blk", "id", "nm", threshold = 0.9, maxBlockSize = 1024)),
      // shared-shingle ADVERSARY for the exact prefix-filter join: 1000
      // IDENTICAL docs — every shingle has df=1000, so the df-ascending
      // prefix ordering has nowhere rare to hide and the prefix join
      // fans out quadratically. Exact (guard idle) must verify all
      // C(1000,2) ≈ 500k pairs; the guarded run fires maxPrefixDf=500,
      // drops the whale's prefix shingles, and trades ALL in-whale
      // recall (rows → unique-tail pairs only) for bounded work — the
      // documented no-longer-exact regime, now measured
      timeNoop("jaccard_adversary_exact")(
        Dedup.prefixFilterJaccardPairs(advDocs, threshold = 0.5)),
      timeNoop("jaccard_adversary_guarded")(
        Dedup.prefixFilterJaccardPairs(advDocs, threshold = 0.5,
          maxPrefixDf = 500)),
      // exact DAU/WAU at 2M events (10x the corpus row scale): validates
      // the windowDays-fold expansion claim — presence-reduce FIRST
      // means the 7x explode runs on the DAU-bounded frame, so 10x
      // events cost ~10x, never 70x
      timeNoop("rolling_active_2m")(
        graft.streaming.EventStreams.rollingActiveUsers(events2m)),
      // ...and the HLL tier on the same 2M stream: fixed-size register
      // states shuffle instead of (day, user) pairs
      timeNoop("rolling_active_2m_hll")(
        graft.streaming.EventStreams.rollingActiveUsersHll(events2m)),
      // tombstone-HEAVY sparse index: 50% of the corpus deleted in one
      // slim pass (postings untouched); the query pays the broadcast
      // anti-join against n/2 tombstone ids
      timeNoop("bm25_tombheavy") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        graft.store.SparseIndex.save(wh, "stress_bm25_th", docs)
        graft.store.SparseIndex.delete(wh, "stress_bm25_th",
          docs.filter(col("doc_id") % 2 === 0).select("doc_id"))
        graft.store.SparseIndex.bm25(wh, "stress_bm25_th",
          Seq("spark", "merge", "customer"), topK = 10)
      },
      // ...then compaction retires the tombstones copy-on-write and the
      // same query runs anti-join-free — the before/after pair is the
      // compaction contract
      timeNoop("bm25_tombheavy_compacted") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        graft.store.SparseIndex.compact(wh, "stress_bm25_th")
        graft.store.SparseIndex.bm25(wh, "stress_bm25_th",
          Seq("spark", "merge", "customer"), topK = 10)
      },
      // Adamic-Adar over the synthetic avg-degree-8 graph (node scale =
      // corpus scale): wedge fan-out Σdeg² with the hub guard idle —
      // degree census + neighbor-pair join + pinned score folds
      timeNoop("link_prediction")(
        graft.operators.Graphs.linkPrediction(
          spark.range(n).select(col("id").as("src"),
            explode(transform(sequence(lit(0), lit(3)),
              j => pmod(xxhash64(col("id"), j), lit(n)))).as("dst")),
          topK = 20)),
      // TF-IDF more-like-this at corpus scale: the posting sliver of one
      // query doc's terms bounds the candidate set; norms are the
      // corpus-wide cost (one keyed fold pass)
      timeNoop("doc_similarity")(
        graft.operators.Curation.docSimilarity(docs, queryDocId = 0L,
          topK = 10)),
      // RFM features on the 2M-event stream: one keyed pass with a
      // distinct-day expand + the 1-row anchor broadcast
      timeNoop("rfm_features_2m")(
        graft.operators.Reports.rfmFeatures(
          events2m.withColumn("value",
            (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
              / 100.0)))),
      // ---- round-11 wave-3 ---------------------------------------------
      // degree assortativity over the synthetic avg-degree-8 graph at
      // node scale n: symmetrize + degree agg + a five-number moment agg
      timeNoop("graph_assortativity")(
        graft.operators.Graphs.assortativity(
          spark.range(n).select(col("id").as("src"),
            explode(transform(sequence(lit(0), lit(3)),
              j => pmod(xxhash64(col("id"), j), lit(n)))).as("dst")))),
      // Holt-Winters on the 2M-event stream fanned to 20 types: the
      // event-scale cost is ONE (type, hour) count; each type's fold
      // runs on its ~720-hour calendar list
      timeNoop("holt_winters_2m")(
        graft.streaming.EventStreams.holtWinters(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // ...and the WATERMARK-CLOSED streaming twin at the same 2M-event
      // scale: the mapGroupsWithState path driven through a file-source
      // stream in 10 mtime-ordered event-time chunks (maxFilesPerTrigger
      // = 1 → 12 sequential micro-batches) plus two sentinel files that
      // push the watermark past every hour. EventTimeTimeout contract
      // under load: the final folds fire in batches where the keys get
      // NO fresh rows — only the watermark moves. Measures the per-batch
      // state shuffle + hour folds, not MemoryStream driver
      // serialization.
      time("holt_winters_stream_2m") {
        val dir = java.nio.file.Files
          .createTempDirectory("hw_stream_2m").toFile
        val staging = java.nio.file.Files
          .createTempDirectory("hw_stream_2m_stage").toFile
        val spanUs2 = 30L * 24 * 3600 * 1000000L
        val src = events2m.select(
          col("user_id"),
          timestamp_micros(col("ts")).as("ts"),
          concat(lit("t"), pmod(col("user_id"), lit(20))).as("event_type"),
          lit(1.0).as("value"))
        def ship(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
          val stage = new java.io.File(staging, s"c$i")
          df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
          val part = stage.listFiles()
            .find(f => f.getName.endsWith(".parquet")).get
          val dst = new java.io.File(dir, f"chunk_$i%02d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(1000000000000L + i * 60000L)
        }
        for (i <- 0 until 10)
          ship(src.filter(col("ts") >= timestamp_micros(lit(i * spanUs2 / 10))
            && col("ts") < timestamp_micros(lit((i + 1) * spanUs2 / 10))), i)
        // two sentinels: watermark for batch N derives from batch N-1's
        // max event time, and timeout callbacks fire one batch later
        import spark.implicits._
        for (k <- 0 until 2)
          ship(Seq((0L, new java.sql.Timestamp(spanUs2 / 1000L + 7200000L),
            "zz", 1.0)).toDF("user_id", "ts", "event_type", "value"), 10 + k)
        val stream = spark.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING, " +
            "value DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(dir.toString)
          .as[graft.streaming.EventStreams.Event]
        val q = graft.streaming.EventStreams.holtWintersStream(stream)
          .writeStream.format("memory").queryName("hw_stream_2m")
          .outputMode("update").start()
        q.processAllAvailable()
        q.stop()
        spark.table("hw_stream_2m").count()
      },
      // SLO hourly breach ticker at 2M events on the same ordered
      // file-source pattern: pure windowed Append agg — state is one
      // open hour row, rows emit as the watermark closes each hour
      time("slo_hourly_stream_2m") {
        val dir = java.nio.file.Files
          .createTempDirectory("slo_stream_2m").toFile
        val staging = java.nio.file.Files
          .createTempDirectory("slo_stream_2m_stage").toFile
        val spanUs2 = 30L * 24 * 3600 * 1000000L
        val src = events2m.select(
          col("user_id"),
          timestamp_micros(col("ts")).as("ts"),
          when(pmod(xxhash64(col("event_id")), lit(50)) === 0L,
            lit("error")).otherwise(lit("ok")).as("event_type"),
          lit(1.0).as("value"))
        def ship(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
          val stage = new java.io.File(staging, s"c$i")
          df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
          val part = stage.listFiles()
            .find(f => f.getName.endsWith(".parquet")).get
          val dst = new java.io.File(dir, f"chunk_$i%02d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(2000000000000L + i * 60000L)
        }
        for (i <- 0 until 10)
          ship(src.filter(col("ts") >= timestamp_micros(lit(i * spanUs2 / 10))
            && col("ts") < timestamp_micros(lit((i + 1) * spanUs2 / 10))), i)
        import spark.implicits._
        for (k <- 0 until 2)
          ship(Seq((0L, new java.sql.Timestamp(spanUs2 / 1000L + 7200000L),
            "zz", 1.0)).toDF("user_id", "ts", "event_type", "value"), 10 + k)
        val stream = spark.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING, " +
            "value DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(dir.toString)
          .as[graft.streaming.EventStreams.Event]
        val q = graft.streaming.EventStreams.sloHourlyStream(stream,
          budgetPpm = 15000L, watermarkDelay = "0 seconds")
          .writeStream.format("memory").queryName("slo_stream_2m")
          .outputMode("append").start()
        q.processAllAvailable()
        q.stop()
        spark.table("slo_stream_2m").count()
      },
      // ---- round-12 wave ----------------------------------------------
      // Spearman at 2M events: the user-keyed agg is the corpus cost;
      // both rank passes ride the banded census over DISTINCT values
      timeNoop("spearman_2m")(
        graft.operators.Reports.spearmanCorr(
          events2m.withColumn("value",
            (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
              / 100.0)))),
      // Theil-Sen at 2M events x 20 types: pairwise stays calendar-
      // bounded (~259k pairs per type over 720 hours) however many rows
      timeNoop("theilsen_2m")(
        graft.operators.Reports.theilSenTrend(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // Ljung-Box at 2M events x 20 types: lag pairs equi-join the
      // hour frame; moments are decimal sums over it
      timeNoop("ljung_box_2m")(
        graft.operators.Reports.ljungBox(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // DP quantile at 2M events: distinct-value frame + Gumbel argmax
      timeNoop("dp_quantile_2m")(
        graft.operators.Reports.dpQuantile(
          events2m
            .withColumn("event_type",
              concat(lit("t"), pmod(col("user_id"), lit(20))))
            .withColumn("value",
              (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
                / 100.0)))),
      // SpaceSaving streaming twin at 2M events (single giant batch on
      // the bounded Dataset path): O(capacity) state per type
      time("heavy_hitters_2m_spacesaving") {
        import spark.implicits._
        val ds = events2m.select(
          col("user_id"),
          timestamp_micros(col("ts")).as("ts"),
          concat(lit("t"), pmod(col("user_id"), lit(20))).as("event_type"),
          lit(1.0).as("value"))
          .as[graft.streaming.EventStreams.Event]
        graft.streaming.EventStreams.heavyHittersStream(ds, capacity = 16)
          .count()
      },
      // split-conformal at 2M events: the residual rank rides the
      // distinct-residual frame (bounded by value quantization), never a
      // per-group collect
      timeNoop("conformal_2m")(
        graft.operators.Reports.conformalInterval(
          events2m
            .withColumn("event_type",
              concat(lit("t"), pmod(col("user_id"), lit(20))))
            .withColumn("value",
              (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
                / 100.0)))),
      // post-stratified ATE at 2M events: one unit-keyed agg, then
      // stratum-bounded work
      timeNoop("ate_poststrat_2m")(
        graft.operators.Reports.postStratifiedAte(
          events2m
            .withColumn("event_type",
              concat(lit("t"), pmod(col("user_id"), lit(20))))
            .withColumn("value",
              (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
                / 100.0)))),
      // AMOC changepoint at 2M events x 20 types: candidate scoring is
      // windows over the ~14k-row calendar frame
      timeNoop("changepoint_2m")(
        graft.operators.Reports.changepointMeanShift(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // compaction planner at corpus scale: one slim keyed agg
      timeNoop("compaction_plan")(
        graft.operators.Layout.compactionPlan(
          docs, Seq("source"), octet_length(col("text")),
          targetBytes = 64L * 1024)),
      // positional phrase index at corpus scale: the one tokenize pass
      // builds (term, id, positions); the query touches two slivers
      timeNoop("phrase_search") {
        val wh = new graft.store.Warehouse(spark, stressWhDir)
        graft.store.SparseIndex.savePositional(wh, "stress_pos", docs)
        graft.store.SparseIndex.phraseSearch(wh, "stress_pos",
          Seq("spark", "merge"), topK = 10)
      },
      // zone-map pruning simulation on the event stream: two keyed aggs
      // over a row-local file assignment, no global sort
      timeNoop("zorder_pruning")(
        graft.operators.Layout.zOrderPruningReport(
          events.select(col("event_id"), col("user_id"), col("ts")),
          pmod(col("user_id"), lit(256L)),
          pmod(expr("ts div 3600000000"), lit(256L)),
          col("event_id"), bits = 8, nFiles = 64)),
      // join advisor on a deliberately whale-keyed pair: the census
      // costs two keyed counts + a key-frame join, never the join
      timeNoop("join_advisor")(
        graft.operators.Joins.joinAdvisor(
          events.select(col("user_id").as("k")),
          events.select(
            when(col("event_id") < n / 10, lit(0L))
              .otherwise(col("user_id")).as("k")),
          "k")),
      // reciprocal-kNN cut + degree histogram on the avg-degree-8 graph
      timeNoop("knn_mutual_pairs")(
        graft.operators.Graphs.mutualKnnPairs(
          spark.range(n).select(col("id").as("src"),
            explode(transform(sequence(lit(0), lit(3)),
              j => pmod(xxhash64(col("id"), j), lit(n)))).as("dst")))),
      timeNoop("graph_degree_hist")(
        graft.operators.Graphs.degreeHistogram(
          spark.range(n).select(col("id").as("src"),
            explode(transform(sequence(lit(0), lit(3)),
              j => pmod(xxhash64(col("id"), j), lit(n)))).as("dst")))),
      // MAD anomalies + exact trimmed mean on the 2M-event stream: both
      // collapse the stream once, then work on slim frames
      timeNoop("mad_anomalies_2m")(
        graft.operators.Reports.madAnomalies(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      timeNoop("trimmed_mean_2m")(
        graft.operators.Reports.trimmedMean(
          events2m
            .withColumn("event_type",
              concat(lit("t"), pmod(col("user_id"), lit(20))))
            .withColumn("value",
              (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
                / 100.0)))),
      // Mann–Kendall at 2M events x 20 types: the pairwise sign sum
      // runs on the calendar-bounded hour frame (720 hours/type), never
      // the stream
      timeNoop("mann_kendall_2m")(
        graft.operators.Reports.mannKendall(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // two-sample KS at 2M rows with a 100k-value grid: the banded
      // ECDF pass (bandCensusN) is the measured shape
      timeNoop("ks_2m")(
        graft.operators.Reports.ksTwoSample(
          events2m.filter(col("event_id") % 2 === 0)
            .select(pmod(xxhash64(col("event_id")), lit(100000)).as("m")),
          events2m.filter(col("event_id") % 2 === 1)
            .select(pmod(xxhash64(col("event_id"), lit(7)), lit(100000))
              .as("m")),
          col("m"))),
      // ---- round-14 wave: the r13 statistical tier at 2M events --------
      // Kruskal–Wallis at 2M events x 20 types: the pooled-midrank pass
      // rides the banded census over the hourly-count value frame; the H
      // fold collects one row per group (20)
      timeNoop("kruskal_wallis_2m")(
        graft.operators.Reports.kruskalWallis(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // Brown–Forsythe at 2M events x 20 types: exact doubled medians
      // from the hourly cum frame, then one F fold over 20 group rows
      timeNoop("brown_forsythe_2m")(
        graft.operators.Reports.brownForsythe(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // Cliff's delta at 2M rows with a 100k-value grid: dominance counts
      // from the banded ECDF (the ks_2m shape), never pair enumeration
      timeNoop("cliffs_delta_2m")(
        graft.operators.Reports.cliffsDelta(
          events2m.filter(col("event_id") % 2 === 0)
            .select(pmod(xxhash64(col("event_id")), lit(100000)).as("m")),
          events2m.filter(col("event_id") % 2 === 1)
            .select(pmod(xxhash64(col("event_id"), lit(7)), lit(100000))
              .as("m")),
          col("m"))),
      // 1-Wasserstein at 2M rows on the same halves: two binned counts +
      // the 64-bin below-self-join cumsum — the stream collapses to the
      // bin spine before any cross-bin work
      timeNoop("wasserstein_2m")(
        graft.operators.Reports.wasserstein1(
          events2m.filter(col("event_id") % 2 === 0)
            .select(pmod(xxhash64(col("event_id")), lit(100000)).as("m")),
          events2m.filter(col("event_id") % 2 === 1)
            .select(pmod(xxhash64(col("event_id"), lit(7)), lit(100000))
              .as("m")),
          col("m"), width = 1563L, nBins = 64)),
      // BH-FDR over 2M hypotheses under the global null (seeded
      // md5-uniform p per key): banded p-ranks at corpus scale — the
      // expected discovery set stays (near-)empty however many tests
      timeNoop("bh_fdr_2m")(
        graft.operators.Reports.bhFdr(
          spark.range(2000000L).select(
            concat(lit("k"), col("id")).as("key"),
            ((graft.functions.HashFunctions.md5Bucket(11L,
              concat(lit("k"), col("id"))).cast("double") + 0.5)
              / 4294967296.0).as("p")))),
      // ---- round-14 parametric-inference tier at 2M ---------------------
      // Welch t / Cohen's d at 2M rows: each side collapses to ONE exact
      // moment row (map-side partials) — the cheapest possible shape
      timeNoop("welch_t_2m")(
        graft.operators.Inference.welchTTest(
          events2m.filter(col("event_id") % 2 === 0)
            .select(pmod(xxhash64(col("event_id")), lit(100000)).as("m")),
          events2m.filter(col("event_id") % 2 === 1)
            .select(pmod(xxhash64(col("event_id"), lit(7)), lit(100000))
              .as("m")),
          col("m"))),
      timeNoop("cohens_d_2m")(
        graft.operators.Inference.cohensD(
          events2m.filter(col("event_id") % 2 === 0)
            .select(pmod(xxhash64(col("event_id")), lit(100000)).as("m")),
          events2m.filter(col("event_id") % 2 === 1)
            .select(pmod(xxhash64(col("event_id"), lit(7)), lit(100000))
              .as("m")),
          col("m"))),
      // ANOVA F / Bartlett / Jarque-Bera at 2M events x 20 types: the
      // hourly collapse is the corpus cost; folds run on 20 group rows
      timeNoop("anova_2m")(
        graft.operators.Inference.anovaOneWay(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      timeNoop("bartlett_2m")(
        graft.operators.Inference.bartlettVar(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      timeNoop("jarque_bera_2m")(
        graft.operators.Inference.jarqueBera(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // McNemar at corpus scale on two real text gates: one
      // conditional-count pass over the documents
      timeNoop("mcnemar_gates")(
        graft.operators.Inference.mcnemar(docs,
          length(col("text")) >= 250L,
          size(split(col("text"), " ")) >= 48)),
      // permutation test at 2M x 64 reps: the explode is the honest
      // 128M-row CPU multiplier, but the shuffle carries only ~64 rows
      // per partition (map-side partials) — the guarded-reps contract
      timeNoop("permutation_2m")(
        graft.operators.Inference.permutationTest(
          events2m.select(col("event_id"),
            pmod(xxhash64(col("event_id")), lit(100000)).as("m")),
          col("m"), "event_id", col("event_id") % 2 === 0,
          reps = 64, seed = 14L)),
      // AR identification at 2M x 20 types: lag equi-joins ride the
      // calendar-bounded hour frame, never the stream
      timeNoop("yule_walker_2m")(
        graft.operators.Inference.yuleWalkerAr2(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      timeNoop("pacf_2m")(
        graft.operators.Inference.pacfDl(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      timeNoop("granger_2m")(
        graft.operators.Inference.grangerF(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(4)))),
          causeType = "t0", effectType = "t1")),
      // Hurst R/S at 2M events: blocks partition the ~720-hour global
      // frame; the fit folds 4 points
      timeNoop("hurst_2m")(
        graft.operators.Inference.hurstExponent(events2m)),
      // AD uniformity at 2M events: the 1000-cell frame is the entire
      // post-collapse working set
      timeNoop("ad_uniformity_2m")(
        graft.operators.Inference.adUniformity(events2m)),
      // DP mean at 2M events x 20 types x 20k units: one unit-keyed sum
      // + one group rollup; noise row-local on 20 rows
      timeNoop("dp_mean_2m")(
        graft.operators.Reports.dpMean(
          events2m
            .withColumn("event_type",
              concat(lit("t"), pmod(col("user_id"), lit(20))))
            .withColumn("value",
              (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
                / 100.0)),
          "event_type", "user_id", "value",
          clip = 5000.0, releaseId = "stress")),
      // isotonic calibration at corpus scale: one binned count over n
      // docs, then three bounded joins on the 20-bin frame
      timeNoop("quality_isotonic")(
        graft.operators.Quality.isotonicCalibration(docs,
          (pmod(xxhash64(col("doc_id")), lit(1000)).cast("double")
            / 1000.0),
          pmod(xxhash64(col("doc_id"), lit(3)), lit(4)) === 0L,
          nBins = 20)),
      // hourly JS drift at 2M events: the (hour, bin) collapse is the
      // corpus cost; 720 bounded per-hour folds
      timeNoop("drift_hourly_2m")(
        graft.operators.Reports.driftHourly(
          events2m.withColumn("value",
            (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
              / 100.0)),
          col("value"), width = 100L, nBins = 10)),
      // ---- round-14 wave-3 estimation tier at corpus scale ----------
      // HT / ratio estimators: the measured cost is ONE tokenize pass
      // over the corpus (the estimator math runs on <=1000-row frames)
      timeNoop("ht_estimate")(
        graft.operators.Estimation.htEstimate(docs,
          size(split(col("text"), "\\s+")).cast("bigint"),
          "doc_id", octet_length(col("text")))),
      timeNoop("ratio_estimate")(
        graft.operators.Estimation.ratioEstimate(docs,
          size(split(col("text"), "\\s+")).cast("bigint"),
          octet_length(col("text")), "doc_id")),
      // capture-recapture over distinct fingerprints: one md5 pass +
      // one distinct; the Chapman math is a 1-row finish
      timeNoop("capture_recapture")(
        graft.operators.Estimation.captureRecapture(docs)),
      // richness pair over the BIGRAM spectrum (matching the registered
      // query: the hash-word corpus has no rare unigram tail either)
      timeNoop("good_turing")(
        graft.operators.Estimation.goodTuring(docs, ngram = 2)),
      timeNoop("chao1_vocab")(
        graft.operators.Estimation.chao1(docs, ngram = 2)),
      // Cramér's V at 2M events on a 20x100 contingency: the cell
      // collapse is the corpus cost, the fold runs 2000 cells
      timeNoop("cramers_2m")(
        graft.operators.Reports.cramersV(
          events2m
            .withColumn("ua", concat(lit("t"), pmod(col("user_id"), lit(20))))
            .withColumn("ub", pmod(xxhash64(col("user_id")), lit(100))
              .cast("string")),
          "ua", "ub")),
      // naive-forecast baseline at 2M events x 20 types: one hourly
      // collapse + one hour+1 equi-join on the calendar frame
      timeNoop("forecast_baseline_2m")(
        graft.operators.Reports.forecastBaseline(
          events2m.withColumn("event_type",
            concat(lit("t"), pmod(col("user_id"), lit(20)))))),
      // ---- round-15: corpus-scale text ops at the 2M-doc tier --------
      // (the two operators r14 left outside the stress convention)
      timeNoop("text_rank_2m")(
        graft.operators.Curation.textRank(docs2mVocab)),
      timeNoop("rake_keywords_2m")(
        graft.operators.Curation.rakeKeywords(docs2mVocab,
          stopwords = Seq("the", "a", "of", "and"))),
      // forecast skill at 2M x 20 types: both parents' hourly collapses
      // plus the per-type ratio join (the registered composite's shape)
      timeNoop("forecast_skill_2m") {
        val ev = events2m.withColumn("event_type",
          concat(lit("t"), pmod(col("user_id"), lit(20))))
        val hw = graft.streaming.EventStreams.holtWintersBacktest(ev)
          .select(col("event_type"), col("n_eval"),
            col("mae").as("hm"), col("rmse").as("hr"))
        val nb = graft.operators.Reports.forecastBaseline(ev)
          .select(col("event_type"), col("n_pairs"),
            col("naive_mae").as("nm"), col("naive_rmse").as("nr"))
        hw.join(nb, Seq("event_type"))
          .select(col("event_type"), col("n_eval"), col("n_pairs"),
            round(col("hm") / col("nm"), 6).as("mase"),
            round(col("hr") / col("nr"), 6).as("u2"))
      }
      // (the embed_hash / text_entropy rows above now measure the native
      // one-pass kernels — compare against STRESS_r9's HOF-fold numbers)
    )
    // Round-14: the remaining streaming twins at 2M events, with STATE
    // SIZE reported from the engine's own progress metrics (max
    // numRowsTotal across micro-batches) — the number that decides
    // whether the stateful shape survives an unbounded stream. Same
    // ordered file-source pattern as holt_winters_stream_2m: 10
    // event-time chunks + 2 watermark sentinels, maxFilesPerTrigger=1.
    val streamStateRows = scala.collection.mutable.Map.empty[String, Long]
    def shipChunks(dir: java.io.File, staging: java.io.File, mtime0: Long)(
        df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val stage = new java.io.File(staging, s"c$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"chunk_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime0 + i * 60000L)
    }
    val streamTwins: Seq[(String, Double, Long)] = {
      val spanUs2 = 30L * 24 * 3600 * 1000000L
      import spark.implicits._
      Seq(
        // sessionize twin: flatMapGroupsWithState + EventTimeTimeout at
        // 2M events / 20k users. The ~7h mean inter-event gap vs the
        // 30-min session gap means most events close as singleton
        // sessions at watermark passage — state stays one open session
        // per RECENTLY-ACTIVE user, not per user ever seen
        time("sessionize_stream_2m") {
          val dir = java.nio.file.Files
            .createTempDirectory("sess_stream_2m").toFile
          val staging = java.nio.file.Files
            .createTempDirectory("sess_stream_2m_stage").toFile
          val ship = shipChunks(dir, staging, 3000000000000L) _
          val src = events2m.select(
            col("user_id"),
            timestamp_micros(col("ts")).as("ts"),
            lit("evt").as("event_type"),
            lit(1.0).as("value"))
          for (i <- 0 until 10)
            ship(src.filter(
              col("ts") >= timestamp_micros(lit(i * spanUs2 / 10)) &&
                col("ts") < timestamp_micros(lit((i + 1) * spanUs2 / 10))), i)
          for (k <- 0 until 2)
            ship(Seq((0L, new java.sql.Timestamp(spanUs2 / 1000L + 7200000L),
              "zz", 1.0)).toDF("user_id", "ts", "event_type", "value"), 10 + k)
          val stream = spark.readStream
            .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING, " +
              "value DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(dir.toString)
            .as[graft.streaming.EventStreams.Event]
          val q = graft.streaming.EventStreams.sessionizeStream(stream)
            .writeStream.format("memory").queryName("sess_stream_2m")
            .outputMode("append").start()
          q.processAllAvailable()
          streamStateRows("sessionize_stream_2m") = q.recentProgress
            .flatMap(_.stateOperators.map(_.numRowsTotal))
            .foldLeft(0L)(math.max)
          q.stop()
          spark.table("sess_stream_2m").count()
        },
        // exact-dedup twin: dropDuplicates behind a 1-hour watermark at
        // 2M rows, 50% planted duplicates ADJACENT in event time (ts
        // monotone in id, pair = id div 2) so the dedup actually fires;
        // state is the digests inside the watermark horizon (~1h of
        // docs), NOT every digest ever seen — the bounded-state claim
        // the operator's scaladoc makes, read off numRowsTotal here
        time("dedup_stream_2m") {
          val dir = java.nio.file.Files
            .createTempDirectory("dedup_stream_2m").toFile
          val staging = java.nio.file.Files
            .createTempDirectory("dedup_stream_2m_stage").toFile
          val ship = shipChunks(dir, staging, 4000000000000L) _
          val src = spark.range(2000000L).select(
            col("id").as("doc_id"),
            timestamp_micros(col("id") * lit(spanUs2 / 2000000L)).as("ts"),
            concat(lit("doc "),
              pmod(xxhash64(floor(col("id") / 2L)), lit(1000000000L))
                .cast("string")).as("text"))
          for (i <- 0 until 10)
            ship(src.filter(col("doc_id") >= i * 200000L &&
              col("doc_id") < (i + 1) * 200000L), i)
          for (k <- 0 until 2)
            ship(Seq((0L, new java.sql.Timestamp(spanUs2 / 1000L + 7200000L),
              "sentinel")).toDF("doc_id", "ts", "text"), 10 + k)
          val stream = spark.readStream
            .schema("doc_id BIGINT, ts TIMESTAMP, text STRING")
            .option("maxFilesPerTrigger", "1")
            .parquet(dir.toString)
          val q = graft.streaming.EventStreams
            .dedupStream(stream, watermarkDelay = "1 hour")
            .writeStream.format("memory").queryName("dedup_stream_2m")
            .outputMode("append").start()
          q.processAllAvailable()
          streamStateRows("dedup_stream_2m") = q.recentProgress
            .flatMap(_.stateOperators.map(_.numRowsTotal))
            .foldLeft(0L)(math.max)
          q.stop()
          spark.table("dedup_stream_2m").count()
        },
        // hourly drift monitor twin: per-open-hour fixed nBins state,
        // reference trained once on the same 2M events (the production
        // wiring) — state rows = hours in flight, never event volume
        time("drift_stream_2m") {
          val dir = java.nio.file.Files
            .createTempDirectory("drift_stream_2m").toFile
          val staging = java.nio.file.Files
            .createTempDirectory("drift_stream_2m_stage").toFile
          val ship = shipChunks(dir, staging, 5000000000000L) _
          val spanUs2 = 30L * 24 * 3600 * 1000000L
          val src = events2m.select(
            col("user_id"),
            timestamp_micros(col("ts")).as("ts"),
            lit("evt").as("event_type"),
            (pmod(xxhash64(col("event_id")), lit(100000)).cast("double")
              / 100.0).as("value"))
          // train the broadcast reference exactly as the batch op does
          val ref = Array.fill(10)(0L)
          src.select(greatest(least(
            floor(col("value").cast("bigint") / lit(100L)).cast("bigint"),
            lit(9L)), lit(0L)).as("bin"))
            .groupBy("bin").count().collect()
            .foreach(r => ref(r.getLong(0).toInt) = r.getLong(1))
          for (i <- 0 until 10)
            ship(src.filter(
              col("ts") >= timestamp_micros(lit(i * spanUs2 / 10)) &&
                col("ts") < timestamp_micros(lit((i + 1) * spanUs2 / 10))), i)
          for (k <- 0 until 2)
            ship(Seq((0L, new java.sql.Timestamp(spanUs2 / 1000L + 7200000L),
              "zz", 1.0)).toDF("user_id", "ts", "event_type", "value"), 10 + k)
          val stream = spark.readStream
            .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING, " +
              "value DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(dir.toString)
            .as[graft.streaming.EventStreams.Event]
          val q = graft.streaming.EventStreams.driftHourlyStream(stream,
            refCounts = ref.toSeq, refTotal = ref.sum, width = 100L)
            .writeStream.format("memory").queryName("drift_stream_2m")
            .outputMode("append").start()
          q.processAllAvailable()
          streamStateRows("drift_stream_2m") = q.recentProgress
            .flatMap(_.stateOperators.map(_.numRowsTotal))
            .foldLeft(0L)(math.max)
          q.stop()
          spark.table("drift_stream_2m").count()
        })
    }
    // Advisor -> executor payoff, EMPIRICALLY: one planted-whale fact
    // (half of 2M rows on a single key) joined to a 1000-key dim,
    // unsalted vs salted with the advisor's OWN salt_factor, collected
    // from the advisor row exactly as a planner would. Both rows run
    // with broadcast and AQE's skew splitter DISABLED (restored after):
    // the pair isolates the salting mechanism in the regime it exists
    // for — a dim past the broadcast budget (modeled via
    // broadcastRows = 1) and a runtime that cannot rebalance the hot
    // key. targetPartitionRows = 62500 sizes salted sub-partitions to
    // the 32-core box the suite runs on.
    val whalePair: Seq[(String, Double, Long)] = {
      val fact = spark.range(8000000L).select(
        when(col("id") < 4000000L, lit(0L))
          .otherwise(pmod(col("id"), lit(1000L))).as("k"),
        col("id").as("payload"))
      val dim = spark.range(1000L).select(col("id").as("k"),
        (col("id") * 7L).as("dim_attr"))
      val adv = Joins.joinAdvisor(fact.select("k"), dim.select("k"), "k",
        broadcastRows = 1L, targetPartitionRows = 62500L).collect()(0)
      assert(adv.getAs[String]("recommendation") == "salt_skewed_key",
        s"whale pair expects salt_skewed_key, got $adv")
      val sf = adv.getAs[Long]("salt_factor").toInt
      val saveB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val saveS = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try Seq(
        timeNoop("join_whale_unsalted")(fact.join(dim, Seq("k"))),
        timeNoop("join_whale_salted_advisor")(
          Joins.saltedJoin(fact, dim, "k", saltFactor = sf)))
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saveB)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", saveS)
      }
    }
    // ---- round-15: SemDeDup stress pair, with PLANTED ground truth ---
    // Corpus: even ids come in 5-member families sharing ONE vector
    // (floor(id/10)*10 seeds the hash); odd ids are uniform noise. At
    // threshold 0.8 only planted pairs qualify (random 64-dim cosines
    // concentrate within ~0.4 of zero), so the correct prune is EXACTLY
    // 4 losers per family: 800,000 of 2M (40%) at the full tier.
    val emb2m = spark.range(2000000L).select(
      col("id").as("vec_id"),
      when(col("id") % 2 === 0,
        transform(sequence(lit(0), lit(63)),
          i => ((pmod(xxhash64((floor(col("id") / 10) * 10).cast("long"), i),
            lit(2000)) - 1000).cast("double") / 1000.0).cast("float")))
        .otherwise(transform(sequence(lit(0), lit(63)),
          i => ((pmod(xxhash64(col("id"), i), lit(2000)) - 1000)
            .cast("double") / 1000.0).cast("float"))).as("embedding"),
      pmod(xxhash64(col("id"), lit(7)), lit(1000000L)).as("q"))
      .persist()
    emb2m.count()
    var semLosers: org.apache.spark.sql.DataFrame = null
    var semCentroid: org.apache.spark.sql.DataFrame = null
    val semRows: Seq[(String, Double, Long)] = Seq(
      // 2M tier = the sign-LSH bucket path: assignment is O(planes x dim)
      // per row so the bucket count scales with the corpus, where the
      // centroid tier's cellOf is O(anchors x dim) per row and its
      // within-cell quadratic is N^1.5 at the optimal anchor count —
      // affordable at the 500k tier below, not at 2M on one box. The
      // keep-best rule drops each qualifying pair's lower-q member.
      // Identical family vectors share every plane sign (planted recall
      // 1.0), so the loser count must land on exactly 800,000.
      time("semantic_dedup_lsh_2m") {
        val pairs = Dedup.embeddingNearDupLshMultiProbe(emb2m, 0.8,
          nPlanes = 16, nProbe = 1, dim = 64, maxBucketSize = 8192)
        def qOf(c: org.apache.spark.sql.Column) =
          pmod(xxhash64(c, lit(7)), lit(1000000L))
        semLosers = pairs
          .select(when(qOf(col("id_a")) >= qOf(col("id_b")), col("id_b"))
            .otherwise(col("id_a")).as("loser"))
          .distinct().localCheckpoint()
        semLosers.count()
      },
      // the centroid tier (the oracled semantic_dedup_keep_best shape)
      // at its in-contract scale: 1024 anchors over 500k vectors give
      // ~500-row cells, no conservative sub-split — planted recovery
      // must be exact here too (4/5 of the even half = 200,000 losers)
      time("semantic_dedup_500k") {
        val half = emb2m.filter(col("vec_id") < 500000L)
        val anchors = half
          .filter(col("vec_id") % 2 === 1 && col("vec_id") < 2048L)
          .select(col("vec_id"), col("embedding")).collect().toSeq
          .map(r => (r.getLong(0), r.getSeq[Float](1)))
        semCentroid = Dedup.semanticDedupKeepBest(half, anchors, 0.8, "q")
          .localCheckpoint()
        semCentroid.count()
      })
    // prune rates + cluster-size histograms (the blocking structures the
    // quadratics actually ran in), reported as top-level JSON fields
    val semPruned2m = semLosers.count()
    val semPruned500k = semCentroid.filter(!col("kept")).count()
    val bhist = emb2m.select(
      Dedup.lshBucket(col("embedding"), Dedup.lshPlanes(64, 16, 7L)).as("b"))
      .groupBy("b").count()
      .agg(count(lit(1)).as("nb"), max("count").as("mx"),
        expr("CAST(percentile(count, 0.5) AS DOUBLE)").as("p50"),
        expr("CAST(percentile(count, 0.99) AS DOUBLE)").as("p99"))
      .collect()(0)
    val chist = semCentroid.groupBy("cell").count()
      .agg(count(lit(1)).as("nc"), max("count").as("mx"),
        expr("CAST(percentile(count, 0.5) AS DOUBLE)").as("p50"),
        expr("CAST(percentile(count, 0.99) AS DOUBLE)").as("p99"))
      .collect()(0)
    val semJson =
      f""""semantic_dedup_lsh_2m_pruned":$semPruned2m,""" +
        f""""semantic_dedup_lsh_2m_planted":800000,""" +
        f""""semantic_dedup_lsh_2m_prune_rate":${semPruned2m / 2e6}%.4f,""" +
        f""""semantic_dedup_lsh_2m_buckets":${bhist.getAs[Long]("nb")},""" +
        f""""semantic_dedup_lsh_2m_bucket_p50":${bhist.getAs[Double]("p50")}%.1f,""" +
        f""""semantic_dedup_lsh_2m_bucket_p99":${bhist.getAs[Double]("p99")}%.1f,""" +
        f""""semantic_dedup_lsh_2m_bucket_max":${bhist.getAs[Long]("mx")},""" +
        f""""semantic_dedup_500k_pruned":$semPruned500k,""" +
        f""""semantic_dedup_500k_planted":200000,""" +
        f""""semantic_dedup_500k_prune_rate":${semPruned500k / 5e5}%.4f,""" +
        f""""semantic_dedup_500k_cells":${chist.getAs[Long]("nc")},""" +
        f""""semantic_dedup_500k_cell_p50":${chist.getAs[Double]("p50")}%.1f,""" +
        f""""semantic_dedup_500k_cell_p99":${chist.getAs[Double]("p99")}%.1f,""" +
        f""""semantic_dedup_500k_cell_max":${chist.getAs[Long]("mx")}"""
    emb2m.unpersist()

    // ---- round-15: the FULL curate composite at the 2M-doc tier, per
    // stage (each stage starts from a materialized input, the
    // StressPipeline discipline). The corpus interleaves en stopwords
    // (2 of every 5 tokens) with per-doc hash words, so the language /
    // quality gates pass and the per-doc vocabulary stays disjoint —
    // decontamination measures its shingle join honestly instead of
    // dropping everything (every 3-gram contains a doc-unique word).
    docs2mVocab.unpersist()
    val enFill = Seq("the", "a", "of", "and")
    val docs2mEn = spark.range(2000000L).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 50).map { i =>
        if (i % 5 < 2) lit(enFill((i / 5 + i) % 4))
        else concat(lit("w"), pmod(xxhash64(col("id"), lit(i)),
          lit(100000000L)).cast("string"))
      }: _*).as("text"),
      (col("id") % 20).cast("string").as("source"))
      .persist()
    docs2mEn.count()
    val curateRows: Seq[(String, Double, Long)] = {
      val corpus = docs2mEn.filter(col("source") =!= "0")
      val bench = docs2mEn.filter(col("source") === "0")
      var curated: org.apache.spark.sql.DataFrame = null
      var clean: org.apache.spark.sql.DataFrame = null
      var mixed: org.apache.spark.sql.DataFrame = null
      val s1 = time("curate_2m_curate") {
        curated = Curation.curate(corpus).localCheckpoint()
        curated.count()
      }
      val s2 = time("curate_2m_decon") {
        val d = Curation.decontaminate(curated, bench,
          shingleN = 3, maxOverlap = 0.2)
        clean = curated
          .join(d.filter(!col("contaminated")).select("doc_id"), Seq("doc_id"))
          .join(docs2mEn.select("doc_id", "source"), Seq("doc_id"))
          .localCheckpoint()
        clean.count()
      }
      val s3 = time("curate_2m_mix") {
        mixed = Curation.hashSample(clean, "source",
          (1 to 19).map(i => i.toString ->
            (if (i % 2 == 0) 0.5 else 1.0)).toMap,
          seed = 7L).localCheckpoint()
        mixed.count()
      }
      val s4 = timeNoop("curate_2m_pack")(
        Curation.packSequences(
          Curation.chunkTokens(mixed, chunkSize = 64, overlap = 16),
          binTokens = 256))
      Seq(s1, s2, s3, s4)
    }
    docs2mEn.unpersist()

    // ---- round-17: audio fingerprint near-dup at the 2M tier (VERDICT
    // r16 #3). 1M two-member re-gained families (fakeAudioGainPairsTable:
    // shared pseudo-random waveform, odd member at 3x gain): every
    // payload is a REAL PCM16 WAV round-tripping through javax.sound,
    // so the timed row pays synthesis + 2M decodes + the banded
    // pigeonhole join — the full production path. Planted recovery must
    // be EXACT (1,000,000 pairs: gain-invariant fingerprints collide at
    // hamming 0; chance cross-family hamming<=3 is ~2e-9 per candidate),
    // and the fingerprint-band bucket histogram is reported so a whale
    // bucket (fingerprint-entropy collapse) is visible, the
    // semantic_dedup_lsh_2m discipline.
    val M = graft.operators.Multimodal
    val audio2m = M.fakeAudioGainPairsTable(
      spark.range(2000000L).select(col("id").as("doc_id"))).persist()
    audio2m.count()
    var audioPairs: org.apache.spark.sql.DataFrame = null
    val audioRows: Seq[(String, Double, Long)] = Seq(
      time("audio_neardup_2m") {
        audioPairs = M.audioNearDup(audio2m, maxHamming = 3).localCheckpoint()
        audioPairs.count()
      })
    val audioTotalPairs = audioPairs.count()
    val audioRecovered = audioPairs
      .filter(expr("id_a div 2 = id_b div 2")).count()
    val afps = M.audioFingerprints(audio2m).persist()
    val audioDecoded = afps.filter(col("decoded")).count()
    val ahist = afps.select(
      posexplode(array((0 until 4).map(b =>
        shiftright(col("afp"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("bi", "bv")))
      .groupBy("bi", "bv").count()
      .agg(count(lit(1)).as("nb"), max("count").as("mx"),
        expr("CAST(percentile(count, 0.5) AS DOUBLE)").as("p50"),
        expr("CAST(percentile(count, 0.99) AS DOUBLE)").as("p99"))
      .collect()(0)
    afps.unpersist()
    val audioJson =
      f""""audio_2m_decoded":$audioDecoded,""" +
        f""""audio_2m_pairs":$audioTotalPairs,""" +
        f""""audio_2m_recovered_planted":$audioRecovered,""" +
        f""""audio_2m_planted":1000000,""" +
        f""""audio_2m_buckets":${ahist.getAs[Long]("nb")},""" +
        f""""audio_2m_bucket_p50":${ahist.getAs[Double]("p50")}%.1f,""" +
        f""""audio_2m_bucket_p99":${ahist.getAs[Double]("p99")}%.1f,""" +
        f""""audio_2m_bucket_max":${ahist.getAs[Long]("mx")}"""
    audio2m.unpersist()

    // PQ QUALITY at corpus scale (not timings). Two numbers per codebook:
    // quantization distortion (the training objective) and recall@10 vs
    // exact L2 for 32 queries. Measured on a CLUSTERED corpus (VERDICT
    // r15 #2 — on the uniform corpus recall was concentration-limited
    // and meaningless): 20-member planted families, family center
    // hash-uniform in [-1,1]^64, member noise ±0.4 — the semantic_dedup
    // planted-family discipline. True neighbors are family members
    // (within-family L2² ≈ 6.8 vs cross-family ≈ 42); the noise is wide
    // enough that family members do NOT share the query's PQ code (with
    // near-dup noise any codebook scores a shared code at the exact ADC
    // minimum and recall is trivially 1), so code RESOLUTION is what's
    // graded. This geometry also
    // surfaces the REAL production failure seed codebooks have: the
    // first 16 corpus rows are one family (clustered data arrives
    // ordered), so pqTrainSeed's 16 centroids per subspace collapse to
    // nearly one point, every candidate's ADC distance degenerates to a
    // constant, and recall dies; the hash-sampled + Lloyd-refined
    // codebook spreads over the data and recovers the families. Queries
    // sit evenly across the id range, far from the degenerate head, so
    // tie-breaking can't hand the seed tier accidental hits.
    val pqQuality: (Double, Double, Double, Double) = {
      val Sim = graft.operators.Similarity
      val embFam = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          (((pmod(xxhash64(expr("id div 20"), i), lit(2000)) - 1000)
            .cast("double") / 1000.0) +
            ((pmod(xxhash64(col("id"), i, lit(99L)), lit(800)) - 400)
              .cast("double") / 1000.0)).cast("float")).as("embedding"))
        .persist()
      embFam.count()
      val qStep = math.max(n / 32L, 1L)
      val queries = embFam.filter(
        pmod(col("vec_id"), lit(qStep)) === lit(qStep / 2))
      def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        df.select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val exact = neighbors(Sim.exactTopKL2(embFam, queries, k = 10))
      def recallOf(cb: Sim.PqCodebook): Double = {
        val got = neighbors(Sim.pqTopKRerank(embFam, queries, cb, k = 10, shortlist = 100))
        exact.map { case (qid, truth) =>
          got.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
        }.sum / exact.size
      }
      val sample = embFam.filter(col("vec_id") % 37 === 0)
        .select(col("embedding")).collect().map(_.getSeq[Float](0)).toSeq
      val seedCb = Sim.pqTrainSeed(embFam, 8, 16, 64)
      val trainedCb = Sim.pqTrainKmeans(embFam, 8, 16, 64, iters = 2)
      val out = (recallOf(seedCb), recallOf(trainedCb),
        Sim.pqDistortion(sample, seedCb), Sim.pqDistortion(sample, trainedCb))
      embFam.unpersist()
      out
    }
    val qs = (results ++ streamTwins ++ whalePair ++ semRows ++ curateRows ++ audioRows)
      .map { case (k, s, rows) =>
        f""""$k":{"sec":$s%.2f,"rows":$rows}"""
      }.mkString("{", ",", "}")
    val stateJson = streamStateRows.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${k}_state_rows":$v""" }.mkString(",")
    println(f"""{"nDocs":$n,"pq_recall_seed":${pqQuality._1}%.3f,"pq_recall_trained":${pqQuality._2}%.3f,"pq_distortion_seed":${pqQuality._3}%.3f,"pq_distortion_trained":${pqQuality._4}%.3f,$semJson,$audioJson,$stateJson,"ops":$qs}""")
    spark.stop()
  }
}
