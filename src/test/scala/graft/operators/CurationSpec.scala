package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox and the lazy dog sit in a field of tall grass " * 3),
    (2L, "the quick brown fox and the lazy dog sit in a field of tall grass " * 3), // dup of 1
    (3L, "der hund und die katze sind nicht auf der wiese mit dem ball und der " * 3),
    (4L, "!!!! ???? ++++ #### %%%% " * 10), // punctuation junk
    (5L, "tiny"), // too short
    (6L, "it was the best of times and it was the worst of times in the city " * 3)
  ).toDF("doc_id", "text")

  "curate" should "keep first of exact dups, drop junk/short/foreign docs" in {
    val out = Curation.curate(docs).select("doc_id").as[Long].collect().sorted
    // 2 deduped against 1; 3 is German (langs=en only); 4 junk quality; 5 short
    out shouldBe Array(1L, 6L)
  }

  "gate" should "filter like curate but keep BOTH exact duplicates" in {
    val out = Curation.gate(docs).select("doc_id").as[Long].collect().sorted
    // same junk/short/foreign drops as curate, but 2 (exact dup of 1)
    // survives — the gate owns scoring only; dedup is a separate stage
    out shouldBe Array(1L, 2L, 6L)
  }

  it should "score quality in [0,1] with en stopword and length signals" in {
    val scored = Curation.curate(docs, Curation.Config(
      minChars = 1, minQuality = 0.0, languages = Seq("en", "de", "und")))
    val q = scored.select("doc_id", "quality").as[(Long, Double)].collect().toMap
    all(q.values) should (be >= 0.0 and be <= 1.0)
    q(1L) should be > q(4L) // real text beats punctuation soup
  }

  "sampleToTokenBudget" should "match the naive global-window formulation exactly" in {
    // 200 docs with clashing qualities and varied token counts
    val curated = spark.range(1, 201).select(
      col("id").as("doc_id"),
      round((col("id") % 17).cast("double") / 17.0, 6).as("quality"),
      (col("id") % 29 + 1).cast("bigint").as("n_tokens"))
    val budget = 900L
    val naive = {
      val w = Window.orderBy(col("quality").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      curated.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= budget)
        .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSet
    }
    val banded = Curation.sampleToTokenBudget(curated, budget)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toSet
    banded shouldBe naive
    banded should not be empty
  }

  "chunkTokens" should "window tokens with overlap, preserving order and short tails" in {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val out = Curation.chunkTokens(
      Seq((1L, doc), (2L, "only three tokens")).toDF("doc_id", "text"),
      chunkSize = 4, overlap = 1) // stride 3 → chunks at 0,3,6,9
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    out.filter(_._1 == 1L).map(_._3) shouldBe Array(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10")
    out.filter(_._1 == 1L).map(_._4) shouldBe Array(4L, 4L, 4L)
    // short doc → exactly one (short) chunk
    out.filter(_._1 == 2L) shouldBe Array((2L, 0, "only three tokens", 3L))
    // every token of the source appears in some chunk (coverage)
    out.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet shouldBe
      (1 to 10).map(i => s"t$i").toSet
  }

  "packSequences" should "cut the ordered chunk stream into fixed-token bins" in {
    val chunks = Seq(
      (1L, 0, 10L), (1L, 1, 10L), (2L, 0, 7L), (3L, 0, 10L), (3L, 1, 3L)
    ).toDF("doc_id", "chunk_idx", "n_tokens")
    val out = Curation.packSequences(chunks, binTokens = 16L)
      .select("doc_id", "chunk_idx", "bin_id", "bin_pos")
      .as[(Long, Int, Long, Long)].collect().sortBy(t => (t._1, t._2))
    // stream offsets: 0,10,20,27,37 → bins of 16: 0,0,1,1,2
    out shouldBe Array(
      (1L, 0, 0L, 0L), (1L, 1, 0L, 10L),
      (2L, 0, 1L, 4L),
      (3L, 0, 1L, 11L), (3L, 1, 2L, 5L))
  }

  "curate_pipeline composite" should "compose dedup, decon, mix and pack end to end" in {
    // mirrors SparkEntry's curate_pipeline registration at spec scale
    val en = "the quick brown fox and the lazy dog sit in a field of tall grass "
    // shares NO 3-gram with `en` (doc 1 must survive the decon gate)
    val leak = "the secret benchmark answer is alpha beta gamma and " +
      "the answer is delta epsilon for this held out set "
    val corpus = Seq(
      (1L, en * 3, "src1"),
      (2L, en * 3, "src1"), // exact dup of 1 → curate drops it
      (3L, leak * 3, "src1"), // verbatim benchmark leak → decon drops it
      (4L, "it was the best of times and it was the worst of times here " * 3,
        "src1")
    ).toDF("doc_id", "text", "source")
    val bench = Seq((100L, leak * 3)).toDF("doc_id", "text")
    val curated = Curation.curate(corpus).localCheckpoint(true)
    val decon = Curation.decontaminate(curated, bench,
      shingleN = 3, maxOverlap = 0.2)
    val clean = curated
      .join(decon.filter(!col("contaminated")).select("doc_id"), Seq("doc_id"))
      .join(corpus.select("doc_id", "source"), Seq("doc_id"))
    val mixed = Curation.hashSample(clean, "source",
      Map("src1" -> 1.0), seed = 7L)
    val packed = Curation.packSequences(
      Curation.chunkTokens(mixed, chunkSize = 64, overlap = 16),
      binTokens = 256)
      .select("doc_id", "chunk_idx", "n_tokens", "bin_id", "bin_pos")
      .as[(Long, Int, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._2))
    // the dup and the leaked doc are gone; the survivors reach the packer
    packed.map(_._1).distinct.sorted shouldBe Array(1L, 4L)
    // packing invariants survive the composition: in-bin offsets bounded,
    // and global starts reconstruct the exact running token sum
    all(packed.map(_._5)) should (be >= 0L and be < 256L)
    val starts = packed.map(t => t._4 * 256L + t._5)
    starts shouldBe packed.map(_._3).scanLeft(0L)(_ + _).init
  }

  it should "match the naive global-window packing on many bands" in {
    val chunks = spark.range(0, 3000).select(
      (col("id") / 3).cast("long").as("doc_id"),
      (col("id") % 3).cast("int").as("chunk_idx"),
      (col("id") % 7 + 1).cast("bigint").as("n_tokens"))
    val naive = {
      val w = Window.orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
      chunks.withColumn("s", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .select(col("doc_id"), col("chunk_idx"),
          floor(col("s") / 128L).cast("bigint").as("bin_id"))
        .as[(Long, Int, Long)].collect().toSet
    }
    // tiny bands so the offsets path actually exercises many bands
    Curation.packSequences(chunks, binTokens = 128L, docsPerBand = 50L)
      .select("doc_id", "chunk_idx", "bin_id")
      .as[(Long, Int, Long)].collect().toSet shouldBe naive
  }

  "hashSample" should "be deterministic per seed, honor fractions, drop unmapped strata" in {
    val pool = spark.range(0, 2000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("src"))
    val s1 = Curation.hashSample(pool, "src", Map("a" -> 0.5), seed = 1L)
    s1.select("doc_id").as[Long].collect().sorted shouldBe
      Curation.hashSample(pool, "src", Map("a" -> 0.5), seed = 1L)
        .select("doc_id").as[Long].collect().sorted
    s1.filter(col("src") === "b").count() shouldBe 0
    s1.count().toDouble / 1000 shouldBe 0.5 +- 0.08
    val s2 = Curation.hashSample(pool, "src", Map("a" -> 0.5), seed = 2L)
      .select("doc_id").as[Long].collect().toSet
    s2 should not equal s1.select("doc_id").as[Long].collect().toSet
  }

  it should "respect an exact-boundary budget" in {
    val curated = Seq(
      (1L, 0.9, 10L), (2L, 0.8, 10L), (3L, 0.7, 10L)
    ).toDF("doc_id", "quality", "n_tokens")
    Curation.sampleToTokenBudget(curated, 20L)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    Curation.sampleToTokenBudget(curated, 9L).count() shouldBe 0L
  }

  "decontaminate" should "flag docs overlapping the benchmark and pass clean ones" in {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains benchmark 3-grams
      (2L, "totally unrelated content about nothing at all"),
      (3L, "alpha beta gamma but then it diverges completely from here")
    ).toDF("doc_id", "text")
    val benchmark = Seq((99L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val r = Curation.decontaminate(corpus, benchmark, shingleN = 3, maxOverlap = 0.5)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_hits"), x.getAs[Boolean]("contaminated"))).toMap
    // doc 1: 4 shingles, 3 of them ("alpha beta gamma", "beta gamma delta",
    // "gamma delta epsilon") in the benchmark -> 0.75 >= 0.5
    r(1L) shouldBe ((3L, true))
    r(2L)._1 shouldBe 0L
    r(2L)._2 shouldBe false
    // doc 3: only "alpha beta gamma" hits; 1/8 < 0.5
    r(3L) shouldBe ((1L, false))
  }

  "decontaminateBloom" should "match the exact variant's counts modulo bloom over-counting" in {
    // the real sf0.001 corpus: src0 as the benchmark, same params as the
    // decontaminate/decontaminate_bloom query pair
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val exact = Curation.decontaminate(corpus, bench, shingleN = 3, maxOverlap = 0.2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_shingles"), x.getAs[Long]("n_hits"),
          x.getAs[Boolean]("contaminated"))).toMap
    val bloom = Curation.decontaminateBloom(corpus, bench, shingleN = 3,
        maxOverlap = 0.2, fpp = 0.001)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_shingles"), x.getAs[Long]("n_hits"),
          x.getAs[Boolean]("contaminated"))).toMap
    bloom.keySet shouldBe exact.keySet
    var extraHits = 0L
    var totalShingles = 0L
    for ((id, (nExact, hExact, fExact)) <- exact) {
      val (nBloom, hBloom, fBloom) = bloom(id)
      withClue(s"doc $id: ") {
        nBloom shouldBe nExact // shingle counts identical
        hBloom should be >= hExact // no false negatives, ever
        if (fExact) fBloom shouldBe true // a contaminated doc never leaks
      }
      extraHits += hBloom - hExact
      totalShingles += nExact
    }
    // over-count bounded by ~fpp (generous 10x headroom for a small corpus)
    extraHits.toDouble / totalShingles should be < 0.01
  }

  "decontaminateFuzzy" should "flag near-duplicates of benchmark docs and keep every corpus doc in the output" in {
    val bench = Seq(
      (900L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy of the benchmark doc
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      // light edit (one word changed): char-shingle Jaccard stays high
      (2L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      // unrelated
      (3L, "completely different subject matter involving spacecraft telemetry analysis")
    ).toDF("doc_id", "text")
    val r = Curation.decontaminateFuzzy(corpus, bench,
        shingleN = 5, k = 8, bands = 4, minJaccard = 0.5)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("max_est_jaccard"), x.getAs[Boolean]("contaminated"))).toMap
    r.keySet shouldBe Set(1L, 2L, 3L) // every corpus doc present
    r(1L) shouldBe ((1.0, true)) // identical text -> identical signature
    r(2L)._2 shouldBe true // near-dup caught despite the edit
    r(3L) shouldBe ((0.0, false)) // no shared band, scored 0
  }

  it should "never compare corpus docs with each other (two corpus near-dups, clean benchmark)" in {
    val bench = Seq((900L, "benchmark text about something entirely else")).toDF("doc_id", "text")
    val dup = "repeated corpus document body that appears twice verbatim in the corpus"
    val corpus = Seq((1L, dup), (2L, dup)).toDF("doc_id", "text")
    val r = Curation.decontaminateFuzzy(corpus, bench,
        shingleN = 5, k = 8, bands = 4, minJaccard = 0.5)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("contaminated")).toMap
    // identical corpus twins are NOT contamination — only benchmark overlap is
    r shouldBe Map(1L -> false, 2L -> false)
  }

  "funnel" should "report NULL kept_tokens when nothing survives (oracle parity)" in {
    val docs = Seq((1L, "tiny"), (2L, "also")).toDF("doc_id", "text") // all < minChars
    val r = Curation.funnel(docs).collect()(0)
    r.getAs[Long]("n_input") shouldBe 2L
    r.getAs[Long]("n_dedup") shouldBe 0L
    r.isNullAt(r.fieldIndex("kept_tokens")) shouldBe true
  }

  it should "count NULL-text docs as inputs that fail the gates, never drop them" in {
    val docs = Seq((1L, Option.empty[String]), (2L, Some("ok " * 40)))
      .toDF("doc_id", "text")
    val r = Curation.funnel(docs).collect()(0)
    // the NULL doc is an input (the whole point of a loss report); it
    // fails the length gate rather than silently vanishing at the explode
    r.getAs[Long]("n_input") shouldBe 2L
    r.getAs[Long]("n_len_ok") shouldBe 1L
  }

  "mixtureSample" should "fill each stratum's token budget independently" in {
    val docs = Seq(
      (1L, "A", 100L, 0.9), (2L, "A", 100L, 0.8), (3L, "A", 100L, 0.7),
      (4L, "B", 100L, 0.95), (5L, "B", 100L, 0.1),
      (6L, "C", 100L, 0.9) // no budget for C → dropped
    ).toDF("doc_id", "source", "n_tokens", "quality")
    val r = Curation.mixtureSample(docs, "source",
      Map("A" -> 250L, "B" -> 100L))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("cum_tokens"))
      .toMap
    // A: quality-desc greedy fill — 1 (cum 100), 2 (cum 200); 3 would hit 300 > 250
    // B: 4 (cum 100 == budget, kept); 5 (cum 200) dropped
    r shouldBe Map(1L -> 100L, 2L -> 200L, 4L -> 100L)
  }

  it should "break quality ties by id and respect a zero budget" in {
    val docs = Seq(
      (2L, "A", 50L, 0.5), (1L, "A", 50L, 0.5), (3L, "B", 10L, 0.9)
    ).toDF("doc_id", "source", "n_tokens", "quality")
    val kept = Curation.mixtureSample(docs, "source",
      Map("A" -> 50L, "B" -> 0L))
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(1L) // tie at 0.5 → lower id first; B budget 0 keeps nothing
  }

  "weightedSample" should "draw a deterministic sample of exactly k rows" in {
    val docs = (1L to 50L).map(i => (i, i * 10L)).toDF("doc_id", "w")
    val a = Curation.weightedSample(docs, "w", k = 5)
      .select("doc_id").as[Long].collect().toSeq
    val b = Curation.weightedSample(docs, "w", k = 5)
      .select("doc_id").as[Long].collect().toSeq
    a shouldBe b // same seed → same sample, independent of execution
    a should have size 5
    a.toSet.subsetOf((1L to 50L).toSet) shouldBe true
  }

  it should "exclude non-positive weights and compile to a top-k, not a global sort" in {
    val docs = Seq((1L, 0L), (2L, -3L), (3L, 5L), (4L, 5L))
      .toDF("doc_id", "w")
    Curation.weightedSample(docs, "w", k = 10)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(3L, 4L)
    // plan shape asserted where k < input rows (a limit covering the whole
    // input is legitimately eliminated by EliminateLimits)
    val many = (1L to 50L).map(i => (i, i)).toDF("doc_id", "w")
    Curation.weightedSample(many, "w", k = 5)
      .queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
  }

  "tfidfTopTerms" should "compute tf, df and scores matching the formula" in {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = Curation.tfidfTopTerms(docs, topK = 5)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[String]("term")) ->
        (x.getAs[Long]("tf"), x.getAs[Long]("df"),
          x.getAs[Double]("tfidf"), x.getAs[Double]("bm25"))).toMap
    val (tfA, dfA, tfidfA, bm25A) = r((1L, "a"))
    tfA shouldBe 2L
    dfA shouldBe 1L
    // N=2 docs, avgdl=(3+2)/2=2.5; tfidf = tf * (ln((N+1)/(df+1)) + 1)
    tfidfA shouldBe math.rint(2.0 * (math.log(3.0 / 2.0) + 1.0) * 1e6) / 1e6
    // bm25 = ln(1+(N-df+0.5)/(df+0.5)) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    val expBm25 = math.log(1.0 + 1.5 / 1.5) * (2.0 * 2.2) /
      (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 2.5))
    bm25A shouldBe (expBm25 +- 1e-6)
    r((1L, "b"))._3 shouldBe 1.0 // df=2=N → idf exactly 1, tfidf = tf = 1
  }

  it should "keep only each document's topK terms, rarest-first" in {
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y"), (3L, "x")
    ).toDF("doc_id", "text")
    val top1 = Curation.tfidfTopTerms(docs, topK = 1)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("term")).toMap
    top1 should have size 3
    // doc 1: z and w both df=1 tf=1 → tie broken alphabetically → w
    top1(1L) shouldBe "w"
    top1(2L) shouldBe "y" // y (df=2) beats x (df=3)
  }

  "ngramVocabulary" should "rank n-grams by occurrence with deterministic ties" in {
    val corpus = Seq(
      (1L, "to be or not to be"),
      (2L, "to be is to do")
    ).toDF("doc_id", "text")
    val top = Curation.ngramVocabulary(corpus, shingleN = 2, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "to be" occurs 3x across both docs; remaining bigrams occur once and
    // tie-break alphabetically
    top(0) shouldBe (("to be", 3L, 2L))
    top(1)._2 shouldBe 1L
    top.map(_._1).slice(1, 3) shouldBe top.map(_._1).slice(1, 3).sorted
  }

  it should "ignore the phantom empty token of leading-whitespace text" in {
    val corpus = Seq(
      (1L, "  padded doc"), // leading whitespace => tokens ["", padded, doc]
      (2L, " padded doc")
    ).toDF("doc_id", "text")
    val grams = Curation.ngramVocabulary(corpus, shingleN = 2, topK = 10)
      .collect().map(_.getString(0))
    grams should contain("padded doc")
    // no gram built from the empty token ("" alone or " padded")
    grams.foreach { g => g should not startWith " " }
    grams.foreach { g => g.nonEmpty shouldBe true }
  }

  "splitAssign" should "cut the hash space at the cumulative fractions, deterministically" in {
    val docs = spark.range(0, 1000).select(col("id").as("doc_id"))
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val r = Curation.splitAssign(docs, splits)
      .groupBy("split").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    r.keySet shouldBe Set("train", "val", "test") // fractions cover 1 => no nulls
    r.values.sum shouldBe 1000L
    // md5 buckets are uniform enough for a coarse window at n=1000
    r("train").toDouble should (be > 700.0 and be < 900.0)
    // per-row determinism: identical assignment on a permuted, re-built frame
    val again = Curation.splitAssign(docs.orderBy(rand(1)), splits)
      .select("doc_id", "split").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val first = Curation.splitAssign(docs, splits)
      .select("doc_id", "split").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    again shouldBe first
  }

  it should "leave rows past the configured mass unassigned" in {
    val docs = spark.range(0, 500).select(col("id").as("doc_id"))
    val r = Curation.splitAssign(docs, Seq(("train", 0.5)))
      .select("split").collect().map(x => Option(x.getString(0)))
    r.count(_.isEmpty) should be > 0
    r.flatten.toSet shouldBe Set("train")
  }

  "bm25Search" should "rank by hand-computed BM25 and exclude docs without query terms" in {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "kiwi kiwi")
    ).toDF("doc_id", "text")
    val out = Curation.bm25Search(docs, Seq("apple"), topK = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    out.map(_._1) should contain theSameElementsAs Seq(1L, 2L) // 3 has no hits
    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    val avgdl = 7.0 / 3.0
    def s(tf: Double, dl: Double) =
      idf * (tf * (k1 + 1.0)) / (tf + (k1 * ((1.0 - b) + (b * dl) / avgdl)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = out.map(x => x._1 -> x).toMap
    byId(1L)._3 shouldBe r6(0.0 + s(2.0, 3.0))
    byId(2L)._3 shouldBe r6(0.0 + s(1.0, 2.0))
    out.head._1 shouldBe 1L // higher tf wins
    byId(1L)._2 shouldBe 1L // one query term hit
  }

  it should "sum multi-term contributions in ascending-term order and honor topK" in {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana banana banana"),
      (3L, "apple"),
      (4L, "unrelated words only")
    ).toDF("doc_id", "text")
    val out = Curation.bm25Search(docs, Seq("banana", "apple"), topK = 2).collect()
    out.length shouldBe 2
    // doc 1 hits both terms
    out.map(_.getLong(0)) should contain(1L)
    val nHits = out.map(x => x.getLong(0) -> x.getLong(1)).toMap
    nHits(1L) shouldBe 2L
  }

  behavior of "cdcChunks"

  it should "partition every document exactly (no gaps, no overlaps) and key chunks by md5" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly today"),
      (2L, "abc"), // shorter than k -> one whole-doc chunk
      (3L, "")     // empty -> one empty chunk
    ).toDF("doc_id", "text")
    val got = Curation.cdcChunks(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog repeatedly today",
      2L -> "abc", 3L -> "")
    for ((id, rows) <- got) {
      val sorted = rows.sortBy(_._2)
      sorted.head._3 shouldBe 1L // first chunk starts at doc start
      // contiguous: each chunk starts where the previous ended
      sorted.sliding(2).foreach {
        case Array(a, b) => b._3 shouldBe a._3 + a._4
        case _ =>
      }
      sorted.map(_._4).sum shouldBe texts(id).length.toLong
      // chunk md5s match the substrings they claim
      sorted.foreach { case (_, _, st, ln, fp) =>
        val sub = texts(id).substring(st.toInt - 1, st.toInt - 1 + ln.toInt)
        fp shouldBe java.security.MessageDigest.getInstance("MD5")
          .digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
    }
    got(2L).length shouldBe 1
    got(3L).length shouldBe 1
    got(3L).head._4 shouldBe 0L
  }

  it should "keep chunk keys stable past an early edit (the CDC property)" in {
    val tail = "shared suffix content that both documents carry onward " * 4
    val a = "PREFIX-ONE " + tail
    val b = "a completely different and longer preamble here " + tail
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val byDoc = Curation.cdcChunks(docs)
      .collect().map(r => (r.getLong(0), r.getString(4))).groupBy(_._1)
    val shared = byDoc(1L).map(_._2).toSet.intersect(byDoc(2L).map(_._2).toSet)
    // boundaries are content-local, so chunks inside the shared tail
    // re-align after at most one boundary window — a fixed-size chunker
    // would share (almost) nothing here because the prefixes differ in
    // length
    shared.size should be >= 3
  }

  behavior of "chunkDupScore"

  it should "score cross-document shared chunks and leave unique docs at zero" in {
    val tail = "identical shared passage both documents repeat verbatim " * 4
    val docs = Seq(
      (1L, "first unique opening text here " + tail),
      (2L, "second and rather different opening " + tail),
      (3L, "entirely unrelated content with nothing shared at all anywhere")
    ).toDF("doc_id", "text")
    // k=8/w=16 (the dedup_chunks tier): chunks long enough that md5
    // equality across docs means real shared content, not 2-char noise
    val got = Curation.chunkDupScore(docs, k = 8, w = 16)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    got.keySet shouldBe Set(1L, 2L, 3L)
    // chunk mass always accounts for the whole document
    got(1L)._3 shouldBe ("first unique opening text here " + tail).length.toLong
    got(3L)._3 shouldBe
      "entirely unrelated content with nothing shared at all anywhere".length.toLong
    // the shared tail surfaces as duplicated mass in BOTH carriers
    got(1L)._5 should be > 0.3
    got(2L)._5 should be > 0.3
    // and the unique doc is untouched
    got(3L)._2 shouldBe 0L
    got(3L)._5 shouldBe 0.0
  }

  behavior of "vocabGrowth"

  it should "track the exact cumulative token and distinct-term curve" in {
    val docs = Seq(
      (1L, "a b a"),        // 3 toks, vocab {a, b}   -> 2 new
      (2L, "b c"),          // 2 toks, c new          -> 1 new
      (3L, ""),             // 0 toks                 -> 0 new
      (4L, "c d d a"),      // 4 toks, d new          -> 1 new
      (5L, "e")             // 1 tok, e new           -> 1 new
    ).toDF("doc_id", "text")
    val got = Curation.vocabGrowth(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    got shouldBe Map(
      1L -> ((3L, 2L, 3L, 2L)),
      2L -> ((2L, 1L, 5L, 3L)),
      3L -> ((0L, 0L, 5L, 3L)),
      4L -> ((4L, 1L, 9L, 4L)),
      5L -> ((1L, 1L, 10L, 5L)))
  }

  it should "produce the same curve across band sizes (banded == global window)" in {
    val docs = (1L to 200L)
      .map(i => (i, s"tok${i % 37} tok${i % 11} tok${(i * 7) % 53}"))
      .toDF("doc_id", "text").repartition(8)
    def run(band: Long) = Curation.vocabGrowth(docs, docsPerBand = band)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val global = run(1000000L) // one band = plain global window
    run(10L) shouldBe global
    run(7L) shouldBe global
    // the curve ends at the exact totals
    global(200L)._1 shouldBe 600L
    global(200L)._2 shouldBe (
      (1L to 200L).flatMap(i =>
        Seq(s"tok${i % 37}", s"tok${i % 11}", s"tok${(i * 7) % 53}")).distinct.size.toLong)
  }

  "epochPlan" should "cap tiny sources and leave big ones uncapped" in {
    // big: ~4000 tokens, tiny: ~40 → the √-share forces many epochs on tiny
    val docs = ((1 to 100).map(i => (i.toLong, "a b c d e f g h i j " * 4, "big")) ++
      (1 to 2).map(i => (1000L + i, "a b c d e f g h i j ", "tiny")))
      .toDF("doc_id", "text", "source")
    val plan = Curation.epochPlan(docs, budgetTokens = 5000L, maxEpochs = 4.0)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    plan("tiny").getAs[Boolean]("capped") shouldBe true
    plan("tiny").getAs[Double]("epochs") shouldBe 4.0
    plan("big").getAs[Boolean]("capped") shouldBe false
    // planned tokens = epochs · source tokens (floored), never above cap·tokens
    plan.values.foreach { r =>
      val planned = r.getAs[Long]("planned_tokens")
      planned should be <= (4.0 * r.getAs[Long]("n_tokens")).toLong
      planned.toDouble shouldBe
        (r.getAs[Double]("epochs") * r.getAs[Long]("n_tokens")) +- 1.0
    }
  }

  it should "spend at most the budget when nothing is capped" in {
    val docs = (1 to 50).map(i => (i.toLong, "a b c d e f g h i j " * 10,
      s"src${i % 5}")).toDF("doc_id", "text", "source")
    val plan = Curation.epochPlan(docs, budgetTokens = 4000L, maxEpochs = 100.0)
      .collect()
    plan.foreach(_.getAs[Boolean]("capped") shouldBe false)
    // Σ planned ≈ budget (floor rounding only loses < 1 token per source)
    val spent = plan.map(_.getAs[Long]("planned_tokens")).sum
    spent should be <= 4000L
    spent should be >= 4000L - plan.length.toLong
  }

  "pmiCollocations" should "rank exclusive pairs above merely frequent ones" in {
    // "alpha beta" always co-occur exclusively; "the x" pairs are
    // frequent but "the" pairs with everything → low association
    val docs = (1L to 20L).map(i =>
      (i, s"alpha beta the w${i % 7} the w${(i * 3) % 7}")).toDF("doc_id", "text")
    val got = Curation.pmiCollocations(docs, window = 1, minCount = 5L, topK = 50)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val exclusive = got(("alpha", "beta"))
    got.collect { case ((a, b), p) if a == "the" || b == "the" => p }
      .foreach(p => exclusive should be > p)
  }

  it should "compute pmi from exact pair-table marginals" in {
    // one doc "a b", window 1: pairs (a,b) and (b,a), N=2, each
    // marginal 1 per side → pmi = ln(1·2/(1·1)) = ln 2
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = Curation.pmiCollocations(docs, window = 1, minCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    got(("a", "b")) shouldBe
      BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  "domainReweight" should "upweight the source the LM finds hardest, weights summing to 1" in {
    // src_easy: one repeated sentence (the corpus LM memorizes it);
    // src_hard: unique token streams (high NLL under the same LM)
    val docs = ((1L to 10L).map(i => (i, "the same simple sentence again", "src_easy")) ++
      (11L to 20L).map(i => (i, (1 to 8).map(j => s"tok${i}_$j").mkString(" "), "src_hard")))
      .toDF("doc_id", "text", "source")
    val r = Curation.domainReweight(docs)
      .collect().map(x => x.getString(0) -> (x.getDouble(2), x.getDouble(3))).toMap
    r("src_hard")._1 should be > r("src_easy")._1
    r("src_hard")._2 should be > r("src_easy")._2
    (r.values.map(_._2).sum) shouldBe 1.0 +- 1e-9
  }

  "ngramNovelty" should "score copies 0, fresh docs 1, short docs NULL" in {
    val ref = Seq((100L, "one two three four five six seven")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two three four five six seven"), // wholly in ref
      (2L, "alpha beta gamma delta epsilon zeta"), // wholly novel
      (3L, "one two three four five NEW NEW2"),   // partially novel
      (4L, "too short")                            // < 5 tokens → NULL
    ).toDF("doc_id", "text")
    val r = Curation.ngramNovelty(corpus, ref, n = 5)
      .collect().map(x => x.getLong(0) -> x).toMap
    r(1L).getAs[Double]("novelty") shouldBe 0.0
    r(2L).getAs[Double]("novelty") shouldBe 1.0
    // doc 3: grams at positions 1..3; only "one two three four five" is in ref
    r(3L).getAs[Long]("n_grams") shouldBe 3L
    r(3L).getAs[Long]("n_novel") shouldBe 2L
    r(4L).getAs[Long]("n_grams") shouldBe 0L
    assert(r(4L).isNullAt(r(4L).fieldIndex("novelty")))
  }

  "skipgramPairs" should "emit every in-window ordered pair exactly once per occurrence" in {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = Curation.skipgramPairs(docs, window = 1, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got shouldBe Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "b") -> 1L)
  }

  it should "respect the window radius, cut at minCount, and skip empty docs" in {
    val docs = Seq((1L, "x y z w"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val w2 = Curation.skipgramPairs(docs, window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    w2(("x", "z")) shouldBe 1L   // distance 2 inside the window
    w2.get(("x", "w")) shouldBe None // distance 3 outside
    w2(("x", "y")) shouldBe 2L   // docs 1 and 3 both contribute
    // the count cut drops singletons
    val cut = Curation.skipgramPairs(docs, window = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    cut shouldBe Set(("x", "y"), ("y", "x"))
  }

  it should "count distinct grams once however often they repeat" in {
    val ref = Seq((9L, "x y z w v")).toDF("doc_id", "text")
    val rep = Seq((1L, "a b c d e a b c d e a b c d e")).toDF("doc_id", "text")
    val r = Curation.ngramNovelty(rep, ref, n = 5).collect()(0)
    // 11 gram positions but only 5 distinct cyclic grams
    r.getAs[Long]("n_grams") shouldBe 5L
    r.getAs[Long]("n_novel") shouldBe 5L
    r.getAs[Double]("novelty") shouldBe 1.0
  }

  behavior of "neymanSample"

  it should "allocate the budget toward high-variance strata and skip zero-variance ones" in {
    // stratum 'v': 200 rows with wildly varying value; 'c': 200 rows
    // constant (σ = 0 → Neyman rate 0); 'm': 200 rows mildly varying
    val docs = ((1 to 200).map(i => (i.toLong, "v", (i % 100) * 1000.0)) ++
      (201 to 400).map(i => (i.toLong, "c", 500.0)) ++
      (401 to 600).map(i => (i.toLong, "m", 500.0 + (i % 5))))
      .toDF("doc_id", "src", "value")
    val got = Curation.neymanSample(docs, "src", col("value"),
      nTarget = 100L, quantScale = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    bySrc.getOrElse("c", 0) shouldBe 0 // zero-variance: no budget
    bySrc("v") should be > bySrc.getOrElse("m", 0) // σ_v ≫ σ_m
    // rates: the whole budget splits between v and m ∝ N·σ, and the
    // draw is deterministic — same seed, same sample
    val again = Curation.neymanSample(docs, "src", col("value"),
      nTarget = 100L, quantScale = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    again.toSet shouldBe got.toSet
    // a stratum's rate caps at 1 when its allocation exceeds its size
    val tiny = ((1 to 5).map(i => (i.toLong, "a", i * 1000.0)) ++
      (6 to 400).map(i => (i.toLong, "b", 500.0 + (i % 2))))
      .toDF("doc_id", "src", "value")
    Curation.neymanSample(tiny, "src", col("value"), nTarget = 300L)
      .filter(col("src") === "a").count() shouldBe 5L
  }

  it should "sample nothing when every stratum has zero variance" in {
    // all-constant strata fold total weight W to 0; the unguarded rate
    // would be 0/0 = NaN and least(1.0, NaN) = 1.0 under Spark's
    // NaN-is-largest ordering — sampling EVERY row instead of none
    val flat = ((1 to 50).map(i => (i.toLong, "a", 7.0)) ++
      (51 to 100).map(i => (i.toLong, "b", 3.0)))
      .toDF("doc_id", "src", "value")
    Curation.neymanSample(flat, "src", col("value"), nTarget = 10L)
      .count() shouldBe 0L
  }

  behavior of "docSimilarity"

  it should "rank an identical document first and respect the maxDf stop-term skip" in {
    val docs = Seq(
      (0L, "apple banana cherry"),
      (1L, "apple banana cherry"),    // identical → cosine 1
      (2L, "apple banana kiwi"),      // 2 of 3 terms shared
      (3L, "melon kiwi grape"),       // no shared terms → absent
      (4L, "apple apple apple")       // one shared term, heavy tf
    ).toDF("doc_id", "text")
    val got = Curation.docSimilarity(docs, queryDocId = 0L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.head._1 shouldBe 1L
    got.head._3 shouldBe 1.0
    got.map(_._1).toSet shouldBe Set(1L, 2L, 4L)
    // with maxDf = 2 'apple' (df 4) and 'banana'/'cherry' (df 3... df 2? )
    // — 'apple' df=4, 'banana' df=3, 'cherry' df=2, 'kiwi' df=2: capping
    // at 2 keeps only cherry/kiwi(+melon/grape), so doc 2 no longer
    // shares a scorable term with doc 0 via banana
    val guarded = Curation.docSimilarity(docs, queryDocId = 0L, topK = 10,
      maxDf = 2L).collect().map(r => r.getLong(0)).toSet
    guarded shouldBe Set(1L) // only cherry (df 2) links 0 to 1
  }

  behavior of "heapsFit"

  it should "recover beta = 1 for all-novel tokens and near 0 for a frozen vocabulary" in {
    // every token unique → V = T exactly → log V = log T: beta 1, r2 1
    val novel = (0L until 128L).map(i =>
      (i, (0 until 10).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rn = Curation.heapsFit(novel).collect()(0)
    rn.getLong(0) shouldBe 8L // doc positions 1,2,4,...,128 → ids 0,1,3,...,127
    rn.getDouble(1) shouldBe 1.0
    rn.getDouble(3) shouldBe 1.0
    // a 3-word frozen vocabulary: V flat at 3 after doc 0 → beta ≈ 0
    val frozen = (0L until 128L).map(i => (i, "a b c a b c"))
      .toDF("doc_id", "text")
    val rf = Curation.heapsFit(frozen).collect()(0)
    math.abs(rf.getDouble(1)) should be < 0.01
  }

  behavior of "tokenSimpsonDiversity"

  it should "score all-distinct tokens 1, a constant flood 0, and mixtures in between" in {
    val docs = Seq(
      ("rich", "a b c d"),        // 4 distinct of 4 → 1 − 0 = 1
      ("flood", "x x x x"),       // one token → 1 − (4·3)/(4·3) = 0
      ("mix", "a a b b")          // 1 − (2·1+2·1)/(4·3) = 1 − 1/3
    ).toDF("lang", "text")
    val got = Curation.tokenSimpsonDiversity(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got("rich") shouldBe ((4L, 4L, 1.0))
    got("flood") shouldBe ((4L, 1L, 0.0))
    got("mix")._3 shouldBe
      BigDecimal(1.0 - 1.0 / 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a single-token language has no defined pair probability → absent
    Curation.tokenSimpsonDiversity(Seq(("solo", "only"))
      .toDF("lang", "text")).count() shouldBe 0L
  }

  behavior of "qlmSearch"

  it should "rank by smoothed likelihood, normalize by length, and drop unseen terms" in {
    val docs = Seq(
      (1L, "apple apple apple pie"), // tf 3, short
      (2L, "apple " + Seq.fill(40)("filler").mkString(" ")), // tf 1, long
      (3L, "banana bread only"))
      .toDF("doc_id", "text")
    val got = Curation.qlmSearch(docs, Seq("apple"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // only docs containing a query term are candidates
    got.map(_._1).toSet shouldBe Set(1L, 2L)
    // higher tf AND shorter doc: doc 1 must outscore doc 2
    got(0)._1 shouldBe 1L
    got(0)._3 should be > got(1)._3
    // a query term absent from the corpus is dropped, not a crash /
    // -inf poison: same candidates, still finite scores
    val padded = Curation.qlmSearch(docs, Seq("apple", "zzzmissing"))
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    padded.map(_._1).toSet shouldBe Set(1L, 2L)
    padded.foreach { case (_, s) =>
      java.lang.Double.isFinite(s) shouldBe true }
  }

  behavior of "keynessLlr"

  it should "surface each source's characteristic terms with exact direction" in {
    // src a over-uses 'alpha', src b 'beta'; 'filler' is background in
    // both and must not win either ranking
    val docs = ((1 to 20).map(i =>
      (i.toLong, "a", "alpha alpha filler common")) ++
      (21 to 40).map(i => (i.toLong, "b", "beta beta filler common")))
      .toDF("doc_id", "source", "text")
    val got = Curation.keynessLlr(docs, topK = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4),
        r.getBoolean(5)))
    val top = got.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
    top("a")._2 shouldBe "alpha"
    top("b")._2 shouldBe "beta"
    top("a")._4 shouldBe true // overused in its own source
    top("a")._3 should be > 0.0
    // below-minCount vocabulary is never scored
    val rare = ((1 to 20).map(i => (i.toLong, "a", "alpha word")) :+
      (21L, "b", "hapax word")).toDF("doc_id", "source", "text")
    Curation.keynessLlr(rare, minCount = 5L)
      .collect().map(_.getString(1)) should not contain "hapax"
  }

  behavior of "bm25PrfSearch"

  it should "recall banana-only docs via feedback expansion that plain BM25 misses" in {
    // seeds match docs 1-3; those all also say "banana"; docs 10-12 say
    // only "banana"; every doc carries the stopword-like "filler"
    val docs = (Seq(
      (1L, "apple banana filler"), (2L, "apple banana filler"),
      (3L, "apple banana filler"),
      (10L, "banana split filler"), (11L, "banana split filler"),
      (12L, "banana split filler")) ++
      (20L to 40L).map(i => (i, s"noise$i filler other")))
      .toDF("doc_id", "text")
    val plain = Curation.bm25Search(docs, Seq("apple"), topK = 10)
      .collect().map(_.getLong(0)).toSet
    plain shouldBe Set(1L, 2L, 3L)
    // expansion mines "banana" (feedback tf 3; df 6/27 needs the cap at
    // 0.3); "filler" (df 27/27) stays blocked by the same cap
    val prf = Curation.bm25PrfSearch(docs, Seq("apple"), topK = 10,
      nFeedback = 3, nExpand = 2, minTermLen = 3, maxDfFrac = 0.3)
    val ids = prf.collect().map(_.getLong(0)).toSet
    ids should contain allOf (10L, 11L, 12L)
    // determinism: re-run bit-identical
    prf.collect() shouldBe Curation.bm25PrfSearch(docs, Seq("apple"),
      topK = 10, nFeedback = 3, nExpand = 2, minTermLen = 3,
      maxDfFrac = 0.3).collect()
  }

  it should "keep corpus-wide stopwords out of the expansion set" in {
    // "filler" appears in every doc: highest feedback tf but df = 100%
    // ⇒ the maxDfFrac cap excludes it, and only "banana" expands
    val docs = (Seq(
      (1L, "apple banana filler"), (2L, "apple banana filler")) ++
      (10L to 29L).map(i => (i, s"noise$i filler")))
      .toDF("doc_id", "text")
    val prf = Curation.bm25PrfSearch(docs, Seq("apple"), topK = 22,
      nFeedback = 2, nExpand = 5, maxDfFrac = 0.5)
    // were "filler" expanded, every noise doc would score; with only
    // "banana" expanded the hit set stays the two apple docs
    prf.collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
  }

  behavior of "ppmiSvdEmbeddings"

  it should "embed co-occurring words close and non-co-occurring words orthogonal" in {
    // two co-occurrence blocks of DIFFERENT strength (30 vs 40 docs) so
    // the top eigenvalues are non-degenerate and the eigenspaces can't
    // mix across blocks
    val docs = ((1 to 30).map(i => (i.toLong, "red blue")) ++
      (31 to 70).map(i => (i.toLong, "cat dog"))).toDF("doc_id", "text")
    // output is flattened (term, pair_mass, component, value) rows;
    // rebuild each term's vector by component order for the geometry pins
    val got = Curation.ppmiSvdEmbeddings(docs, window = 2, minCount = 2,
      vocabSize = 8, dim = 4)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (term, rows) =>
        term -> rows.sortBy(_._2).map(_._3).toSeq
      }
    got.values.foreach(v => v should have size 4)
    got.keySet shouldBe Set("red", "blue", "cat", "dog")
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val num = a.zip(b).map { case (x, y) => x * y }.sum
      num / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    cos(got("red"), got("blue")) should be > 0.99
    cos(got("cat"), got("dog")) should be > 0.99
    math.abs(cos(got("red"), got("cat"))) should be < 0.01
    math.abs(cos(got("blue"), got("dog"))) should be < 0.01
    // negative-eigenvalue components are zeroed by the sqrt(max(l,0))
    // scaling: each vector lives in the top-2 spectral dims only
    got.values.foreach(v => v.drop(2).foreach(x => x shouldBe 0.0))
  }

  behavior of "textRank"

  it should "rank the co-occurrence hub first, deterministically" in {
    // "hub" co-occurs with every other word; x/y/z only with hub (and
    // once with each other) -> the graph walk concentrates on hub
    val docs = Seq((0L, "hub alpha"), (1L, "hub beta"), (2L, "hub gamma"),
      (3L, "hub delta"), (4L, "alpha beta"))
      .toDF("doc_id", "text")
    val r = Curation.textRank(docs, topK = 10).collect()
    r.head.getString(0) shouldBe "hub"
    r.head.getAs[Long]("rank_ppm") should be >
      r(1).getAs[Long]("rank_ppm")
    // exact-integer ppm semantics: a re-run is bit-identical
    Curation.textRank(docs, topK = 10).collect() shouldBe r
  }

  behavior of "rakeKeywords"

  it should "match hand-computed deg/freq scores and prefer multi-word terms" in {
    val docs = Seq(
      (0L, "deep learning systems of the word"),
      (1L, "deep learning of word"),
      (2L, "word and word"))
      .toDF("doc_id", "text")
    val got = Curation.rakeKeywords(docs,
      stopwords = Seq("of", "the", "and")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // freq/deg by hand: deep 2/5, learning 2/5 (score 2.5 each),
    // systems 1/3 (3.0), word 4/4 (1.0; "word and word" is TWO islands)
    got("deep learning systems") shouldBe ((3L, 1L, 8.0))
    got("deep learning") shouldBe ((2L, 1L, 5.0))
    got("word") shouldBe ((1L, 4L, 1.0))
    // the 3-word technical term outranks the thrice-repeated bare word
    val ordered = Curation.rakeKeywords(docs,
      stopwords = Seq("of", "the", "and")).collect().map(_.getString(0))
    ordered.head shouldBe "deep learning systems"
  }
}
