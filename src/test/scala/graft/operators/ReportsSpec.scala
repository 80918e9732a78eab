package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ReportsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "corpusDiff"

  it should "classify added/removed/kept by normalized fingerprint" in {
    val old = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon"),
      (3L, "unchanged text here")
    ).toDF("doc_id", "text")
    val now = Seq(
      (10L, "  Alpha   beta GAMMA "), // reformatted ⇒ same normalized fp ⇒ kept
      (11L, "unchanged text here"),   // kept verbatim
      (12L, "brand new document"),    // added
      (13L, "brand new document")     // in-version dup collapses to one fp
    ).toDF("doc_id", "text")
    val got = Reports.corpusDiff(old, now)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got("kept") shouldBe ((2L, 6L))    // alpha-beta-gamma (3) + unchanged (3)
    got("removed") shouldBe ((1L, 2L)) // delta epsilon
    got("added") shouldBe ((1L, 3L))   // brand new document, dup collapsed
  }

  behavior of "freqSpectrum"

  it should "count terms per occurrence count with their token mass" in {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "b d")
    ).toDF("doc_id", "text")
    // counts: a=3, b=3, c=1, d=1 → f=3: 2 terms (mass 6); f=1: 2 terms (mass 2)
    val got = Reports.freqSpectrum(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got shouldBe Map(3L -> ((2L, 6L)), 1L -> ((2L, 2L)))
  }

  behavior of "splitLeakage"

  it should "tally thresholded near-dup pairs by split pair, flagging cross-split rows" in {
    // 30 docs in 10 near-dup triplets: identical text within a triplet
    // (est_jaccard = 1.0); each triplet uses its own single letter, so
    // the CHARACTER shingle sets are fully disjoint across triplets
    val docs = (0L until 30L).map { i =>
      val c = ('a' + (i / 3).toInt).toChar.toString
      (i, s"$c$c$c $c$c $c$c$c$c $c $c$c$c")
    }.toDF("doc_id", "text")
    val out = Reports.splitLeakage(docs,
      Seq(("train", 0.5), ("test", 0.5)), minJaccard = 0.5,
      shingleN = 3, k = 8, bands = 4)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    // every triplet contributes 3 pairs; totals conserved across buckets
    out.values.map(_._1).sum shouldBe 30L
    out.foreach { case ((a, b), (_, cross)) =>
      cross shouldBe (a != b)
      a should be <= b
    }
    // a single split captures every pair with no cross-split rows
    val one = Reports.splitLeakage(docs, Seq(("all", 1.0)), minJaccard = 0.5,
      shingleN = 3, k = 8, bands = 4).collect()
    one.length shouldBe 1
    one(0).getLong(2) shouldBe 30L
    one(0).getBoolean(3) shouldBe false
    // PARTIAL split map: docs past the cut get the explicit 'unassigned'
    // bucket — least/greatest would otherwise silently re-label a
    // (train, NULL) pair as same-split
    val part = Reports.splitLeakage(docs, Seq(("train", 0.4)),
      minJaccard = 0.5, shingleN = 3, k = 8, bands = 4)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    part.values.map(_._1).sum shouldBe 30L
    part.keys.flatMap { case (a, b) => Seq(a, b) }
      .foreach(sp => Set("train", "unassigned") should contain(sp))
    // with a 40% cut, some triplet must straddle the boundary
    part.keys.exists { case (a, b) => a != b } shouldBe true
  }

  behavior of "qualityDeciles"

  it should "cut each source into balanced tie-broken buckets with exact masses" in {
    val docs = (1L to 40L).map { i =>
      (i, s"src${i % 2}",
        ("the and with that " * ((i % 5).toInt + 1)).trim + s" filler$i")
    }.toDF("doc_id", "source", "text")
    val got = Reports.qualityDeciles(docs, n = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // 20 docs per source over 4 buckets → 5 docs each (ntile balance)
    got.keys.map(_._1).toSet shouldBe Set("src0", "src1")
    got.values.foreach(_._1 shouldBe 5L)
    // quality is non-increasing down the buckets within a source
    for (src <- Seq("src0", "src1"); b <- 1L to 3L) {
      got((src, b))._3 should be >= got((src, b + 1))._3
    }
    // token mass adds up to the per-source total
    val totalToks = got.collect { case ((s, _), (_, t, _)) if s == "src0" => t }.sum
    totalToks should be > 0L
  }

  "lengthHistogram" should "bin with exact integer cuts and clamp the last bin" in {
    val rows = Seq(("a", 0L), ("a", 99L), ("a", 100L), ("a", 250L),
      ("a", 999L), ("a", 5000L), ("b", 450L))
    val got = Reports.lengthHistogram(
      rows.toDF("g", "v"), "g", col("v"), width = 100L, nBins = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    got(("a", 0L)) shouldBe ((2L, 0L))    // 0 and 99
    got(("a", 1L)) shouldBe ((1L, 100L))  // 100
    got(("a", 2L)) shouldBe ((1L, 200L))  // 250
    got(("a", 9L)) shouldBe ((2L, 900L))  // 999 and the clamped 5000
    got(("b", 4L)) shouldBe ((1L, 400L))
    // sparse: no empty bins materialize
    got.keys.count(_._1 == "a") shouldBe 4
  }

  it should "conserve total row mass across bins" in {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(500)((s"g${rnd.nextInt(3)}", rnd.nextInt(2000).toLong))
    val got = Reports.lengthHistogram(
      rows.toDF("g", "v"), "g", col("v"), width = 100L, nBins = 10).collect()
    got.map(_.getLong(2)).sum shouldBe 500L
    // every bin id is inside [0, nBins)
    all(got.map(_.getLong(1))) should (be >= 0L and be <= 9L)
  }

  behavior of "sourceOverlap"

  it should "count bag-of-words-identical docs once per source pair" in {
    val docs = Seq(
      (1L, "shared article text here", "a"),
      (2L, "Shared ARTICLE text HERE", "b"), // re-cased, same bag
      (3L, "shared text here article shared", "c"), // reordered + dup token
      (4L, "unique content one", "a"),
      (5L, "unique content two", "b")
    ).toDF("doc_id", "text", "source")
    val got = Reports.sourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got shouldBe Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L)
  }

  behavior of "expectationReport"

  it should "count NULL predicates as violations and check composite uniqueness" in {
    val rows = Seq(
      (1L, Some(10.0)), (2L, Some(-3.0)), (3L, None), (1L, Some(5.0))
    ).toDF("id", "v")
    val got = Reports.expectationReport(rows,
      rowRules = Seq(
        ("v_positive", col("v") > 0),
        ("id_small", col("id") < 100)),
      uniqueRules = Seq(("id_unique", col("id"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    got("v_positive") shouldBe ((2L, false)) // the -3 and the NULL
    got("id_small") shouldBe ((0L, true))
    got("id_unique") shouldBe ((1L, false)) // id 1 twice
  }

  behavior of "kAnonymityViolations"

  it should "flag only classes below k and certify with an empty result" in {
    val rows = (Seq.fill(10)(("web", "morning")) ++ Seq.fill(3)(("web", "night")) ++
      Seq.fill(7)(("app", "morning"))).toDF("channel", "period")
    val bad = Reports.kAnonymityViolations(rows, Seq("channel", "period"), k = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    bad shouldBe Map(("web", "night") -> 3L)
    // raising every class above k certifies: empty output
    Reports.kAnonymityViolations(rows, Seq("channel", "period"), k = 2L)
      .count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Reports.kAnonymityViolations(rows, Seq.empty, k = 5L)
  }

  behavior of "lshCalibration"

  it should "report exact agreement for verbatim duplicates and conserve pair mass" in {
    // 4 identical docs (est = true = 1.0) + 4 docs with pairwise-disjoint
    // single-letter vocabularies (no shared shingles anywhere)
    val docs = ((0L to 3L).map(i => (i, "the exact same content repeated verbatim here")) ++
      (10L to 13L).map { i =>
        val c = ('p' + (i - 10).toInt).toChar.toString
        (i, s"$c$c$c $c$c $c$c$c$c $c $c$c$c")
      }).toDF("doc_id", "text")
    val cal = Reports.lshCalibration(docs, shingleN = 5, k = 8, bands = 4)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // the est=1.0 level is exactly the 6 identical-doc pairs: true=1, err=0
    cal(1.0)._1 shouldBe 6L
    cal(1.0)._2 shouldBe 1.0 +- 1e-9
    cal(1.0)._3 shouldBe 0.0 +- 1e-9
    // pair mass equals the candidate-pair count from the same parameters
    val nPairs = Dedup.minhashLsh(docs, shingleN = 5, k = 8, bands = 4).count()
    cal.values.map(_._1).sum shouldBe nPairs
    // estimates are exact multiples of 1/8 and errors live in [0, 1]
    cal.keys.foreach(e => (e * 8).isWhole shouldBe true)
    cal.values.foreach(_._3 should (be >= 0.0 and be <= 1.0))
  }

  "retentionCohorts" should "count each cohort's survivors per offset with exact ratios" in {
    // bucketUs = 10: users 1,2 start in week 0; user 3 starts week 1.
    // user 1 active weeks {0,1,2}, user 2 {0,2}, user 3 {1}
    val ev = Seq(
      (1L, 5L), (1L, 12L), (1L, 25L), (1L, 27L), // dup in week 2 collapses
      (2L, 1L), (2L, 22L),
      (3L, 15L)
    ).toDF("user_id", "ts")
    val got = Reports.retentionCohorts(ev, bucketUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    got((0L, 0L)) shouldBe ((2L, 1.0))
    got((0L, 1L)) shouldBe ((1L, 0.5)) // only user 1 returns in week 1
    got((0L, 2L)) shouldBe ((2L, 1.0)) // both return in week 2
    got((1L, 0L)) shouldBe ((1L, 1.0))
    got.size shouldBe 4
  }

  behavior of "zipfFit"

  it should "recover the planted slope of a synthetic power-law spectrum" in {
    // corpus where the spectrum is exactly n_f = round(1000 / f^1.5) for
    // f = 1..20: n_f distinct tokens occurring f times each → OLS on
    // (ln f, ln n_f) must come out near −1.5 with r² ≈ 1
    val docs = (1 to 20).flatMap { f =>
      val nTerms = math.max(math.round(1000.0 / math.pow(f, 1.5)).toInt, 1)
      (0 until nTerms).flatMap(t => Seq.fill(f)(s"w_${f}_$t"))
    }.grouped(500).map(_.mkString(" ")).toSeq.toDF("text")
    val r = Reports.zipfFit(docs).collect()(0)
    r.getLong(0) shouldBe 20L // 20 spectrum points
    r.getDouble(1) shouldBe -1.5 +- 0.05 // slope (rounding of n_f adds noise)
    r.getDouble(3) should be > 0.99 // r²
  }

  it should "be invariant to how the corpus is sliced into documents" in {
    val words = (0 until 200).flatMap(i => Seq.fill(1 + i % 5)(s"t$i"))
    val oneDoc = Seq(words.mkString(" ")).toDF("text")
    val manyDocs = words.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
    val one = Reports.zipfFit(oneDoc).collect()(0)
    one.toSeq shouldBe Reports.zipfFit(manyDocs).collect()(0).toSeq
    // this corpus is the degenerate flat spectrum (40 terms at every
    // frequency → zero y-variance): slope is exactly 0, r² is NULL
    // (nullif guard) rather than an ANSI divide-by-zero abort
    one.getDouble(1) shouldBe 0.0
    one.isNullAt(3) shouldBe true
  }

  behavior of "lshRecall"

  it should "catch every planted exact near-dup pair at high thresholds" in {
    // 6 copies of one doc (15 pairs at tj = 1.0, identical signatures →
    // every band collides) among 20 distinct-random docs
    val rnd = new scala.util.Random(7)
    val docs = ((0 until 6).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog again and again")) ++
      (6 until 26).map(i => (i.toLong,
        Seq.fill(12)(rnd.alphanumeric.take(8).mkString).mkString(" "))))
      .toDF("doc_id", "text")
    val got = Reports.lshRecall(docs, sampleFrac = 1.0,
      thresholds = Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got(0.9) shouldBe ((15L, 15L, 1.0))
    got(0.5)._3 shouldBe 1.0 // nothing between 0.5 and 0.9 in this corpus
  }

  behavior of "dpCounts"

  it should "add bounded seeded Laplace noise that scales as 1/epsilon" in {
    val docs = (1 to 100).flatMap(i => Seq(("s0", i), ("s1", i)))
      .toDF("source", "i")
    val r1 = Reports.dpCounts(docs, "source", epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // determinism: same seed → identical release
    Reports.dpCounts(docs, "source", epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe r1
    // |Laplace(1)| from the md5Bucket uniform is at most ln(2^32) ≈ 22.2
    r1.values.foreach(v => math.abs(v - 100.0) should be < 22.2)
    // noise scales exactly 1/eps (same uniform, rounded at 6)
    val r10 = Reports.dpCounts(docs, "source", epsilon = 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1.keys.foreach { k =>
      (r10(k) - 100.0) shouldBe ((r1(k) - 100.0) / 10.0) +- 1e-5
    }
    // different groups draw different noise
    r1("s0") should not be r1("s1")
    // the per-release nonce: a fresh releaseId redraws the noise (two
    // releases must never reuse noise — the delta would leak exactly),
    // and the same releaseId replays bit-for-bit
    val r2 = Reports.dpCounts(docs, "source", epsilon = 1.0, releaseId = "r1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1.keys.foreach(k => r2(k) should not be r1(k))
    Reports.dpCounts(docs, "source", epsilon = 1.0, releaseId = "r1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe r2
  }

  behavior of "driftPsi"

  it should "be exactly 0 for identical snapshots and positive under a shift" in {
    val a = (0 until 200).map(i => (i * 5).toLong).toDF("m")
    val same = Reports.driftPsi(a, a, col("m"), width = 100L, nBins = 10)
      .collect()(0)
    same.getLong(0) shouldBe 10L
    same.getLong(1) shouldBe 200L
    same.getDouble(3) shouldBe 0.0
    // shift the second snapshot up by 3 bins: mass moves, PSI > 0.25
    val b = (0 until 200).map(i => (i * 5 + 300).toLong).toDF("m")
    val drift = Reports.driftPsi(a, b, col("m"), width = 100L, nBins = 10)
      .collect()(0)
    drift.getDouble(3) should be > 0.25
    // disjoint supports still defined (add-one smoothing on the grid)
    val c = Seq(5L, 15L).toDF("m")
    val d2 = Seq(905L, 915L).toDF("m")
    val far = Reports.driftPsi(c, d2, col("m"), width = 100L, nBins = 10)
      .collect()(0)
    far.getDouble(3).isNaN shouldBe false
    far.getDouble(3) should be > 0.0
  }

  it should "clamp negative metric values into bin 0 instead of dropping them" in {
    // -250 and -5 must land in bin 0 (not fall off the spine and vanish
    // from the totals); totals account for EVERY row on both sides
    val a = Seq(-250L, -5L, 50L, 150L).toDF("m")
    val b = Seq(10L, 20L, 110L, 990L).toDF("m")
    val r = Reports.driftPsi(a, b, col("m"), width = 100L, nBins = 10)
      .collect()(0)
    r.getLong(1) shouldBe 4L // n_a counts the negatives
    r.getLong(2) shouldBe 4L
    // bin0 holds 3 of a's rows vs 2 of b's → a real PSI contribution
    r.getDouble(3) should be > 0.0
  }

  behavior of "mutualInformation"

  it should "report 0 for independent and 1 (normalized) for determined columns" in {
    // uniform independent 2×2: every cell term is ln(1) = 0
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val ri = Reports.mutualInformation(indep, "a", "b").collect()(0)
    ri.getLong(0) shouldBe 4L // cells
    ri.getDouble(4) shouldBe 0.0 // mi
    ri.getDouble(5) shouldBe 0.0 // nmi
    // b determined by a: MI = H(a) = H(b) = ln 2 → NMI = 1
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val rd = Reports.mutualInformation(dep, "a", "b").collect()(0)
    rd.getDouble(2) shouldBe math.log(2.0) +- 1e-6 // h_a
    rd.getDouble(4) shouldBe math.log(2.0) +- 1e-6 // mi
    rd.getDouble(5) shouldBe 1.0
    // constant column: zero entropy → NMI is NULL, not a div-by-zero
    val const = Seq(("x", "u"), ("x", "v")).toDF("a", "b")
    val rc = Reports.mutualInformation(const, "a", "b").collect()(0)
    rc.getDouble(2) shouldBe 0.0 // h_a
    rc.isNullAt(5) shouldBe true
  }

  it should "fail fast on a high-cardinality pair and stay idle on categorical input" in {
    // 64 distinct (a, b) cells against maxCells = 16: the census aborts
    // with a clear message BEFORE the one-row collect builds
    val wide = (1 to 64).map(i => (s"u$i", s"v$i")).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      Reports.mutualInformation(wide, "a", "b", maxCells = 16L).collect()
    }
    ex.getMessage should include("maxCells")
    ex.getMessage should include("64")
    // same frame under the cap: identical result to the unguarded path
    val ok = Reports.mutualInformation(wide, "a", "b", maxCells = 64L)
      .collect()(0)
    ok.getLong(0) shouldBe 64L
    ok.getDouble(5) shouldBe 1.0 // b determined by a
  }

  behavior of "groupTrend"

  it should "recover planted slopes and NULL out degenerate groups" in {
    val rows =
      // group a: y = 2x + 1 exactly
      (0 to 4).map(x => ("a", x.toLong, 2.0 * x + 1)) ++
        // group b: all points at one x — zero x-variance, slope NULL
        Seq(("b", 3L, 1.0), ("b", 3L, 5.0)) ++
        // group c: flat metric — slope exactly 0
        (0 to 3).map(x => ("c", x.toLong, 7.5))
    val got = Reports.groupTrend(
      rows.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    got("a").getLong(1) shouldBe 5L
    got("a").getDouble(2) shouldBe 2.0
    got("a").getDouble(3) shouldBe 1.0
    got("b").isNullAt(2) shouldBe true
    got("c").getDouble(2) shouldBe 0.0
    got("c").getDouble(3) shouldBe 7.5
  }

  behavior of "tokenizerFertility"

  it should "compute exact per-language ratios" in {
    val docs = Seq(
      ("en", "hello world"),            // 2 tokens, 2 subwords
      ("en", "don't stop"),             // 2 tokens, 4 subwords (don ' t stop)
      ("de", "donaudampfschiff fahrt")  // 2 tokens, 2 subwords
    ).toDF("lang", "text")
    val got = Reports.tokenizerFertility(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    got("en") shouldBe ((2L, 4L, 6L, 1.5))
    got("de") shouldBe ((1L, 2L, 2L, 1.0))
  }

  behavior of "cusumChangepoint"

  it should "accumulate sustained drift and reset below the mean" in {
    val hourUs = 3600000000L
    // type A: counts 1,1,1,5,5,5 per hour → mean = 3 (floored 18/6)
    // d = -2,-2,-2,+2,+2,+2; C = -2,-4,-6,-4,-2,0
    // S = C - min(0, prefix-min C) = 0,0,0,2,4,6 — drift accumulates
    // only once the rate shifts, exactly the CUSUM contract
    val ev = (0 until 6).flatMap { h =>
      val cnt = if (h < 3) 1 else 5
      (0 until cnt).map(i => ("A", h * hourUs + i * 1000L))
    }.toDF("event_type", "ts")
    val got = Reports.cusumChangepoint(ev)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    got shouldBe Map(
      0L -> ((1L, 0L)), 1L -> ((1L, 0L)), 2L -> ((1L, 0L)),
      3L -> ((5L, 2L)), 4L -> ((5L, 4L)), 5L -> ((5L, 6L)))
  }

  it should "stay near zero on a flat series and honor slack" in {
    val hourUs = 3600000000L
    val flat = (0 until 8).flatMap(h =>
      (0 until 3).map(i => ("B", h * hourUs + i * 1000L)))
      .toDF("event_type", "ts")
    Reports.cusumChangepoint(flat).collect()
      .foreach(r => r.getLong(3) shouldBe 0L)
    // slack absorbs a +1 deviation entirely
    val up = ((0 until 4).flatMap(h =>
      (0 until 3).map(i => ("C", h * hourUs + i * 1000L))) ++
      (4 until 8).flatMap(h =>
        (0 until 4).map(i => ("C", h * hourUs + i * 1000L))))
      .toDF("event_type", "ts")
    val s = Reports.cusumChangepoint(up, slack = 2L).collect()
    s.foreach(r => r.getLong(3) shouldBe 0L)
  }

  behavior of "seasonalProfile"

  it should "fold hours into the 168-cell weekly template exactly" in {
    val hourUs = 3600000000L
    // two full weeks: hour h carries (h % 24) + 1 events — every (dow,
    // hod) cell sees the same count twice
    val ev = (0 until 24 * 14).flatMap(h =>
      (0 until (h % 24) + 1).map(i => h * hourUs + i * 1000L))
      .toDF("ts")
    val got = Reports.seasonalProfile(ev).collect()
    got.length shouldBe 168
    got.foreach { r =>
      r.getLong(2) shouldBe 2L // n_hours: two weeks
      r.getLong(3) shouldBe 2L * (r.getLong(1) + 1) // total = 2·(hod+1)
      r.getDouble(4) shouldBe (r.getLong(1) + 1).toDouble
    }
  }

  behavior of "chiSquareIndependence"

  it should "report 0 for independence, n·min(ka−1, kb−1) for determination, and guard cardinality" in {
    // uniform independent 2×2: o = e everywhere → chi2 = 0, dof = 1
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val ri = Reports.chiSquareIndependence(indep, "a", "b").collect()(0)
    ri.getLong(0) shouldBe 4L
    ri.getLong(2) shouldBe 1L
    ri.getDouble(3) shouldBe 0.0
    // b fully determined by a (2 balanced classes): chi2 = n
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val rd = Reports.chiSquareIndependence(dep, "a", "b").collect()(0)
    rd.getLong(1) shouldBe 4L
    rd.getDouble(3) shouldBe 4.0
    // the maxCells census fails fast, the MI guard pattern
    val wide = (1 to 32).map(i => (s"u$i", s"v$i")).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      Reports.chiSquareIndependence(wide, "a", "b", maxCells = 8L).collect()
    }
    ex.getMessage should include("maxCells")
  }

  behavior of "rfmFeatures"

  it should "compute exact integer recency, tenure, coverage and quantized monetary" in {
    val day = 86400000000L
    val ev = Seq(
      // user 1: days 0, 2, 2, 9 — recency 10-9=1, tenure 9, 3 active days
      (1L, 0L * day + 5L, 10.0), (1L, 2L * day + 1L, 1.5),
      (1L, 2L * day + 2L, 2.25), (1L, 9L * day, 0.004),
      // user 2: one event on day 10 (the corpus max day)
      (2L, 10L * day + 3L, 7.0)
    ).toDF("user_id", "ts", "value")
    val got = Reports.rfmFeatures(ev)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // monetary: floor(10·1000)+floor(1.5·1000)+floor(2.25·1000)+floor(4)
    got(1L) shouldBe ((1L, 9L, 4L, 3L, 10000L + 1500L + 2250L + 4L))
    got(2L) shouldBe ((0L, 0L, 1L, 1L, 7000L))
  }

  behavior of "topKConcentration"

  it should "report the exact share of the heaviest users with pinned ties" in {
    // user 1: 6 events, user 2: 3, users 3..5: 1 each → top-2 = 9/12
    val ev = ((1L to 6L).map(i => (1L, i)) ++ (1L to 3L).map(i => (2L, i)) ++
      Seq((3L, 1L), (4L, 1L), (5L, 1L))).toDF("user_id", "i")
    val r = Reports.topKConcentration(ev, k = 2).collect()(0)
    r.getLong(0) shouldBe 2L // k (actual cut size)
    r.getLong(1) shouldBe 5L // n_users
    r.getLong(2) shouldBe 9L
    r.getLong(3) shouldBe 12L
    r.getDouble(4) shouldBe 0.75
    // k larger than the user count: the cut is everything, share = 1
    Reports.topKConcentration(ev, k = 50).collect()(0)
      .getDouble(4) shouldBe 1.0
  }

  behavior of "cupedAbTest"

  it should "recover the planted covariate slope and tighten z on correlated outcomes" in {
    val day = 86400000000L
    // replicate the operator's md5-parity arm so the test can plant a
    // TREATMENT effect on arm 1 only
    def armOf(u: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$u".getBytes("UTF-8"))
      val hex = h.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 2
    }
    // 400 users; pre-period (even days) x varies widely per user, the
    // outcome is y = 2x + small noise + effect·arm: the x-driven spread
    // dominates var(y), so the raw z barely sees the effect while the
    // CUPED z (variance = the noise alone) sees it clearly
    val ev = (1L to 400L).flatMap { u =>
      val x = (u % 17 + 1).toDouble
      val noise = ((u * 7919L) % 11L).toDouble / 10.0
      val effect = if (armOf(u) == 1L) 1.5 else 0.0
      Seq(
        ("g", u, 0L * day + u, x),
        ("g", u, 1L * day + u, 2.0 * x + noise + effect))
    }.toDF("event_type", "user_id", "ts", "value")
    val r = Reports.cupedAbTest(ev, "event_type", "user_id", "value")
      .collect()(0)
    r.getLong(1) + r.getLong(2) shouldBe 400L
    r.getDouble(3) shouldBe 2.0 +- 0.05 // theta = cov(x,y)/var(x) ≈ 2
    val zRaw = r.getDouble(4)
    val zCuped = r.getDouble(5)
    // arm 0 minus arm 1: the planted +1.5 on arm 1 makes both z's
    // negative, and the adjustment must sharpen the signal
    zCuped should be < -5.0
    math.abs(zCuped) should be > math.abs(zRaw) * 2.0
  }

  private def md5Arm(u: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"42:$u".getBytes("UTF-8"))
    val hex = h.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 2
  }

  behavior of "postStratifiedAte"

  it should "undo a composition confound the raw diff falls for, and drop single-arm strata" in {
    // stratum A: users 1..120, baseline 10; stratum B: 30 arm-1 users vs
    // only 3 arm-0 users, baseline 100 (B's mass sits almost entirely in
    // one arm — the composition confound); stratum C: 4 users all in arm
    // 1 (no contrast — must be dropped). Planted effect: +2.0 per event
    // on arm 1 everywhere; 2 events per user, so the per-unit (summed)
    // effect is +4.0 and arm0-minus-arm1 estimates should be -4.0.
    val pool = (121L to 5000L)
    val b1 = pool.filter(md5Arm(_) == 1L).take(30)
    val b0 = pool.filter(md5Arm(_) == 0L).take(3)
    val c1 = (5001L to 9000L).filter(md5Arm(_) == 1L).take(4)
    def rows(u: Long, st: String, base: Double) = {
      val eff = if (md5Arm(u) == 1L) 2.0 else 0.0
      Seq((st, u, base + eff), (st, u, base + eff))
    }
    val ev = ((1L to 120L).flatMap(rows(_, "A", 10.0)) ++
      (b1 ++ b0).flatMap(rows(_, "B", 100.0)) ++
      c1.flatMap(rows(_, "C", 50.0)))
    val df = scala.util.Random.shuffle(ev)
      .toDF("event_type", "user_id", "value").repartition(7)
    val r = Reports.postStratifiedAte(df).collect()(0)
    r.getLong(0) shouldBe 2L // A and B kept
    r.getLong(1) shouldBe 1L // C dropped
    r.getLong(2) shouldBe (120L + 33L)
    // the stratified estimate is exactly the planted per-unit effect
    r.getDouble(4) shouldBe -4.0 +- 1e-6
    // the raw diff is dragged far negative by B's arm-1-heavy mass
    r.getDouble(3) should be < -20.0
  }

  it should "fail fast past maxStrata and stay idle on categorical input" in {
    val ev = (1L to 50L).map(u => (s"t${u % 30}", u, 1.0))
      .toDF("event_type", "user_id", "value")
    val boom = intercept[IllegalArgumentException] {
      Reports.postStratifiedAte(ev, maxStrata = 10L)
    }
    boom.getMessage should include("maxStrata")
    Reports.postStratifiedAte(ev, maxStrata = 100L)
      .collect() should have length 1
  }

  behavior of "trimmedMean"

  it should "cut exact rank intervals across duplicate-heavy values" in {
    val ev = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 100.0)) ++
      Seq.fill(10)(("h", 5.0)) ++
      (Seq.fill(3)(1.0) ++ Seq.fill(4)(2.0) ++ Seq.fill(3)(9.0))
        .map(("i", _))
    val got = Reports.trimmedMean(
      scala.util.Random.shuffle(ev)
        .toDF("event_type", "value").repartition(4))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // g: raw mean drags to 14.5 on the 100-outlier; 10% trim drops rank
    // 1 and rank 10, keeping 2..9 -> 5.5
    got("g") shouldBe ((10L, 8L, 14.5, 5.5))
    got("h") shouldBe ((10L, 8L, 5.0, 5.0))
    // i: value 1 spans ranks 1-3 (keep 2), 2 spans 4-7 (keep 4),
    // 9 spans 8-10 (keep 2) -> (2*1 + 4*2 + 2*9) / 8 = 3.5
    got("i") shouldBe ((10L, 8L, 3.8, 3.5))
  }

  behavior of "madAnomalies"

  it should "flag only the spike, with exact half-unit median and MAD" in {
    // 20 hours cycling 9,10,11,10 (median 10, MAD 0.5) plus one
    // 100-event outage spike; the spike must not mask itself (it would
    // inflate a mean/sigma detector's sigma by ~20x)
    val counts = (0L until 20L).map(h =>
      h -> Seq(9, 10, 11, 10)(h.toInt % 4)) :+ (20L -> 100)
    val ev = counts.flatMap { case (h, c) =>
      (0 until c).map(i => ("g", h * 3600000000L + i * 1000000L, 1.0))
    }
    val got = Reports.madAnomalies(
      scala.util.Random.shuffle(ev)
        .toDF("event_type", "ts", "value").repartition(5))
      .collect()
    got should have length 1
    val r = got.head
    r.getString(0) shouldBe "g"
    r.getLong(1) shouldBe 20L
    r.getLong(2) shouldBe 100L
    r.getDouble(3) shouldBe 10.0
    r.getDouble(4) shouldBe 1.0 // median |dev| over 21 hours (odd count)
    // without the spike the 9s/11s (|dev| = 1 = MAD at the interpolated
    // 0.5) stay below any k >= 1 gate: clean series -> empty report
    val calm = counts.dropRight(1).flatMap { case (h, c) =>
      (0 until c).map(i => ("g", h * 3600000000L + i * 1000000L, 1.0))
    }
    Reports.madAnomalies(calm.toDF("event_type", "ts", "value"))
      .collect() shouldBe empty
  }

  behavior of "changepointMeanShift"

  it should "find a planted mean shift exactly and tie-break deterministically" in {
    def evs(t: String, h: Long, n: Int) =
      (0 until n).map(k => (t, h * 3600000000L + k * 1000000L, 1.0))
    val ev = (0L to 9L).flatMap(evs("up", _, 2)) ++
      (10L to 19L).flatMap(evs("up", _, 8)) ++
      (0L to 5L).flatMap(evs("flat", _, 3)) ++
      evs("single", 2L, 4) // one active hour: no valid split
    val df = scala.util.Random.shuffle(ev)
      .toDF("event_type", "ts", "value").repartition(6)
    val got = Reports.changepointMeanShift(df)
      .collect().map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe Set("up", "flat")
    val up = got("up")
    up.getLong(1) shouldBe 20L // n_hours
    up.getLong(2) shouldBe 9L // split after the last low hour
    up.getLong(3) shouldBe 10L
    up.getDouble(4) shouldBe 2.0
    up.getDouble(5) shouldBe 8.0
    up.getDouble(6) shouldBe 6.0
    up.getDouble(7) shouldBe 0.0 // both segments constant at the split
    up.getDouble(8) should be > 0.0 // pooled SSE sees the shift
    // constant series: every split scores 0 — the (sse, hour) tie-break
    // must pick the earliest candidate
    got("flat").getLong(2) shouldBe 0L
    got("flat").getDouble(6) shouldBe 0.0
  }

  it should "match a driver-side argmin replay on a noisy series under any partitioning" in {
    val rnd = new scala.util.Random(11)
    val counts = (0L until 40L).map(h =>
      h -> (3 + rnd.nextInt(4) + (if (h >= 23) 6 else 0)))
    val ev = counts.flatMap { case (h, n) =>
      (0 until n).map(k => ("g", h * 3600000000L + k * 1000000L, 1.0))
    }
    def sse(xs: Seq[Long]): Double = {
      val n = xs.size.toDouble
      xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble -
        xs.sum.toDouble * xs.sum.toDouble / n
    }
    val xs = counts.map(_._2.toLong)
    val best = (1 until xs.size).map { k =>
      (sse(xs.take(k)) + sse(xs.drop(k)), counts(k - 1)._1)
    }.min // (sse, split_hour) lexicographic — same tie policy
    for (parts <- Seq(1, 16)) {
      val r = Reports.changepointMeanShift(
        ev.toDF("event_type", "ts", "value").repartition(parts))
        .collect()(0)
      r.getLong(2) shouldBe best._2
      r.getDouble(7) shouldBe BigDecimal(best._1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-6
    }
  }

  behavior of "conformalInterval"

  it should "pick the exact ceil((1-a)(n+1))-th residual order statistic per type" in {
    def calOf(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$id".getBytes("UTF-8"))
      val hex = h.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 5 == 0
    }
    val ev = (1L to 400L).map(i => ("g", i, (i % 20).toDouble + 0.25)) ++
      (401L to 430L).map(i => ("h", i, 5.0)) // constant type: radius 0
    val df = scala.util.Random.shuffle(ev)
      .toDF("event_type", "event_id", "value").repartition(6)

    def replay(rows: Seq[(String, Long, Double)], keep: Int) = {
      val (cal, train) = rows.partition(e => calOf(e._2))
      val qs = train.map(e => math.floor(e._3 * 1000).toLong)
      val mu = qs.sum / qs.size
      val res = cal.map(e =>
        math.abs(math.floor(e._3 * 1000).toLong - mu)).sorted
      val n = res.size.toLong
      val k = math.min(n, (keep * (n + 1) + 9) / 10)
      (train.size.toLong, n, mu, res((k - 1).toInt))
    }
    val byType = ev.groupBy(_._1)
    val got = Reports.conformalInterval(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    got.keySet shouldBe byType.keySet
    for ((t, rows) <- byType) {
      val (nTr, nCal, mu, qhat) = replay(rows.toSeq, keep = 9)
      withClue(s"type $t: ") {
        got(t) shouldBe ((nTr, nCal, mu / 1000.0, qhat / 1000.0,
          (mu - qhat) / 1000.0, (mu + qhat) / 1000.0))
      }
    }
    got("h")._4 shouldBe 0.0 // constant metric: zero radius
    // tighter alpha never widens: the 50% radius <= the 90% radius
    val r50 = Reports.conformalInterval(df, alphaTenths = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    r50("g") should be <= got("g")._4
  }

  behavior of "didEstimate"

  it should "recover a planted post-period treatment effect under a shared trend" in {
    val day = 86400000000L
    // days 0..3 (midpoint 2): everyone drifts +1.0/day (shared trend),
    // treated units (md5 arm 1) gain +5.0 in the post period only
    val ev = (1L to 200L).flatMap { u =>
      (0L to 3L).map { d =>
        val base = 10.0 + d * 1.0 + (u % 7) * 0.1
        val eff = if (md5Arm(u) == 1L && d >= 2L) 5.0 else 0.0
        ("g", u, d * day + u, base + eff)
      }
    }.toDF("event_type", "user_id", "ts", "value")
    val r = Reports.didEstimate(ev, "event_type", "user_id", "ts", "value")
      .collect()(0)
    // quantized at 1000: the raw trend and unit offsets difference out
    r.getDouble(5) shouldBe 5000.0 +- 1.0
    r.getDouble(6) should be > 10.0
  }

  behavior of "mannWhitneyU"

  it should "match the hand-computed tie-corrected U and z" in {
    // arm 0 values {1,1}, arm 1 values {1,2} (quantized): midranks give
    // R_a = 4, U = 1; tie group t=3 ⇒ var = 1 ⇒ z = (1-2)/1 = -1
    val pool = (1L to 50L)
    val a = pool.filter(md5Arm(_) == 0L).take(2)
    val b = pool.filter(md5Arm(_) == 1L).take(2)
    val ev = Seq(
      ("g", a(0), 0.001), ("g", a(1), 0.001),
      ("g", b(0), 0.001), ("g", b(1), 0.002))
      .toDF("event_type", "user_id", "value")
    val r = Reports.mannWhitneyU(ev, "event_type", "user_id", "value")
      .collect()(0)
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 2L
    r.getDouble(3) shouldBe 1.0 +- 1e-9
    r.getDouble(4) shouldBe -1.0 +- 1e-9
  }

  it should "separate stochastically shifted arms across band boundaries" in {
    // arm 1 values sit one bandWidth higher: U ratio extreme, z large
    val ev = (1L to 400L).map { u =>
      val v = if (md5Arm(u) == 0L) (u % 13) * 1.0 else 25.0 + (u % 13) * 1.0
      ("g", u, v)
    }.toDF("event_type", "user_id", "value")
    val r = Reports.mannWhitneyU(ev, "event_type", "user_id", "value",
      bandWidth = 7000L)
      .collect()(0)
    // complete separation: every arm-0 value below every arm-1 value ⇒
    // U = 0 for arm 0 and a strongly negative z
    r.getDouble(3) shouldBe 0.0 +- 1e-9
    r.getDouble(4) should be < -10.0
  }

  it should "fail fast on a wide-domain value column and stay idle on bounded ones" in {
    // epoch-micros-style values: the band census would be ~1 cell per
    // distinct value — the shared Banded guard turns the would-be driver
    // OOM into an actionable error BEFORE any collect
    val wide = (1L to 50L).map(u => ("g", u, u * 1.0e12))
      .toDF("event_type", "user_id", "value")
    val e = intercept[IllegalArgumentException] {
      Reports.mannWhitneyU(wide, "event_type", "user_id", "value",
        maxBands = 10L)
    }
    e.getMessage should include("maxBands")
    // a priced/bounded domain under the same cap passes untouched
    val bounded = (1L to 50L).map(u => ("g", u, (u % 7) * 1.0))
      .toDF("event_type", "user_id", "value")
    Reports.mannWhitneyU(bounded, "event_type", "user_id", "value",
      maxBands = 10L).collect().length shouldBe 1
  }

  behavior of "winsorizedMean"

  it should "clamp tails to the k-th order statistics instead of dropping them" in {
    // n=10, k=1: clamp_lo = value at rank 2, clamp_hi = value at rank 9;
    // the outlier 100 saturates to 9 -> winsorized sum 55
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0)
    val df = vals.map(("g", _)).toDF("event_type", "value")
    val r = Reports.winsorizedMean(df, quantScale = 1L).collect()(0)
    r.getLong(1) shouldBe 10L
    r.getDouble(2) shouldBe 2.0 +- 1e-9 // clamp_lo
    r.getDouble(3) shouldBe 9.0 +- 1e-9 // clamp_hi
    r.getDouble(4) shouldBe 14.5 +- 1e-9 // raw mean incl. outlier
    r.getDouble(5) shouldBe 5.5 +- 1e-9 // winsorized
  }

  it should "fold ties into shared rank intervals" in {
    // 1,5,5,5,9 with k=1: clamp_lo = rank-2 value = 5, clamp_hi =
    // rank-4 value = 5 -> winsorized = (5+5+5+5+5)/5 = 5
    val df = Seq(1.0, 5.0, 5.0, 5.0, 9.0).map(("g", _))
      .toDF("event_type", "value")
    val r = Reports.winsorizedMean(df, winsorPct = 20, quantScale = 1L)
      .collect()(0)
    r.getDouble(2) shouldBe 5.0 +- 1e-9
    r.getDouble(3) shouldBe 5.0 +- 1e-9
    r.getDouble(5) shouldBe 5.0 +- 1e-9
  }

  behavior of "ljungBox"

  it should "flag an alternating series and fold a constant one to Q = 0" in {
    // counts alternate 5/15 by hour: strong negative lag-1, positive
    // lag-2 autocorrelation -> large Q; lag pairs must come from the
    // hour equi-join (48 hours, no gaps)
    val alt = (0 until 48).flatMap { h =>
      val n = if (h % 2 == 0) 5 else 15
      (0 until n).map(i => ("g", h * 3600000000L + i * 1000L))
    }.toDF("event_type", "ts")
    val r = Reports.ljungBox(alt).collect()(0)
    r.getAs[Long]("n_hours") shouldBe 48L
    r.getAs[Double]("r1") should be < -0.8
    r.getAs[Double]("r2") should be > 0.8
    r.getAs[Double]("q_stat") should be > 100.0
    // constant series: zero variance -> NULL lags, Q folds to 0
    val flat = (0 until 48).flatMap(h =>
      (0 until 7).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    val f = Reports.ljungBox(flat).collect()(0)
    f.isNullAt(2) shouldBe true // r1
    f.getAs[Double]("q_stat") shouldBe 0.0 +- 1e-9
  }

  it should "emit degenerate groups (zero lag pairs at every lag) with NULL lags and Q = 0" in {
    // group "one": a single observed hour -> no pair exists at any lag;
    // group "far": two hours 100 apart -> every lag 1..6 misses. Both
    // must still appear (the oracle's den CROSS JOIN lag-grid LEFT JOIN
    // shape), not vanish through an inner join on nums
    val df = (
      (0 until 4).map(i => ("one", 1000L + i.toLong)) ++
        Seq(("far", 0L), ("far", 100L * 3600000000L)) ++
        (0 until 48).map(h => ("ok", h * 3600000000L)))
      .toDF("event_type", "ts")
    val got = Reports.ljungBox(df).collect()
      .map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe Set("one", "far", "ok")
    val one = got("one")
    one.getAs[Long]("n_hours") shouldBe 1L
    (2 to 7).foreach(i => one.isNullAt(i) shouldBe true) // r1..r6
    one.getAs[Double]("q_stat") shouldBe 0.0 +- 1e-9
    val far = got("far")
    far.getAs[Long]("n_hours") shouldBe 2L
    (2 to 7).foreach(i => far.isNullAt(i) shouldBe true)
    far.getAs[Double]("q_stat") shouldBe 0.0 +- 1e-9
  }

  behavior of "seasonalDecompose"

  it should "recover a flat series exactly and localize a planted phase spike" in {
    // flat 7 events/hour over 4 days: trend 7, seasonal 0, residual 0
    val flat = (0 until 96).flatMap(h =>
      (0 until 7).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    val fr = Reports.seasonalDecompose(flat).collect()
    fr.length shouldBe 96 - 24 // interior hours only (12 lost each edge)
    fr.foreach { r =>
      r.getAs[Double]("trend") shouldBe 7.0 +- 1e-9
      r.getAs[Double]("seasonal") shouldBe 0.0 +- 1e-9
      r.getAs[Double]("residual") shouldBe 0.0 +- 1e-9
    }
    // phase-0 hours spike to 30: the seasonal component must carry the
    // spike at phase 0 and the additive identity must hold per row
    val spiky = (0 until 96).flatMap { h =>
      val n = if (h % 24 == 0) 30 else 7
      (0 until n).map(i => ("g", h * 3600000000L + i * 1000L))
    }.toDF("event_type", "ts")
    val sr = Reports.seasonalDecompose(spiky).collect()
    val byPhase = sr.groupBy(r => r.getAs[Long]("hour_id") % 24)
    val s0 = byPhase(0L).map(_.getAs[Double]("seasonal")).head
    byPhase.view.filterKeys(_ != 0L).toMap.values.flatten
      .map(_.getAs[Double]("seasonal")).foreach(s => s0 should be > s + 10.0)
    sr.foreach { r =>
      (r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")) shouldBe
        r.getAs[Long]("n_events").toDouble +- 1e-5
    }
  }

  behavior of "coverageGaps"

  it should "account for silent spans and locate the longest one" in {
    // observed hours 0,1,5,6,7,12: gaps 2-4 (len 3) and 8-11 (len 4)
    val ev = Seq(0, 1, 5, 6, 7, 12).flatMap(h =>
      (0 until 2).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    val r = Reports.coverageGaps(ev).collect()(0)
    r.getLong(1) shouldBe 6L // n_hours
    r.getLong(2) shouldBe 13L // span
    r.getLong(3) shouldBe 7L // missing
    r.getLong(4) shouldBe 2L // n_gaps
    r.getLong(5) shouldBe 4L // max gap
    r.getLong(6) shouldBe 8L
    r.getLong(7) shouldBe 11L
    // a dense series: zeros and NULL bounds, not a missing row
    val dense = (0 until 5).flatMap(h =>
      (0 until 2).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    val d = Reports.coverageGaps(dense).collect()(0)
    d.getLong(4) shouldBe 0L
    d.getLong(5) shouldBe 0L
    d.isNullAt(6) shouldBe true
  }

  behavior of "weekendEffect"

  it should "separate a planted weekend lift and match the hand Welch t" in {
    // 3 full weeks planted on the REAL calendar: epoch day 0 is a
    // Thursday, so day d is weekend iff (d + 3) % 7 >= 5 (Sat/Sun);
    // weekday hours 10 + (h%3) events, weekend hours +12 lift
    val ev = (0 until 21 * 24).flatMap { h =>
      val we = (h / 24 + 3) % 7 >= 5
      val n = if (we) 22 + h % 3 else 10 + h % 3
      (0 until n).map(i => ("g", h * 3600000000L + i * 1000L))
    }.toDF("event_type", "ts")
    val r = Reports.weekendEffect(ev).collect()(0)
    r.getLong(1) shouldBe 15L * 24L // weekday hours
    r.getLong(2) shouldBe 6L * 24L
    r.getAs[Double]("mean_wd") shouldBe 11.0 +- 0.01
    r.getAs[Double]("mean_we") shouldBe 23.0 +- 0.01
    r.getAs[Double]("t_welch") should be < -100.0 // huge separation
    r.getAs[Double]("df") should be > 100.0
  }

  it should "classify real calendar Saturdays/Sundays as weekend" in {
    // 2026-08-15 is a Saturday, 2026-08-17 a Monday (UTC): one event
    // each; only the Saturday hour may land in the weekend class
    val sat = java.time.Instant.parse("2026-08-15T12:00:00Z")
    val mon = java.time.Instant.parse("2026-08-17T12:00:00Z")
    def us(i: java.time.Instant) =
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    val ev = Seq(("g", us(sat)), ("g", us(mon)))
      .toDF("event_type", "ts")
    val r = Reports.weekendEffect(ev).collect()(0)
    r.getAs[Long]("n_wd") shouldBe 1L // the Monday hour
    r.getAs[Long]("n_we") shouldBe 1L // the Saturday hour
  }

  behavior of "freshness"

  it should "measure frontier lag and final-day volume per type" in {
    // type a alive at the frontier (hour 100), type b stopped at hour 90
    val ev = ((90 to 100).flatMap(h => (0 until 2).map(i =>
      ("a", h * 3600000000L + i * 1000L))) ++
      (80 to 90).flatMap(h => (0 until 3).map(i =>
        ("b", h * 3600000000L + i * 1000L))))
      .toDF("event_type", "ts")
    val got = Reports.freshness(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    got("a") shouldBe ((100L, 0L, 22L, 22L)) // all 11 hours in window
    // b: last 90, behind 10; hours > 76 -> 77..90 observed = 80..90
    got("b") shouldBe ((90L, 10L, 33L, 33L))
  }

  behavior of "seasonalAnomalies"

  it should "stay quiet through pure seasonality and flag only the planted spike" in {
    // strong daily pattern the raw-count z-detectors would alert on
    def series(spikeAt: Option[Int]) = (0 until 120).flatMap { h =>
      val seasonal = 10 + 8 * ((h % 24) / 12)
      val n = if (spikeAt.contains(h)) seasonal + 40 else seasonal
      (0 until n).map(i => ("g", h * 3600000000L + i * 1000L))
    }.toDF("event_type", "ts")
    // clean periodic series: residuals are seasonal-model noise only —
    // nothing clears 3x its own MAD by a planted margin, so the report
    // must NOT contain any hour a spike would own
    val clean = Reports.seasonalAnomalies(series(None)).collect()
    val spiked = Reports.seasonalAnomalies(series(Some(60))).collect()
    spiked.map(_.getLong(1)) should contain(60L)
    // the spike hour carries by far the largest residual
    val at60 = spiked.filter(_.getLong(1) == 60L).head
    math.abs(at60.getAs[Double]("residual")) should be > 25.0
    clean.map(_.getLong(1)) should not contain 60L
  }

  behavior of "dailyQuantiles"

  it should "cut exact integer target ranks per (group, day)" in {
    // day 0: values 1..10 -> p50 = rank-5 value = 5, p90 = rank-9 = 9;
    // day 1: constant 4 -> both quantiles 4
    val ev = ((1 to 10).map(v => ("g", v * 1000L, v.toDouble)) ++
      (1 to 6).map(i => ("g", 86400000000L + i * 1000L, 4.0)))
      .toDF("event_type", "ts", "value")
    val got = Reports.dailyQuantiles(ev, quantScale = 1L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    got(0L) shouldBe ((10L, 5.0, 9.0))
    got(1L) shouldBe ((6L, 4.0, 4.0))
  }

  behavior of "theilSenTrend"

  it should "recover a planted slope through an outlier hour OLS would chase" in {
    // counts 2h+10 per hour except hour 5 spikes to 100: 36 of 45
    // pairwise slopes are exactly 2.0 -> median slope 2, intercept 10
    val ev = (0 until 10).flatMap { h =>
      val n = if (h == 5) 100 else 2 * h + 10
      (0 until n).map(i => ("g", h * 3600000000L + i * 1000L))
    }.toDF("event_type", "ts")
    val r = Reports.theilSenTrend(ev).collect()(0)
    r.getLong(1) shouldBe 10L // n_hours
    r.getLong(2) shouldBe 45L // n_pairs
    r.getDouble(3) shouldBe 2.0 +- 1e-9
    r.getDouble(4) shouldBe 10.0 +- 1e-9
  }

  it should "fail fast when the hour span out-bands the pairwise census" in {
    val wide = (0 until 50).map(h => ("g", h * 3600000000L))
      .toDF("event_type", "ts")
    val e = intercept[IllegalArgumentException] {
      Reports.theilSenTrend(wide, maxHours = 10L)
    }
    e.getMessage should include("maxHours")
  }

  behavior of "spearmanCorr"

  it should "report +-1 for strictly monotone relationships and handle ties" in {
    // user u: u+1 events of value 1000+u -> activity and value mass both
    // strictly increasing in u
    val up = (0 until 10).flatMap(u =>
      (0 to u).map(i => (u.toLong, s"e$i", (1000.0 + u))))
      .toDF("user_id", "event_type", "value")
    Reports.spearmanCorr(up).collect()(0).getDouble(1) shouldBe 1.0 +- 1e-9
    // value negated -> mass strictly decreasing in activity
    val down = (0 until 10).flatMap(u =>
      (0 to u).map(i => (u.toLong, s"e$i", -(1000.0 + u))))
      .toDF("user_id", "event_type", "value")
    Reports.spearmanCorr(down).collect()(0)
      .getDouble(1) shouldBe -1.0 +- 1e-9
    // tied activity (all users 2 events): x rank variance is 0 — a
    // degenerate margin has no rank correlation, and the contract is a
    // stated NULL (not an ANSI DIVIDE_BY_ZERO crash, not a NaN)
    val flat = (0 until 6).flatMap(u =>
      (0 until 2).map(i => (u.toLong, s"e$i", 10.0 + u)))
      .toDF("user_id", "event_type", "value")
    Reports.spearmanCorr(flat).collect()(0).isNullAt(1) shouldBe true
  }

  behavior of "leadLag"

  it should "recover a planted offset in either direction" in {
    // series b repeats series a 2 hours later; series c LEADS a by 1
    // (grids offset from hour 6 so no series touches negative hours —
    // trunc division would fold hour -1 into hour 0 and corrupt counts)
    def emit(t: String, h: Int, n: Int) =
      (0 until n).map(i => (t, h * 3600000000L + i * 1000L))
    val base = (0 until 72).map(h => 3 + (h * h % 11))
    val ev = (base.zipWithIndex.flatMap { case (n, h) => emit("a", h + 6, n) } ++
      base.zipWithIndex.flatMap { case (n, h) => emit("b", h + 8, n) } ++
      base.zipWithIndex.flatMap { case (n, h) => emit("c", h + 5, n) })
      .toDF("event_type", "ts")
    val got = Reports.leadLag(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(4)))).toMap
    got(("a", "b"))._1 shouldBe 2L // b trails a by 2
    got(("a", "b"))._2 shouldBe 1.0 +- 1e-9
    got(("a", "c"))._1 shouldBe -1L // c leads a by 1
    got(("a", "c"))._2 shouldBe 1.0 +- 1e-9
  }

  it should "emit a stated NULL winner when one series is constant" in {
    // series d is flat: zero variance at every lag -> every r NULL; the
    // winner row still ships (NULLs-last ordering picks lag -6) with a
    // NULL r rather than an ANSI crash or a dropped pair
    val ev = ((0 until 48).flatMap(h => (0 until (3 + h % 5)).map(i =>
      ("a", (h + 6) * 3600000000L + i * 1000L))) ++
      (0 until 48).flatMap(h => (0 until 4).map(i =>
        ("d", (h + 6) * 3600000000L + i * 1000L))))
      .toDF("event_type", "ts")
    val row = Reports.leadLag(ev).collect()
      .filter(r => r.getString(0) == "a" && r.getString(1) == "d")
    row.length shouldBe 1
    row.head.isNullAt(4) shouldBe true
  }

  behavior of "hotStreaks"

  it should "find the longest above-median island with exact medians" in {
    // 11 hours, six 1s and five 9s: exact median 1 (doubled 2);
    // above-median islands = {3,4} and {6,7,8} -> longest 3 @ hours 6-8
    val counts = Seq(1, 1, 1, 9, 9, 1, 9, 9, 9, 1, 1)
    val ev = counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => ("g", h * 3600000000L + i * 1000L))
    }.toDF("event_type", "ts")
    val r = Reports.hotStreaks(ev).collect()(0)
    r.getDouble(1) shouldBe 1.0 +- 1e-9 // median
    r.getLong(2) shouldBe 2L // n_streaks
    r.getLong(3) shouldBe 3L // longest
    r.getLong(4) shouldBe 6L
    r.getLong(5) shouldBe 8L
    // a constant series has nothing above its own median: empty report
    val flat = (0 until 10).flatMap(h =>
      (0 until 4).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    Reports.hotStreaks(flat).count() shouldBe 0L
  }

  behavior of "dpQuantile"

  it should "concentrate on the true quantile at high epsilon and replay deterministically" in {
    val df = (1 to 100).map(v => ("g", v.toDouble))
      .toDF("event_type", "value")
    // eps = 1000: utility dominates the Gumbel keys -> the rank-0-error
    // candidate (value 50, cum = target = 50) wins outright; exact
    // quantile and rank error live ONLY on the debug tier
    val sharp = Reports.dpQuantileDebug(
      df, epsilon = 1000.0, quantScale = 1L).collect()(0)
    sharp.getAs[Double]("dp_quantile") shouldBe 50.0 +- 1e-9
    sharp.getAs[Double]("exact_quantile") shouldBe 50.0 +- 1e-9
    sharp.getAs[Long]("rank_error") shouldBe 0L
    // the release is a pure function of (data, seed, releaseId): two
    // runs agree; the release frame ships ONLY the noisy pick
    val rel = Reports.dpQuantile(df, epsilon = 0.05, quantScale = 1L)
    rel.columns.toSeq shouldBe Seq("event_type", "dp_quantile", "epsilon")
    val a = rel.collect()(0)
    val b = Reports.dpQuantile(df, epsilon = 0.05, quantScale = 1L)
      .collect()(0)
    a.getAs[Double]("dp_quantile") shouldBe b.getAs[Double]("dp_quantile")
    // the release pick equals the debug tier's pick under one nonce
    val dbg = Reports.dpQuantileDebug(df, epsilon = 0.05, quantScale = 1L)
      .collect()(0)
    a.getAs[Double]("dp_quantile") shouldBe
      dbg.getAs[Double]("dp_quantile")
    // fresh nonce = fresh Gumbel keys: across many releaseIds at low
    // epsilon the draws move (no reuse across repeat publications)
    val picks = Seq("r0", "r1", "r2", "r3", "r4").map(rid =>
      Reports.dpQuantile(df, epsilon = 0.05, quantScale = 1L,
        releaseId = rid).collect()(0).getAs[Double]("dp_quantile"))
    picks.distinct.size should be > 1
    an[IllegalArgumentException] should be thrownBy
      Reports.dpQuantile(df, releaseId = "")
  }

  behavior of "experimentSizing"

  it should "match the hand-evaluated Fleiss formula and clamp degenerate lifts" in {
    // 10 of 100 users click -> p1 = 0.1, p2 = 0.12; every user signs up
    // -> p1 = 1, p2 clamps to 1, sizing has no answer (stated NULL)
    val ev = ((1L to 100L).map(u => (u, "signup")) ++
      (1L to 10L).map(u => (u, "click")))
      .toDF("user_id", "event_type")
    val got = Reports.experimentSizing(ev)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = got("click")
    c.getAs[Long]("n_users_type") shouldBe 10L
    c.getAs[Long]("n_users_total") shouldBe 100L
    c.getAs[Double]("p1") shouldBe 0.1 +- 1e-9
    c.getAs[Double]("p2") shouldBe 0.12 +- 1e-9
    val (p1, p2) = (0.1, 0.12)
    val pbar = 0.5 * (p1 + p2)
    val num = 1.959963984540054 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      0.8416212335729143 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    val expected = math.ceil(num * num / ((p2 - p1) * (p2 - p1))).toLong
    c.getAs[Long]("n_per_arm") shouldBe expected
    c.getAs[Long]("n_total") shouldBe expected * 2
    got("signup").isNullAt(5) shouldBe true
    got("signup").isNullAt(6) shouldBe true
  }

  behavior of "kendallTau"

  it should "report +-1 for co-moving and counter-moving series and count ties" in {
    def series(f: Int => Int, g: Int => Int) = (0 until 8).flatMap { h =>
      (0 until f(h)).map(i => ("a", h * 3600000000L + i * 1000L)) ++
        (0 until g(h)).map(i => ("b", h * 3600000000L + i * 1000L))
    }.toDF("event_type", "ts")
    val co = Reports.kendallTau(
      series(h => h + 1, h => 2 * h + 3), "a", "b").collect()(0)
    co.getLong(0) shouldBe 8L
    co.getLong(1) shouldBe 28L
    co.getDouble(4) shouldBe 1.0 +- 1e-9
    val anti = Reports.kendallTau(
      series(h => h + 1, h => 20 - h), "a", "b").collect()(0)
    anti.getDouble(4) shouldBe -1.0 +- 1e-9
    // a flat on half the hours: tied-x pairs leave C+D short of n_pairs
    val tied = Reports.kendallTau(
      series(h => if (h < 4) 1 else h, h => h + 1), "a", "b").collect()(0)
    (tied.getLong(2) + tied.getLong(3)) should be < tied.getLong(1)
    tied.getDouble(4) should (be > 0.5 and be < 1.0)
  }

  it should "fail fast when the shared-hour span exceeds maxHours" in {
    val wide = (0 until 30).flatMap(h => Seq(
      ("a", h * 3600000000L), ("b", h * 3600000000L)))
      .toDF("event_type", "ts")
    val e = intercept[IllegalArgumentException] {
      Reports.kendallTau(wide, "a", "b", maxHours = 10L)
    }
    e.getMessage should include("maxHours")
  }

  behavior of "tClosenessReport"

  it should "report 0 for matching distributions and the exact EMD for skewed ones" in {
    // buckets: 0 and 2 (n_chars 100 vs 1100, width 500); identical class
    // distributions ⇒ EMD 0
    val same = Seq(("a", "en", 100L), ("a", "en", 1100L),
      ("b", "en", 100L), ("b", "en", 1100L))
      .toDF("source", "lang", "n_chars")
    Reports.tClosenessReport(same, Seq("source", "lang"), "n_chars")
      .collect().map(_.getDouble(3)).foreach(_ shouldBe 0.0 +- 1e-9)
    // class a entirely in bucket 0, b entirely in bucket 2:
    // EMD = |cum_g·N − cum_b·n_g| / (n_g·N·(m−1)) = 16/32 = 0.5 each
    val skew = (Seq.fill(4)(("a", "en", 100L)) ++
      Seq.fill(4)(("b", "en", 1100L)))
      .toDF("source", "lang", "n_chars")
    val got = Reports.tClosenessReport(skew, Seq("source", "lang"), "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    got("a") shouldBe 0.5 +- 1e-9
    got("b") shouldBe 0.5 +- 1e-9
  }

  it should "fail fast on an over-wide spine and on a degenerate one" in {
    val wide = (1L to 50L).map(i => ("s", "en", i * 500L))
      .toDF("source", "lang", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Reports.tClosenessReport(wide, Seq("source"), "n_chars",
        maxBuckets = 10)
    }
    e.getMessage should include("maxBuckets")
    val flat = Seq(("s", "en", 1L), ("s", "en", 2L))
      .toDF("source", "lang", "n_chars")
    intercept[IllegalArgumentException] {
      Reports.tClosenessReport(flat, Seq("source"), "n_chars")
    }
  }

  behavior of "revenueGini"

  it should "report 0 for perfect equality and (n-1)/n under total concentration" in {
    val equal = (1L to 8L).map(c => (c, java.math.BigDecimal.valueOf(100.00)))
      .toDF("o_custkey", "o_totalprice")
    val re = Reports.revenueGini(equal, bandWidth = 3000L).collect()(0)
    re.getLong(0) shouldBe 8L
    re.getLong(1) shouldBe 8L * 10000L
    re.getDouble(2) shouldBe 0.0 +- 1e-9
    // n < 10 ⇒ n/10 = 0 ⇒ the top decile holds zero customers
    re.getDouble(3) shouldBe 0.0 +- 1e-9
    // one customer owns everything except epsilon crumbs
    val concentrated = ((1L to 9L).map(c =>
      (c, java.math.BigDecimal.valueOf(0.01))) :+
      (10L, java.math.BigDecimal.valueOf(99999.99)))
      .toDF("o_custkey", "o_totalprice")
    val rc = Reports.revenueGini(concentrated, bandWidth = 1000L).collect()(0)
    // G -> (n-1)/n = 0.9 as the crumbs' mass vanishes
    rc.getDouble(2) shouldBe 0.9 +- 1e-3
    rc.getDouble(3) should be > 0.999
  }

  it should "match a hand-computed rank-form Gini across band boundaries" in {
    // amounts chosen to straddle several 500-wide bands; hand Gini via
    // G = 2·Σ r·q / (n·Σq) − (n+1)/n with ranks by (q, cust)
    val amts = Seq(1.00, 7.00, 7.00, 3.50, 12.25, 9.75)
    val df = amts.zipWithIndex.map { case (a, i) =>
      ((i + 1).toLong, java.math.BigDecimal.valueOf(a)) }
      .toDF("o_custkey", "o_totalprice")
    val q = amts.map(a => math.floor(a * 100.0).toLong)
    val ranked = q.zip(1L to 6L).sortBy(identity)
    val srq = ranked.zipWithIndex.map { case ((qi, _), i) => (i + 1) * qi }.sum
    val expected = 2.0 * srq / (6.0 * q.sum) - 7.0 / 6.0
    val r = Reports.revenueGini(df, bandWidth = 500L).collect()(0)
    r.getDouble(2) shouldBe (math.rint(expected * 1e6) / 1e6) +- 1e-9
  }

  it should "fail fast when the amount domain out-bands the census cap" in {
    val wide = (1L to 40L).map(c =>
      (c, java.math.BigDecimal.valueOf(c.toDouble * 1.0e8)))
      .toDF("o_custkey", "o_totalprice")
    val e = intercept[IllegalArgumentException] {
      Reports.revenueGini(wide, bandWidth = 100L, maxBands = 10L)
    }
    e.getMessage should include("maxBands")
  }

  behavior of "benfordDigits"

  it should "extract leading digits by integer math and flag a flat distribution" in {
    // 9000.00..9008.99-style values all lead with 9; mix in 1xx values
    val rows = ((1 to 90).map(i => 100.00 + i) ++ (1 to 10).map(i => 9000.0 + i))
      .map(java.math.BigDecimal.valueOf).toDF("amt")
    val got = Reports.benfordDigits(rows, "amt")
      .collect().map(r => r.getInt(0) -> r).toMap
    got(1).getLong(1) shouldBe 90L
    got(9).getLong(1) shouldBe 10L
    got(1).getDouble(2) shouldBe 0.9 +- 1e-9
    // expected(1) = log10(2) ≈ 0.30103; ninety-of-a-hundred 1s is a
    // huge positive deviation
    got(1).getDouble(3) shouldBe 0.30103 +- 1e-5
    got(1).getDouble(4) should be > 10.0
    // digits 2..8 absent entirely
    got.keySet shouldBe Set(1, 9)
  }

  behavior of "survivalKm"

  it should "reproduce the textbook product-limit curve with censoring" in {
    val day = 86400000000L
    // users with (first, last) days; horizon = day 20 ⇒ censor cutoff 13:
    // lifetimes: u1 0-2 (event), u2 0-2 (event), u3 0-5 (event),
    // u4 0-14 (censored), u5 0-20 (censored, defines horizon)
    val ev = Seq(
      (1L, 0L), (1L, 2L), (2L, 0L), (2L, 2L), (3L, 0L), (3L, 5L),
      (4L, 0L), (4L, 14L), (5L, 0L), (5L, 20L)
    ).map { case (u, d) => (u, d * day + u) }.toDF("user_id", "ts")
    val rows = Reports.survivalKm(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // dur 2: at-risk 5, d=2 ⇒ S = 3/5
    rows(2L) shouldBe ((5L, 2L, 0L, 0.6))
    // dur 5: at-risk 3, d=1 ⇒ S = 0.6 · 2/3 = 0.4
    rows(5L)._4 shouldBe 0.4 +- 1e-9
    // dur 14 censored: survival unchanged at 0.4, no event
    rows(14L) shouldBe ((2L, 0L, 1L, 0.4))
    rows(20L) shouldBe ((1L, 0L, 1L, 0.4))
  }

  behavior of "bootstrapCi"

  it should "bracket the mean deterministically and tighten with sample size" in {
    val small = (1L to 50L).map(i => (i, (i % 10) * 10 + 5)).toDF("id", "v")
    val big = (1L to 5000L).map(i => (i, (i % 10) * 10 + 5)).toDF("id", "v")
    val rs = Reports.bootstrapCi(small, "id", "v").collect()(0)
    val rb = Reports.bootstrapCi(big, "id", "v").collect()(0)
    rs.getLong(0) shouldBe 50L
    rs.getLong(2) shouldBe 64L
    rs.getDouble(3) should be < rs.getDouble(1)
    rs.getDouble(4) should be > rs.getDouble(1)
    // same seed ⇒ bit-identical re-run
    val rs2 = Reports.bootstrapCi(small, "id", "v").collect()(0)
    rs2 shouldBe rs
    // 100x rows ⇒ the CI width shrinks roughly with sqrt(n)
    val ws = rs.getDouble(4) - rs.getDouble(3)
    val wb = rb.getDouble(4) - rb.getDouble(3)
    wb should be < ws / 4.0
  }

  behavior of "cliffsDelta"

  it should "match the hand pair census and its Romano label" in {
    val a = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("m")
    val b = Seq(2L, 3L, 4L).map(Tuple1(_)).toDF("m")
    // 9 pairs by hand: gt 1, lt 6, ties 2 -> delta = -5/9
    val r = Reports.cliffsDelta(a, b, col("m")).collect()(0)
    r.getAs[Long]("n_a") shouldBe 3L
    r.getAs[Double]("cliffs_delta") shouldBe -0.555556 +- 1e-6
    r.getAs[String]("magnitude") shouldBe "large"
    // identical samples: perfect overlap -> 0, negligible
    val same = Reports.cliffsDelta(a, a, col("m")).collect()(0)
    same.getAs[Double]("cliffs_delta") shouldBe 0.0 +- 1e-9
    same.getAs[String]("magnitude") shouldBe "negligible"
    // full dominance -> +1
    val hi = Seq(10L, 11L).map(Tuple1(_)).toDF("m")
    Reports.cliffsDelta(hi, a, col("m")).collect()(0)
      .getAs[Double]("cliffs_delta") shouldBe 1.0 +- 1e-9
  }

  it should "emit stated NULL delta AND magnitude on an empty side" in {
    val a = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("m")
    val none = a.filter(col("m") < 0L)
    // the r13 advice bug: abs(NULL) < x is false at every when tier, so
    // the label fell through to 'large' on no data
    val r = Reports.cliffsDelta(a, none, col("m")).collect()(0)
    r.getAs[Long]("n_b") shouldBe 0L
    r.isNullAt(r.fieldIndex("cliffs_delta")) shouldBe true
    r.isNullAt(r.fieldIndex("magnitude")) shouldBe true
    val r2 = Reports.cliffsDelta(none, none, col("m")).collect()(0)
    r2.isNullAt(r2.fieldIndex("cliffs_delta")) shouldBe true
    r2.isNullAt(r2.fieldIndex("magnitude")) shouldBe true
  }

  behavior of "oddsRatio"

  it should "match the hand 2x2 OR/RR/Woolf SE and guard empty cells" in {
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(30)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(40)((false, false))
    val r = Reports.oddsRatio(rows.toDF("e", "o"), col("e"), col("o"))
      .collect()(0)
    r.getAs[Long]("n") shouldBe 100L
    r.getAs[Double]("odds_ratio") shouldBe 2.666667 +- 1e-6
    r.getAs[Double]("risk_ratio") shouldBe 2.0 +- 1e-9
    r.getAs[Double]("se_log_or") shouldBe
      math.sqrt(1.0 / 20 + 1.0 / 30 + 1.0 / 10 + 1.0 / 40) +- 1e-6
    // a zero cell: OR and SE are stated NULLs, RR still defined
    val z = Seq.fill(5)((true, true)) ++ Seq.fill(5)((false, true)) ++
      Seq.fill(5)((false, false))
    val rz = Reports.oddsRatio(z.toDF("e", "o"), col("e"), col("o"))
      .collect()(0)
    rz.isNullAt(5) shouldBe true // odds_ratio
    rz.getAs[Double]("risk_ratio") shouldBe 2.0 +- 1e-9
    rz.isNullAt(7) shouldBe true // se_log_or
  }

  behavior of "kruskalWallis"

  it should "match the hand H on separated groups and fold to 0 on identical ones" in {
    def series(counts: Map[String, Seq[Int]]) = counts.toSeq.flatMap {
      case (g, cs) => cs.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => (g, h * 3600000000L + i * 1000L)) }
    }.toDF("event_type", "ts")
    // A hours {1,2,3}, B hours {10,20,30}: no ties, R_A=6, R_B=15,
    // H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 27/7 = 3.857143
    val sep = Reports.kruskalWallis(
      series(Map("a" -> Seq(1, 2, 3), "b" -> Seq(10, 20, 30))))
      .collect()(0)
    sep.getAs[Long]("n_obs") shouldBe 6L
    sep.getAs[Long]("n_groups") shouldBe 2L
    sep.getAs[Double]("h_stat") shouldBe 3.857143 +- 1e-6
    sep.getAs[Double]("h_corrected") shouldBe 3.857143 +- 1e-6
    // identical distributions: rank sums equal -> H = 0; the tie
    // correction (three ties of 2) leaves 0/0.914... = 0
    val same = Reports.kruskalWallis(
      series(Map("a" -> Seq(1, 2, 3), "b" -> Seq(1, 2, 3))))
      .collect()(0)
    same.getAs[Double]("h_stat") shouldBe 0.0 +- 1e-9
    same.getAs[Double]("h_corrected") shouldBe 0.0 +- 1e-9
    an[IllegalArgumentException] should be thrownBy
      Reports.kruskalWallis(
        series(Map("a" -> Seq(1), "b" -> Seq(2), "c" -> Seq(3))),
        maxGroups = 2L)
  }

  behavior of "brownForsythe"

  it should "match the hand F on unequal spreads and 0 on equal ones" in {
    def series(counts: Map[String, Seq[Int]]) = counts.toSeq.flatMap {
      case (g, cs) => cs.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => (g, h * 3600000000L + i * 1000L)) }
    }.toDF("event_type", "ts")
    // A {1,2,3} vs B {10,20,30}: doubled deviations {2,0,2}/{20,0,20},
    // between = 216, within = 808/3, F = 4·216/(808/3) = 3.207921
    val diff = Reports.brownForsythe(
      series(Map("a" -> Seq(1, 2, 3), "b" -> Seq(10, 20, 30))))
      .collect()(0)
    diff.getAs[Long]("n_obs") shouldBe 6L
    diff.getAs[Double]("f_stat") shouldBe 3.207921 +- 1e-5
    // equal spreads around different centers: between-variance of the
    // deviations is exactly 0 -> F = 0 (location does not leak in)
    val eq = Reports.brownForsythe(
      series(Map("a" -> Seq(1, 2, 3), "b" -> Seq(11, 12, 13))))
      .collect()(0)
    eq.getAs[Double]("f_stat") shouldBe 0.0 +- 1e-12
    // a single group has no between-variance: stated NULL
    Reports.brownForsythe(series(Map("a" -> Seq(1, 2, 3))))
      .collect()(0).isNullAt(2) shouldBe true
  }

  behavior of "sloBurn"

  it should "burn the budget fast in short windows around a frontier incident" in {
    // 100 quiet hours of 4 ok-events; the frontier hour adds 6 errors
    val ev = ((0 until 100).flatMap(h => (0 until 4).map(i =>
      ("ok", h * 3600000000L + i * 1000L))) ++
      (0 until 6).map(i => ("error", 99L * 3600000000L + 500000L + i)))
      .toDF("event_type", "ts")
    val got = Reports.sloBurn(ev, budgetPpm = 100000L).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5)))).toMap
    // 1h: 10 events, 6 errors -> 600000 ppm, burn 6, breached
    got(1L) shouldBe ((10L, 6L, 600000L, 6.0, 1L))
    // 6h: 30 events -> exactly 200000 ppm, burn 2, breached
    got(6L) shouldBe ((30L, 6L, 200000L, 2.0, 1L))
    // 24h: 102 events -> 58823 ppm (exact integer div), under budget
    got(24L) shouldBe ((102L, 6L, 58823L, 0.58823, 0L))
    got(168L)._5 shouldBe 0L
  }

  behavior of "mannKendall"

  it should "match the hand S/Var on a clean ramp and census-guard wide series" in {
    // counts strictly increase by hour (h+1 events at hour h) over 48
    // hours: S = 48·47/2 = 1128, no ties -> 18·Var = 48·47·101
    val up = (0 until 48).flatMap(h =>
      (0 to h).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    val r = Reports.mannKendall(up).collect()(0)
    r.getAs[Long]("n_hours") shouldBe 48L
    r.getAs[Long]("s_stat") shouldBe 1128L
    r.getAs[Long]("var_s18") shouldBe 48L * 47L * 101L
    r.getAs[Double]("z") shouldBe
      (1127.0 / math.sqrt(48.0 * 47.0 * 101.0 / 18.0)) +- 1e-6
    r.getAs[String]("trend") shouldBe "increasing"
    // constant series: every pair ties -> Var = 0 -> stated too_short
    val flat = (0 until 48).flatMap(h =>
      (0 until 3).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    val f = Reports.mannKendall(flat).collect()(0)
    f.getAs[Long]("s_stat") shouldBe 0L
    f.getAs[Long]("var_s18") shouldBe 0L
    f.isNullAt(4) shouldBe true // z
    f.getAs[String]("trend") shouldBe "too_short"
    val wide = (0 until 100).map(h => ("g", h * 3600000000L))
      .toDF("event_type", "ts")
    an[IllegalArgumentException] should be thrownBy
      Reports.mannKendall(wide, maxHours = 50L)
  }

  behavior of "runsTest"

  it should "read alternation as excess runs and clustering as too few" in {
    def series(f: Int => Int) = (0 until 40).flatMap(h =>
      (0 until f(h)).map(i => ("g", h * 3600000000L + i * 1000L)))
      .toDF("event_type", "ts")
    // 10/20 alternating: every hour is a run -> R = 40 >> E[R] = 21
    val alt = Reports.runsTest(series(h =>
      if (h % 2 == 0) 10 else 20)).collect()(0)
    alt.getAs[Long]("n_above") shouldBe 20L
    alt.getAs[Long]("n_below") shouldBe 20L
    alt.getAs[Long]("n_runs") shouldBe 40L
    alt.getAs[Double]("z") should be > 5.0
    // 20 lows then 20 highs: two runs -> far below expectation
    val clu = Reports.runsTest(series(h =>
      if (h < 20) 10 else 20)).collect()(0)
    clu.getAs[Long]("n_runs") shouldBe 2L
    clu.getAs[Double]("z") should be < -5.0
    // constant series: every hour equals the median, nothing signed
    Reports.runsTest(series(_ => 7)).count() shouldBe 0L
  }

  behavior of "ksTwoSample"

  it should "pin the sup gap and its location on shifted samples" in {
    val a = (1 to 100).map(v => Tuple1(v.toLong)).toDF("m")
    val b = (51 to 150).map(v => Tuple1(v.toLong)).toDF("m")
    val r = Reports.ksTwoSample(a, b, col("m")).collect()(0)
    r.getAs[Long]("n_a") shouldBe 100L
    r.getAs[Long]("n_b") shouldBe 100L
    r.getAs[Double]("d_stat") shouldBe 0.5 +- 1e-9
    r.getAs[Long]("at_value") shouldBe 50L // F_a = .5, F_b = 0 first here
    // identical samples: zero distance
    Reports.ksTwoSample(a, a, col("m")).collect()(0)
      .getAs[Double]("d_stat") shouldBe 0.0 +- 1e-12
  }

  it should "honor the documented contract: empty side -> empty frame" in {
    val a = (1 to 10).map(v => Tuple1(v.toLong)).toDF("m")
    val none = a.filter(col("m") < 0L)
    Reports.ksTwoSample(a, none, col("m")).count() shouldBe 0L
    Reports.ksTwoSample(none, a, col("m")).count() shouldBe 0L
    Reports.ksTwoSample(none, none, col("m")).count() shouldBe 0L
    // and the schema survives the short-circuit (downstream unions)
    Reports.ksTwoSample(a, none, col("m")).columns.toSeq shouldBe
      Seq("n_a", "n_b", "d_stat", "at_value")
  }

  behavior of "wasserstein1"

  it should "scale with how FAR mass moved, unlike KS" in {
    val at0 = (1 to 100).map(_ => Tuple1(0L)).toDF("m")
    val at1 = (1 to 100).map(_ => Tuple1(100L)).toDF("m")
    val at2 = (1 to 100).map(_ => Tuple1(200L)).toDF("m")
    def w1(x: org.apache.spark.sql.DataFrame,
        y: org.apache.spark.sql.DataFrame) =
      Reports.wasserstein1(x, y, col("m")).collect()(0)
        .getAs[Double]("w1")
    w1(at0, at1) shouldBe 100.0 +- 1e-9 // one bin of width 100
    w1(at0, at2) shouldBe 200.0 +- 1e-9 // twice as far -> twice the cost
    w1(at0, at0) shouldBe 0.0 +- 1e-12
  }

  behavior of "driftDistances"

  it should "stay bounded: 0 on identity, toward 1 bit on disjoint support" in {
    val lo = (1 to 200).map(_ => Tuple1(0L)).toDF("m")
    val hi = (1 to 200).map(_ => Tuple1(900L)).toDF("m")
    val same = Reports.driftDistances(lo, lo, col("m")).collect()(0)
    same.getAs[Double]("jsd_bits") shouldBe 0.0 +- 1e-9
    same.getAs[Double]("hellinger") shouldBe 0.0 +- 1e-9
    val far = Reports.driftDistances(lo, hi, col("m")).collect()(0)
    far.getAs[Double]("jsd_bits") should be > 0.8
    far.getAs[Double]("jsd_bits") should be <= 1.0
    far.getAs[Double]("hellinger") should be > 0.8
    far.getAs[Double]("hellinger") should be <= 1.0
  }

  behavior of "cohensKappa"

  it should "match the hand 2x2 kappa and read chance agreement as 0" in {
    // planted table: both-pos 20, a-only 30, b-only 10, both-neg 40
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(30)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(40)((false, false))
    val df = rows.toDF("ra", "rb")
    val r = Reports.cohensKappa(df, col("ra"), col("rb")).collect()(0)
    r.getAs[Long]("n") shouldBe 100L
    r.getAs[Double]("po") shouldBe 0.6 +- 1e-9
    r.getAs[Double]("pe") shouldBe 0.5 +- 1e-9 // (50·30 + 50·70)/10⁴
    r.getAs[Double]("kappa") shouldBe 0.2 +- 1e-9
    // perfect agreement -> kappa 1; constant raters -> stated NULL
    val agree = Seq.fill(30)((true, true)) ++ Seq.fill(30)((false, false))
    Reports.cohensKappa(agree.toDF("ra", "rb"), col("ra"), col("rb"))
      .collect()(0).getAs[Double]("kappa") shouldBe 1.0 +- 1e-9
    val const = Seq.fill(30)((true, true))
    Reports.cohensKappa(const.toDF("ra", "rb"), col("ra"), col("rb"))
      .collect()(0).isNullAt(7) shouldBe true
  }

  behavior of "bhFdr"

  it should "reject exactly the BH prefix and nothing under the null" in {
    val ps = Seq("a" -> 0.001, "b" -> 0.002, "c" -> 0.003,
      "d" -> 0.2, "e" -> 0.3, "f" -> 0.4, "g" -> 0.5, "h" -> 0.6,
      "i" -> 0.7, "j" -> 0.8).toDF("key", "p")
    val got = Reports.bhFdr(ps, "key", "p", qPermille = 50L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("p_rank"), r.getAs[Long]("rejected")))).toMap
    // thresholds k·0.05/10: ranks 1..3 pass (0.005/0.01/0.015), rank 4
    // (p = 0.2 > 0.02) fails -> kmax = 3
    got("a") shouldBe ((1L, 1L))
    got("b") shouldBe ((2L, 1L))
    got("c") shouldBe ((3L, 1L))
    got("d") shouldBe ((4L, 0L))
    got.values.map(_._2).sum shouldBe 3L
    // all-large p: nothing rejected (kmax NULL path)
    val none = Seq("a" -> 0.5, "b" -> 0.6, "c" -> 0.9).toDF("key", "p")
    Reports.bhFdr(none, "key", "p").collect()
      .map(_.getAs[Long]("rejected")).sum shouldBe 0L
  }
  behavior of "dpMean"

  it should "release only (group, dp_mean, epsilon, clip) and track the exact clipped mean under weak noise" in {
    // 3 units in one group, sums 10/20/3000 -> clip 100 bites the whale
    val ev = Seq(
      ("g", 1L, 10.0), ("g", 2L, 20.0),
      ("g", 3L, 1500.0), ("g", 3L, 1500.0)).toDF("grp", "unit", "v")
    val rel = Reports.dpMean(ev, "grp", "unit", "v",
      clip = 100.0, epsilon = 1e9, releaseId = "a")
    rel.columns.toSeq shouldBe Seq("grp", "dp_mean", "epsilon", "clip")
    // epsilon 1e9 -> noise ~1e-7: release approximates (10+20+100)/3
    rel.collect()(0).getAs[Double]("dp_mean") shouldBe
      (130.0 / 3.0) +- 1e-3
    val dbg = Reports.dpMeanDebug(ev, "grp", "unit", "v",
      clip = 100.0, epsilon = 1e9, releaseId = "a").collect()(0)
    dbg.getAs[Long]("n_units") shouldBe 3L
    dbg.getAs[Long]("n_clipped") shouldBe 1L
    dbg.getAs[Double]("exact_clipped_mean") shouldBe
      math.rint(130.0 / 3.0 * 1e6) / 1e6 +- 1e-9
  }

  it should "draw fresh noise per releaseId (no draw reuse across releases)" in {
    val ev = Seq(("g", 1L, 50.0), ("g", 2L, 60.0)).toDF("grp", "unit", "v")
    def rel(id: String): Double =
      Reports.dpMean(ev, "grp", "unit", "v", clip = 100.0,
        epsilon = 1.0, releaseId = id)
        .collect()(0).getAs[Double]("dp_mean")
    rel("r1") should not be rel("r2")
  }

  behavior of "driftHourly"

  it should "score each hour's histogram against the global reference" in {
    // hour 0: values all in bin 0; hour 1: values all in bin 9 ->
    // symmetric construction, equal JSD, both > 0 vs the mixed ref
    val hourUs = 3600000000L
    val ev = (0 until 6).map(i => (i.toLong * 600000000L, 10.0)) ++
      (0 until 6).map(i => (hourUs + i * 600000000L, 480.0))
    val df = ev.toDF("ts", "value")
    val rows = Reports.driftHourly(df, col("value"), width = 50L,
      nBins = 10).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(0L, 1L)
    rows.map(_.getLong(1)).toSeq shouldBe Seq(6L, 6L)
    rows(0).getDouble(2) shouldBe rows(1).getDouble(2)
    assert(rows(0).getDouble(2) > 0.0)
  }

  behavior of "cramersV"

  it should "read 1 on perfect association and 0 on independence" in {
    val perfect = (Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2")))
      .toDF("u", "v")
    val r = Reports.cramersV(perfect, "u", "v").collect()(0)
    r.getAs[Double]("cramers_v") shouldBe 1.0
    val indep = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"))
      .toDF("u", "v")
    Reports.cramersV(indep, "u", "v").collect()(0)
      .getAs[Double]("cramers_v") shouldBe 0.0
  }

  it should "gate V to NULL on a single-category column" in {
    val df = Seq(("a1", "b1"), ("a1", "b2")).toDF("u", "v")
    Reports.cramersV(df, "u", "v").collect()(0)
      .isNullAt(4) shouldBe true
  }

  behavior of "forecastBaseline"

  it should "compute naive rmse/mae from consecutive-hour diffs" in {
    // counts [1,3,2] -> diffs [2,-1]: sse 5, sae 3
    val hourUs = 3600000000L
    val ev = Seq.fill(1)(("a", 0L * hourUs)) ++
      Seq.fill(3)(("a", 1L * hourUs)) ++ Seq.fill(2)(("a", 2L * hourUs))
    val r = Reports.forecastBaseline(ev.toDF("event_type", "ts"))
      .collect()(0)
    r.getLong(1) shouldBe 3L
    r.getLong(2) shouldBe 2L
    r.getDouble(3) shouldBe math.rint(math.sqrt(2.5) * 1e6) / 1e6 +- 1e-9
    r.getDouble(4) shouldBe 1.5
  }

  it should "emit NULL errors for a group with no consecutive pairs" in {
    val hourUs = 3600000000L
    // two observed hours, 5 hours apart -> no hh+1 pair
    val ev = Seq(("a", 0L * hourUs), ("a", 5L * hourUs))
    val r = Reports.forecastBaseline(ev.toDF("event_type", "ts"))
      .collect()(0)
    r.getLong(2) shouldBe 0L
    r.isNullAt(3) shouldBe true
    r.isNullAt(4) shouldBe true
  }

  it should "score an hour matching the reference near zero" in {
    val hourUs = 3600000000L
    // both hours identical -> each matches the global mix. JSD is not
    // EXACTLY 0: add-one smoothing weighs the hour (n=4) and the
    // reference (n=8) differently — only near zero, vs ~0.5+ for the
    // disjoint-bin case above
    val ev = (0 until 4).flatMap(i =>
      Seq((i.toLong * 600000000L, 10.0), (hourUs + i * 600000000L, 10.0)))
    val rows = Reports.driftHourly(ev.toDF("ts", "value"), col("value"),
      width = 50L, nBins = 10).collect()
    rows.foreach(r => assert(r.getDouble(2) < 0.02))
  }
}
