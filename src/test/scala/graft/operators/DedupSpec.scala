package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "s1"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", "s1"), // near dup of 1
    (4L, "completely different text about spark query engines", "s2"),
    (5L, "another unrelated document mentioning window functions", "s2")
  ).toDF("doc_id", "text", "source")

  "exact" should "group identical texts and keep the minimum id" in {
    val r = Dedup.exact(docs).collect()
    r.map(_.getAs[Long]("n_copies")).sum shouldBe 5
    val dup = r.find(_.getAs[Long]("n_copies") == 2).get
    dup.getAs[Long]("keep_id") shouldBe 1L
  }

  "minhashLsh" should "surface exact and near duplicates as candidates" in {
    val pairs = Dedup.minhashLsh(docs, k = 8, bands = 4)
      .select("id_a", "id_b", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.keySet should contain((1L, 2L))
    pairs((1L, 2L)) shouldBe 1.0 // identical docs agree on every slot
    // near-dup 1-3 should collide on at least one band too
    pairs.keySet should contain((1L, 3L))
    pairs((1L, 3L)) should be >= 0.25
  }

  it should "reject invalid banding" in {
    an[IllegalArgumentException] should be thrownBy
      Dedup.minhashLsh(docs, k = 8, bands = 3)
  }

  it should "drop over-full band buckets (skew guard)" in {
    // 20 identical docs: every band bucket has 20 members > cap 10 ⇒ no pairs
    val many = (1L to 20L).map(i => (i, "same text for everyone", "s")).toDF("doc_id", "text", "source")
    Dedup.minhashLsh(many, k = 8, bands = 4, maxBucketSize = 10).count() shouldBe 0
    // raising the cap admits them again
    Dedup.minhashLsh(many, k = 8, bands = 4, maxBucketSize = 100).count() shouldBe 190
  }

  "minhashCandidatePairs" should "emit exactly the scored variant's pair topology" in {
    val slim = Dedup.minhashCandidatePairs(docs, k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scored = Dedup.minhashLsh(docs, k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    slim shouldBe scored
    slim should contain((1L, 2L))
  }

  "connectedComponents" should "label each node with its component's min id" in {
    // components: {1,2,3} (chain), {7,9}; singleton 11 never appears
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val r = Dedup.connectedComponents(pairs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    r shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
  }

  "applyClusters" should "keep one canonical doc per cluster and pass unclustered docs" in {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "d"), (9L, "e"), (11L, "f"))
      .toDF("doc_id", "text")
    val clusters = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b"))
    val kept = Dedup.applyClusters(corpus, clusters)
      .select("doc_id").as[Long].collect().toSet
    // {1,2,3} keeps 1; {7,9} keeps 7; 11 was never clustered
    kept shouldBe Set(1L, 7L, 11L)
  }

  "applyClustersKeepBest" should "keep the highest-scored doc per cluster, ties to min id" in {
    val corpus = Seq(
      (1L, "a", 10L), (2L, "b", 50L), (3L, "c", 50L), // cluster {1,2,3}: max score ties 2/3 → keep 2
      (7L, "d", 5L), (9L, "e", 80L),                  // cluster {7,9}: keep 9
      (11L, "f", 1L)                                  // unclustered: passes through
    ).toDF("doc_id", "text", "n_chars")
    val clusters = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b"))
    val kept = Dedup.applyClustersKeepBest(corpus, clusters, col("n_chars"))
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(2L, 9L, 11L)
    // min-id rule disagrees here — the two variants are genuinely different
    Dedup.applyClusters(corpus, clusters)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 7L, 11L)
  }

  "the loser-side Bloom prune" should
      "route provable keepers around the anti-join with identical results" in {
    // maxBroadcastLosers = 0 forces the scale path (guide §3.2): corpus
    // rows failing the Bloom probe bypass the join entirely; false
    // positives only widen the join input, never the result
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "d"), (9L, "e"), (11L, "f"))
      .toDF("doc_id", "text")
    val clusters = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b"))
    val bloomed = Dedup.applyClusters(corpus, clusters, maxBroadcastLosers = 0L)
    bloomed.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 7L, 11L)
    // the forced plan carries the bloom probe + union (the shape the
    // 100 TB tier runs); the default plan stays a single broadcast anti-join
    val forced = bloomed.queryExecution.executedPlan.toString
    forced should include("Union")
    val default = Dedup.applyClusters(corpus, clusters)
      .queryExecution.executedPlan.toString
    default should include("BroadcastHashJoin")
    (default should not).include("Union")
  }

  it should "apply to keep-best the same way (slim decision join above the cap)" in {
    val corpus = Seq(
      (1L, "a", 10L), (2L, "b", 50L), (3L, "c", 50L),
      (7L, "d", 5L), (9L, "e", 80L), (11L, "f", 1L)
    ).toDF("doc_id", "text", "n_chars")
    val clusters = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b"))
    Dedup.applyClustersKeepBest(corpus, clusters, col("n_chars"),
        maxBroadcastLosers = 0L)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(2L, 9L, 11L)
  }

  it should "converge on a long chain (diameter > 2)" in {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = Dedup.connectedComponents(chain).collect()
    r.map(_.getLong(1)).distinct shouldBe Array(1L)
    r.length shouldBe 12
  }

  it should "produce identical labels via the driver union-find and the distributed loop" in {
    // chains + a clique + singleton-free edges across several components;
    // maxDriverEdges = 0 forces the distributed propagate path
    val edges = ((1L until 12L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 40L))).toDF("id_a", "id_b")
    def labelsOf(maxDriver: Long) =
      Dedup.connectedComponents(edges, maxDriverEdges = maxDriver)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = labelsOf(1000000L)
    val viaCluster = labelsOf(0L)
    viaDriver shouldBe viaCluster
    viaDriver(12L) shouldBe 1L
    viaDriver(22L) shouldBe 20L
    viaDriver(40L) shouldBe 30L
  }

  it should "produce identical labels under a reliable checkpoint dir" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
      val r = Dedup.connectedComponents(pairs, checkpointDir = Some(dir.toString))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      r shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  "simhashBuckets" should "bucket identical docs together" in {
    val r = Dedup.simhashBuckets(docs, nBits = 16).collect()
    r.length should be >= 1
    val b = r.find(_.getAs[Long]("n_docs") >= 2).get
    b.getAs[Long]("keep_id") shouldBe 1L
  }

  "simhashNearDup" should "find hamming-close pairs without exact bucket equality" in {
    val r = Dedup.simhashNearDup(docs, maxHamming = 8, nBits = 32)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // identical docs: distance 0
    r((1L, 2L)) shouldBe 0L
    // near-dup differs by one word: small but possibly nonzero distance
    r.get((1L, 3L)).foreach(_ should be <= 8L)
    // hamming values must respect the radius
    r.values.foreach(_ should be <= 8L)
  }

  "stripBoilerplate" should "remove cross-document lines, keep unique lines in order" in {
    val pages = Seq(
      (1L, "SITE NAV\nunique article one\nline A\nCOOKIE FOOTER"),
      (2L, "SITE NAV\nunique article two\nCOOKIE FOOTER"),
      (3L, "SITE NAV\nCOOKIE FOOTER"), // all boilerplate → empty
      (4L, "standalone page\nwith its own\nlines only")
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(pages)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "unique article one\nline A"
    out(2L) shouldBe "unique article two"
    out(3L) shouldBe ""
    out(4L) shouldBe "standalone page\nwith its own\nlines only" // byte round-trip
  }

  "incrementalFilter" should "admit only incoming docs with no existing near-dup" in {
    import org.apache.spark.sql.functions.{array, col, lit, struct}
    val docs = Seq(
      (1L, "old corpus document one", "old"),
      (2L, "old corpus document two", "old"),
      (10L, "new near dup of one", "new"),   // pairs with existing 1 -> blocked
      (11L, "fresh new content here", "new"),
      (12L, "another new thing entirely", "new"), // pairs with new 13 only -> admitted
      (13L, "another new thing entirely!", "new")
    ).toDF("doc_id", "text", "source")
    // hand-built scored pairs: (10,1) cross-generation, (12,13) in-batch
    val pairs = Seq((10L, 1L, 0.9), (12L, 13L, 0.9), (11L, 2L, 0.2))
      .toDF("id_a", "id_b", "est_jaccard")
    val admitted = Dedup.incrementalFilter(
      docs, pairs, isNew = col("source") === "new", minJaccard = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 10 blocked (near-dups existing 1); 11 kept (score below threshold);
    // 12/13 kept (their dup is batch-internal, applyClusters' job)
    admitted shouldBe Set(11L, 12L, 13L)
  }

  "repeatedSubstringSpans" should "merge overlapping cross-doc gram hits into spans" in {
    // shared license block = tokens "l1 ... l6" (6 tokens): with gramN=4
    // and minDf=2 it yields 3 overlapping hits in each doc that must
    // merge into ONE span covering the block
    val license = "l1 l2 l3 l4 l5 l6"
    val docs = Seq(
      (1L, s"alpha beta $license gamma"),
      (2L, s"$license delta epsilon zeta eta"),
      (3L, "totally unrelated words only here now") // no repeated grams
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSubstringSpans(docs, gramN = 4, minDf = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // doc 1: license at token positions 3-8; doc 2: positions 1-6
    spans shouldBe Array((1L, 3L, 8L, 3L), (2L, 1L, 6L, 3L))
  }

  "exciseSpans" should "remove span tokens and keep everything else in order" in {
    val license = "l1 l2 l3 l4 l5 l6"
    val docs = Seq(
      (1L, s"alpha beta $license gamma"),
      (2L, s"$license delta epsilon zeta eta"),
      (3L, "totally unrelated words only here now")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSubstringSpans(docs, gramN = 4, minDf = 2)
    val out = Dedup.exciseSpans(docs, spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "alpha beta gamma"
    out(2L) shouldBe "delta epsilon zeta eta"
    out(3L) shouldBe "totally unrelated words only here now"
  }

  it should "drop documents excised wall-to-wall" in {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"), // identical docs: every position repeated
      (2L, "w1 w2 w3 w4 w5"),
      (3L, "keeps its own words here")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSubstringSpans(docs, gramN = 4, minDf = 2)
    val out = Dedup.exciseSpans(docs, spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.keySet shouldBe Set(3L)
    out(3L) shouldBe "keeps its own words here"
  }

  it should "split hits separated by more than a gram width into distinct spans" in {
    val repA = "a1 a2 a3 a4"
    val repB = "b1 b2 b3 b4"
    val docs = Seq(
      (1L, s"$repA x1 x2 x3 x4 x5 $repB"), // two far-apart repeated blocks
      (2L, s"$repA y1 y2 y3 y4 y5 $repB")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSubstringSpans(docs, gramN = 4, minDf = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    spans shouldBe Array(
      (1L, 1L, 4L), (1L, 10L, 13L),
      (2L, 1L, 4L), (2L, 10L, 13L))
  }

  "repeatedSubstringSpansExact" should "report a shared passage with exact boundaries in both docs" in {
    val passage = (1 to 15).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"d1 $passage d2 d3"),        // passage at tokens 2..16
      (2L, s"e1 e2 e3 $passage e4")      // passage at tokens 4..18
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSubstringSpansExact(docs, minLen = 12, gramN = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted
    spans shouldBe Array((1L, 2L, 16L), (2L, 4L, 18L))
  }

  it should "NOT fuse two short repeats the gram tier mis-merges" in {
    val g1 = "a b c d e f g h"
    val g2 = "q r s t u v w x"
    val docs = Seq(
      (1L, s"fa fb $g1 $g2 fc fd"),  // g1 at 3..10, g2 at 11..18 — adjacent
      (2L, s"m1 m2 $g1 m3 m4"),      // shares ONLY g1
      (3L, s"n1 n2 $g2 n3 n4")       // shares ONLY g2
    ).toDF("doc_id", "text")
    // gram tier: doc 1's hits at p=3 and p=11 are within gramN, so they
    // FUSE into one 16-token span that is an exact repeat of nothing
    val gram = Dedup.repeatedSubstringSpans(docs, gramN = 8, minDf = 2)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    gram shouldBe Array((3L, 18L))
    // exact tier at minLen=12: each aligned run is only 8 tokens — below
    // the threshold, so no span survives anywhere
    Dedup.repeatedSubstringSpansExact(docs, minLen = 12, gramN = 8)
      .count() shouldBe 0
    // at minLen=8 the two real 8-token repeats surface SEPARATELY (and
    // doc 1's adjacent spans merge into one excisable region, while docs
    // 2 and 3 each carry only their own repeat)
    val exact8 = Dedup.repeatedSubstringSpansExact(docs, minLen = 8, gramN = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted
    exact8 shouldBe Array((1L, 3L, 18L), (2L, 3L, 10L), (3L, 3L, 10L))
  }

  it should "stay within the gram tier's span regions (exact ⊆ approximate)" in {
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"x1 x2 $passage x3"),
      (2L, s"$passage y1 y2"),
      (3L, "unrelated words that repeat nowhere in this tiny corpus at all")
    ).toDF("doc_id", "text")
    val gram = Dedup.repeatedSubstringSpans(docs, gramN = 8, minDf = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val exact = Dedup.repeatedSubstringSpansExact(docs, minLen = 12, gramN = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3))))
    exact should not be empty
    exact.foreach { case (id, (s, e)) =>
      val (gs, ge) = gram(id)
      s should be >= gs
      e should be <= ge
    }
  }

  it should "drop whale grams above maxGramDf before pairing" in {
    // 12 docs all share one 8-gram: with the guard below its df the pair
    // join sees nothing; raising the cap re-admits it
    val shared = "c1 c2 c3 c4 c5 c6 c7 c8"
    val whale = (100L to 111L).map(i => (i, s"$shared own$i words$i"))
      .toDF("doc_id", "text")
    Dedup.repeatedSubstringSpansExact(whale, minLen = 8, gramN = 8, maxGramDf = 5)
      .count() shouldBe 0
    Dedup.repeatedSubstringSpansExact(whale, minLen = 8, gramN = 8, maxGramDf = 12)
      .count() shouldBe 12
  }

  it should "preserve blank lines, and only count distinct documents" in {
    val pages = Seq(
      // the repeated line appears twice in ONE doc: not boilerplate
      (1L, "repeat me\nbody\nrepeat me"),
      // blank lines repeat across docs but are structure, never removed
      (2L, "other\n\nafter blank"),
      (3L, "more\n\nblank users")
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(pages)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "repeat me\nbody\nrepeat me"
    out(2L) shouldBe "other\n\nafter blank"
    out(3L) shouldBe "more\n\nblank users"
  }

  "ngramJaccardPairs" should "score within-block similarity" in {
    val r = Dedup.ngramJaccardPairs(docs, "source", shingleN = 2)
      .collect()
      .map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b")) -> x.getAs[Double]("jaccard"))
      .toMap
    r((1L, 2L)) shouldBe 1.0
    r((1L, 3L)) should (be > 0.5 and be < 1.0)
    // cross-block pairs must not appear
    r.keySet should not contain ((1L, 4L))
    // zero-overlap pairs are not candidates and are not emitted (sparse join)
    r.keySet should not contain ((4L, 5L))
  }

  it should "drop stop-shingles above maxShingleDf before pairing" in {
    // all 12 docs share exactly one shingle ("unique text number"); with the
    // stop-shingle guard below its document frequency, no overlap remains
    val whale = (100L to 111L).map(i => (i, s"unique text number $i here", "w"))
      .toDF("doc_id", "text", "source")
    Dedup.ngramJaccardPairs(whale, "source", shingleN = 3, maxShingleDf = 5)
      .count() shouldBe 0
    Dedup.ngramJaccardPairs(whale, "source", shingleN = 3, maxShingleDf = 12)
      .count() shouldBe 66
  }

  it should "drop whale blocks (maxBlockSize guard) while keeping small ones" in {
    val whale = (100L to 111L).map(i => (i, s"unique text number $i here", "whale"))
    val mixed = docs.union(whale.toDF("doc_id", "text", "source"))
    val r = Dedup.ngramJaccardPairs(mixed, "source", shingleN = 2, maxBlockSize = 10)
      .collect().map(_.getAs[String]("block")).toSet
    // the 12-doc whale block exceeds the cap and contributes no pairs;
    // the small s1/s2 blocks still do
    r should not contain "whale"
    r should contain("s1")
    // raising the cap re-admits the whale block: 12 choose 2 pairs
    Dedup.ngramJaccardPairs(mixed, "source", shingleN = 2, maxBlockSize = 100)
      .filter(col("block") === "whale").count() shouldBe 66
  }

  "embeddingNearDup" should "find high-cosine pairs within a block" in {
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f), 0),
      (2L, Seq(0.99f, 0.1f, 0f), 0),  // near dup of 1
      (3L, Seq(0f, 1f, 0f), 0),       // orthogonal
      (4L, Seq(1f, 0f, 0f), 1)        // same direction but other block
    ).toDF("vec_id", "embedding", "label")
    val r = Dedup.embeddingNearDup(vecs, "label", 0.9)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1)))
    r should contain theSameElementsAs Seq((1L, 2L))
  }

  "semanticDedup" should "drop smaller-id-dominated vectors within their cell only" in {
    val anchors = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
    val vecs = Seq(
      (1L, Seq(1f, 0f)),      // cell 0, kept (smallest id in its neighborhood)
      (2L, Seq(0.99f, 0.1f)), // cell 0, near-dup of 1 => dropped
      (3L, Seq(0f, 1f)),      // cell 1, kept
      (4L, Seq(-0.1f, 1f))    // cell 1, cos vs 3 ~ 0.995 => dropped
    ).toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(vecs, anchors, 0.9)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    r(1L) shouldBe ((0L, true))
    r(2L) shouldBe ((0L, false))
    r(3L) shouldBe ((1L, true))
    r(4L) shouldBe ((1L, false))
  }

  it should "never compare across cells even at an identical direction" in {
    // v2 duplicates v1's direction but its own cell has no smaller id;
    // cells block the comparison so it stays kept
    val anchors = Seq((0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.45f)))
    val vecs = Seq(
      (1L, Seq(1f, 0f)),
      (2L, Seq(0.9f, 0.44f)) // argmax cosine lands in cell 1, alone there
    ).toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(vecs, anchors, 0.5)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r shouldBe Map(1L -> true, 2L -> true)
  }

  "semanticDedupKeepBest" should "drop the lower-quality member of each near-dup pair" in {
    val anchors = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
    val vecs = Seq(
      (1L, Seq(1f, 0f), 10L),      // cell 0, near-dup of 2 but lower score
      (2L, Seq(0.99f, 0.1f), 50L), // cell 0, the quality argmax => kept
      (3L, Seq(0f, 1f), 10L),      // cell 1, kept
      (4L, Seq(-0.1f, 1f), 5L)     // cell 1, worse than 3 => dropped
    ).toDF("vec_id", "embedding", "score")
    val r = Dedup.semanticDedupKeepBest(vecs, anchors, 0.9, "score")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    r(1L) shouldBe ((0L, false)) // min-id would have KEPT 1 — score rules
    r(2L) shouldBe ((0L, true))
    r(3L) shouldBe ((1L, true))
    r(4L) shouldBe ((1L, false))
  }

  it should "break score ties to the smaller id" in {
    val anchors = Seq((0L, Seq(1f, 0f)))
    val vecs = Seq((1L, Seq(1f, 0f), 7L), (2L, Seq(0.99f, 0.1f), 7L))
      .toDF("vec_id", "embedding", "score")
    val r = Dedup.semanticDedupKeepBest(vecs, anchors, 0.9, "score")
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r shouldBe Map(1L -> true, 2L -> false)
  }

  it should "sort NULL scores below every real score" in {
    val anchors = Seq((0L, Seq(1f, 0f)))
    // 1 (NULL score, smaller id) loses to scored 2; the all-NULL pair
    // (3, 4) falls back to min-id — 4 loses. All four share one cell.
    val vecs = Seq(
      (1L, Seq(1f, 0f), Option.empty[Long]),
      (2L, Seq(0.99f, 0.1f), Some(5L)))
      .toDF("vec_id", "embedding", "score")
    val r = Dedup.semanticDedupKeepBest(vecs, anchors, 0.9, "score")
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r shouldBe Map(1L -> false, 2L -> true)
    val nn = Seq(
      (3L, Seq(1f, 0f), Option.empty[Long]),
      (4L, Seq(0.99f, 0.1f), Option.empty[Long]))
      .toDF("vec_id", "embedding", "score")
    val r2 = Dedup.semanticDedupKeepBest(nn, anchors, 0.9, "score")
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r2 shouldBe Map(3L -> true, 4L -> false)
  }

  "semanticDedupLsh" should "keep the smallest id of each within-bucket near-dup neighborhood" in {
    // identical 64-dim vectors share every plane sign, so they land in
    // one bucket under ANY seeded plane set; the keep-min-id rule drops
    // exactly the larger ids of the family
    val base = Array.tabulate(64)(i => if (i % 3 == 0) 1f else -0.5f).toSeq
    val other = Array.tabulate(64)(i => if (i % 2 == 0) -1f else 0.7f).toSeq
    val vecs = Seq((1L, base), (2L, base), (9L, base), (5L, other))
      .toDF("vec_id", "embedding")
    val r = Dedup.semanticDedupLsh(vecs, 0.99)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r(1L) shouldBe true
    r(2L) shouldBe false
    r(9L) shouldBe false
    r(5L) shouldBe true
  }

  it should "emit exactly the loser set of embeddingNearDupLsh's pairs" in {
    // deterministic pseudo-random corpus; the kept verdict must be the
    // min-id rule applied to the standalone pair operator's output
    // (same planes/seed; threshold avoids the >= vs > boundary)
    def v(id: Long): Seq[Float] = Array.tabulate(64) { i =>
      (((id * 2654435761L + i * 40503L) % 2000L) - 1000L).toFloat / 1000f
    }.toSeq
    val vecs = (1L to 40L).map(id => (id, v(id % 7))) // 7 families
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupLsh(vecs, 0.5)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val got = Dedup.semanticDedupLsh(vecs, 0.5)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    got.filterNot(_._2).keySet shouldBe pairs
    got.count(!_._2) should be > 0 // families must actually collide
  }

  "semanticIncrementalFilter" should "admit only incoming vectors with no same-cell survivor near-dup" in {
    val anchors = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
    val survivors = Seq((10L, Seq(1f, 0f)), (11L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val incoming = Seq(
      (1L, Seq(0.99f, 0.1f)), // cell 0, near survivor 10 => blocked
      (2L, Seq(0.1f, 0.99f)), // cell 1, near survivor 11 => blocked
      (3L, Seq(0.8f, -0.6f))  // cell 0, cos vs 10 = 0.8 < 0.9 => admitted
    ).toDF("vec_id", "embedding")
    val r = Dedup.semanticIncrementalFilter(incoming, survivors, anchors, 0.9)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    r(1L) shouldBe ((0L, false))
    r(2L) shouldBe ((1L, false))
    r(3L) shouldBe ((0L, true))
  }

  it should "not drop incoming-vs-incoming duplicates (semanticDedup's job downstream)" in {
    // two identical incoming vectors far from every survivor: BOTH are
    // admitted — the gate compares against the corpus only, exactly
    // incrementalFilter's contract at the minhash tier
    val anchors = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
    val survivors = Seq((10L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val incoming = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Dedup.semanticIncrementalFilter(incoming, survivors, anchors, 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r shouldBe Map(1L -> true, 2L -> true)
  }

  it should "block within the assigned cell only" in {
    // the incoming vector's direction matches survivor 10, but its
    // argmax-cosine cell is anchor 1 while 10 sits in anchor 0's cell:
    // cells block the comparison, so it is admitted
    val anchors = Seq((0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.45f)))
    val survivors = Seq((10L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val incoming = Seq((1L, Seq(0.9f, 0.44f))).toDF("vec_id", "embedding")
    val r = Dedup.semanticIncrementalFilter(incoming, survivors, anchors, 0.5)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r shouldBe Map(1L -> true)
  }

  it should "only ever ADMIT more when the whale guard fires, never block more" in {
    // the subSplit trade is bounded work for in-whale recall: a split
    // cell can miss a blocking survivor (falsely admitting a dup) but
    // must never manufacture a blocker — so the admitted set under a
    // tiny cap is a SUPERSET of the admitted set under no cap
    val anchors = Seq((0L, Seq(1f, 0f)))
    val survivors = (10L to 14L).map(i => (i, Seq(1f, i.toFloat / 100)))
      .toDF("vec_id", "embedding")
    // 1..5 all sit near every survivor; 6 is orthogonal to all of them
    val incoming = ((1L to 5L).map(i => (i, Seq(1f, i.toFloat / 100))) :+
      ((6L, Seq(0f, 1f)))).toDF("vec_id", "embedding")
    def admitted(cap: Int): Set[Long] =
      Dedup.semanticIncrementalFilter(incoming, survivors, anchors, 0.9,
        maxCellSize = cap)
        .filter(col("admitted")).collect().map(_.getLong(0)).toSet
    val full = admitted(100000)
    full shouldBe Set(6L) // near-dups blocked, the orthogonal one admitted
    val split = admitted(1) // cell of 5 survivors -> 5 sub-blocks
    split should contain allElementsOf full
  }

  it should "apply dominance pairwise: a dropped vector still eliminates what it dominates" in {
    // chain a~b~c with a !~ c (36-degree steps): b loses to a, c loses
    // to b even though b itself is dropped — the kept set is the
    // per-neighborhood quality frontier, not one per component
    def v(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val anchors = Seq((0L, Seq(1f, 0f)))
    val vecs = Seq((1L, v(0), 30L), (2L, v(36), 20L), (3L, v(72), 10L))
      .toDF("vec_id", "embedding", "score")
    val r = Dedup.semanticDedupKeepBest(vecs, anchors, 0.7, "score")
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    r shouldBe Map(1L -> true, 2L -> false, 3L -> false)
  }

  behavior of "sortedNeighborhood"

  /** Brute-force SNM replay: global (key, id) sort, all pairs within
    * window − 1 ranks, token-set Jaccard. */
  private def naiveSnm(
      docs: Seq[(Long, String)], window: Int, keyLen: Int,
      minJ: Double): Set[(Long, Long, Long)] = {
    def norm(t: String) =
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
        .toLowerCase.replaceAll("\\s+", " ").trim
    def toks(t: String) = t.toLowerCase.split("\\s+").distinct.toSet
    val ranked = docs.map { case (id, t) => (norm(t).take(keyLen), id, toks(t)) }
      .sortBy(x => (x._1, x._2)).zipWithIndex
    (for {
      (a, ra) <- ranked
      (b, rb) <- ranked
      if rb > ra && rb <= ra + window - 1
      i = (a._3 & b._3).size
      u = (a._3 | b._3).size
      if u > 0 && i.toDouble / u >= minJ
    } yield (a._2, b._2, (rb - ra).toLong)).toSet
  }

  it should "pair exactly the window-adjacent records that pass the Jaccard gate" in {
    val docs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma DELTA"),   // same normalized key + tokens
      (12L, "alpha beta zeta eta"),      // shares prefix, half the tokens
      (13L, "omega psi chi phi"),        // far away in sort order
      (14L, "zzz completely different"),
      (15L, "  Alpha   beta gamma delta ")) // normalization collapses to 10's key
    for (parts <- Seq(1, 4)) {
      val got = Dedup.sortedNeighborhood(
        docs.toDF("doc_id", "text").repartition(parts),
        window = 3, minJaccard = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      withClue(s"parts=$parts: ") {
        got shouldBe naiveSnm(docs, window = 3, keyLen = 24, minJ = 0.4)
      }
    }
  }

  it should "bound candidates at |N|*(window-1) and respect the window" in {
    // 20 docs with identical tokens: every window-adjacent pair passes
    val docs = (0L until 20L).map(i => (i, s"tok$i common shared words"))
    val got = Dedup.sortedNeighborhood(
      docs.toDF("doc_id", "text"), window = 4, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // distances only 1..3; total pairs = 19 + 18 + 17
    got.map(_._3).toSet shouldBe Set(1L, 2L, 3L)
    got.length shouldBe (19 + 18 + 17)
  }

  it should "compute exact set Jaccard on the carried token arrays" in {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"))
    val r = Dedup.sortedNeighborhood(
      docs.toDF("doc_id", "text"), window = 2, minJaccard = 0.0).collect()
    r.length shouldBe 1
    r.head.getDouble(3) shouldBe (3.0 / 5.0)
  }

  it should "keep output identical when the band cap forces prefix extension" in {
    // every doc shares the 2-char default band prefix "sh"; with
    // maxBandSize=4 the census must extend "sh" -> "sha"/"shb"/... and
    // the result must STILL equal the global-sort replay exactly
    val docs = (0L until 40L).map { i =>
      val c = ('a' + (i % 8)).toChar
      (i, s"sh$c${i / 8} common tail words t$i")
    }
    val got = Dedup.sortedNeighborhood(
      docs.toDF("doc_id", "text"), window = 4, minJaccard = 0.0,
      maxBandSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe naiveSnm(docs, window = 4, keyLen = 24, minJ = 0.0)
    got.size shouldBe (39 + 38 + 37)
  }

  it should "keep an unsplittable identical-key whale whole and correct" in {
    // 10 docs whose FULL 24-char key prefix is identical (cap 3): no
    // character can separate them — the band stays whole and the window
    // still pairs them in (key, id) order
    val whale = (0L until 10L).map(i =>
      (i, s"identicalprefix-24chars!! unique tail $i"))
    val other = Seq((100L, "zz far away"))
    val docs = whale ++ other
    val got = Dedup.sortedNeighborhood(
      docs.toDF("doc_id", "text"), window = 3, minJaccard = 0.0,
      maxBandSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe naiveSnm(docs, window = 3, keyLen = 24, minJ = 0.0)
  }

  it should "exclude NULL-text rows instead of NPEing on the census" in {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, null: String),
      (3L, "alpha beta gamma delta"))
    val got = Dedup.sortedNeighborhood(
      docs.toDF("doc_id", "text"), window = 2, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 3L))
  }

  it should "agree with the naive replay on random corpora under random band caps" in {
    val rnd = new scala.util.Random(67)
    val words = Seq("aa", "ab", "ba", "bb", "ca", "xyz", "q")
    for (trial <- 0 until 4) {
      val docs = (0L until 60L).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(4))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      }
      val cap = 1 + rnd.nextInt(12)
      val window = 2 + rnd.nextInt(4)
      val got = Dedup.sortedNeighborhood(
        docs.toDF("doc_id", "text"), window = window, minJaccard = 0.0,
        maxBandSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      withClue(s"trial=$trial cap=$cap window=$window: ") {
        got shouldBe naiveSnm(docs, window, keyLen = 24, minJ = 0.0)
      }
    }
  }

  it should "rank supplementary-plane keys in UTF-8 byte order (engine collation)" in {
    // U+10000 (surrogate pair in UTF-16) vs U+F000 (BMP private use):
    // JVM String.compareTo puts the surrogate FIRST (code units 0xD800 <
    // 0xF000) while UTF-8 byte order puts it LAST (F0 > EF) — the census
    // must use the engine's order or global ranks diverge
    val hi = new String(Character.toChars(0x10000))
    val bmp = new String(Character.toChars(0xF000))
    val docs = Seq(
      (1L, s"$bmp$bmp shared tokens here"),
      (2L, s"$hi$hi shared tokens here"),
      (3L, s"a plain ascii doc"))
    val got = Dedup.sortedNeighborhood(
      docs.toDF("doc_id", "text"), window = 2, minJaccard = 0.0,
      maxBandSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // UTF-8 order: ascii(3) < U+F000(1) < U+10000(2)
    got.map(p => (p._1, p._2)) shouldBe Set((3L, 1L), (1L, 2L))
  }

  "prefixFilterJaccardPairs" should "find EXACTLY the brute-force pairs (the no-recall-loss contract)" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (t <- Seq(0.5, 0.7)) {
      val got = Dedup.prefixFilterJaccardPairs(docs, threshold = t)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // brute force via the independent declarative shingle formulation:
      // every pair, exact Jaccard, no filter tricks
      val sets = docs.select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("s"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
      val brute = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (ia, ib, j)).toSet
      withClue(s"threshold $t: ") {
        got shouldBe brute
        got should not be empty
      }
    }
  }

  it should "stay a subset under a firing maxPrefixDf guard (bounded-work trade)" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val exact = Dedup.prefixFilterJaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Dedup.prefixFilterJaccardPairs(docs, threshold = 0.5,
      maxPrefixDf = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    guarded.subsetOf(exact) shouldBe true
  }
}
