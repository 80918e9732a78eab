package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  behavior of "gopherRules"

  it should "keep a row (with zeroed metrics, pass=false) for token-free docs" in {
    val docs = Seq((1L, ""), (2L, "  \n\t "), (3L, "real words here now"))
      .toDF("doc_id", "text")
    val r = Quality.gopherRules(docs, minWords = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    r.keySet shouldBe Set(1L, 2L, 3L)
    for (id <- Seq(1L, 2L)) {
      r(id).getAs[Long]("n_words") shouldBe 0L
      r(id).getAs[Double]("mean_word_len") shouldBe 0.0
      r(id).getAs[Double]("frac_alpha_words") shouldBe 0.0
      r(id).getAs[Double]("symbol_ratio") shouldBe 0.0
      r(id).getAs[Boolean]("pass") shouldBe false
    }
    r(3L).getAs[Long]("n_words") shouldBe 4L
  }

  it should "compute line, word, and symbol metrics on crafted docs" in {
    val docs = Seq(
      // all-bullet lines, 1-char words
      (1L, "- a\n- b"),
      // clean passable prose
      (2L, "the cat and the dog have words of that size with more text here now"),
      // symbol soup: 5 '#' + one '...'
      (3L, "x #### ... more #things here okay fine"),
      // ellipsis line endings, both styles
      (4L, "words trail off…\nanother line...")
    ).toDF("doc_id", "text")
    val r = Quality.gopherRules(docs, minWords = 5,
        stopwords = Seq("the", "a", "b", "and", "have", "of", "that", "with"))
      .collect().map(x => x.getLong(0) -> x).toMap

    val d1 = r(1L)
    d1.getAs[Long]("n_words") shouldBe 4L
    d1.getAs[Double]("mean_word_len") shouldBe 1.0
    d1.getAs[Double]("frac_alpha_words") shouldBe 0.5
    d1.getAs[Long]("n_stop_words") shouldBe 2L // 'a' and 'b'
    d1.getAs[Double]("frac_bullet_lines") shouldBe 1.0
    d1.getAs[Boolean]("pass") shouldBe false // mean_word_len < 3

    val d2 = r(2L)
    d2.getAs[Long]("n_words") shouldBe 15L
    d2.getAs[Double]("mean_word_len") shouldBe (53.0 / 15.0)
    d2.getAs[Double]("frac_alpha_words") shouldBe 1.0
    d2.getAs[Long]("n_stop_words") should be >= 2L
    d2.getAs[Boolean]("pass") shouldBe true

    val d3 = r(3L)
    d3.getAs[Double]("symbol_ratio") shouldBe (6.0 / 8.0)
    d3.getAs[Boolean]("pass") shouldBe false

    val d4 = r(4L)
    d4.getAs[Double]("frac_ellipsis_lines") shouldBe 1.0
    d4.getAs[Boolean]("pass") shouldBe false
  }

  it should "gate on the word-count window" in {
    val docs = Seq((1L, "three tiny words")).toDF("doc_id", "text")
    val strict = Quality.gopherRules(docs, minWords = 5).collect().head
    strict.getAs[Boolean]("pass") shouldBe false
    val loose = Quality.gopherRules(docs, minWords = 1,
      stopwords = Seq("three", "tiny")).collect().head
    loose.getAs[Boolean]("pass") shouldBe true
  }

  behavior of "lmScore"

  it should "match the hand-computed add-one bigram NLL" in {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = Quality.lmScore(docs)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // cb: (a,b)=3, (b,a)=1, (b,c)=1; cu: a=3, b=2; V=3
    val pab = math.log(4.0 / 6.0) // (3+1)/(3+3)
    val pba = math.log(2.0 / 5.0) // (1+1)/(2+3)
    val pbc = math.log(2.0 / 5.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r(1L)._1 shouldBe 3L
    r(1L)._2 shouldBe r6(-(((0.0 + pab) + pba) + pab) / 3.0)
    r(2L)._1 shouldBe 2L
    r(2L)._2 shouldBe r6(-((0.0 + pab) + pbc) / 2.0)
  }

  it should "drop docs with fewer than two tokens and score common phrasing lower" in {
    val docs = Seq(
      (1L, "one"),
      (2L, ""),
      (3L, "the same phrase repeats"),
      (4L, "the same phrase repeats"),
      (5L, "utterly different gibberish here")
    ).toDF("doc_id", "text")
    val r = Quality.lmScore(docs)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    r.keySet shouldBe Set(3L, 4L, 5L)
    // the repeated phrase's bigrams are twice as frequent => lower NLL
    r(3L) shouldBe r(4L)
    r(3L) should be < r(5L)
  }

  behavior of "blocklistGate"

  it should "count token occurrences and phrase hits case-insensitively with a combined verdict" in {
    val docs = Seq(
      (1L, "clean document with harmless words"),
      (2L, "the Forbidden word appears twice: forbidden indeed"),
      (3L, "contains the exact   Bad Phrase somewhere"),
      (4L, "forbidden AND a bad phrase together"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = Quality.blocklistGate(docs,
      terms = Seq("forbidden"), phrases = Seq("bad phrase"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    got(1L) shouldBe ((0L, 0L, true))
    got(2L) shouldBe ((2L, 0L, false)) // both casings counted
    got(3L) shouldBe ((0L, 1L, false)) // whitespace-collapsed phrase hit
    got(4L) shouldBe ((1L, 1L, false))
    got(5L) shouldBe ((0L, 0L, true))
  }

  behavior of "blocklistGateAc"

  /** Naive all-occurrence count: positions i where text.substring(i)
    * starts with p — the definition the automaton must reproduce. */
  private def naiveCount(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.startsWith(p, i)).max(0).toLong

  it should "count all occurrences including overlaps and nested patterns" in {
    val pats = Seq("aa", "aab", "ab", "b", "she", "he", "hers")
    val docs = Seq(
      (1L, "aaab"),            // "aa"×2 (overlap), "aab"×1, "ab"×1, "b"×1
      (2L, "ushers"),          // she, he, hers all fire inside one run
      (3L, "no hits here except b? no."),
      (4L, ""),
      (5L, "aabaab aab")
    ).toDF("doc_id", "text")
    val got = Quality.blocklistGateAc(docs, pats)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val texts = Map(1L -> "aaab", 2L -> "ushers",
      3L -> "no hits here except b? no.", 4L -> "", 5L -> "aabaab aab")
    texts.foreach { case (id, t) =>
      val per = pats.map(naiveCount(t, _))
      withClue(s"doc $id: ") {
        got(id) shouldBe ((per.sum, per.count(_ > 0).toLong, per.sum == 0L))
      }
    }
    got(1L)._1 shouldBe 5L // the overlap arithmetic above, pinned
  }

  it should "agree with a naive scan on random text over a random dictionary" in {
    val rnd = new scala.util.Random(23)
    val alphabet = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pats = (1 to 12).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val docs = (0L until 30L).map(i => (i, randStr(200)))
    val got = Quality.blocklistGateAc(docs.toDF("doc_id", "text"), pats)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, t) =>
      withClue(s"doc $id: ") {
        got(id) shouldBe pats.map(naiveCount(t, _)).sum
      }
    }
  }

  behavior of "ecdfByGroup"

  it should "reproduce percent_rank exactly, ties and singletons included" in {
    val rnd = new scala.util.Random(17)
    // heavy ties (values drawn from 10 levels) + one singleton group
    val rows = (Seq.fill(200)((s"g${rnd.nextInt(3)}", rnd.nextInt(10) / 10.0)) :+
      (("solo", 0.7))).zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
    val df = rows.toDF("id", "g", "v")
    val viaWindow = df.withColumn("pct_rank",
      round(org.apache.spark.sql.functions.percent_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("v"))), 6))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val viaHist = Quality.ecdfByGroup(df, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pct_rank")).toMap
    viaHist shouldBe viaWindow
    viaHist(200L) shouldBe 0.0 // the singleton group
  }

  behavior of "classifierCalibration"

  it should "conserve doc mass over in-range bins with exact bin edges" in {
    val docs = (1L to 60L).map(i =>
      (i, (1 to (3 + (i % 9).toInt)).map(j => s"w${(i * j) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val cal = Quality.classifierCalibration(
      docs, graft.functions.TextFunctions.langStopwords("en")).collect()
    cal.map(_.getAs[Long]("n_docs")).sum shouldBe 60L
    cal.foreach { r =>
      val bin = r.getAs[Long]("bin")
      bin should (be >= 0L and be <= 19L)
      r.getAs[Double]("bin_lo") shouldBe (bin.toDouble / 20.0 - 0.5)
      r.getAs[Long]("n_pass") should be <= r.getAs[Long]("n_docs")
      r.getAs[Double]("pass_rate") should (be >= 0.0 and be <= 1.0)
    }
  }

  it should "agree with the standalone classifier's binning doc by doc" in {
    val docs = (1L to 30L).map(i =>
      (i, (1 to 6).map(j => s"tok${(i + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val perDoc = Quality.linearClassifier(docs).collect()
      .map(r => math.min(math.max(
        math.floor((r.getAs[Double]("qscore") + 0.5) * 20.0).toLong, 0L), 19L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cal = Quality.classifierCalibration(
      docs, graft.functions.TextFunctions.langStopwords("en")).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_docs")).toMap
    cal shouldBe perDoc
  }

  behavior of "lmScoreBackoff"

  it should "hit all three backoff tiers on a hand-built split" in {
    val train = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    // trigrams of the scored doc:
    //  (a,b,c): seen in train → tier 0, S = c3/c2(a,b) = 1/2
    //  (b,c,x): unseen trigram, bigram (c,x) unseen, x unseen unigram
    //           → tier 2, S = 0.16·(0+1)/(N+V) = 0.16/(6+4)
    //  (c,x,a): unseen trigram, bigram (x,a) unseen, a seen (c1=2)
    //           → tier 2, S = 0.16·(2+1)/10
    val score = Seq((1L, "a b c x a")).toDF("doc_id", "text")
    val r = Quality.lmScoreBackoff(score, train).collect()(0)
    r.getAs[Long]("n_trigrams") shouldBe 3L
    r.getAs[Long]("n_backoff") shouldBe 2L
    val expected = -(math.log(1.0 / 2.0) + math.log(0.16 * 1.0 / 10.0) +
      math.log(0.16 * 3.0 / 10.0)) / 3.0
    r.getAs[Double]("nll") shouldBe expected +- 1e-6
  }

  it should "use the 0.4-weighted bigram tier when only the trigram is unseen" in {
    // train has bigram (b,d) inside "a b d" but never trigram (c,b,d)
    val train = Seq((100L, "a b d c b e")).toDF("doc_id", "text")
    val score = Seq((1L, "c b d")).toDF("doc_id", "text")
    val r = Quality.lmScoreBackoff(score, train).collect()(0)
    r.getAs[Long]("n_trigrams") shouldBe 1L
    r.getAs[Long]("n_backoff") shouldBe 1L
    // S = 0.4 · c(b,d)/c1(b) = 0.4 · 1/2
    r.getAs[Double]("nll") shouldBe -math.log(0.4 * 0.5) +- 1e-6
  }

  it should "never back off when scoring the training corpus itself" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sleeps under the warm sun")).toDF("doc_id", "text")
    val rows = Quality.lmScoreBackoff(docs, docs).collect()
    rows.foreach(_.getAs[Long]("n_backoff") shouldBe 0L)
  }
  behavior of "isotonicCalibration"

  it should "pool adjacent violators exactly (weighted PAV via minimax)" in {
    // 3 bins, 5 docs each, raw rates [0.8, 0.2, 0.6]:
    // PAV pools bins 0-1 -> [0.5, 0.5, 0.6]
    val rows = (0 until 5).map(i => (0.05, i < 4)) ++  // bin 0: 4/5
      (0 until 5).map(i => (0.40, i < 1)) ++           // bin 1: 1/5
      (0 until 5).map(i => (0.90, i < 3))              // bin 2: 3/5
    val docs = rows.toDF("score", "label")
    val got = Quality.isotonicCalibration(docs, col("score"), col("label"),
      nBins = 3).collect()
    got.map(_.getDouble(4)).toSeq shouldBe Seq(0.5, 0.5, 0.6)
    got.map(_.getDouble(3)).toSeq shouldBe Seq(0.8, 0.2, 0.6)
  }

  it should "leave an already-monotone curve untouched and stay nondecreasing" in {
    val rows = (0 until 10).map(i => (0.05, i < 2)) ++
      (0 until 10).map(i => (0.50, i < 5)) ++
      (0 until 10).map(i => (0.95, i < 9))
    val got = Quality.isotonicCalibration(rows.toDF("score", "label"),
      col("score"), col("label"), nBins = 3).collect()
    got.map(_.getDouble(4)).toSeq shouldBe Seq(0.2, 0.5, 0.9)
    got.map(_.getDouble(4)).toSeq shouldBe
      got.map(_.getDouble(4)).toSeq.sorted
  }
}
