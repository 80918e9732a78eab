package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect()(0).getAs[T]("r")

  "tokenCount" should "count whitespace tokens" in {
    one[Int](TextFunctions.tokenCount(col("text")), "the quick  brown\tfox") shouldBe 4
  }

  "subwordCount" should "count letter/digit/punct runs" in {
    // "don't stop123" → don + ' + t + stop + 123 = 5
    one[Int](TextFunctions.subwordCount(col("text")), "don't stop123") shouldBe 5
  }

  "punctRatio" should "not divide by zero on empty docs (ANSI mode)" in {
    one[Double](TextFunctions.punctRatio(col("text")), "") shouldBe 0.0
    one[Double](TextFunctions.punctRatio(col("text")), "a,b") shouldBe (1.0 / 3) +- 1e-12
  }

  "meanTokenLen" should "handle empty input safely" in {
    noException should be thrownBy
      one[Double](TextFunctions.meanTokenLen(col("text")), "")
    one[Double](TextFunctions.meanTokenLen(col("text")), "ab cdef") shouldBe 3.0
  }

  "stopwordRatio" should "compute the hit fraction" in {
    one[Double](TextFunctions.stopwordRatio(col("text"), Seq("the", "a")),
      "The cat in a hat") shouldBe 0.4 +- 1e-12
  }

  "langId" should "pick the language with most stopword hits" in {
    one[String](TextFunctions.langId(col("text")),
      "the cat and the dog in the house") shouldBe "en"
    one[String](TextFunctions.langId(col("text")),
      "der hund und die katze ist nicht da") shouldBe "de"
    one[String](TextFunctions.langId(col("text")), "zzz qqq xxx") shouldBe "und"
  }

  it should "classify the widened language set, non-Latin scripts included" in {
    val fixtures = Seq(
      "pt" -> "o gato não está em casa para ver um rato com ele",
      "nl" -> "de kat en de hond zijn niet voor het huis te zien",
      "sv" -> "katten och hunden är det som en ser på gården för",
      "tr" -> "bu ev için çok güzel bir bahçe ve daha fazla alan",
      "fi" -> "kissa ja koira on mutta se ei että hän oli kun",
      "id" -> "kucing itu ada di dalam rumah yang besar dan untuk tidur",
      "vi" -> "con mèo và con chó của tôi là có trong một nhà cho người",
      "ru" -> "кошка и собака не на улице что это как он быть с",
      "ar" -> "القطة في البيت من على أن هذا إلى كان التي لا ما",
      "hi" -> "बिल्ली घर के में है की को से का पर यह और")
    fixtures.foreach { case (expected, text) =>
      withClue(s"$expected: ") {
        one[String](TextFunctions.langId(col("text")), text) shouldBe expected
      }
    }
  }

  "langIdScript" should "route CJK/Hangul by script and everything else to stopwords" in {
    // CJK has no whitespace — the stopword path sees one giant token and
    // returns 'und'; the script tier is what classifies these
    one[String](TextFunctions.langIdScript(col("text")),
      "数据处理系统的设计与实现非常重要") shouldBe "zh"
    // han + kana mix is Japanese, not Chinese — kana wins
    one[String](TextFunctions.langIdScript(col("text")),
      "データ処理システムの設計はとても大切です") shouldBe "ja"
    one[String](TextFunctions.langIdScript(col("text")),
      "데이터 처리 시스템 설계가 중요합니다") shouldBe "ko"
    // space-separated scripts keep flowing through stopwords
    one[String](TextFunctions.langIdScript(col("text")),
      "кошка и собака не на улице что это как он быть с") shouldBe "ru"
    one[String](TextFunctions.langIdScript(col("text")),
      "the cat and the dog in the house") shouldBe "en"
    // a single ideograph inside Latin text must not flip the verdict
    one[String](TextFunctions.langIdScript(col("text")),
      "the word 猫 means cat and the rest of this text is english") shouldBe "en"
  }

  "scriptRatio" should "measure per-script character fractions" in {
    one[Double](TextFunctions.scriptRatio(col("text"),
      TextFunctions.scriptClasses("latin")), "abc де 猫") shouldBe (3.0 / 8) +- 1e-12
    one[Double](TextFunctions.scriptRatio(col("text"),
      TextFunctions.scriptClasses("han")), "abc де 猫") shouldBe (1.0 / 8) +- 1e-12
    one[Double](TextFunctions.scriptRatio(col("text"),
      TextFunctions.scriptClasses("latin")), "") shouldBe 0.0 +- 1e-12
  }

  "contentFingerprint" should "be order- and duplication-invariant" in {
    val a = one[String](TextFunctions.contentFingerprint(col("text")), "b a c a")
    val b = one[String](TextFunctions.contentFingerprint(col("text")), "c b a")
    a shouldBe b
  }

  "charShingles" should "produce n-grams of the normalized text" in {
    val r = one[collection.Seq[String]](TextFunctions.charShingles(col("text"), 3), "ab  cd")
    r should contain allOf ("ab ", "b c", " cd")
  }

  "wordShingles" should "produce word n-grams" in {
    val r = one[collection.Seq[String]](TextFunctions.wordShingles(col("text"), 2), "a b c")
    r.toSeq shouldBe Seq("a b", "b c")
  }

  "jaccard" should "compute set overlap and survive empty arrays" in {
    val df = Seq((Seq("a", "b"), Seq("b", "c")), (Seq.empty[String], Seq.empty[String]))
      .toDF("a", "b")
    val r = df.select(TextFunctions.jaccard(col("a"), col("b")).as("j"))
      .as[Double].collect()
    r(0) shouldBe (1.0 / 3) +- 1e-12
    r(1) shouldBe 0.0
  }

  "qualityScore" should "rank clean text above noise" in {
    val noisy = "!!! ??? ### $$$ %%%"
    val clean = "the house and the garden are in a quiet part of the town " * 10
    val df = Seq(clean, noisy).toDF("text")
      .select(TextFunctions.qualityScore(col("text"), TextFunctions.langStopwords("en")).as("q"))
      .as[Double].collect()
    df(0) should be > df(1)
  }

  "repetition signals" should "flag looping tokens and duplicate lines" in {
    val looping = ("buy now " * 50).trim            // 100 tokens, 2 distinct
    val varied = (1 to 100).map(i => s"w$i").mkString(" ")
    val dupLines = "header\nbody one\nheader\nbody two\nheader"
    val r = Seq(looping, varied, dupLines).toDF("text").select(
      TextFunctions.repeatTokenRatio(col("text")).as("rt"),
      TextFunctions.dupLineFraction(col("text")).as("dl"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    r(0)._1 shouldBe 0.98 +- 1e-9  // 1 - 2/100
    r(1)._1 shouldBe 0.0
    r(2)._2 shouldBe 0.4 +- 1e-9   // 5 lines, 3 distinct → 1 − 3/5
  }

  "redactPii" should "replace emails and IPv4 literals with typed placeholders" in {
    val docs = Seq(
      "contact jane.doe+spam@corp-mail.example.com or 10.0.42.7 today",
      "two mails a@b.co c@d.org and ip 192.168.1.1; versions like 1.2.3 stay",
      "nothing sensitive here"
    ).toDF("text")
    val out = docs.select(
      TextFunctions.redactPii(col("text")).as("r"),
      TextFunctions.piiCount(col("text"), TextFunctions.piiEmailPattern).as("ne"),
      TextFunctions.piiCount(col("text"), TextFunctions.piiIpv4Pattern).as("ni"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out(0) shouldBe (("contact <EMAIL> or <IP> today", 1L, 1L))
    out(1) shouldBe (("two mails <EMAIL> <EMAIL> and ip <IP>; versions like 1.2.3 stay", 2L, 1L))
    out(2) shouldBe (("nothing sensitive here", 0L, 0L)) // identity round-trip
  }

  "WinnowFingerprints (native)" should "match the declarative reference formulation exactly" in {
    // real corpus docs + adversarial strings: multibyte UTF-8, ties
    // (repeated grams), all-same-char, length == k (single window)
    val crafted = Seq(
      "héllo wörld héllo wörld héllo wörld",
      "aaaaaaaaaaaaaaaaaaaa",
      "中文字符串的指纹选择测试中文字符串",
      "abcde",
      "the quick brown fox jumps over the lazy dog").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    for (docs <- Seq(crafted, real)) {
      val base = docs.filter(org.apache.spark.sql.functions.length(col("text")) >= 5)
      val native = base
        .select(col("doc_id"),
          explode(org.apache.spark.sql.graft.TextExpressionFunctions
            .winnowColumn(col("text"), 5, 4)).as("w"))
        .select(col("doc_id"), col("w.pos"), col("w.fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val reference = base
        .select(col("doc_id"), TextFunctions.gramHashes(col("text"), 5).as("__hs"))
        .select(col("doc_id"),
          explode(TextFunctions.winnowFromHashes(col("__hs"), 4)).as("w"))
        .select(col("doc_id"), col("w.pos"), col("w.fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      native shouldBe reference
      native should not be empty
    }
  }

  "JaroWinkler (native)" should "reproduce the published vectors and the DuckDB-pinned edge rules" in {
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(org.apache.spark.sql.graft.TextExpressionFunctions
          .jaroWinklerColumn(col("a"), col("b")).as("r"))
        .collect()(0).getDouble(0)
    // Winkler 1990's canonical vectors, bit-exact (these doubles are
    // DuckDB jaro_winkler_similarity outputs — the oracle contract)
    jw("MARTHA", "MARHTA") shouldBe 0.9611111111111111
    jw("DIXON", "DICKSONX") shouldBe 0.8133333333333332
    jw("JELLYFISH", "SMELLYFISH") shouldBe 0.8962962962962964
    jw("CRATE", "TRACE") shouldBe 0.7333333333333334
    jw("arnab", "raanb") shouldBe 0.8666666666666667
    // boost threshold: jaro 0.5 <= 0.7, shared 2-prefix earns NO boost
    jw("abcdefgh", "abxxxxxx") shouldBe 0.5
    // edge rules pinned to DuckDB: either-empty -> 0 (INCLUDING both
    // empty — not the s1==s2 shortcut), equal -> 1, disjoint -> 0
    jw("", "") shouldBe 0.0
    jw("a", "") shouldBe 0.0
    jw("same", "same") shouldBe 1.0
    jw("abc", "xyz") shouldBe 0.0
  }

  it should "be symmetric and bounded on a deterministic fuzz set" in {
    val rnd = new scala.util.Random(11)
    val strs = (0 until 60).map(_ =>
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    val pairs = for (a <- strs; b <- strs) yield (a, b)
    val scored = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        org.apache.spark.sql.graft.TextExpressionFunctions
          .jaroWinklerColumn(col("a"), col("b")).as("ab"),
        org.apache.spark.sql.graft.TextExpressionFunctions
          .jaroWinklerColumn(col("b"), col("a")).as("ba"))
      .collect()
    scored.foreach { r =>
      val (ab, ba) = (r.getDouble(2), r.getDouble(3))
      withClue(s"${r.getString(0)} / ${r.getString(1)}: ") {
        ab shouldBe ba
        ab should be >= 0.0
        ab should be <= 1.0
      }
    }
  }

  "DeflateRatio" should "separate repetitive from diverse text and honor the empty contract" in {
    def ratio(s: String): Double =
      Seq(s).toDF("text")
        .select(org.apache.spark.sql.graft.TextExpressionFunctions
          .deflateRatioColumn(col("text")).as("r"))
        .collect()(0).getDouble(0)
    val repetitive = ratio("spam ham " * 200)
    val diverse = ratio(
      (1 to 200).map(i => s"w${i * 7919}q${i * 104729}").mkString(" "))
    repetitive should be < 0.05
    diverse should be > 0.3
    repetitive should be < diverse / 5
    ratio("") shouldBe 1.0
    // deterministic across evaluations
    ratio("the same text") shouldBe ratio("the same text")
  }

  it should "match an independent zlib replay on full corpus output" in {
    // independent reference: DeflaterOutputStream over a byte sink —
    // same algorithm parameters (level 6, raw/nowrap), a DIFFERENT API
    // path with its own buffering, so a length-accounting or
    // thread-reuse bug in the native expression's streaming loop cannot
    // agree with it by accident
    def refRatio(s: String): Double = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (bytes.isEmpty) return 1.0
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.Deflater(6, true)
      val dos = new java.util.zip.DeflaterOutputStream(out, d)
      dos.write(bytes); dos.close(); d.`end`()
      out.size().toDouble / bytes.length
    }
    val corpus = Seq(
      "spam ham " * 300,
      (1 to 300).map(i => s"w${i * 7919}q${i * 104729}").mkString(" "),
      "short",
      "",
      "mixed unicode éè€ 你好 repeated repeated repeated",
      "a" * 10000,
      (1 to 50).map(i => s"line $i of a templated page\nheader footer").mkString("\n"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = corpus.toDF("id", "text")
      .select(col("id"), org.apache.spark.sql.graft.TextExpressionFunctions
        .deflateRatioColumn(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.foreach { case (id, t) =>
      withClue(s"doc $id: ") { got(id) shouldBe refRatio(t) }
    }
  }

  it should "return an empty selection for texts shorter than k (both formulations)" in {
    Seq("abcd").toDF("text")
      .select(org.apache.spark.sql.graft.TextExpressionFunctions
        .winnowColumn(col("text"), 5, 4).as("w"))
      .collect()(0).getSeq[Any](0) shouldBe empty
    // the declarative reference must agree even WITHOUT the caller-side
    // length filter (sequence(1, m<=0) would otherwise fabricate grams)
    Seq("abcd", "").toDF("text")
      .select(TextFunctions.gramHashes(col("text"), 5).as("__hs"))
      .select(TextFunctions.winnowFromHashes(col("__hs"), 4).as("w"))
      .collect().foreach(_.getSeq[Any](0) shouldBe empty)
  }

  behavior of "tokenEntropyOnTokens"

  private def entropyOf(text: String): Double =
    Seq(text).toDF("text")
      .select(TextFunctions.tokenEntropyOnTokens(
        array_remove(TextFunctions.tokens(col("text")), ""))
        .as("h"))
      .collect()(0).getDouble(0)

  it should "match closed-form values on hand cases" in {
    entropyOf("a a a a") shouldBe 0.0
    entropyOf("") shouldBe 0.0
    entropyOf("a b") shouldBe
      BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    entropyOf("a b c d") shouldBe
      BigDecimal(math.log(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 3:1 split: H = -(3/4 ln 3/4 + 1/4 ln 1/4)
    val h31 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    entropyOf("a a a b") shouldBe h31 +- 1e-6
  }

  it should "rank a phrase-cycling doc below a diverse doc of equal distinct ratio" in {
    // both have 6 distinct tokens over 12 positions; the cycler's mass
    // concentrates on two tokens
    val cycling = entropyOf("x y x y x y x y a b c d")
    val diverse = entropyOf("a a b b c c d d e e f f")
    cycling should be < diverse
  }

  it should "agree with a naive per-doc computation on random corpora" in {
    val rnd = new scala.util.Random(21)
    val docs = Seq.fill(30)(Seq.fill(1 + rnd.nextInt(60))(
      s"t${rnd.nextInt(12)}").mkString(" "))
    docs.foreach { d =>
      val toks = d.split("\\s+").toSeq
      val n = toks.size.toDouble
      val naive = -toks.groupBy(identity).values
        .map(g => g.size / n * math.log(g.size / n)).sum
      entropyOf(d) shouldBe naive +- 1e-6
    }
  }

  behavior of "hashSketchOnTokens"

  private def sketchOf(text: String, dim: Int = 16): Seq[Long] =
    Seq(text).toDF("text")
      .select(TextFunctions.hashSketchOnTokens(
        array_remove(TextFunctions.tokens(col("text")), ""), dim).as("v"))
      .collect()(0).getSeq[Long](0).toSeq

  it should "be a bag-of-tokens linear sketch" in {
    // order-invariant (bag semantics)...
    sketchOf("alpha beta gamma") shouldBe sketchOf("gamma alpha beta")
    // ...and additive: doubling every token doubles the vector
    val once = sketchOf("alpha beta gamma")
    sketchOf("alpha alpha beta beta gamma gamma") shouldBe once.map(_ * 2)
    // empty docs are the zero vector of the right width
    sketchOf("") shouldBe Seq.fill(16)(0L)
  }

  it should "bound total mass by the token count and separate distinct docs" in {
    val v = sketchOf("one two three four five six seven eight")
    v.map(math.abs).sum should be <= 8L
    v.length shouldBe 16
    sketchOf("completely different vocabulary set") should not be
      sketchOf("one two three four five six seven eight")
  }

  behavior of "the native one-pass kernels"

  // adversarial corpus for the parity pins: unicode (multi-byte UTF-8 so
  // the md5 bytes and sort order exercise non-ASCII), whale repetition,
  // singleton docs, shared prefixes (sort-order ties), and random mixes
  private val parityDocs: Seq[String] = {
    val rnd = new scala.util.Random(97)
    Seq(
      "", "solo", "a a a a a a a a",
      "naïve café naïve crème café über",
      "préfix préfixe préf préfix",
      "z y x w v u t s r q p o n m l k j i h g f e d c b a") ++
      Seq.fill(40)(Seq.fill(1 + rnd.nextInt(80))(
        s"tok${rnd.nextInt(15)}").mkString(" "))
  }

  it should "match the declarative entropy spec bit-for-bit (incl. unicode)" in {
    val df = parityDocs.toDF("text")
      .select(array_remove(TextFunctions.tokens(col("text")), "").as("toks"))
      .select(
        TextFunctions.tokenEntropyOnTokens(col("toks")).as("native"),
        TextFunctions.tokenEntropySpec(col("toks")).as("spec"))
    df.collect().foreach { r =>
      // exact: the native kernel replays the identical fold (run order,
      // StrictMath.log term, subtract seed), not an approximation of it
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))
    }
  }

  it should "match the declarative count-sketch spec exactly (incl. unicode)" in {
    for (dim <- Seq(1, 7, 64)) {
      val df = parityDocs.toDF("text")
        .select(array_remove(TextFunctions.tokens(col("text")), "").as("toks"))
        .select(
          TextFunctions.hashSketchOnTokens(col("toks"), dim).as("native"),
          TextFunctions.hashSketchSpec(col("toks"), dim).as("spec"))
      df.collect().foreach { r =>
        r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
      }
    }
  }
}
