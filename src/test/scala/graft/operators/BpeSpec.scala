package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "ab ab ab"),
    (2L, "abc")
  ).toDF("doc_id", "text")

  "train" should "discover merges by weighted pair frequency, ties lexicographic" in {
    val t = Bpe.train(corpus, nMerges = 5, minPairFreq = 1L)
    // vocab: ab (freq 3), abc (freq 1)
    // iter 1: (a,b) weight 4 beats (b,c) weight 1 → merge "ab"
    // iter 2: only (ab,c) weight 1 remains → merge "abc"; then exhausted
    t.merges shouldBe Seq(("a", "b"), ("ab", "c"))
    val segs = t.segmentations.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    segs("ab") shouldBe Seq("ab")
    segs("abc") shouldBe Seq("abc")
  }

  it should "stop early when no pair reaches minPairFreq" in {
    val t = Bpe.train(corpus, nMerges = 5) // default minPairFreq = 2
    t.merges shouldBe Seq(("a", "b")) // (ab,c) occurs once → below threshold
    val segs = t.segmentations.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    segs("abc") shouldBe Seq("ab", "c")
  }

  it should "fuse left-to-right without overlap" in {
    // "aaa" with merge (a,a): greedy scan gives [aa, a], never [a, aa]
    // or a double-merge
    val t = Bpe.train(Seq((1L, "aaa aaa")).toDF("doc_id", "text"),
      nMerges = 1, minPairFreq = 1L)
    t.merges shouldBe Seq(("a", "a"))
    t.segmentations.collect()
      .map(r => r.getSeq[String](2)) should contain only Seq("aa", "a")
  }

  it should "produce identical merges and segmentations on both execution paths" in {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newest newest wide widest")
    ).toDF("doc_id", "text")
    val driver = Bpe.train(docs, nMerges = 6, minPairFreq = 1L)
    val dist = Bpe.train(docs, nMerges = 6, minPairFreq = 1L, maxDriverWords = 0L)
    driver.merges shouldBe dist.merges
    def segMap(t: Bpe.Trained) = t.segmentations.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    segMap(driver) shouldBe segMap(dist)
  }

  // ---- independent golden replay ----------------------------------
  // A from-the-definition BPE reference (Sennrich 2016 §3.2: count
  // adjacent symbol pairs weighted by word frequency, merge the most
  // frequent, ties lexicographic; greedy left-to-right non-overlapping
  // application), written WITHOUT reusing any Bpe helper — the
  // adversarial cross-check for a query that has no SQL oracle.
  private def refTokens(t: String): Seq[String] =
    t.toLowerCase.split("\\s+", -1).toSeq

  private def refBpeEncode(
      docs: Seq[(Long, String)], nMerges: Int, minPairFreq: Long)
      : Set[(Long, Int, String, Seq[String], Long)] = {
    val freqs = docs.flatMap { case (_, t) => refTokens(t) }
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var segs: Map[String, Vector[String]] =
      freqs.keysIterator.map(w => w -> w.split("").toVector).toMap
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((w, f) <- freqs; Seq(a, b) <- segs(w).sliding(2) if segs(w).size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      val best = counts.toSeq.sortBy { case ((a, b), w) => (-w, a, b) }.headOption
      best match {
        case Some(((a, b), w)) if w >= minPairFreq =>
          segs = segs.view.mapValues { s =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            s.foreach { x =>
              if (out.nonEmpty && out.last == a && x == b)
                out(out.length - 1) = a + b
              else out += x
            }
            out.toVector
          }.toMap
          i += 1
        case _ => done = true
      }
    }
    (for {
      (id, t) <- docs
      (w, pos) <- refTokens(t).zipWithIndex
      if w.nonEmpty
    } yield (id, pos, w, segs(w): Seq[String], segs(w).size.toLong)).toSet
  }

  it should "reproduce the independent reference on full train+encode output" in {
    val docs = Seq(
      (1L, "low lower lowest the lowly low"),
      (2L, "new newest newer the news new new"),
      (3L, "wide widest wider the widely"),
      (4L, "the they them then there these"),
      (5L, "low new wide the lowest newest widest"))
    for (merges <- Seq(0, 3, 12)) {
      val df = docs.toDF("doc_id", "text")
      val got = Bpe.encode(df, Bpe.train(df, merges, minPairFreq = 2L))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"),
          r.getAs[String]("word"), r.getAs[Seq[String]]("subwords"),
          r.getAs[Long]("n_subwords"))).toSet
      withClue(s"nMerges=$merges: ") {
        got shouldBe refBpeEncode(docs, merges, minPairFreq = 2L)
      }
    }
  }

  "encode" should "segment known words via lookup and fall back to chars for OOV" in {
    val t = Bpe.train(corpus, nMerges = 5, minPairFreq = 1L)
    val enc = Bpe.encode(Seq((9L, "ab abc abd")).toDF("doc_id", "text"), t)
      .collect()
      .map(r => (r.getAs[Int]("pos"), r.getAs[String]("word"),
        r.getAs[Seq[String]]("subwords"), r.getAs[Long]("n_subwords")))
      .sortBy(_._1)
    enc(0) shouldBe ((0, "ab", Seq("ab"), 1L))
    enc(1) shouldBe ((1, "abc", Seq("abc"), 1L))
    enc(2) shouldBe ((2, "abd", Seq("a", "b", "d"), 3L)) // OOV → characters
  }

  it should "shrink the subword stream as merges accumulate" in {
    val docs = Seq((1L, "lower lower newest newest lowest")).toDF("doc_id", "text")
    def totalSubwords(nMerges: Int): Long =
      Bpe.encode(docs, Bpe.train(docs, nMerges, minPairFreq = 1L))
        .agg(org.apache.spark.sql.functions.sum("n_subwords"))
        .collect()(0).getLong(0)
    totalSubwords(0) shouldBe 28L // pure characters: 5+5+6+6+6
    totalSubwords(8) should be < totalSubwords(2)
  }
}
