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
