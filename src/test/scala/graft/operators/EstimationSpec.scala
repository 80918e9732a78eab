package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Unit specs for the sample-based estimation tier. Estimators are
  * pinned through their EXACT special cases (full-inclusion sampling
  * recovers the truth bit-for-bit; perfect proportionality makes the
  * ratio estimator exact for ANY sample) plus hand-checked spectrum
  * cases for the richness pair. */
class EstimationSpec extends SparkSpec {
  import spark.implicits._

  behavior of "htEstimate"

  it should "recover the exact total under full inclusion (pi = 1)" in {
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 12L)).toDF("id", "y")
    val r = Estimation.htEstimate(docs, col("y"), "id",
      org.apache.spark.sql.functions.lit(1000L)).collect()(0)
    r.getLong(0) shouldBe 3L // n_pop
    r.getLong(1) shouldBe 3L // n_sample
    r.getDouble(2) shouldBe 42.0
    r.getLong(3) shouldBe 42L
    r.getDouble(4) shouldBe 0.0
  }

  it should "clamp the permille column into [1, 1000]" in {
    // pi column 5000 clamps to 1000 -> still full inclusion, still exact
    val docs = Seq((1L, 7L), (2L, 9L)).toDF("id", "y")
    val r = Estimation.htEstimate(docs, col("y"), "id",
      org.apache.spark.sql.functions.lit(5000L)).collect()(0)
    r.getLong(1) shouldBe 2L
    r.getDouble(2) shouldBe 16.0
  }

  behavior of "ratioEstimate"

  it should "be exact under perfect proportionality whatever the sample" in {
    // y = 2x for every row -> ratio 2.0 and estimate == truth for ANY
    // nonempty sample
    val docs = (0L until 50L).map(i => (i, (i + 1) * 2L, i + 1L))
      .toDF("id", "y", "x")
    val r = Estimation.ratioEstimate(docs, col("y"), col("x"), "id",
      samplePermille = 500L).collect()(0)
    assert(r.getLong(1) > 0L && r.getLong(1) < 50L) // a real subsample
    r.getDouble(3) shouldBe 2.0
    r.getDouble(4) shouldBe r.getLong(5).toDouble
    r.getDouble(6) shouldBe 0.0
  }

  it should "recover the exact total at full sampling rate" in {
    val docs = Seq((1L, 5L, 100L), (2L, 7L, 50L)).toDF("id", "y", "x")
    val r = Estimation.ratioEstimate(docs, col("y"), col("x"), "id",
      samplePermille = 1000L).collect()(0)
    r.getLong(1) shouldBe 2L
    r.getDouble(4) shouldBe 12.0
  }

  behavior of "captureRecapture"

  it should "equal the true distinct count when both samples capture everything" in {
    val docs = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "aa"))
      .toDF("doc_id", "text")
    val r = Estimation.captureRecapture(docs, ratePermille = 1000L)
      .collect()(0)
    r.getLong(0) shouldBe 3L // n1 (dup "aa" collapses to one fp)
    r.getLong(1) shouldBe 3L
    r.getLong(2) shouldBe 3L
    r.getDouble(3) shouldBe 3.0 // Chapman exact at full capture
    r.getDouble(4) shouldBe 0.0 // SE 0 when n1 = n2 = m
    r.getLong(5) shouldBe 3L
  }

  behavior of "goodTuring"

  it should "compute r* and P0 from a hand spectrum" in {
    // tokens: a a b c -> S(1)=2, S(2)=1, N=4
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val rows = Estimation.goodTuring(docs).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    val r1 = rows(0)
    r1.getLong(1) shouldBe 2L // S(1)
    r1.getDouble(3) shouldBe 1.0 // r* = 2·S(2)/S(1)
    r1.getDouble(4) shouldBe 0.5 // P0 = S(1)/N
    rows(1).isNullAt(3) shouldBe true // S(3) absent -> NULL r*
  }

  behavior of "chao1"

  it should "apply the bias-corrected Chao1 formula" in {
    // V=3, n1=2, n2=1 -> 3 + 2·1/(2·2) = 3.5
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val r = Estimation.chao1(docs).collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 1L
    r.getDouble(3) shouldBe 3.5
  }

  it should "stay finite with zero doubletons (the +1 correction)" in {
    // all singletons: V=3, n1=3, n2=0 -> 3 + 3·2/2 = 6
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    Estimation.chao1(docs).collect()(0).getDouble(3) shouldBe 6.0
  }

  behavior of "bigram spectrum mode"

  it should "pair adjacent FILTERED tokens row-locally" in {
    // " a b a b c" -> bigrams: "a b" x2, "b a", "b c" -> V=3, S(1)=2,
    // S(2)=1; the leading whitespace token is filtered BEFORE pairing
    val docs = Seq((1L, " a b a b c")).toDF("doc_id", "text")
    val r = Estimation.chao1(docs, ngram = 2).collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 1L
    val gt = Estimation.goodTuring(docs, ngram = 2).collect()
    gt.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    gt(0).getDouble(3) shouldBe 1.0 // r* = 2·S(2)/S(1) = 2·1/2
  }

  it should "produce no bigrams from a single-token doc" in {
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    Estimation.chao1(docs, ngram = 2).collect()(0).getLong(0) shouldBe 0L
  }
}
