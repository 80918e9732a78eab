package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct pins for the shared banded prefix-sum census — until now it
  * was exercised only through its consumers (mannWhitneyU, revenueGini,
  * doubledMidranks), so a regression in the offset arithmetic would
  * surface as three cryptic downstream failures instead of one local
  * one. */
class BandedSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Banded.bandCensus"

  it should "produce exclusive per-group offsets in band order and exact totals" in {
    // group g1: bands 0 (w 3), 2 (w 5), 5 (w 1); g2: band 1 (w 4)
    val perBand = Seq(
      ("g1", 0L, 2L), ("g1", 0L, 1L), ("g1", 2L, 5L), ("g1", 5L, 1L),
      ("g2", 1L, 4L))
      .toDF("g", "__band", "w")
    val (rows, totals) = Banded.bandCensus(perBand, Seq("g"), "w")
    val byKey = rows.map { case (k, b, off) => (k.head, b) -> off }.toMap
    byKey((("g1"), 0L)) shouldBe 0L
    byKey((("g1"), 2L)) shouldBe 3L // everything in band 0
    byKey((("g1"), 5L)) shouldBe 8L // bands 0 + 2
    byKey((("g2"), 1L)) shouldBe 0L // offsets restart per group
    totals(Seq("g1")) shouldBe 9L
    totals(Seq("g2")) shouldBe 4L
  }

  it should "handle negative bands in ascending order and the empty-group case" in {
    // trunc-div banding puts negatives below zero; the offset scan must
    // order -2 < 0 < 3
    val perBand = Seq((-2L, 1L), (0L, 10L), (3L, 100L))
      .toDF("__band", "w")
    val (rows, totals) = Banded.bandCensus(perBand, Seq(), "w")
    rows.map { case (_, b, off) => b -> off }.toMap shouldBe
      Map(-2L -> 0L, 0L -> 1L, 3L -> 11L)
    totals(Seq()) shouldBe 111L
    // empty input: no rows, no totals, no crash
    val (er, et) = Banded.bandCensus(
      perBand.filter(col("w") < 0), Seq(), "w")
    er shouldBe empty
    et shouldBe empty
  }

  it should "fail fast before any collect when the cell census exceeds maxBands" in {
    val wide = (1L to 50L).map(b => (b, 1L)).toDF("__band", "w")
    val e = intercept[IllegalArgumentException] {
      Banded.bandCensus(wide, Seq(), "w", maxBands = 10L)
    }
    e.getMessage should include("maxBands")
  }

  behavior of "Banded.bandCensusN"

  it should "scan one exclusive prefix per weight in a single pass" in {
    // two weights riding one census: the per-band offsets must advance
    // independently (tokens 3/5, new terms 2/0)
    val perBand = Seq((0L, 3L, 2L), (1L, 5L, 0L), (2L, 7L, 4L))
      .toDF("__band", "t", "v")
    val (rows, totals) =
      Banded.bandCensusN(perBand, Seq(), Seq("t", "v"))
    val byBand = rows.map { case (_, b, offs) => b -> offs }.toMap
    byBand(0L) shouldBe Seq(0L, 0L)
    byBand(1L) shouldBe Seq(3L, 2L)
    byBand(2L) shouldBe Seq(8L, 2L)
    totals(Seq()) shouldBe Seq(15L, 6L)
  }

  it should "back the migrated userGrowth/vocabGrowth callers with identical curves" in {
    // userGrowth: 3 users first appearing on days 0, 0, 130 (bands 0
    // and 1 at bandDays=128) -> running totals 2 then 3
    val ev = Seq((1L, 0L), (2L, 3600000000L), (1L, 5L),
      (3L, 130L * 86400000000L))
      .toDF("user_id", "ts")
    val ug = graft.streaming.EventStreams.userGrowth(ev)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ug shouldBe Array((0L, 2L, 2L), (130L, 1L, 3L))
    // vocabGrowth with docsPerBand=2: cum_tokens/cum_vocab must equal
    // the global running sums across the band boundary
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "c d e"), (3L, "a"))
      .toDF("doc_id", "text")
    val vg = Curation.vocabGrowth(docs, docsPerBand = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("cum_tokens"),
        r.getAs[Long]("cum_vocab")))
    vg shouldBe Array((0L, 2L, 2L), (1L, 4L, 3L), (2L, 7L, 5L),
      (3L, 8L, 5L))
  }
}
