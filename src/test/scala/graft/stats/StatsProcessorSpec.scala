package graft.stats

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.selector._

class StatsProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val units = Seq(
    (1L, "u1", 10L, ts("2024-01-01 00:00:00")),
    (2L, "u1", 30L, ts("2024-01-03 00:00:00")),
    (3L, "u2", 20L, ts("2024-01-02 00:00:00")),
    (4L, "u2", 40L, ts("2024-01-04 00:00:00"))
  ).toDF("id", "uploaderId", "metric", "creationTimeUtc")

  "getStats" should "filter, project, time-sort desc and limit" in {
    val r = StatsProcessor.getStats(
      units,
      Seq(RawPred(col("metric") > 10)),
      Seq(col("id"), col("creationTimeUtc")),
      Right("creationTimeUtc"),
      Some(2))
    r.select("id").as[Long].collect() shouldBe Array(4L, 2L)
  }

  it should "shuffle deterministically under a fixed seed" in {
    def run(seed: Long) = StatsProcessor.getStats(
      units, Seq.empty, Seq(col("id"), col("metric")), Left(seed), None)
      .select("id").as[Long].collect().toSeq
    run(7L) shouldBe run(7L)
    run(7L).toSet shouldBe Set(1L, 2L, 3L, 4L)
  }

  "getAggregateStats" should "compute every metric in one pass" in {
    val r = StatsProcessor.getAggregateStats(
      units, Seq(OneMatchOne("uploaderId", "u1")),
      Seq("m" -> col("metric")), Descriptive.exactIntStats).collect()(0)
    r.getAs[Long]("m_n") shouldBe 2
    r.getAs[Long]("m_sum") shouldBe 40
    r.getAs[Double]("m_mean") shouldBe 20.0
  }

  "globalRunStats" should "exclude soft-deleted runs and sort by group" in {
    val runs = Seq(
      ("maple", 2L, 3L, Option.empty[Timestamp]),
      ("maple", 3L, 4L, None),
      ("maple", 9L, 9L, Some(ts("2024-01-01 00:00:00"))), // tombstoned
      ("plain", 0L, 0L, None)
    ).toDF("pipeline", "nSamples", "nReadGroups", "deletionTimeUtc")
    val r = StatsProcessor.globalRunStats(runs).collect()
    r.map(_.getString(0)) shouldBe Array("maple", "plain")
    val maple = r(0)
    maple.getAs[Long]("nRuns") shouldBe 2
    maple.getAs[Long]("nSamples") shouldBe 5
    maple.getAs[Long]("nReadGroups") shouldBe 7
  }

  "length_quantiles_approx" should "track the exact percentiles within GK accuracy" in {
    val sf = "/root/testdata/sf0.001"
    def byKey(name: String): Map[String, org.apache.spark.sql.Row] =
      graft.SparkEntry.queries(name)(spark, sf)
        .collect().map(r => r.getAs[String]("source") -> r).toMap
    val exact = byKey("length_quantiles")
    val approx = byKey("length_quantiles_approx")
    approx.keySet shouldBe exact.keySet
    for ((src, a) <- approx; e = exact(src); p <- Seq("p50", "p90", "p99")) {
      // GK with accuracy 1000 on ~25-doc groups is exact up to rank
      // rounding; allow one rank step of slack via a 20% value band
      val ev = e.getAs[Double](p)
      val av = a.getAs[Long](p).toDouble
      withClue(s"$src/$p exact=$ev approx=$av: ") {
        math.abs(av - ev) should be <= math.max(ev * 0.2, 2.0)
      }
    }
  }
}
