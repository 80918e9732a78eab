package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DescriptiveSpec extends SparkSpec {
  import spark.implicits._

  private def aggAll(df: org.apache.spark.sql.DataFrame,
      cols: Seq[org.apache.spark.sql.Column]) =
    df.agg(cols.head, cols.tail: _*).collect()(0)

  // Reference maple fixture numbers (SURVEY §7.2 step 2): nReadsInput
  // values 10000, 20000, 40000 → n=3, mean=23333.33, median=20000.
  "exactIntStats" should "reproduce the reference's descriptive stats" in {
    val df = Seq(10000L, 20000L, 40000L).toDF("v")
    val r = aggAll(df, Descriptive.exactIntStats(col("v"), "m"))
    r.getAs[Long]("m_n") shouldBe 3L
    r.getAs[Long]("m_sum") shouldBe 70000L
    r.getAs[Long]("m_min") shouldBe 10000L
    r.getAs[Long]("m_max") shouldBe 40000L
    r.getAs[Double]("m_mean") shouldBe 23333.333333333332 +- 1e-9
    r.getAs[Double]("m_median") shouldBe 20000.0
    // population variance (reference divides by n, not n-1)
    r.getAs[Double]("m_var_pop") shouldBe 1.5555555555555556e8 +- 1e-1
    r.getAs[Double]("m_stdev") shouldBe math.sqrt(1.5555555555555556e8) +- 1e-4
  }

  it should "interpolate the median on even counts" in {
    val r = aggAll(Seq(1L, 2L, 3L, 4L).toDF("v"),
      Descriptive.exactIntStats(col("v"), "m"))
    r.getAs[Double]("m_median") shouldBe 2.5
  }

  it should "match a naive computation on seeded random integer data" in {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val xs = List.fill(1 + rnd.nextInt(50))((rnd.nextInt(2000001) - 1000000).toLong)
      val r = aggAll(xs.toDF("v"), Descriptive.exactIntStats(col("v"), "m"))
      val n = xs.size.toDouble
      val mean = xs.sum.toDouble / n
      val varPop = xs.map(x => (x - mean) * (x - mean)).sum / n
      r.getAs[Long]("m_n") shouldBe xs.size.toLong
      r.getAs[Long]("m_sum") shouldBe xs.sum
      r.getAs[Double]("m_mean") shouldBe mean +- (math.abs(mean) * 1e-12 + 1e-9)
      r.getAs[Double]("m_var_pop") shouldBe varPop +- (math.abs(varPop) * 1e-9 + 1e-6)
    }
  }

  "exactDecimalStats" should "sum fixed-point exactly" in {
    val r = aggAll(Seq(1.11, 2.22, 3.33).toDF("v"),
      Descriptive.exactDecimalStats(col("v"), "p"))
    r.getAs[Long]("p_n") shouldBe 3L
    r.getAs[Double]("p_sum") shouldBe 6.66
    r.getAs[Double]("p_min") shouldBe 1.11
    r.getAs[Double]("p_max") shouldBe 3.33
    r.getAs[Double]("p_mean") shouldBe 2.22
  }

  "approxStats" should "land near the exact answers within sketch error" in {
    val xs = (1L to 10000L).toDF("v")
    val r = aggAll(xs, Descriptive.approxStats(col("v"), "m"))
    r.getAs[Long]("m_n") shouldBe 10000L
    r.getAs[Long]("m_approx_distinct").toDouble shouldBe 10000.0 +- 10000 * 0.1
    r.getAs[Double]("m_mean") shouldBe 5000.5
    r.getAs[Long]("m_median_approx").toDouble shouldBe 5000.0 +- 10.0
  }

  "sparkNativeStats" should "agree with the exact kernel on clean data" in {
    val df = Seq(5L, 7L, 11L, 13L).toDF("v")
    val e = aggAll(df, Descriptive.exactIntStats(col("v"), "m"))
    val s = aggAll(df, Descriptive.sparkNativeStats(col("v"), "m"))
    s.getAs[Long]("m_n") shouldBe e.getAs[Long]("m_n")
    s.getAs[Double]("m_mean") shouldBe e.getAs[Double]("m_mean") +- 1e-9
    s.getAs[Double]("m_var_pop") shouldBe e.getAs[Double]("m_var_pop") +- 1e-6
    s.getAs[Double]("m_median") shouldBe e.getAs[Double]("m_median")
  }

  // nearest-rank (type-1) percentile in plain Scala, the semantics
  // robustGroupStats commits to: value at sorted position ceil(p·n)
  private def nr(sorted: IndexedSeq[Long], p: Int): Long =
    sorted((p * sorted.size + 99) / 100 - 1)

  "robustGroupStats" should "match a hand-computed outlier example" in {
    val df = ((1L to 20L) :+ 1000L).map(("a", _)).toDF("g", "v")
    val r = Descriptive.robustGroupStats(df, "g", col("v")).collect()(0)
    r.getAs[Long]("n") shouldBe 21L
    r.getAs[Long]("p05") shouldBe 2L    // ceil(0.05·21) = 2nd smallest
    r.getAs[Long]("median") shouldBe 11L
    r.getAs[Long]("p95") shouldBe 20L   // the whale is clamped away
    // clamped: 1→2, 1000→20; trimmed: exactly the values 2..20
    r.getAs[Double]("winsorized_mean") shouldBe (2L + (2L to 20L).sum + 20L).toDouble / 21.0
    r.getAs[Double]("trimmed_mean") shouldBe 11.0
    // |v−11| sorted: 0,1,1,2,2,3,3,4,4,5,5,... → 11th is 5
    r.getAs[Long]("mad") shouldBe 5L
  }

  it should "be unmoved by how extreme the whale is, unlike the mean" in {
    def run(whale: Long) = Descriptive.robustGroupStats(
      ((1L to 99L) :+ whale).map(("g", _)).toDF("g", "v"), "g", col("v"))
      .collect()(0)
    val a = run(1000L)
    val b = run(1000000000L)
    a.getAs[Long]("median") shouldBe b.getAs[Long]("median")
    a.getAs[Long]("mad") shouldBe b.getAs[Long]("mad")
    a.getAs[Double]("winsorized_mean") shouldBe b.getAs[Double]("winsorized_mean")
    a.getAs[Double]("trimmed_mean") shouldBe b.getAs[Double]("trimmed_mean")
  }

  it should "match a naive per-group computation on seeded random data" in {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("x", "y", "z")
      _ <- 1 to (20 + rnd.nextInt(60))
    } yield (g, rnd.nextInt(100000).toLong)
    val got = Descriptive.robustGroupStats(rows.toDF("g", "v"), "g", col("v"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted.toIndexedSeq
      val (p05, med, p95) = (nr(sorted, 5), nr(sorted, 50), nr(sorted, 95))
      val r = got(g)
      r.getAs[Long]("n") shouldBe sorted.size.toLong
      r.getAs[Long]("p05") shouldBe p05
      r.getAs[Long]("median") shouldBe med
      r.getAs[Long]("p95") shouldBe p95
      val clamped = sorted.map(v => math.max(p05, math.min(p95, v)))
      r.getAs[Double]("winsorized_mean") shouldBe
        clamped.sum.toDouble / sorted.size
      val inliers = sorted.filter(v => v >= p05 && v <= p95)
      r.getAs[Double]("trimmed_mean") shouldBe inliers.sum.toDouble / inliers.size
      r.getAs[Long]("mad") shouldBe nr(sorted.map(v => math.abs(v - med)).sorted, 50)
    }
  }

  behavior of "quantileNormalize"

  it should "rank by strictly-below bin mass with clamped edges" in {
    // widths of 10, bins 0..9; values: 4 rows in bin 0, 4 in bin 5,
    // 2 in bin 9 (one via the upper clamp), 1 negative via the lower
    val rows = Seq(
      (1L, 1L), (2L, 3L), (3L, 7L), (4L, -50L), // bin 0 (incl. clamp)
      (5L, 50L), (6L, 52L), (7L, 55L), (8L, 59L), // bin 5
      (9L, 95L), (10L, 940L)) // bin 9 (incl. clamp)
      .toDF("id", "v")
    val got = Descriptive.quantileNormalize(rows, "id", col("v"),
      width = 10L, nBins = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    got(4L) shouldBe ((0L, 0.0)) // nothing strictly below bin 0
    got(1L) shouldBe ((0L, 0.0))
    got(5L) shouldBe ((5L, 0.4)) // 4 of 10 rows in lower bins
    got(9L) shouldBe ((9L, 0.8))
    got(10L) shouldBe ((9L, 0.8)) // clamped into the top bin
  }

  it should "spread fractional metrics across bins via quantScale" in {
    // scores in [0,1): the old cast-to-bigint binning collapsed all of
    // these into bin 0 (every pct_rank 0); quantScale = 1000, width = 100
    // spreads them over bins 0..9
    val rows = Seq((1L, 0.05), (2L, 0.15), (3L, 0.55), (4L, 0.95))
      .toDF("id", "score")
    val got = Descriptive.quantileNormalize(rows, "id", col("score"),
      width = 100L, nBins = 10, quantScale = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    got(1L) shouldBe ((0L, 0.0))
    got(2L) shouldBe ((1L, 0.25))
    got(3L) shouldBe ((5L, 0.5))
    got(4L) shouldBe ((9L, 0.75))
  }
}
