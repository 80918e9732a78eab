package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Unit specs for the round-14 parametric-inference tier. Each test
  * pins a hand-checkable case AND the degenerate-input gate (the r13
  * lesson: a when-chain that falls through on NULL operands ships
  * actively wrong output on no data). */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  private val hourUs = 3600000000L

  /** events frame with `counts(i)` rows in hour i for each (type, counts). */
  private def hourlyEvents(series: (String, Seq[Int])*): DataFrame =
    series.flatMap { case (g, counts) =>
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => (g, h * hourUs + i))
      }
    }.toDF("event_type", "ts")

  behavior of "welchTTest"

  it should "compute t and Welch-Satterthwaite df from exact moments" in {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(2L, 4L, 6L, 8L).toDF("v")
    val r = Inference.welchTTest(a, b, col("v")).collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 4L
    r.getDouble(2) shouldBe 2.0
    r.getDouble(3) shouldBe 5.0
    // mirror the pinned chain: varA=1, varB=20/3, va=1/3, vb=5/3
    val va = 1.0 / 3.0; val vb = (20.0 / 3.0) / 4.0
    val t = (2.0 - 5.0) / math.sqrt(va + vb)
    val df = (va + vb) * (va + vb) / (va * va / 2.0 + vb * vb / 3.0)
    r.getDouble(4) shouldBe math.rint(t * 1e6) / 1e6 +- 1e-9
    r.getDouble(5) shouldBe math.rint(df * 1e6) / 1e6 +- 1e-9
  }

  it should "gate t/df to NULL on a singleton side" in {
    val r = Inference.welchTTest(
      Seq(5L).toDF("v"), Seq(1L, 2L, 3L).toDF("v"), col("v")).collect()(0)
    r.isNullAt(4) shouldBe true
    r.isNullAt(5) shouldBe true
  }

  behavior of "cohensD"

  it should "compute pooled-SD d and the Hedges correction" in {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(2L, 4L, 6L, 8L).toDF("v")
    val r = Inference.cohensD(a, b, col("v")).collect()(0)
    val pooled = (2.0 * 1.0 + 3.0 * (20.0 / 3.0)) / 5.0
    val dd = (2.0 - 5.0) / math.sqrt(pooled)
    val g = dd * (1.0 - 3.0 / (4.0 * 7.0 - 9.0))
    r.getDouble(4) shouldBe math.rint(dd * 1e6) / 1e6 +- 1e-9
    r.getDouble(5) shouldBe math.rint(g * 1e6) / 1e6 +- 1e-9
  }

  it should "gate d/g to NULL when pooled variance is zero" in {
    val r = Inference.cohensD(
      Seq(4L, 4L).toDF("v"), Seq(4L, 4L).toDF("v"), col("v")).collect()(0)
    r.isNullAt(4) shouldBe true
    r.isNullAt(5) shouldBe true
  }

  behavior of "anovaOneWay"

  it should "compute F and eta-squared on a hand-checked two-group case" in {
    // a: hourly counts [2,4]; b: [3,5] -> SSB=1, SSW=4, F=0.5, eta=0.2
    val r = Inference.anovaOneWay(
      hourlyEvents("a" -> Seq(2, 4), "b" -> Seq(3, 5))).collect()(0)
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 2L
    r.getDouble(2) shouldBe 0.5
    r.getDouble(3) shouldBe 0.2
  }

  it should "gate F to NULL when the within-spread is zero" in {
    val r = Inference.anovaOneWay(
      hourlyEvents("a" -> Seq(3, 3), "b" -> Seq(5, 5))).collect()(0)
    r.isNullAt(2) shouldBe true
    r.isNullAt(3) shouldBe true
  }

  behavior of "bartlettVar"

  it should "be exactly 0 for equal group variances and exclude singletons" in {
    // a: [1,3], b: [5,7] (var 2 each), c: [9] (singleton -> excluded)
    val r = Inference.bartlettVar(
      hourlyEvents("a" -> Seq(1, 3), "b" -> Seq(5, 7), "c" -> Seq(9)))
      .collect()(0)
    r.getLong(0) shouldBe 4L // singleton not counted in n_obs
    r.getLong(1) shouldBe 2L
    r.getDouble(2) shouldBe 0.0
  }

  it should "gate the statistic to NULL on a zero-variance group" in {
    val r = Inference.bartlettVar(
      hourlyEvents("a" -> Seq(4, 4), "b" -> Seq(5, 7))).collect()(0)
    r.isNullAt(2) shouldBe true
  }

  behavior of "jarqueBera"

  it should "read zero skew and -1.5 excess kurtosis off [1,2,3]" in {
    val r = Inference.jarqueBera(hourlyEvents("a" -> Seq(1, 2, 3)))
      .collect()(0)
    r.getString(0) shouldBe "a"
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 0.0
    r.getDouble(3) shouldBe -1.5
    r.getDouble(4) shouldBe 0.28125 // 3/6 * (0 + 1.5^2/4)
  }

  it should "gate all three statistics to NULL on a constant series" in {
    val r = Inference.jarqueBera(hourlyEvents("a" -> Seq(4, 4, 4)))
      .collect()(0)
    r.isNullAt(2) shouldBe true
    r.isNullAt(3) shouldBe true
    r.isNullAt(4) shouldBe true
  }

  behavior of "mcnemar"

  it should "compute the continuity-corrected chi2 from discordant cells" in {
    // 2 rows (T,F), 6 rows (F,T), 3 concordant -> (|2-6|-1)^2/8 = 1.125
    val df = (Seq.fill(2)((true, false)) ++ Seq.fill(6)((false, true)) ++
      Seq.fill(3)((true, true))).toDF("ga", "gb")
    val r = Inference.mcnemar(df, col("ga"), col("gb")).collect()(0)
    r.getLong(0) shouldBe 11L
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 6L
    r.getDouble(3) shouldBe 1.125
  }

  it should "gate chi2 to NULL when there are no discordant pairs" in {
    val df = Seq((true, true), (false, false)).toDF("ga", "gb")
    Inference.mcnemar(df, col("ga"), col("gb")).collect()(0)
      .isNullAt(3) shouldBe true
  }

  it should "clamp the continuity correction to 0 on equal discordant cells" in {
    // n10 = n01 = 3: Edwards max(0, |b-c|-1) = 0, NOT (0-1)^2/(b+c)
    val df = (Seq.fill(3)((true, false)) ++ Seq.fill(3)((false, true)))
      .toDF("ga", "gb")
    Inference.mcnemar(df, col("ga"), col("gb")).collect()(0)
      .getDouble(3) shouldBe 0.0
  }

  behavior of "permutationTest"

  it should "give the minimal add-one p on a perfectly separated sample" in {
    // A side all 1000, B side all 0: no md5 reassignment reproduces the
    // perfect split, so n_ge = 0 and p = 1/65
    val docs = (0L until 40L).map(i => (i, if (i % 2 == 0) 1000L else 0L))
      .toDF("id", "v")
    val r = Inference.permutationTest(docs, col("v"), "id",
      col("id") % 2 === 0, reps = 64, seed = 14L).collect()(0)
    r.getLong(0) shouldBe 40L
    r.getLong(1) shouldBe 64L
    r.getLong(2) shouldBe 64L // every rep keeps both sides at n = 40
    r.getDouble(3) shouldBe 1000.0
    r.getLong(4) shouldBe 0L
    r.getDouble(5) shouldBe math.rint(1e6 / 65.0) / 1e6
  }

  it should "span blocks identically when reps exceed one 128-bit digest" in {
    // reps = 130 exercises the blk = 1 branch (bits 128, 129 read the
    // SECOND md5); the statistic stays well-defined and kept <= reps
    val docs = (0L until 40L).map(i => (i, if (i % 2 == 0) 1000L else 0L))
      .toDF("id", "v")
    val r = Inference.permutationTest(docs, col("v"), "id",
      col("id") % 2 === 0, reps = 130, seed = 14L).collect()(0)
    r.getLong(1) shouldBe 130L
    r.getLong(2) shouldBe 130L
    r.getLong(4) shouldBe 0L
    r.getDouble(5) shouldBe math.rint(1e6 / 131.0) / 1e6
  }

  it should "gate outputs to NULL when the observed split empties a side" in {
    val docs = (0L until 8L).map(i => (i, i * 10L)).toDF("id", "v")
    val r = Inference.permutationTest(docs, col("v"), "id",
      col("id") < 0L, reps = 8, seed = 14L).collect()(0)
    r.getLong(0) shouldBe 8L
    r.isNullAt(3) shouldBe true // obs_diff
    r.isNullAt(4) shouldBe true // n_ge
    r.isNullAt(5) shouldBe true // p_value
  }

  it should "still emit ONE stated-NULL row when every rep is dropped" in {
    // n = 1: every hash assignment puts the lone row on one side, so
    // reps_kept = 0 — the row must survive with NULL n_ge/p_value, not
    // vanish into an empty frame
    val docs = Seq((1L, 5L)).toDF("id", "v")
    val out = Inference.permutationTest(docs, col("v"), "id",
      col("id") % 2 === 0, reps = 8, seed = 14L).collect()
    out.length shouldBe 1
    out(0).getLong(0) shouldBe 1L
    out(0).getLong(2) shouldBe 0L // reps_kept
    out(0).isNullAt(4) shouldBe true
    out(0).isNullAt(5) shouldBe true
  }

  it should "reject a reps count beyond the guard" in {
    val docs = Seq((1L, 2L)).toDF("id", "v")
    an[IllegalArgumentException] should be thrownBy
      Inference.permutationTest(docs, col("v"), "id",
        col("id") % 2 === 0, reps = 2048)
  }

  behavior of "yuleWalkerAr2"

  it should "fit the alternating series and forecast from the frontier" in {
    // x = [1,2,1,2,1,2]: r1 = -5/6, r2 = 2/3 (mirror chain below)
    val r = Inference.yuleWalkerAr2(
      hourlyEvents("a" -> Seq(1, 2, 1, 2, 1, 2))).collect()(0)
    r.getLong(1) shouldBe 6L
    val r1 = -1.25 / 1.5; val r2 = 1.0 / 1.5
    val den = 1.0 - r1 * r1
    val phi1 = r1 * (1.0 - r2) / den
    val phi2 = (r2 - r1 * r1) / den
    val fc = 1.5 + phi1 * (2.0 - 1.5) + phi2 * (1.0 - 1.5)
    r.getDouble(2) shouldBe math.rint(r1 * 1e6) / 1e6 +- 1e-9
    r.getDouble(3) shouldBe math.rint(r2 * 1e6) / 1e6 +- 1e-9
    r.getDouble(4) shouldBe math.rint(phi1 * 1e6) / 1e6 +- 1e-9
    r.getDouble(5) shouldBe math.rint(phi2 * 1e6) / 1e6 +- 1e-9
    r.getDouble(6) shouldBe math.rint(fc * 1e6) / 1e6 +- 1e-9
  }

  it should "gate everything to NULL on a too-short series" in {
    val r = Inference.yuleWalkerAr2(hourlyEvents("a" -> Seq(3, 4)))
      .collect()(0)
    (2 to 6).foreach(i => r.isNullAt(i) shouldBe true)
  }

  behavior of "pacfDl"

  it should "match the Durbin-Levinson closed form on the alternating series" in {
    val r = Inference.pacfDl(
      hourlyEvents("a" -> Seq(1, 2, 1, 2, 1, 2, 1, 2))).collect()(0)
    // mirror: n=8, mean=1.5, c0=2.0; lag sums of (x-m)(x'-m):
    // l1: 7 pairs each -0.25; l2: 6 pairs each +0.25; l3: 5 pairs -0.25
    val r1 = -1.75 / 2.0; val r2 = 1.5 / 2.0; val r3 = -1.25 / 2.0
    val den2 = 1.0 - r1 * r1
    val p2 = (r2 - r1 * r1) / den2
    val p21 = r1 * (1.0 - p2)
    val den3 = 1.0 - p21 * r1 - p2 * r2
    val p3 = (r3 - p21 * r2 - p2 * r1) / den3
    r.getDouble(2) shouldBe math.rint(r1 * 1e6) / 1e6 +- 1e-9
    r.getDouble(5) shouldBe math.rint(r1 * 1e6) / 1e6 +- 1e-9
    r.getDouble(6) shouldBe math.rint(p2 * 1e6) / 1e6 +- 1e-9
    r.getDouble(7) shouldBe math.rint(p3 * 1e6) / 1e6 +- 1e-9
  }

  it should "gate lag-3 outputs to NULL when no lag-3 pairs exist" in {
    val r = Inference.pacfDl(hourlyEvents("a" -> Seq(1, 2, 3)))
      .collect()(0)
    r.isNullAt(4) shouldBe true // r3
    r.isNullAt(7) shouldBe true // pacf3
  }

  behavior of "grangerF"

  it should "NULL the F on a perfect fit (rss_full = 0) and keep rss_restricted" in {
    // y_t equals x_{t-1} exactly -> full model residual 0 -> gated NULL
    val ev = hourlyEvents(
      "click" -> Seq(2, 3, 2, 3, 2, 3),
      "purchase" -> Seq(1, 2, 3, 2, 3, 2))
    val r = Inference.grangerF(ev, "click", "purchase").collect()(0)
    r.getLong(0) shouldBe 5L
    r.isNullAt(5) shouldBe true // f_stat gated: rss_full == 0
    r.isNullAt(3) shouldBe false // rss_restricted still reported
  }

  it should "report a positive F when the cause adds signal over noise" in {
    // y tracks x_{t-1} with one perturbed point so rss_full > 0
    val ev = hourlyEvents(
      "click" -> Seq(2, 5, 2, 5, 2, 5, 2, 5),
      "purchase" -> Seq(1, 2, 5, 2, 5, 3, 5, 2))
    val r = Inference.grangerF(ev, "click", "purchase").collect()(0)
    r.getLong(0) shouldBe 7L
    assert(!r.isNullAt(5) && r.getDouble(5) > 0.0)
    // nested models: restricted RSS can never beat the full one
    assert(r.getDouble(3) >= r.getDouble(4))
  }

  behavior of "hurstExponent"

  it should "use complete blocks only and replicate the fitted H per row" in {
    // 8 observed hours, windows 2 and 4 -> 4 and 2 complete blocks
    val ev = hourlyEvents("a" -> Seq(1, 3, 2, 6, 1, 4, 2, 7))
    val out = Inference.hurstExponent(ev, windows = Seq(2, 4)).collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L, 4L)
    out.map(_.getLong(1)).toSeq shouldBe Seq(4L, 2L)
    val hs = out.map(_.getDouble(3)).distinct
    hs.length shouldBe 1 // one fitted H replicated on every window row
  }

  it should "return an empty frame on a constant series (all S = 0)" in {
    val ev = hourlyEvents("a" -> Seq(5, 5, 5, 5, 5, 5, 5, 5))
    Inference.hurstExponent(ev, windows = Seq(2, 4)).count() shouldBe 0L
  }

  behavior of "adUniformity"

  it should "match the rank-weight mirror on an exactly uniform sample" in {
    // ts = 0..999: span 1000, width 1, one count per cell
    val ev = (0L until 1000L).map(t => ("e", t)).toDF("event_type", "ts")
    val r = Inference.adUniformity(ev, cells = 1000).collect()(0)
    r.getLong(0) shouldBe 1000L
    r.getLong(1) shouldBe 1000L
    r.getLong(2) shouldBe 1000L
    // mirror fold: c=1 per cell i, rank prefix r=i
    var s = 0.0
    for (i <- 0 until 1000) {
      val f = (i + 0.5) / 1000.0
      s += (2.0 * i + 1.0) * math.log(f) +
        (2000.0 - 2.0 * i - 1.0) * math.log(1.0 - f)
    }
    val a2 = -1000.0 - s / 1000.0
    r.getDouble(3) shouldBe math.rint(a2 * 1e6) / 1e6 +- 1e-9
  }

  it should "collapse all-identical timestamps into one cell" in {
    val ev = Seq(("e", 42L), ("e", 42L), ("e", 42L)).toDF("event_type", "ts")
    val r = Inference.adUniformity(ev, cells = 1000).collect()(0)
    r.getLong(1) shouldBe 1L // one occupied cell
    val f = 0.5 / 1000.0
    val s = 3.0 * 3.0 * math.log(f) + 3.0 * 3.0 * math.log(1.0 - f)
    val a2 = -3.0 - s / 3.0
    r.getDouble(3) shouldBe math.rint(a2 * 1e6) / 1e6 +- 1e-9
  }
}
