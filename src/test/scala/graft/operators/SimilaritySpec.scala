package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1f, 0f)),
    (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0f, 1f)),
    (3L, Seq(0.1f, 0.9f)),
    (4L, Seq(-1f, 0f))
  ).toDF("vec_id", "embedding")

  "bruteForceTopK" should "rank neighbors by cosine, excluding self" in {
    val r = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    r shouldBe Array(1L, 3L) // cos: 1→0.994, 3→0.110, 2→0, 4→−1
  }

  "cellOf" should "assign each vector to its argmax-cosine anchor" in {
    val anchors = Seq((0L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val r = vecs.select(col("vec_id"),
      Similarity.cellOf(anchors, col("embedding")).as("cell"))
      .as[(Long, Long)].collect().toMap
    r(0L) shouldBe 0L
    r(1L) shouldBe 0L
    r(2L) shouldBe 2L
    r(3L) shouldBe 2L
  }

  "ivfTopK" should "only search within the query's cell" in {
    val anchors = vecs.filter(col("vec_id").isin(0L, 2L))
    val r = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 1), anchors, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    // query 1 lives in cell 0; its only cell-mate is 0 — 2,3 are in cell 2,
    // and 4 (−1,0) also lands in cell 2 (cos −1 vs 0)
    r shouldBe Set(0L)
  }

  it should "produce a plan without a cross join or extra shuffle for assignment" in {
    val anchors = vecs.filter(col("vec_id").isin(0L, 2L))
    val plan = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 1), anchors, k = 3)
      .queryExecution.optimizedPlan.toString
    plan.toLowerCase should not include "cartesianproduct"
    plan.toLowerCase should not include "cross"
  }

  "knnGraph" should "give every vector its top-k same-cell neighbors" in {
    val anchors = Seq((0L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val r = Similarity.knnGraph(vecs, anchors, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // cell 0 holds {0, 1}; cell 2 holds {2, 3, 4}
    r(0L) shouldBe 1L
    r(1L) shouldBe 0L
    // 2=(0,1) and 3=(0.1,1): mutual nearest within cell 2; 4=(-1,0) picks
    // 3 over 2 by cosine (slightly positive vs 0), not by id
    r(2L) shouldBe 3L
    r(3L) shouldBe 2L
    r(4L) should (be(2L) or be(3L))
    // the graph never crosses cells
    val pairs = Similarity.knnGraph(vecs, anchors, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val cellOfId = Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 2L)
    pairs.foreach { case (q, n) => cellOfId(q) shouldBe cellOfId(n) }
  }

  it should "stay an equi-join plan (no cartesian product)" in {
    val anchors = Seq((0L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val plan = Similarity.knnGraph(vecs, anchors, k = 2)
      .queryExecution.optimizedPlan.toString
    plan.toLowerCase should not include "cartesianproduct"
  }

  "randomProjection" should "be a deterministic row-local projection that roughly preserves distances" in {
    val n = 200
    val dim = 32
    val rnd = new scala.util.Random(11)
    val emb = (0L until n.toLong)
      .map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(emb, dim, outDim = 16, seed = 7L)
    // deterministic: same seed, same output
    val a = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Similarity.randomProjection(emb, dim, outDim = 16, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    b shouldBe a
    // row-local: no exchange, no join in the plan
    val plan = proj.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
    // JL property (statistical): projected pairwise squared distances
    // concentrate around the originals — check the mean ratio over a
    // pair sample is near 1 (loose band; 16 dims is a noisy estimator)
    val orig = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val ratios = for {
      i <- 0L until 50L
      j = i + 100L
    } yield d2(a(i), a(j)) /
      d2(orig(i).map(_.toDouble), orig(j).map(_.toDouble))
    val mean = ratios.sum / ratios.size
    mean should (be > 0.7 and be < 1.3)
  }

  "gramMatrix" should "match a naive exact co-moment computation" in {
    val d = 4
    val rnd = new scala.util.Random(11)
    val data = (0L until 40L).map(i =>
      (i, Seq.fill(d)((rnd.nextInt(2001) - 1000) / 1000.0f)))
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.gramMatrix(df, d = d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // naive: replicate quantization (scale = max|v|/127, floor(v/s + .5))
    def quant(v: Seq[Float]): Seq[Long] = {
      val s = v.map(x => math.abs(x)).max.toDouble / 127.0
      v.map(x => if (s == 0.0) 0L else math.floor(x.toDouble / s + 0.5).toLong)
    }
    val qs = data.map(x => quant(x._2))
    for (i <- 0 until d; j <- i until d) {
      val expected = (
        qs.size.toLong,
        qs.map(_(i)).sum,
        qs.map(_(j)).sum,
        qs.map(q => q(i) * q(j)).sum)
      withClue(s"($i,$j): ") { got((i.toLong, j.toLong)) shouldBe expected }
    }
    got.size shouldBe d * (d + 1) / 2
  }

  "jacobiEigen" should "diagonalize a known symmetric matrix" in {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)/√2) and 1
    val (vals, vecs2) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    vals(0) shouldBe 3.0 +- 1e-12
    vals(1) shouldBe 1.0 +- 1e-12
    math.abs(vecs2(0)(0)) shouldBe (1.0 / math.sqrt(2)) +- 1e-12
    vecs2(0)(0) shouldBe vecs2(0)(1) +- 1e-12 // (1,1) direction
  }

  it should "produce an orthonormal basis that reconstructs the matrix" in {
    val rnd = new scala.util.Random(5)
    val d = 8
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() - 0.5
      m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs8) = Similarity.jacobiEigen(m)
    // orthonormal rows
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(k => vecs8(a)(k) * vecs8(b)(k)).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-10
    }
    // eigen residual ‖M e − λ e‖∞ ≈ 0, eigenvalues descending
    for (a <- 0 until d) {
      for (i <- 0 until d) {
        val mei = (0 until d).map(k => m(i)(k) * vecs8(a)(k)).sum
        mei shouldBe (vals(a) * vecs8(a)(i)) +- 1e-10
      }
      if (a > 0) vals(a - 1) should be >= vals(a)
    }
  }

  "pcaProject" should "align PC1 with the planted variance direction, deterministically" in {
    // corpus stretched along (1,1,0,0)/√2 with small noise elsewhere:
    // PC1 must capture that axis and carry the dominant variance
    val rnd = new scala.util.Random(9)
    val d = 4
    val data = (0L until 300L).map { i =>
      val t = (rnd.nextDouble() - 0.5) * 2.0
      (i, Seq(
        (t + 0.01 * rnd.nextGaussian()).toFloat,
        (t + 0.01 * rnd.nextGaussian()).toFloat,
        (0.02 * rnd.nextGaussian()).toFloat,
        (0.02 * rnd.nextGaussian()).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val p = Similarity.pcaProject(df, d = d, k = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def variance(xs: Seq[Double]) = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    val v1 = variance(p.values.map(_(0)).toSeq)
    val v2 = variance(p.values.map(_(1)).toSeq)
    v1 should be > 50.0 * v2 // planted axis dominates
    // PC1 ordering agrees with the planted coordinate up to global sign
    val planted = data.map(x => x._1 -> (x._2(0) + x._2(1))).toMap
    val ids = data.map(_._1)
    val corr = {
      val a = ids.map(planted(_).toDouble)
      val b = ids.map(p(_)(0))
      val (ma, mb) = (a.sum / a.size, b.sum / b.size)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
        b.map(y => (y - mb) * (y - mb)).sum)
    }
    math.abs(corr) should be > 0.99
    // deterministic end to end: a second run reproduces identical doubles
    val p2 = Similarity.pcaProject(df, d = d, k = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    p2 shouldBe p
  }
}
