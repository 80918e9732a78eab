package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "rrfFuse"

  it should "rank consensus docs above single-leg docs with exact scores" in {
    val sparse = Seq((10L, 3.0), (20L, 2.0), (30L, 1.0)).toDF("doc_id", "score")
    val dense = Seq((20L, 0.9), (40L, 0.5)).toDF("doc_id", "score")
    val r = Retrieval.rrfFuse(Seq(("bm25", sparse), ("dense", dense)))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // doc 20 is sparse rank 2 and dense rank 1: 1/(60+2) + 1/(60+1)
    r(20L)._1 shouldBe 2L
    r(20L)._2 shouldBe
      BigDecimal(1.0 / 62.0 + 1.0 / 61.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r(10L)._1 shouldBe 1L
    // consensus beats both single-leg rank-1 contributions
    r(20L)._2 should be > r(10L)._2
    r(20L)._2 should be > r(40L)._2
  }

  it should "cut to topK under the total order and reject duplicate names" in {
    val leg = (1L to 50L).map(i => (i, 100.0 - i)).toDF("doc_id", "score")
    Retrieval.rrfFuse(Seq(("a", leg)), topK = 7).count() shouldBe 7L
    an[IllegalArgumentException] should be thrownBy
      Retrieval.rrfFuse(Seq(("a", leg), ("a", leg)))
  }

  behavior of "mmrRerank"

  // query direction (1,0,0); c2 is nearly a copy of c1, c3 is distinct
  private def cand3 = Seq(
    (0L, 1L, 0.9, Array(0.9f, 0.436f, 0.0f)),
    (0L, 2L, 0.89, Array(0.89f, 0.456f, 0.0f)),
    (0L, 3L, 0.85, Array(0.85f, -0.527f, 0.0f))
  ).toDF("query_id", "neighbor_id", "cosine", "embedding")

  it should "trade relevance for diversity at moderate lambda" in {
    val picks = Retrieval.mmrRerank(cand3, k = 2, lambda = 0.7)
      .orderBy("rank").collect().map(_.getLong(1))
    // rank 1 is the pure-relevance argmax; rank 2 skips the near-copy
    picks shouldBe Array(1L, 3L)
  }

  it should "reduce to pure relevance order at lambda = 1" in {
    val picks = Retrieval.mmrRerank(cand3, k = 3, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(1))
    picks shouldBe Array(1L, 2L, 3L)
  }

  it should "stop early for queries with fewer candidates than k" in {
    val cand = Seq(
      (0L, 1L, 0.9, Array(1.0f, 0.0f)),
      (0L, 2L, 0.8, Array(0.0f, 1.0f)),
      (1L, 7L, 0.5, Array(1.0f, 0.0f))
    ).toDF("query_id", "neighbor_id", "cosine", "embedding")
    val rows = Retrieval.mmrRerank(cand, k = 4, lambda = 0.7).collect()
    rows.count(_.getLong(0) == 0L) shouldBe 2
    rows.count(_.getLong(0) == 1L) shouldBe 1
  }

  behavior of "ndcgEval"

  it should "score 1 for the ideal order, less for a swap, with exact hand-checked gains" in {
    val rels = Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L))
      .toDF("doc_id", "rel")
    // ideal order 1,2,3: dcg = idcg → ndcg = 1
    val ideal = Seq((1L, 9.0), (2L, 8.0), (3L, 7.0)).toDF("doc_id", "score")
    val ri = Retrieval.ndcgEval(ideal, rels, k = 3).collect()(0)
    def g(rel: Long, d: Int) =
      (math.pow(2.0, rel.toDouble) - 1.0) / (math.log(d + 1.0) / math.log(2.0))
    val idcg = g(3, 1) + g(2, 2) + g(1, 3)
    ri.getDouble(1) shouldBe
      BigDecimal(idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    ri.getDouble(3) shouldBe 1.0
    // swapping ranks 1 and 3 must strictly lower ndcg
    val swapped = Seq((3L, 9.0), (2L, 8.0), (1L, 7.0)).toDF("doc_id", "score")
    val rs = Retrieval.ndcgEval(swapped, rels, k = 3).collect()(0)
    rs.getDouble(3) should be < 1.0
    rs.getDouble(3) shouldBe BigDecimal((g(1, 1) + g(2, 2) + g(3, 3)) / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // unlabeled docs read as relevance 0
    val stray = Seq((99L, 9.0)).toDF("doc_id", "score")
    Retrieval.ndcgEval(stray, rels, k = 3).collect()(0)
      .getDouble(1) shouldBe 0.0
  }

  behavior of "rboOverlap"

  it should "report 1 − p^k for identical lists, 0 for disjoint, and weight the top" in {
    val a = (1L to 10L).map(i => (i, 100.0 - i)).toDF("doc_id", "score")
    val same = Retrieval.rboOverlap(a, a, k = 10, p = 0.9).collect()(0)
    same.getLong(2) shouldBe 10L // n_common
    same.getDouble(3) shouldBe
      BigDecimal(1.0 - math.pow(0.9, 10.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-6
    val b = (11L to 20L).map(i => (i, 100.0 - i)).toDF("doc_id", "score")
    Retrieval.rboOverlap(a, b).collect()(0).getDouble(3) shouldBe 0.0
    // a swap at the TOP hurts more than the same swap at the bottom
    def perm(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (id, 100.0 - i) }
        .toDF("doc_id", "score")
    val base = (1L to 10L)
    val topSwap = Retrieval.rboOverlap(
      perm(base), perm(Seq(99L) ++ base.drop(1))).collect()(0).getDouble(3)
    val botSwap = Retrieval.rboOverlap(
      perm(base), perm(base.dropRight(1) :+ 99L)).collect()(0).getDouble(3)
    topSwap should be < botSwap
  }
}
