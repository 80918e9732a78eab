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
}
