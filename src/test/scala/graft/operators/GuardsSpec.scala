package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sub-split whale guard shared by the embedding-blocked quadratic
  * operators (knnGraph / embeddingNearDup / semanticDedup). */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  "Guards.subSplit" should "leave blocks at or under the cap in one sub-block" in {
    val df = (0L until 30L).map(i => (i, (i % 3).toString)).toDF("id", "block")
    val r = Guards.subSplit(df, "block", "id", maxSize = 10)
      .select("block", "__sub").as[(String, Long)].collect()
    r.length shouldBe 30
    all(r.map(_._2)) shouldBe 0L
  }

  it should "split a whale block into ceil(n/maxSize) hash sub-blocks" in {
    // one whale block of 40 rows + a small block of 3
    val df = ((0L until 40L).map(i => (i, "whale")) ++
      (100L until 103L).map(i => (i, "small"))).toDF("id", "block")
    val r = Guards.subSplit(df, "block", "id", maxSize = 10)
      .select("block", "__sub").as[(String, Long)].collect()
    val whaleSubs = r.filter(_._1 == "whale").map(_._2)
    val smallSubs = r.filter(_._1 == "small").map(_._2)
    all(smallSubs) shouldBe 0L
    // ceil(40/10) = 4 sub-blocks, ids hash-spread across all of them
    all(whaleSubs) should (be >= 0L and be < 4L)
    whaleSubs.distinct.length shouldBe 4
    // hash assignment keeps every sub-block well under the unsplit size
    whaleSubs.groupBy(identity).values.map(_.length).max should be < 25
  }

  it should "bound knnGraph's per-cell candidate work under a skewed corpus" in {
    // 60 vectors, ALL landing in anchor 0's cell (every vector ~ (1, eps))
    val vecs = (0L until 60L)
      .map(i => (i, Seq(1f, (i % 7).toFloat / 100f)))
      .toDF("vec_id", "embedding")
    val anchors = Seq((0L, Seq(1f, 0f)), (1L, Seq(-1f, 0f)))
    val unguarded = Similarity.knnGraph(vecs, anchors, k = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    unguarded.length shouldBe 60 * 59 // the quadratic the guard exists to cap
    val guarded = Similarity.knnGraph(vecs, anchors, k = 100, maxCellSize = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // ceil(60/10) = 6 sub-cells: each query only meets its ~10 sub-cell
    // mates, so candidate volume drops ~6x; pairs stay within the cell
    guarded.length should be < (60 * 59) / 3
    guarded.length should be > 0
    val bySub = guarded.groupBy(_._1).values.map(_.length)
    bySub.max should be < 30 // no query sees anywhere near the whole cell
  }

  it should "keep embeddingNearDup results identical while no block exceeds the cap" in {
    val vecs = (0L until 20L)
      .map(i => (i, s"b${i % 2}", Seq(1f, i.toFloat / 20f)))
      .toDF("vec_id", "label", "embedding")
    def run(cap: Int) = Dedup.embeddingNearDup(vecs, "label", 0.5, maxBlockSize = cap)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().sorted.toSeq
    run(100000) shouldBe run(10) // both blocks have 10 rows: cap idle at 10
    // and a firing cap yields a subset of the idle pairs (never new pairs)
    val fired = run(3).map(p => (p._1, p._2)).toSet
    val idle = run(100000).map(p => (p._1, p._2)).toSet
    fired.subsetOf(idle) shouldBe true
  }

  it should "keep multi-probe LSH monotone in nProbe even when the bucket guard fires" in {
    // 30 near-parallel vectors -> ONE sign-LSH bucket, over the cap of 8.
    // The census counts PRIMARY rows only, so nProbe=1 and nProbe=2 make
    // the identical split decision and probing can only add pairs
    val vecs = (0L until 30L)
      .map(i => (i, Seq(1f, (i % 5).toFloat / 100f, 0.5f, 0.1f)))
      .toDF("vec_id", "embedding")
    def pairs(nProbe: Int) = Dedup.embeddingNearDupLshMultiProbe(
      vecs, 0.5, nPlanes = 4, nProbe = nProbe, dim = 4, maxBucketSize = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val p1 = pairs(1)
    val p2 = pairs(2)
    p1 should not be empty
    p1.subsetOf(p2) shouldBe true
  }

  it should "keep semanticDedup bounded and conservative under a whale cell" in {
    // all 40 vectors near-identical -> one whale cell, everyone a near-dup
    val vecs = (0L until 40L)
      .map(i => (i, Seq(1f, (i % 3).toFloat / 1000f)))
      .toDF("vec_id", "embedding")
    val anchors = Seq((0L, Seq(1f, 0f)))
    val idle = Dedup.semanticDedup(vecs, anchors, 0.9)
      .filter(col("kept")).count()
    idle shouldBe 1 // unguarded: only the smallest id survives
    val fired = Dedup.semanticDedup(vecs, anchors, 0.9, maxCellSize = 8)
      .filter(col("kept")).count()
    // sub-splitting keeps the min id OF EACH SUB-CELL: >= 1, <= nSub = 5,
    // and never drops a row the unguarded pass would keep
    fired should be >= 1L
    fired should be <= 5L
  }
}
