package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quality (not just correctness) of the approximate-NN paths: measure
  * recall@k of IVF against the exact brute-force ranking on the real
  * embeddings testdata. ANN operators that silently return garbage pass
  * row-count checks; this pins the accuracy floor. */
class AnnRecallSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  "ivfTopK" should "retain reasonable recall@10 vs brute force" in {
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10
    val exact = neighbors(Similarity.bruteForceTopK(emb, queries, k))
    // 4 anchors ⇒ ~4 cells; nprobe=1 searches the query's own cell only
    val approx = neighbors(
      Similarity.ivfTopK(emb, queries, emb.filter(col("vec_id") < 4), k))
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // random 64-d embeddings spread across 4 cells: a same-cell search
    // still has to find a meaningful share of the true neighbors
    mean should be > 0.2
    // and every returned neighbor must actually share the query's cell —
    // sanity that the approximation error is the *designed* one
    approx.values.foreach(_.size should be <= k)

    // nprobe is the recall knob: probing more cells can only widen the
    // candidate set, so recall must not degrade
    val approx2 = neighbors(Similarity.ivfTopK(
      emb, queries, emb.filter(col("vec_id") < 4), k, nprobe = 2))
    val mean2 = exact.map { case (q, truth) =>
      approx2.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }.sum / exact.size
    mean2 should be >= mean
    // probing every cell recovers the exact ranking
    val approxAll = neighbors(Similarity.ivfTopK(
      emb, queries, emb.filter(col("vec_id") < 4), k, nprobe = 4))
    approxAll shouldBe exact
  }

  "kmeansAnchors" should "refine cells so recall does not regress vs sampled anchors" in {
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10
    val exact = neighbors(Similarity.bruteForceTopK(emb, queries, k))
    def meanRecall(approx: Map[Long, Set[Long]]): Double =
      exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size

    val sampledRecall = meanRecall(neighbors(
      Similarity.ivfTopK(emb, queries, emb.filter(col("vec_id") < 4), k, nprobe = 2)))
    val kmeansRecall = meanRecall(neighbors(
      Similarity.ivfTopKKmeans(emb, queries, nCells = 4, k = k, iters = 4, nprobe = 2)))
    // Lloyd refinement tightens cells around the data's clusters; on random
    // data it must at least hold the line vs arbitrary sampled anchors
    kmeansRecall should be >= (sampledRecall - 0.05)
    kmeansRecall should be > 0.2

    // determinism: the seeded init + deterministic assignment must yield
    // identical anchors across runs
    val a1 = Similarity.kmeansAnchors(emb, 4, iters = 2)
    val a2 = Similarity.kmeansAnchors(emb, 4, iters = 2)
    a1 shouldBe a2
  }

  it should "train bit-identical centroids under any partitioning" in {
    // the r17 close caught trained-anchor literals flipping last bits
    // between JVMs: a double moment-sum merges partials in shuffle-fetch
    // order. The decimal(38,10) fold is order-independent, so training
    // over different partition counts/layouts must agree EXACTLY — not
    // approximately — and so must the PQ codebook trainer
    val save = spark.conf.get("spark.sql.shuffle.partitions")
    val a1 = Similarity.kmeansAnchors(emb.repartition(3), 4, iters = 3)
    val c1 = Similarity.pqTrainKmeans(emb.repartition(3), 4, 8, 64, iters = 2)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val a2 = Similarity.kmeansAnchors(emb.repartition(11), 4, iters = 3)
      val c2 = Similarity.pqTrainKmeans(emb.repartition(11), 4, 8, 64, iters = 2)
      a2 shouldBe a1
      c2 shouldBe c1
    } finally spark.conf.set("spark.sql.shuffle.partitions", save)
  }

  "pqTrainKmeans" should "not regress recall@10 vs the seed codebook" in {
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10
    // PQ scores under L2; compare against the exact L2 ranking (cosine
    // and L2 rankings differ for unnormalized vectors)
    val exactL2 = neighbors(Similarity.exactTopKL2(emb, queries, k))
    def meanRecall(approx: Map[Long, Set[Long]]): Double =
      exactL2.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exactL2.size
    val seedCb = Similarity.pqTrainSeed(emb, m = 8, kPerSub = 16, dim = 64)
    val trainedCb = Similarity.pqTrainKmeans(emb, m = 8, kPerSub = 16, dim = 64, iters = 3)
    // the DIRECT training objective, deterministic at any SF: Lloyd
    // refinement must cut quantization distortion (mean Σ_s min_c
    // ‖slice_s − c‖²) vs the arbitrary first-16 seed slices
    val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0)).toSeq
    val (seedDist, trainedDist) =
      (Similarity.pqDistortion(vecs, seedCb), Similarity.pqDistortion(vecs, trainedCb))
    info(f"pq distortion: seed $seedDist%.3f, trained $trainedDist%.3f")
    trainedDist should be < seedDist
    // recall@10 downstream of distortion — noisy at this tiny SF (the
    // 200k StressScale point records the at-scale comparison), so the
    // spec only pins a floor and no-collapse vs seed
    val seedRecall = meanRecall(neighbors(
      Similarity.pqTopKRerank(emb, queries, seedCb, k, shortlist = 50)))
    val trainedRecall = meanRecall(neighbors(
      Similarity.pqTopKRerank(emb, queries, trainedCb, k, shortlist = 50)))
    info(f"pq recall@10: seed $seedRecall%.3f, trained $trainedRecall%.3f")
    trainedRecall should be >= (seedRecall - 0.15)
    trainedRecall should be > 0.3
    // training is deterministic (seeded init, deterministic assignment)
    Similarity.pqTrainKmeans(emb, 8, 16, 64, iters = 2) shouldBe
      Similarity.pqTrainKmeans(emb, 8, 16, 64, iters = 2)
  }

  "pqDistortionDistributed" should "agree with the driver-side distortion" in {
    // the one-pass codegen'd audit (NearestCellL2DistF) must compute the
    // SAME objective as the collected-sample fold — same slices, same
    // argmin ties — up to IEEE partial-sum order across partitions
    val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0)).toSeq
    val seedCb = Similarity.pqTrainSeed(emb, m = 8, kPerSub = 16, dim = 64)
    val driver = Similarity.pqDistortion(vecs, seedCb)
    val dist = Similarity.pqDistortionDistributed(emb, seedCb)
    dist shouldBe driver +- math.abs(driver) * 1e-9
  }

  "coarseDistortionL2" should "agree with a manual min-L2 mean" in {
    val anchors = Similarity.kmeansAnchors(emb, k = 4, iters = 1, l2Assign = true)
    val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0)).toSeq
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val manual = vecs.map(v => anchors.map(a => l2(v, a._2)).min).sum / vecs.size
    val dist = Similarity.coarseDistortionL2(emb, anchors)
    dist shouldBe manual +- math.abs(manual) * 1e-9
  }

  "ivfPqTopK" should "hold an L2 recall floor and not collapse when probing wider" in {
    import org.apache.spark.sql.DataFrame
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10
    val exact = neighbors(Similarity.exactTopKL2(emb, queries, k))
    val anchors = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("bigint"), col("embedding")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val res = Similarity.ivfResiduals(emb, anchors)
    val cb = Similarity.pqTrainSeed(res, m = 8, kPerSub = 16, dim = 64, vecCol = "rv")
    def recallAt(df: DataFrame): Double = {
      val approx = neighbors(df)
      exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
    }
    val r1 = recallAt(Similarity.ivfPqTopK(emb, queries, anchors, cb, k, nProbe = 1))
    val r2 = recallAt(Similarity.ivfPqTopK(emb, queries, anchors, cb, k, nProbe = 2))
    val r4 = recallAt(Similarity.ivfPqTopK(emb, queries, anchors, cb, k, nProbe = 4))
    info(f"ivfpq recall@10: nProbe=1 $r1%.3f, 2 $r2%.3f, 4 $r4%.3f")
    // near-random 64-d embeddings are the worst case for any coarse+PQ
    // stack (see the flat-PQ floor above); residual coding must still
    // beat noise, and widening the probe must not collapse recall (top-k
    // over a candidate superset can shuffle individual neighbors, so
    // strict monotonicity is NOT guaranteed — a small slack is)
    withClue(f"nProbe=1 recall $r1%.3f: ") { r1 should be >= 0.1 }
    r2 should be >= r1 - 0.1
    r4 should be >= r2 - 0.1

    // trained tier: Lloyd coarse anchors (L2) + Lloyd residual codebook.
    // Recall must not collapse vs the seed tier (near-random data keeps
    // both concentration-limited — same slack as the flat-PQ comparison)
    val ta = Similarity.kmeansAnchors(emb, k = 4, iters = 2, l2Assign = true)
    val tres = Similarity.ivfResiduals(emb, ta)
    val tcb = Similarity.pqTrainKmeans(tres, m = 8, kPerSub = 16, dim = 64,
      iters = 2, vecCol = "rv")
    val rt = recallAt(Similarity.ivfPqTopK(emb, queries, ta, tcb, k, nProbe = 2))
    info(f"ivfpq trained recall@10: nProbe=2 $rt%.3f (seed $r2%.3f)")
    rt should be >= r2 - 0.15
  }

  "hardNegatives" should "exclude the dup band, rank after exclusion, and reduce to knnGraph when vacuous" in {
    val anchors = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("bigint"), col("embedding")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val hn = Similarity.hardNegatives(emb, anchors, k = 5, dupThreshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    hn should not be empty
    // no returned negative sits in the duplicate band
    hn.foreach { case (_, _, cos, _) => cos should be < 0.2 }
    // ranks are contiguous from 1 after the exclusion
    hn.groupBy(_._1).values.foreach { rows =>
      rows.map(_._4).sorted shouldBe (1 to rows.length)
    }
    // a vacuous threshold reduces exactly to the kNN graph
    val vac = Similarity.hardNegatives(emb, anchors, k = 5, dupThreshold = 2.0)
      .collect().map(_.toSeq).toSet
    val g = Similarity.knnGraph(emb, anchors, k = 5)
      .collect().map(_.toSeq).toSet
    vac shouldBe g
  }

  "embeddingNearDupLsh" should "recover most high-cosine pairs found by exhaustive search" in {
    import spark.implicits._
    val t = 0.3
    val v = emb.select(col("vec_id"), col("embedding"), lit(1).as("all"))
    val exhaustive = Dedup.embeddingNearDup(v, "all", t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 4 planes = 16 buckets: coarse enough to keep decent recall
    val lsh = Dedup.embeddingNearDupLsh(emb, t, nPlanes = 4, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    if (exhaustive.nonEmpty) {
      val recall = lsh.intersect(exhaustive).size.toDouble / exhaustive.size
      recall should be > 0.05 // sign-LSH with 4 planes on random vectors
      lsh.diff(exhaustive) shouldBe empty // no false positives above t
    }
  }

  "embeddingNearDupLshMultiProbe" should "lift recall over single-probe at linear probe cost" in {
    import spark.implicits._
    val t = 0.3
    val v = emb.select(col("vec_id"), col("embedding"), lit(1).as("all"))
    val exhaustive = Dedup.embeddingNearDup(v, "all", t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def pairsAt(nProbe: Int): Set[(Long, Long)] =
      Dedup.embeddingNearDupLshMultiProbe(emb, t, nPlanes = 8, nProbe = nProbe, dim = 64)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val p1 = pairsAt(1)
    val p2 = pairsAt(2)
    val p4 = pairsAt(4)
    // nProbe=1 reduces exactly to the single-probe pair set
    val single = Dedup.embeddingNearDupLsh(emb, t, nPlanes = 8, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    p1 shouldBe single
    // probing can only widen the candidate set
    p1.subsetOf(p2) shouldBe true
    p2.subsetOf(p4) shouldBe true
    if (exhaustive.nonEmpty) {
      def recall(s: Set[(Long, Long)]) =
        s.intersect(exhaustive).size.toDouble / exhaustive.size
      info(f"recall nProbe=1 ${recall(p1)}%.3f, 2 ${recall(p2)}%.3f, 4 ${recall(p4)}%.3f")
      recall(p4) should be >= recall(p1)
      recall(p2) should be > recall(p1) // 8 planes, random 64-d: flips help
      // every reported pair is a true pair (exact cosine inside buckets)
      p4.diff(exhaustive) shouldBe empty
    }
  }

  behavior of "ivfCalibration"

  it should "report recall non-decreasing in nprobe and exactly 1 at full probe" in {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") % 97 === 0)
    val anchors = e.filter(col("vec_id") < 4)
    val rows = Similarity.ivfCalibration(e, queries, anchors,
      k = 5, nprobes = Seq(1, 2, 4))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    rows(1L) should be <= rows(2L)
    rows(2L) should be <= rows(4L)
    // nprobe = nCells probes every cell ⇒ the candidate set is the whole
    // corpus ⇒ IVF == brute ⇒ recall exactly 1
    rows(4L) shouldBe 1.0
  }
}
