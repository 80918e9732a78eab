package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence. */
  private def naive(
      edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 0 until iters) {
      val sums = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / out(src) }.sum).toMap
      r = nodes.map(n => n -> (150000L + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def run(
      edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
      parts: Int = 4): Map[Long, Long] =
    Graphs.pageRank(
      edges.toDF("src", "dst").repartition(parts),
      nodes.toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  behavior of "Graphs.pageRank"

  it should "match the exact integer recurrence on a hand-built graph" in {
    // hub-and-spoke plus a cycle and a dangling node (4 -> nothing after
    // its one edge; 5 is fully isolated)
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 1L, 3L -> 1L, 3L -> 2L, 4L -> 1L)
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    for (iters <- Seq(0, 1, 3, 5)) {
      withClue(s"iters=$iters: ") {
        run(edges, nodes, iters) shouldBe naive(edges, nodes, iters)
      }
    }
  }

  it should "keep the base rank on isolated nodes and be partitioning-invariant" in {
    val edges = (1L to 40L).map(i => i -> (i % 40 + 1))
    val nodes = (1L to 45L) // 41..45 isolated
    val a = run(edges, nodes, 3, parts = 1)
    val b = run(edges, nodes, 3, parts = 16)
    a shouldBe b
    (41L to 45L).foreach(n => a(n) shouldBe 150000L)
    // total mass never exceeds the initial 10^6 per node (truncating
    // divisions and dangling drop only lose mass)
    a.values.sum should be <= 1000000L * nodes.size
  }

  it should "rank the hub of a star above its spokes" in {
    val spokes = (2L to 20L)
    val edges = spokes.map(s => s -> 1L) ++ spokes.map(s => 1L -> s)
    val r = run(edges, (1L to 20L), 3)
    spokes.foreach(s => r(1L) should be > r(s))
  }

  behavior of "labelPropagation"

  private def lpa(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int) =
    Graphs.labelPropagation(
      edges.toDF("src", "dst"), nodes.toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  it should "split two bridged triangles that connected components would merge" in {
    // triangles {1,2,3} and {4,5,6} with one bridge 3-4; node 7 isolated.
    // Hand-rolled synchronous mode/min updates give {1,2,3}→1, {4,5,6}→3.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val r = lpa(edges, 1L to 7L, iters = 3)
    Seq(1L, 2L, 3L).map(r) shouldBe Seq(1L, 1L, 1L)
    Seq(4L, 5L, 6L).map(r) shouldBe Seq(3L, 3L, 3L)
    r(7L) shouldBe 7L // isolated node keeps its own label
  }

  it should "symmetrize directed edges so influence flows both ways" in {
    val r = lpa(Seq((1L, 2L)), Seq(1L, 2L), iters = 1)
    // each adopts the other's (only) neighbor label, then min rules
    r(1L) shouldBe 2L
    r(2L) shouldBe 1L
  }

  it should "be invariant to input partitioning" in {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    def run(parts: Int) = Graphs.labelPropagation(
      edges.toDF("src", "dst").repartition(parts), (0L until 40L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    run(2) shouldBe run(13)
  }

  behavior of "Graphs.triangles"

  /** Brute-force reference: count distinct unordered triples with all
    * three undirected edges present. */
  private def naiveTri(
      edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, (Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tris = nodes.combinations(3).filter { case Seq(a, b, c) =>
      adj.getOrElse(a, Set()).contains(b) &&
        adj.getOrElse(b, Set()).contains(c) &&
        adj.getOrElse(a, Set()).contains(c)
    }.toSeq
    nodes.map { n =>
      val d = adj.getOrElse(n, Set()).size.toLong
      val t = tris.count(_.contains(n)).toLong
      n -> (d, t)
    }.toMap
  }

  private def runTri(
      edges: Seq[(Long, Long)], nodes: Seq[Long],
      parts: Int = 4): Map[Long, (Long, Long, Long)] =
    Graphs.triangles(
      edges.toDF("src", "dst").repartition(parts), nodes.toDF("id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  it should "match the brute-force count on a hand-built graph" in {
    // two triangles sharing edge (1,2), one dangling spoke, one isolate
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 4L, 4L -> 2L, 2L -> 5L)
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val got = runTri(edges, nodes)
    val want = naiveTri(edges, nodes)
    nodes.foreach { n =>
      val (d, t, cc) = got(n)
      (d, t) shouldBe want(n)
      if (d >= 2) cc shouldBe 2L * t * 1000000L / (d * (d - 1)) else cc shouldBe 0L
    }
    got(1L)._2 shouldBe 2L // both triangles touch 1
    got(6L) shouldBe ((0L, 0L, 0L))
  }

  it should "count each triangle once regardless of edge direction or duplication" in {
    // the same triangle given in every direction twice over
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 3L -> 1L, 1L -> 3L,
      1L -> 2L, 2L -> 3L)
    val got = runTri(edges, Seq(1L, 2L, 3L))
    got.values.foreach { case (d, t, cc) =>
      d shouldBe 2L; t shouldBe 1L; cc shouldBe 1000000L
    }
  }

  it should "match brute force on a random graph and be partitioning-invariant" in {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    val nodes = (0L until 25L).toSeq
    val got = runTri(edges, nodes, parts = 3)
    got shouldBe runTri(edges, nodes, parts = 17)
    val want = naiveTri(edges, nodes)
    nodes.foreach { n => (got(n)._1, got(n)._2) shouldBe want(n) }
  }

  behavior of "Graphs.personalizedPageRank"

  it should "concentrate exact-integer rank around the seed set" in {
    // path 1→2→3 with node 4 isolated, seed {1}. Hand-unrolled:
    // r1 = (150000, 850000, 0); r2 = (150000, 127500, 722500);
    // r3 = (150000, 127500, 108375) — rank decays with seed distance,
    // the isolate holds 0
    val edges = Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val got = Graphs.personalizedPageRank(edges, nodes, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 150000L, 2L -> 127500L, 3L -> 108375L, 4L -> 0L)
  }

  it should "reduce to global pageRank when every node is a seed" in {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val ppr = Graphs.personalizedPageRank(edges, nodes, nodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graphs.pageRank(edges, nodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ppr shouldBe pr
  }

  behavior of "Graphs.kCore"

  /** Brute-force reference: peel until stable, any order (confluent). */
  private def naiveKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      val dead = adj.collect { case (n, nb) if nb.size < k => n }.toSet
      changed = dead.nonEmpty
      adj = adj.collect {
        case (n, nb) if !dead(n) => n -> (nb -- dead)
      }.filter(_._2.nonEmpty)
    }
    adj.map { case (n, nb) => n -> nb.size.toLong }
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Graphs.kCore(edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  it should "peel a hand-built graph to its 2-core" in {
    // triangle 1-2-3 with a pendant chain 3-4-5 and an isolate: the
    // 2-core is exactly the triangle, every member at core degree 2
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L)
    runKCore(edges, 2) shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    // no 3-core at all
    runKCore(edges, 3) shouldBe Map.empty
  }

  it should "match brute-force peeling on random graphs (confluence)" in {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 3) {
      val n = 30
      val edges = Seq.fill(80)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      for (k <- Seq(2, 3, 4))
        withClue(s"trial=$trial k=$k") {
          runKCore(edges, k) shouldBe naiveKCore(edges, k)
        }
    }
  }

  behavior of "linkPrediction"

  it should "score non-edges by 1/ln(deg) over common neighbors and skip existing edges" in {
    // path 1–2–3 plus 2–4: pairs through center 2 (deg 3): (1,3), (1,4),
    // (3,4), each scoring 1/ln(3); edge (1,2) etc. must never appear
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = Graphs.linkPrediction(edges, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val s = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.keySet shouldBe Set((1L, 3L), (1L, 4L), (3L, 4L))
    got.values.foreach(_ shouldBe ((1L, s)))
    // a closed triangle has NO non-edge pairs left to predict
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    Graphs.linkPrediction(tri, topK = 10).count() shouldBe 0L
    // two common neighbors add their contributions: square 1-2-3-4-1
    // predicts the diagonals with 2 wedges each
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val diag = Graphs.linkPrediction(sq, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    diag shouldBe Map((1L, 3L) -> 2L, (2L, 4L) -> 2L)
  }

  it should "exclude hub centers past maxWedgeDegree" in {
    // star: hub 0 linked to 1..9 (deg 9) — with the guard at 5 the hub
    // cannot be a wedge center, so no pairs survive
    val star = (1L to 9L).map(i => (0L, i)).toDF("src", "dst")
    Graphs.linkPrediction(star, topK = 100).count() shouldBe 36L
    Graphs.linkPrediction(star, topK = 100, maxWedgeDegree = 5)
      .count() shouldBe 0L
  }

  behavior of "bfsHops"

  it should "label minimum hop distance from a multi-source seed set" in {
    // 1→2→3→4→5 chain plus a shortcut 10→4; seeds {1, 10}:
    // 4 is 1 hop from 10 (not 3 hops from 1); 6 is unreachable
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 4L),
      (6L, 6L)).toDF("src", "dst")
    val seeds = Seq(1L, 10L, 10L).toDF("id") // dup seed collapses
    val got = Graphs.bfsHops(edges, seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 4L -> 1L,
      3L -> 2L, 5L -> 2L)
  }

  it should "stop at maxHops and at an exhausted frontier" in {
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val capped = Graphs.bfsHops(chain, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    capped shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)
    // frontier exhausts at hop 2 well before the cap
    val short = Graphs.bfsHops(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
      seeds, maxHops = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    short shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
  }

  behavior of "hopHistogram"

  it should "accumulate reach per hop with exact fractions" in {
    // hops: 0 x2, 1 x3, 3 x5 (no hop-2 nodes — the gap must not break
    // the below-join cumulative)
    val dist = (Seq.fill(2)(0L) ++ Seq.fill(3)(1L) ++ Seq.fill(5)(3L))
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "hops")
    val got = Graphs.hopHistogram(dist).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    got(0L) shouldBe ((2L, 2L, 0.2))
    got(1L) shouldBe ((3L, 5L, 0.5))
    got(3L) shouldBe ((5L, 10L, 1.0))
  }

  behavior of "Graphs.mutualKnnPairs and degreeHistogram"

  it should "keep only reciprocal edges, canonicalized and deduped" in {
    val edges = Seq(
      (1L, 2L), (2L, 1L), // mutual
      (1L, 3L), // one-way: dropped
      (4L, 5L), (5L, 4L), (4L, 5L), // mutual with a duplicate edge
      (6L, 6L), // self loop: dropped
      (7L, 8L), (8L, 7L)).toDF("src", "dst")
    Graphs.mutualKnnPairs(edges.repartition(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((1L, 2L), (4L, 5L), (7L, 8L))
  }

  it should "histogram symmetrized degrees" in {
    // star center 1 with 3 leaves + an isolated mutual pair
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("src", "dst")
    Graphs.degreeHistogram(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(1L -> 5L, 3L -> 1L) // 3 leaves + both pair nodes at degree 1; the hub at 3
  }

  behavior of "Graphs.assortativity"

  it should "score a star -1 and a degree-regular cycle NULL" in {
    // star: center 1, leaves 2..8 — perfectly disassortative
    val star = (2L to 8L).map(l => (1L, l)).toDF("src", "dst")
    val r1 = Graphs.assortativity(star).collect()
    r1 should have length 1
    r1.head.getLong(0) shouldBe 8L // n_nodes
    r1.head.getLong(1) shouldBe 7L // n_edges
    r1.head.getDouble(2) shouldBe -1.0
    // cycle: every degree 2 — zero degree variance, r undefined
    val cyc = (1L to 6L).map(i => (i, i % 6 + 1)).toDF("src", "dst")
    val r2 = Graphs.assortativity(cyc).collect().head
    r2.getLong(1) shouldBe 6L
    r2.isNullAt(2) shouldBe true
  }

  it should "match a driver-side Pearson replay and be direction/partitioning-invariant" in {
    val rnd = new scala.util.Random(7)
    val raw = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val und = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val degs = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = und.size.toLong
    val (sj, sjj, sjk) = und.foldLeft((BigInt(0), BigInt(0), BigInt(0))) {
      case ((a, b, c), (u, v)) =>
        (a + degs(u), b + BigInt(degs(u)) * degs(u), c + BigInt(degs(u)) * degs(v))
    }
    val expect =
      (BigInt(m) * sjk - sj * sj).toDouble / (BigInt(m) * sjj - sj * sj).toDouble
    for (parts <- Seq(1, 16)) {
      val got = Graphs.assortativity(
        raw.toDF("src", "dst").repartition(parts)).collect().head
      got.getLong(0) shouldBe degs.size.toLong
      got.getLong(1) shouldBe m / 2
      got.getDouble(2) shouldBe expect +- 1e-6 // output rounded to 6 places
    }
  }
}
