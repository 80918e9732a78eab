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
}
