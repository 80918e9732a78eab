package graft.operators

import graft.SparkSpec

class AffinitySpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets over items {a,b,c,w}: (a,b) co-occur twice, (a,c) once,
  // (b,c) once; duplicates inside basket 1 must not inflate counts
  private lazy val lines = Seq(
    (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "b"),
    (4L, "c"), (4L, "w")
  ).toDF("bk", "it")

  "basketPairs" should "count presence co-occurrence with exact marginals and pinned ratios" in {
    val got = Affinity.basketPairs(lines, "bk", "it", minPairCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toMap
    // n_baskets = 4; n_a=2 (a), n_b=3 (b), n_c=2, n_w=1
    got(("a", "b")) shouldBe ((2L, 2L, 3L, 4L, 0.5, 1.0, (2.0 / 2.0) / (3.0 / 4.0)))
    got(("a", "c")) shouldBe ((1L, 2L, 2L, 4L, 0.25, 0.5, 0.5 / 0.5))
    got(("b", "c")) shouldBe ((1L, 3L, 2L, 4L, 0.25, 1.0 / 3.0, (1.0 / 3.0) / 0.5))
    got(("c", "w")) shouldBe ((1L, 2L, 1L, 4L, 0.25, 0.5, 0.5 / 0.25))
    got.size shouldBe 4
  }

  it should "prune by minPairCount" in {
    val got = Affinity.basketPairs(lines, "bk", "it", minPairCount = 2L)
      .select("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe Set(("a", "b"))
  }

  it should "drop whale baskets whole and keep marginals self-consistent" in {
    val whale = (1 to 50).map(i => (9L, s"w$i")).toDF("bk", "it")
    val got = Affinity.basketPairs(lines.union(whale), "bk", "it",
      minPairCount = 1L, maxBasketSize = 4)
      .collect()
    // the 50-item basket contributes no pairs AND no marginal mass:
    // every surviving row sees n_baskets = 4, as if the whale never existed
    got.map(_.getLong(5)).toSet shouldBe Set(4L)
    got.map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "w"))
  }

  behavior of "itemNeighborhoods"

  it should "rank perfectly co-touched items first with cosine 1" in {
    // items x,y always together (3 users); z shares one user with x
    val rows = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (3L, "z"),
      (4L, "z"), (4L, "z")) // dup presence collapses
      .toDF("u", "it")
    val got = Affinity.itemNeighborhoods(rows, "u", "it",
      topK = 2, minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(6)) ->
        (r.getString(1), r.getDouble(5))).toMap
    got(("x", 1L)) shouldBe (("y", 1.0))
    got(("y", 1L)) shouldBe (("x", 1.0))
    // x-z: n_both 1, n_x 3, n_z 2 → 1/sqrt(6)
    got(("x", 2L))._1 shouldBe "z"
    got(("x", 2L))._2 shouldBe (1.0 / math.sqrt(6.0)) +- 1e-6
  }

  it should "exclude power users above maxUserItems from all counts" in {
    val whale = (1 to 40).map(i => (99L, s"i$i")).toDF("u", "it")
    val base = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
      .toDF("u", "it")
    val got = Affinity.itemNeighborhoods(base.union(whale), "u", "it",
      topK = 5, minPairCount = 1L, maxUserItems = 10)
    // whale items vanish entirely; a-b cosine stays 2/sqrt(4) = 1
    got.count() shouldBe 2L
    got.collect().map(_.getDouble(5)).toSet shouldBe Set(1.0)
  }
}
