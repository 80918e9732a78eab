package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity: association-rule statistics over item PAIRS
  * (Agrawal–Srikant 1994's frequent-itemset mining at the pair tier —
  * where production "customers who bought X also bought Y" lives; longer
  * itemsets are compositions of this step). The reference engine has no
  * co-occurrence operator; this is part of the recommendation/analytics
  * surface a warehouse-scale engine owes its users.
  *
  * Scale shape: the pair table comes from a self EQUI-join on the basket
  * key — pair work is Σ n_b² over basket sizes, and baskets are naturally
  * tiny (order lines, session items), so the join is shuffle-on-basket
  * with bounded per-key fan-out. Whale baskets (a crawler session with
  * 10⁵ items would alone contribute 5·10⁹ pairs) are DROPPED above
  * `maxBasketSize` — the standard basket-cap trade, enforced before the
  * join; item marginals and the basket total are computed over the SAME
  * capped basket set so every ratio stays self-consistent. All counts are
  * exact BIGINTs; support/confidence/lift are single pinned IEEE
  * divisions at the end, so the whole report replays hash-exact in SQL.
  */
object Affinity {

  /** Pair-level association report.
    *
    * @param lines      (basket, item) occurrence rows (duplicates fine —
    *                   de-duplicated to presence before pairing)
    * @param basketCol  basket / transaction key
    * @param itemCol    item key
    * @param minPairCount keep pairs co-occurring in at least this many
    *                   baskets (support pruning — the Apriori cut)
    * @param maxBasketSize drop baskets larger than this before pairing
    * @return (item_a, item_b, n_pair, n_a, n_b, n_baskets, support,
    *         confidence, lift) with item_a < item_b; confidence is
    *         P(b | a), lift = confidence / P(b)
    */
  def basketPairs(
      lines: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxBasketSize: Int = 256): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be positive: $minPairCount")
    require(maxBasketSize >= 2, s"maxBasketSize must allow pairs: $maxBasketSize")
    // presence, not multiplicity: a basket containing an item 3 times
    // still co-occurs once (map-side partial distinct on (basket, item))
    val d0 = lines
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    // basket-size census + whale cap (the counts frame is one slim row
    // per basket; AQE broadcasts it when small, and the big side is
    // about to shuffle on bk for the self-join anyway)
    val kept = d0.groupBy(col("bk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBasketSize)
      .select(col("bk"))
    val d = d0.join(kept, Seq("bk")).localCheckpoint(true)
    // marginals over the capped set — exact integers
    val itemCounts = d.groupBy(col("it"))
      .agg(count(lit(1)).as("n_item"))
    val nBaskets = d.select(countDistinct(col("bk")).as("n_baskets"))
    // pair table: equi-join on the basket key, ordered pair cut
    val pairs = d
      .join(d.select(col("bk"), col("it").as("it2")), Seq("bk"))
      .filter(col("it") < col("it2"))
      .groupBy(col("it").as("item_a"), col("it2").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairs
      .join(itemCounts.select(col("it").as("item_a"), col("n_item").as("n_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("it").as("item_b"), col("n_item").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"),
        col("n_a"), col("n_b"), col("n_baskets"),
        // pinned IEEE order; inputs exact, so SQL replays bit-identically
        (col("n_pair").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_pair").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        ((col("n_pair").cast("double") / col("n_a").cast("double")) /
          (col("n_b").cast("double") / col("n_baskets").cast("double")))
          .as("lift"))
  }

  /** Item-item collaborative-filtering neighborhoods (Sarwar et al.
    * 2001; the Amazon item-to-item recommender, Linden et al. 2003):
    * for every item, the `topK` most similar items by binary-interaction
    * cosine — sim(i,j) = n_ij / √(n_i·n_j) over users who touched both.
    * [[basketPairs]] prices a pair; this builds each item's RANKED
    * neighborhood, the precomputed table an item-page recommender serves
    * from.
    *
    * Scale shape: identical to [[basketPairs]] — presence-deduped
    * (user, item) rows, a per-user size census with the `maxUserItems`
    * whale cap (a crawler touching 10⁵ items contributes 5·10⁹ pairs
    * and no signal — the standard power-user cut, applied before the
    * self-join so marginals stay consistent), pair counts keyed on the
    * ordered pair, then one item-partitioned window for the top-k cut.
    * Counts exact; cosine is one √ and one division per surviving pair.
    *
    * @return (item, neighbor, n_both, n_item, n_neighbor, cosine, rank)
    *         — both directions of each pair, rank 1..topK per item */
  def itemNeighborhoods(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      topK: Int = 5,
      minPairCount: Long = 2L,
      maxUserItems: Int = 256): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    import org.apache.spark.sql.expressions.Window
    val d0 = interactions
      .select(col(userCol).as("u"), col(itemCol).as("it"))
      .distinct()
    val kept = d0.groupBy(col("u"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxUserItems)
      .select(col("u"))
    val d = d0.join(kept, Seq("u")).localCheckpoint(true)
    val itemCounts = d.groupBy(col("it")).agg(count(lit(1)).as("n_item"))
    val pairs = d
      .join(d.select(col("u"), col("it").as("it2")), Seq("u"))
      .filter(col("it") < col("it2"))
      .groupBy(col("it").as("ia"), col("it2").as("ib"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairCount)
    // both directions, then rank inside each item's neighborhood
    // one pass over the pair build for both directions (optimization
    // r17, guide §2.4): the unionAll of two selects re-executed the
    // whole self-join + aggregate pipeline once per direction
    val directed = pairs
      .select(explode(array(
        struct(col("ia").as("item"), col("ib").as("neighbor"), col("n_both")),
        struct(col("ib").as("item"), col("ia").as("neighbor"), col("n_both"))))
        .as("e"))
      .select(col("e.item").as("item"), col("e.neighbor").as("neighbor"),
        col("e.n_both").as("n_both"))
      .join(itemCounts.select(col("it").as("item"),
        col("n_item")), Seq("item"))
      .join(itemCounts.select(col("it").as("neighbor"),
        col("n_item").as("n_neighbor")), Seq("neighbor"))
      .withColumn("cosine",
        round(col("n_both").cast("double") /
          sqrt(col("n_item").cast("double") * col("n_neighbor").cast("double")),
          6))
    directed
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("item"))
          .orderBy(col("cosine").desc, col("neighbor").asc)).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("item"), col("neighbor"), col("n_both"), col("n_item"),
        col("n_neighbor"), col("cosine"), col("rank"))
  }
}
