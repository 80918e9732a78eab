package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whale guards for blocked quadratic self-joins.
  *
  * Every cell/block-blocked operator in this package pairs rows WITHIN a
  * key group, so its cost is Σ n_b² over block sizes. The banded LSH path
  * guards this with `maxBucketSize` (drop over-full buckets); the
  * embedding-blocked operators ([[Similarity.knnGraph]],
  * [[Dedup.embeddingNearDup]], [[Dedup.semanticDedup]]) instead SUB-SPLIT
  * over-full blocks: a skewed embedding distribution (one dominant
  * semantic cluster — the normal case in web corpora) can concentrate
  * half the corpus in one cell no matter how many anchors the caller
  * picks, and dropping that cell would discard exactly the near-dup mass
  * the operator exists to find.
  */
private[operators] object Guards {

  /** Add a `__sub` column splitting any block larger than `maxSize` into
    * `ceil(n/maxSize)` hash-assigned sub-blocks; downstream self-joins key
    * on (block, __sub) so per-task pair work is bounded by ~maxSize²
    * regardless of skew. Blocks at or under the cap get `__sub = 0` for
    * every row — the join is then IDENTICAL to keying on the block alone,
    * so results (and SQL oracles) are unchanged until the guard actually
    * fires. When it fires, pairs across sub-blocks of a whale block are
    * not examined — bounded work traded for in-whale recall, the same
    * trade the LSH `maxBucketSize` guard makes by dropping, but keeping
    * ~1/nSub of the whale's pairs instead of none.
    *
    * Cost when idle: one count aggregation over the slim (block) keys —
    * partial-aggregated map-side — plus a join that AQE turns into a
    * broadcast (the counts frame is one row per block, and blocks ≪ rows
    * by the blocking contract). The big side is about to shuffle on the
    * block key anyway for the self-join.
    */
  def subSplit(df: DataFrame, blockCol: String, idCol: String, maxSize: Int): DataFrame =
    subSplitBy(df, blockCol, idCol, maxSize, lit(true))

  /** [[subSplit]] with the census restricted to rows matching
    * `countFilter`. Multi-probe LSH needs this: its frame carries one
    * PRIMARY row per resident vector plus visiting flip-probe rows, and a
    * census over all rows would make the split point depend on nProbe —
    * a bucket under the cap at nProbe=1 could sub-split at nProbe=2 and
    * silently LOSE primary-primary pairs the single-probe pass finds
    * (inverting the probing-only-widens contract). Counting primaries
    * only keeps the split decision probe-count-invariant, and the pair
    * work per sub-block stays bounded: ≤ maxSize census rows join
    * ~1/nSub of the remaining rows. Blocks with no census rows (e.g.
    * visitor-only buckets) default to one sub-block. */
  def subSplitBy(
      df: DataFrame,
      blockCol: String,
      idCol: String,
      maxSize: Int,
      countFilter: org.apache.spark.sql.Column): DataFrame = {
    require(maxSize > 0, "maxSize must be positive")
    val counts = df.filter(countFilter)
      .groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
    df.join(counts, Seq(blockCol), "left")
      .withColumn("__sub",
        pmod(xxhash64(col(idCol).cast("string")),
          greatest(lit(1L),
            ceil(coalesce(col("__bn"), lit(0L)) / lit(maxSize.toDouble)).cast("long"))))
      .drop("__bn")
  }
}
