package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Seconds, Span}

import graft.SparkSpec

/** Operator cache lifecycle: a long-lived session (the HttpShim server is
  * the motivating consumer) must not accumulate cached blocks as queries
  * run. The LSH operators are persist-free (compute-once reuse comes from
  * ReuseExchange inside one plan); the two-pass curation operators
  * materialize their banded intermediate via `localCheckpoint`, which is
  * invisible to the SQL cache (`spark.catalog.clearCache()` is never
  * needed) and whose blocks the ContextCleaner frees once the result
  * frame becomes unreachable. */
class CacheLifecycleSpec extends SparkSpec with Eventually {
  import spark.implicits._

  private def docs = (1L to 40L)
    .map(i => (i, s"document number $i with shared words and some text ${i % 7}", "s"))
    .toDF("doc_id", "text", "source")

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  "single-consumer-chain LSH operators" should
    "register no persistent blocks at all" in {
    val before = persistentIds
    Dedup.simhashBuckets(docs, nBits = 8).count()
    (persistentIds -- before) shouldBe empty
  }

  "multi-consumer operators (checkpointed intermediates)" should
    "hold blocks only through the result frame, freed once it is dropped" in {
    val before = persistentIds
    var scored: DataFrame = Dedup.minhashLsh(docs, k = 8, bands = 4)
    scored.count()
    // slim pair path: checkpoints only the banded frame (its census and
    // join consumers have non-collapsible exchanges)
    var pairs: DataFrame = Dedup.minhashCandidatePairs(docs, k = 8, bands = 4)
    pairs.count()
    var near: DataFrame = Dedup.simhashNearDup(docs, maxHamming = 4)
    near.count()
    var pack: DataFrame = Curation.packSequences(
      Curation.chunkTokens(docs, chunkSize = 8, overlap = 2), binTokens = 64)
    pack.count()
    var sample: DataFrame = Curation.sampleToTokenBudget(
      docs.withColumn("quality", lit(0.5)).withColumn("n_tokens", lit(10L)),
      tokenBudget = 100)
    sample.count()
    // drop the results; the ContextCleaner reclaims the checkpoint blocks
    // without any catalog.clearCache() intervention
    scored = null
    pairs = null
    near = null
    pack = null
    sample = null
    eventually(timeout(Span(30, Seconds))) {
      System.gc()
      (persistentIds -- before) shouldBe empty
    }
  }
}
