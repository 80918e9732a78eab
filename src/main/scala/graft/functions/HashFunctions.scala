package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-family combinators for MinHash / SimHash sketching.
  *
  * Two tiers:
  *  - md5-based variants: engine-portable (md5 hex is identical in Spark,
  *    DuckDB, Trino, ...) → used by the oracle-checked queries. Seeded
  *    hash family i is `md5(i || ':' || s)`, min taken lexicographically
  *    on the hex string — a uniform hash family, just string-ordered.
  *  - xxhash64 variants: Spark-native 64-bit hashes, ~10× cheaper — the
  *    production path at 100 TB where no cross-engine replay is needed.
  */
object HashFunctions {

  /** Deterministic uniform bucket in [0, 2^32) from a seeded md5 of an
    * id — the shared primitive behind hash-Bernoulli sampling
    * ([[graft.operators.Curation.hashSample]]), weighted sampling
    * ([[graft.operators.Curation.weightedSample]]) and shard assignment
    * ([[graft.store.Export.assignShards]]). Engine-portable: the same
    * arithmetic replays verbatim in SQL (`('0x' || substr(md5(...), 1,
    * 8))::BIGINT`), so every sampler/assigner keeps its cross-engine
    * determinism from ONE definition. */
  def md5Bucket(seed: Long, id: Column): Column =
    conv(substring(
      md5(concat_ws(":", lit(seed.toString), id.cast("string"))),
      1, 8), 16, 10).cast("bigint")

  /** MinHash signature (portable): array of k minima of seeded md5 over
    * the shingle set. */
  def minhashSignatureMd5(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, s => md5(concat(lit(s"$i:"), s))))
    }: _*)

  /** MinHash signature (fast path): xxhash64 with integer seeds. */
  def minhashSignatureXx(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH band keys from a signature: `bands` groups of `rowsPerBand`
    * signature slots, each hashed to one bucket key. Two docs sharing any
    * band key are dedup candidates. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        lit(b.toString) +:
          (0 until rowsPerBand).map(r =>
            signature.getItem(b * rowsPerBand + r).cast("string")): _*))
    }: _*)

  /** Hex digits whose nibble value has the low bit set — parity of nibble
    * k of an md5 hex string is `substring(h, k+1, 1) ∈ oddHex`, a
    * construction every engine can replay. */
  val oddHex: Seq[String] = Seq("1", "3", "5", "7", "9", "b", "d", "f")

  /** `nBits`-bit SimHash over a token array (portable construction).
    * Bit k of token t = low bit of hex nibble k of md5(t); simhash bit k
    * is set iff more than half the tokens (with multiplicity) have bit k
    * set. nBits ≤ 32 (md5 hex has 32 nibbles). */
  def simhash(tokens: Column, nBits: Int): Column = {
    require(nBits <= 32, "md5 hex has 32 nibbles")
    val hashes = transform(tokens, t => md5(t))
    val n = size(hashes)
    (0 until nBits).map { k =>
      val hits = size(filter(hashes,
        h => substring(h, k + 1, 1).isin(oddHex: _*)))
      when(hits * 2 > n, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
