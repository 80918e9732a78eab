package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (the whole point of these shapes):
  *  - Exact dedup is a hash aggregate on a digest — one shuffle keyed by
  *    md5, partial-aggregated map-side; never a pairwise compare.
  *  - MinHash/SimHash near-dup avoids the O(n²) cross join: candidates
  *    come from an equi-join on band/bucket keys (shuffle on small keys),
  *    so cost is O(n) + O(candidate pairs).
  *  - Pairwise (n-gram Jaccard, embedding cosine) variants are *blocked*
  *    on a partition key (source / LSH bucket / IVF cell) so the
  *    quadratic term is per-block, not global — the only way a pairwise
  *    compare survives 100 TB.
  */
object Dedup {

  /** Exact duplicate groups by content digest: one row per distinct text
    * with its cluster size and the kept (minimum) id — the classic
    * keep-first exact dedup. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_md5"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col(idCol)).as("keep_id"))

  /** Near-duplicate candidate pairs via MinHash + LSH banding.
    * shingleN-char shingles → k-slot signature → `bands` band keys →
    * equi-join on band key. Returns distinct candidate pairs (a < b) with
    * the estimated Jaccard (fraction of matching signature slots). */
  def minhashLsh(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 16,
      bands: Int = 8): DataFrame = {
    require(bands > 0 && k % bands == 0,
      s"bands ($bands) must be positive and divide k ($k); " +
        "otherwise band keys degenerate and the join goes quadratic")
    val rowsPerBand = k / bands
    val sigs = docs.select(
      col(idCol).as("id"),
      H.minhashSignatureMd5(T.charShingles(col(textCol), shingleN), k).as("sig"))
    val banded = sigs.select(
      col("id"), col("sig"),
      explode(H.lshBandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val l = banded.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(sequence(lit(1), lit(k)),
          i => element_at(col("sig_a"), i) === element_at(col("sig_b"), i)))
          .cast("double") / k).as("est_jaccard"))
      .distinct()
  }

  /** SimHash bucketing: docs sharing an identical nBits-bit SimHash are
    * near-dup candidates. Returns buckets with >1 member. */
  def simhashBuckets(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      nBits: Int = 16): DataFrame =
    docs
      .select(col(idCol).as("id"), H.simhash(T.tokens(col(textCol)), nBits).as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** Exact n-gram Jaccard similarity for candidate pairs *within a block*
    * (same `blockCol` value). Quadratic only per block. */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3): DataFrame = {
    val sh = docs.select(
      col(blockCol).as("block"),
      col(idCol).as("id"),
      T.wordShingles(col(textCol), shingleN).as("sh"))
    val l = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        T.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** Embedding near-dup pairs: cosine over pairs blocked by `blockCol`
    * (e.g. a cluster/label/LSH-bucket column) above a threshold. */
  def embeddingNearDup(
      vecs: DataFrame,
      blockCol: String,
      threshold: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val v = vecs.select(col(blockCol).as("block"), col(idCol).as("id"), col(vecCol).as("v"))
    val l = v.select(col("block"), col("id").as("id_a"), col("v").as("v_a"))
    val r = v.select(col("block"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        V.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") > threshold)
  }
}
