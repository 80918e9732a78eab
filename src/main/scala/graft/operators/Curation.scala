package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Corpus curation: the composite filter → dedup → score → sample pipeline
  * a training-data run actually executes, assembled from the library's
  * oracle-checked primitives. One declarative plan — Catalyst fuses the
  * scoring projections into the scan, the dedup is one hash-agg shuffle,
  * and nothing materializes until the sink.
  *
  * Stage order matters at scale: cheap row-local filters (length, langId,
  * quality — all codegen'd projections) run BEFORE the dedup shuffle so
  * the only wide exchange sees pre-shrunk data.
  */
object Curation {

  final case class Config(
      minChars: Int = 50,
      maxChars: Int = 1 << 20,
      languages: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      stopwords: Seq[String] = T.langStopwords("en"))

  /** Score + filter + exact-dedup (keep smallest id per content
    * fingerprint). Output: one row per surviving doc with its quality
    * metrics attached. */
  def curate(
      docs: DataFrame,
      cfg: Config = Config(),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val text = col(textCol)
    val scored = docs.select(
      col(idCol),
      text,
      length(text).as("n_chars"),
      T.tokenCount(text).cast("bigint").as("n_tokens"),
      T.langId(text).as("lang_id"),
      T.qualityScore(text, cfg.stopwords).as("quality"),
      T.contentFingerprint(text).as("fp"))
    val filtered = scored.filter(
      col("n_chars").between(cfg.minChars, cfg.maxChars) &&
        col("lang_id").isin(cfg.languages: _*) &&
        col("quality") >= cfg.minQuality)
    // keep-first exact dedup on the order/duplication-robust fingerprint:
    // one shuffle, map-side partial min
    val keep = filtered
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol))
    filtered.join(keep, Seq("fp", idCol)).drop("fp")
  }

  /** Deterministic token-budget sample: highest-quality docs first (ties
    * by id) until the running token budget is exhausted. The running sum
    * is a window over the global quality order — at scale, prefer
    * quality-band bucketing; this exact form is for request-sized curation
    * and oracle checks. */
  def sampleToTokenBudget(
      curated: DataFrame,
      tokenBudget: Long,
      idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    curated
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= tokenBudget)
  }
}
