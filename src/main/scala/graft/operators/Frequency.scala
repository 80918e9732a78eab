package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FrequencyFunctions

import graft.functions.{HashFunctions => H, TextFunctions => T}

/** Frequency / cardinality analytics built on the mergeable sketch
  * aggregates ([[org.apache.spark.sql.graft.MisraGriesAgg]],
  * [[org.apache.spark.sql.graft.KmvSketchAgg]]) — the "what are the top
  * terms" / "how much do these audiences overlap" questions a corpus run
  * asks at a scale where the naive full-vocab / full-id-set answers are
  * the bottleneck shuffle.
  */
object Frequency {

  /** Unigram+bigram stream of a token array — the shared feature space of
    * [[heavyHitters]] and [[Curation.dsirSample]]. Empty-safe: docs with
    * fewer than two tokens contribute their unigrams only. */
  private[operators] def gramsArray(toks: Column): Column =
    concat(
      toks,
      when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 2),
          i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2)))))

  /** EXACT heavy hitters (frequency > N/k) over the corpus's
    * unigram+bigram stream, computed with the classic two-pass
    * sketch-then-verify pattern:
    *
    *  1. ONE pass folds every partition into a ≤(k-1)-entry Misra-Gries
    *     summary (plus the exact stream length N); the merge moves only
    *     summaries. The MG guarantee makes the merged candidate set a
    *     SUPERSET of all true heavy hitters.
    *  2. The exact pass re-counts ONLY the candidates: a broadcast join
    *     filters the stream to ≤k-1 distinct keys before the counting
    *     shuffle, so the exchange carries a bounded key set no matter how
    *     large the vocabulary is.
    *
    * The final answer is exact and partitioning-independent even though
    * the intermediate candidate set is not — which is what makes this
    * oracle-checkable against a plain GROUP BY ... HAVING replay.
    *
    * Scale: a single full-vocab `groupBy(gram).count()` shuffles every
    * distinct gram (billions at 100 TB); this shuffles (a) fixed-size
    * summaries and (b) occurrences of ≤k-1 grams. Reference surface:
    * generalizes the counting aggregations of `sentinel-core`'s stats
    * processors (processors/stats/StatsProcessor.scala) to the
    * heavy-hitter regime.
    */
  def heavyHitters(
      docs: DataFrame,
      k: Int = 512,
      textCol: String = "text"): DataFrame = {
    val toks = filter(T.tokens(col(textCol)), t => length(t) > 0)
    val grams = Fan.spread(docs.select(col(textCol)))
      .select(explode(gramsArray(toks)).as("gram"))
    val summary = grams.agg(
      FrequencyFunctions.mgCandidates(col("gram"), k).as("cand"),
      count(lit(1)).as("n"))
    val cand = summary.select(explode(col("cand")).as("gram"), col("n"))
    grams
      .join(broadcast(cand), Seq("gram"))
      .groupBy(col("gram"), col("n"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") * lit(k.toLong) > col("n"))
      .select(col("gram"), col("n_occ"))
  }

  /** Pairwise distinct-id overlap between groups (e.g. daily active users
    * day × day — the retention matrix) via KMV sketches (Beyer et al.
    * 2007) — the set-INTERSECTION estimate HLL structurally cannot
    * produce. Portable md5 hash tier, so the whole computation (sketch =
    * k smallest distinct hashes, then the standard estimators) replays
    * deterministically in any SQL engine.
    *
    * Estimators, with U = k smallest of the union of the two sketches and
    * θ = largest value in U (normalized by 2^32):
    *  - distinct(A∪B) ≈ (k-1)/θ   (exact |U| when the union is complete)
    *  - Jaccard ĵ = |S_A ∩ S_B ∩ U| / |U|
    *  - |A∩B| ≈ ĵ · distinct(A∪B)
    *
    * Scale: one keyed aggregation folds any number of events into ≤k
    * longs per group; the pairwise stage joins G sketch rows (G =
    * #groups), broadcast both sides. The event stream is never shuffled
    * per-pair — the naive per-pair `COUNT(DISTINCT CASE ...)` plan
    * re-shuffles the full id stream G² times.
    */
  def kmvOverlap(
      events: DataFrame,
      k: Int = 128,
      seed: Long = 13L,
      groupCol: String = "event_type",
      idCol: String = "user_id"): DataFrame = {
    val sk = events
      .select(col(groupCol).as("grp"), H.md5Bucket(seed, col(idCol)).as("v"))
      .groupBy(col("grp"))
      .agg(FrequencyFunctions.kmvSketch(col("v"), k).as("sk"))
    val a = sk.select(col("grp").as("group_a"), col("sk").as("ska"))
    val b = sk.select(col("grp").as("group_b"), col("sk").as("skb"))
    val u = slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)
    val estUnion =
      when(size(col("u")) < k, size(col("u")).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
          col("theta").cast("double"))
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .withColumn("u", u)
      .withColumn("theta", element_at(col("u"), size(col("u"))))
      .withColumn("rho",
        size(filter(array_intersect(col("ska"), col("skb")),
          v => v <= col("theta"))).cast("long"))
      .withColumn("est_union", estUnion)
      .select(
        col("group_a"), col("group_b"), col("rho"),
        round(col("est_union"), 6).as("est_distinct_union"),
        round(col("rho").cast("double") / size(col("u")).cast("double"), 6)
          .as("est_jaccard"),
        round(col("rho").cast("double") / size(col("u")).cast("double") *
          col("est_union"), 6).as("est_common_users"))
  }

  /** Heavy hitters with count-min point estimates alongside the exact
    * counts ([[org.apache.spark.sql.graft.CmsSketchAgg]], Cormode &
    * Muthukrishnan 2005): ONE pass folds the unigram+bigram stream into a
    * depth×width counter block (the shuffle moves 32 KiB blocks, never
    * the stream), candidates come from the same exact two-pass
    * [[heavyHitters]], and each candidate is probed against the broadcast
    * 1-row sketch frame. `n_est >= n_occ` always (CMS overestimates,
    * never under) with err ≤ εN, ε ≈ e/width — the constant-memory
    * answer for "how often does ANY key occur" when the vocabulary is
    * too large to count exactly. Portable md5Bucket double hashing, so
    * sketch contents and estimates replay in plain SQL. */
  def cmsHeavyHitters(
      docs: DataFrame,
      k: Int = 512,
      depth: Int = 4,
      width: Int = 1024,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.SketchFunctions
    def h1(c: Column) = H.md5Bucket(1L, c)
    def h2(c: Column) = H.md5Bucket(2L, c)
    val toks = filter(T.tokens(col(textCol)), t => length(t) > 0)
    val grams = Fan.spread(docs.select(col(textCol)))
      .select(explode(gramsArray(toks)).as("gram"))
    // the CMS rides the SAME aggregation job as the MG candidate pass
    // (both are mergeable, so one scan folds both summaries) — the whole
    // op costs the two scans [[heavyHitters]] already costs, not three.
    // The 1-row summary is eagerly checkpointed: its two consumers (the
    // candidate explode feeding the recount, the sketch probe at the
    // end) must not each re-run the corpus aggregation, and the 32 KiB
    // sketch must NOT ride the recount shuffle as a group key.
    val summary = grams.agg(
      FrequencyFunctions.mgCandidates(col("gram"), k).as("cand"),
      count(lit(1)).as("n"),
      SketchFunctions.cmsSketch(h1(col("gram")), h2(col("gram")),
        depth, width).as("__sk"))
      .localCheckpoint()
    val cand = summary.select(explode(col("cand")).as("gram"), col("n"))
    grams
      .join(broadcast(cand), Seq("gram"))
      .groupBy(col("gram"), col("n"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") * lit(k.toLong) > col("n"))
      .crossJoin(broadcast(summary.select(col("__sk"))))
      .select(col("gram"), col("n_occ"),
        SketchFunctions.cmsEstimate(col("__sk"),
          h1(col("gram")), h2(col("gram"))).as("n_est"))
  }
}
