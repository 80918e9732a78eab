package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Retrieval composition on top of the ranking primitives: hybrid
  * sparse+dense fusion and diversity re-ranking. The single-modality
  * rankers live with their index structures ([[Curation.bm25Search]],
  * [[Similarity.bruteForceTopK]] / IVF / PQ); this module combines their
  * OUTPUTS, so it is shortlist-scale by construction — every frame here is
  * |queries| × topN rows, never corpus-scale. That is the 100 TB shape:
  * fusion and re-ranking cost nothing next to the retrieval legs, and the
  * legs keep their own scale paths (posting-list filter, ANN cells).
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): fused
    * score(d) = Σ_rankings 1/(k + rank_r(d)), the standard way to merge a
    * BM25 leg with a dense-vector leg without calibrating their
    * incomparable scores — only RANKS cross the boundary, which is what
    * makes the fusion robust (and deterministic: no score scaling).
    *
    * Determinism: each contribution is one IEEE division of exact
    * integers; the per-doc sum folds over the rankings in MODALITY-NAME
    * order (sorted struct fold — FP addition order pinned even with 3+
    * legs), rounded to 6; the final cut is a total order (score desc, id
    * asc) under `limit` → `TakeOrderedAndProject`.
    *
    * Ranks are assigned HERE, inside a window partitioned by the modality
    * tag: each partition is one leg's already-cut top-N shortlist, so the
    * window is bounded by construction (never corpus-scale — pass CUT
    * legs, not full score tables).
    *
    * @param rankings (modalityName, frame) pairs; each frame carries
    *                 (idCol, score) — the top-N output of a retrieval
    *                 leg, scored descending. Names must be distinct.
    */
  def rrfFuse(
      rankings: Seq[(String, DataFrame)],
      k: Int = 60,
      topK: Int = 10,
      idCol: String = "doc_id",
      scoreCol: String = "score"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "modality names must be distinct")
    require(k >= 0 && topK > 0, "need k >= 0 and topK > 0")
    val tagged = rankings.map { case (name, df) =>
      df.select(col(idCol), lit(name).as("__m"), col(scoreCol).as("__s"))
    }.reduce(_ unionByName _)
    val ranked = tagged
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("__m"))
          .orderBy(col("__s").desc, col(idCol).asc)))
      .select(col(idCol), col("__m"),
        (lit(1.0) / (lit(k).cast("double") + col("rank").cast("double")))
          .as("__c"))
    ranked.groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("__m"), col("__c")))).as("__xs"),
        count(lit(1)).as("n_rankings"))
      .select(col(idCol), col("n_rankings"),
        round(aggregate(col("__xs"), lit(0.0), (a, x) => a + x("__c")), 6)
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily pick, per query, the candidate maximizing
    *
    *   mmr = λ·rel − (1−λ)·max_{s ∈ selected} cos(candidate, s)
    *
    * so the final top-k trades relevance against redundancy — the
    * de-duplicated result page / diverse few-shot-example selection step.
    * The first pick is the pure-relevance argmax (empty-set penalty 0).
    *
    * Greedy selection is inherently sequential in k, so the operator
    * UNROLLS k iterations of dataframe ops: anti-join the selected set,
    * one equi-join against the ≤(i−1)-row-per-query selected frame for
    * the max-similarity penalty (max is order-independent), one window
    * top-1 per query. Every frame is shortlist-scale (|queries|·topN);
    * the candidates frame is localCheckpoint-ed once since all k
    * iterations re-read it. Determinism: rel and sims are 6-rounded
    * cosines, mmr is a fixed 3-op IEEE chain, ties break by id.
    *
    * @param candidates per-query shortlist: (queryCol, idCol, relCol,
    *                   vecCol) — e.g. [[Similarity.bruteForceTopK]]
    *                   joined back to its vectors
    */
  def mmrRerank(
      candidates: DataFrame,
      k: Int,
      lambda: Double = 0.7,
      queryCol: String = "query_id",
      idCol: String = "neighbor_id",
      relCol: String = "cosine",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= 100, s"k out of range: $k")
    require(lambda >= 0 && lambda <= 1, s"lambda out of range: $lambda")
    val cand = candidates.select(
      col(queryCol), col(idCol), col(relCol).as("__rel"),
      col(vecCol).as("__v")).localCheckpoint()
    def top1(scored: DataFrame): DataFrame = scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col("__mmr").desc, col(idCol).asc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
    var selected = top1(cand.withColumn("__mmr", lit(lambda) * col("__rel")))
      .withColumn("rank", lit(1))
    for (i <- 2 to k) {
      // the selected frame is <= (i-1) rows per query — broadcast it
      // explicitly (checkpointed inputs carry no stats, so the static
      // planner would otherwise sort-merge a provably tiny side)
      val remaining = cand.join(
        broadcast(selected.select(col(queryCol), col(idCol))),
        Seq(queryCol, idCol), "left_anti")
      val penalized = remaining.join(
        broadcast(selected.select(col(queryCol), col("__v").as("__sv"))),
        Seq(queryCol))
        .groupBy(col(queryCol), col(idCol))
        .agg(first(col("__rel")).as("__rel"), first(col("__v")).as("__v"),
          max(round(V.cosine(col("__v"), col("__sv")), 6)).as("__ms"))
      val pick = top1(penalized.withColumn("__mmr",
        lit(lambda) * col("__rel") - lit(1.0 - lambda) * col("__ms")))
        .withColumn("rank", lit(i))
      // each iteration references `selected` THREE times (anti-join,
      // penalty join, union): without truncating lineage the logical plan
      // grows 3^k and the driver dies on plan serialization long before
      // any executor works — the frame is |queries|·i rows, so an eager
      // localCheckpoint per iteration is ~free
      selected = selected.unionByName(pick.select(selected.columns.map(col): _*))
        .localCheckpoint()
    }
    // mmr_score ships UNROUNDED: the 3-op IEEE chain over 6-rounded
    // inputs replays bit-for-bit in any engine, while round() itself is
    // the one op engines disagree on at shortest-repr .5 straddles
    selected.select(col(queryCol), col(idCol), col("rank"),
      col("__mmr").as("mmr_score"))
  }

  /** nDCG@k (Järvelin & Kekäläinen 2002) of a retrieval shortlist
    * against graded relevance labels — the retrieval-quality scalar
    * every ranking change is judged by. DCG = Σ_{d=1..k} (2^relᵈ−1)/
    * log₂(d+1) over the shortlist in (score desc, id asc) order; IDCG is
    * the same fold over the corpus's top-k labels (the ideal ranking);
    * nDCG = DCG/IDCG.
    *
    * Shape + exactness: the shortlist collapses to ONE sorted array
    * (≤ k elements — bounded by construction, no window anywhere) and
    * folds with an index-aware transform, so the IEEE sum order is
    * PINNED and the scalar replays in SQL list folds; the ideal top-k is
    * a `TakeOrderedAndProject` over the label frame, never a global
    * sort. Missing labels read as relevance 0.
    *
    * @param ranking shortlist (idCol, scoreCol) — a retrieval leg's cut
    *                output
    * @param rels (idCol, relCol) graded labels (long)
    * @return one row (k, dcg, idcg, ndcg), 6-rounded */
  def ndcgEval(
      ranking: DataFrame,
      rels: DataFrame,
      k: Int = 10,
      idCol: String = "doc_id",
      scoreCol: String = "score",
      relCol: String = "rel"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    def gainFold(arr: org.apache.spark.sql.Column) = {
      val cut = slice(arr, 1, k)
      when(size(cut) === 0, lit(0.0)).otherwise(
        aggregate(
          zip_with(cut, sequence(lit(1), size(cut)), (r, d) =>
            (pow(lit(2.0), r.cast("double")) - lit(1.0)) /
              log(2.0, d.cast("double") + lit(1.0))),
          lit(0.0), (acc, x) => acc + x))
    }
    val labeled = ranking
      .join(rels.select(col(idCol), col(relCol)), Seq(idCol), "left")
      .select(col(idCol), col(scoreCol).as("__s"),
        coalesce(col(relCol), lit(0L)).as("__r"))
    // one sorted array in (score desc, id asc) order — negated score in
    // the sort struct pins descending order without a window — sliced to
    // k INSIDE the fold (a pre-agg limit() without order would pick
    // nondeterministic survivors)
    val dcg = labeled
      .agg(sort_array(collect_list(
        struct((-col("__s")).as("ns"), col(idCol).as("id"),
          col("__r").as("r")))).as("__l"))
      .select(gainFold(transform(col("__l"), x => x.getField("r")))
        .as("__dcg"))
    val ideal = rels
      .orderBy(col(relCol).desc, col(idCol)).limit(k)
      .agg(sort_array(collect_list(struct((-col(relCol)).as("nr"),
        col(idCol).as("id")))).as("__l"))
      .select(gainFold(transform(col("__l"), x => -x.getField("nr")))
        .as("__idcg"))
    dcg.crossJoin(ideal).select(
      lit(k.toLong).as("k"),
      round(col("__dcg"), 6).as("dcg"),
      round(col("__idcg"), 6).as("idcg"),
      round(col("__dcg") / nullif(col("__idcg"), lit(0.0)), 6).as("ndcg"))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    * retrieval shortlists, truncated at depth k (the RBO_min tier): the
    * ranking-similarity measure that weights agreement at the TOP —
    * swapping ranks 1 and 2 moves it far more than swapping 9 and 10,
    * which is what "did my index change the ranking?" actually asks
    * (Kendall/Spearman weight all positions equally and need identical
    * item sets). rbo = (1−p)·Σ_{d=1..k} p^{d−1}·|A₁..d ∩ B₁..d|/d.
    *
    * Shape + exactness: ranks come from posexploding each shortlist's
    * ONE sorted ≤k array (no windows); a doc in both lists contributes
    * to every depth ≥ max(rank_a, rank_b), so the per-depth overlap is
    * one k-row conditional count against a k-cell depth spine, and the
    * IEEE sum folds the ≤k-cell grid in PINNED depth order.
    *
    * @param p persistence (weight decay) in (0,1); 0.9 ≈ top-10 focus
    * @return one row (k, p, n_common, rbo), 6-rounded */
  def rboOverlap(
      a: DataFrame,
      b: DataFrame,
      k: Int = 10,
      p: Double = 0.9,
      idCol: String = "doc_id",
      scoreCol: String = "score"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(p > 0.0 && p < 1.0, s"p in (0,1): $p")
    def ranked(df: DataFrame, rk: String) = df
      .select(col(idCol), col(scoreCol).as("__s"))
      .agg(sort_array(collect_list(
        struct((-col("__s")).as("ns"), col(idCol).as("id")))).as("__l"))
      // slice AFTER the sort: a pre-agg limit() without order would pick
      // nondeterministic survivors
      .select(posexplode(slice(transform(col("__l"), x => x.getField("id")),
        1, k)).as(Seq("__p", idCol)))
      .select(col(idCol), (col("__p") + 1).cast("long").as(rk))
    val common = ranked(a, "__ra").join(ranked(b, "__rb"), Seq(idCol))
      .select(greatest(col("__ra"), col("__rb")).as("__d"))
    val spine = a.sparkSession.range(1, k + 1).select(col("id").as("depth"))
    val grid = spine.join(
      common.crossJoin(spine.select(col("depth").as("__dd")))
        .filter(col("__d") <= col("__dd"))
        .groupBy(col("__dd").as("depth")).agg(count(lit(1)).as("__x")),
      Seq("depth"), "left")
      .select(col("depth"), coalesce(col("__x"), lit(0L)).as("__x"))
    grid.agg(
      max(when(col("depth") === k.toLong, col("__x"))).as("n_common"),
      sort_array(collect_list(struct(col("depth"), col("__x")))).as("__g"))
      .select(lit(k.toLong).as("k"), lit(p).as("p"), col("n_common"),
        round(lit(1.0 - p) * aggregate(col("__g"), lit(0.0), (acc, c) =>
          acc + pow(lit(p), c.getField("depth").cast("double") - lit(1.0)) *
            c.getField("__x").cast("double") /
            c.getField("depth").cast("double")), 6).as("rbo"))
  }
}
