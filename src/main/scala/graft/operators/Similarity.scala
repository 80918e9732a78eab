package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact cosine top-k. The query side is tiny and
  *   explicitly `broadcast()` — the corpus is never shuffled, each
  *   executor scans its partitions once. This is the right *exact* plan
  *   at any corpus size when |queries| is small.
  * - `ivfTopK`: IVF-style coarse quantization — corpus rows are assigned
  *   to their nearest anchor ("centroid", here: deterministic anchor
  *   vectors taken from the corpus), queries probe only their own cell.
  *   Turns the n·q term into n·q/cells on average; the standard ANN
  *   scale path when brute force stops fitting the latency budget.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector (excluding self).
    * Ties broken by corpus id for determinism. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(V.cosine(col("qv"), col("cv")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-bucketed ANN: assign every vector to its argmax-cosine anchor,
    * then brute-force only within the query's cell (nprobe=1). `anchors`
    * must be small (broadcast). */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      anchors: DataFrame,
      k: Int,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // cell(v) = anchor id with max cosine(v, anchor); ties → smallest id
    def withCell(df: DataFrame, id: String): DataFrame = {
      val a = broadcast(anchors.select(col(idCol).as("anchor_id"), col(vecCol).as("av")))
      val w = Window.partitionBy(col(id))
        .orderBy(col("anchor_cos").desc, col("anchor_id").asc)
      df.select(col(id), col(vecCol).as("v"))
        .crossJoin(a)
        .withColumn("anchor_cos", V.cosine(col("v"), col("av")))
        .withColumn("arn", row_number().over(w))
        .filter(col("arn") === 1)
        .select(col(id), col("anchor_id").as("cell"), col("v"))
    }
    val c = withCell(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), col("cell"), col("v").as("cv"))
    val q = broadcast(
      withCell(queries, idCol)
        .select(col(idCol).as("query_id"), col("cell"), col("v").as("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(V.cosine(col("qv"), col("cv")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
