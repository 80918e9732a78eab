package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column combinators over `array<float>` embedding columns.
  *
  * Two tiers, identical results (same ascending-index double fold):
  *  - `dot`/`norm`/`cosine`: the native [[graft.functions.expressions
  *    .DotProductF]] expression — whole-stage-codegen'd primitive loop,
  *    the hot path for ANN/near-dup at scale.
  *  - `dotHof`: the `zip_with`+`aggregate` formulation kept as the
  *    generic fallback for non-float arrays (higher-order functions are
  *    interpreted — do not use in hot loops).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double — native codegen expression over array<float>. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftFunctions.dotColumn(a, b)

  /** Generic interpreted fallback for arbitrary numeric arrays. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
