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

  /** Σ aᵢ·bᵢ over `array<int>` in long — exact integer arithmetic, the
    * scoring primitive for int8-quantized candidate retrieval. */
  def dotInt(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftFunctions.dotIntColumn(a, b)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Symmetric int8 quantization scale: max |vᵢ| / 127 in double.
    * 0.0 for the all-zero vector (whose quantized form is all zeros). */
  def quantScale(v: Column): Column =
    array_max(transform(v, x => abs(x))).cast("double") / 127.0

  /** Symmetric int8 quantization of an `array<float>` embedding:
    * qᵢ = ⌊vᵢ/scale + 0.5⌋ (explicit floor-of-shifted instead of a
    * `round()` so the halfway rule is the same expression in every
    * engine — an oracle replays it verbatim). The all-zero vector maps
    * to all zeros. Per-row projection, no shuffle; int8 storage is the
    * standard 4× shrink for ANN candidate retrieval at the 100 TB scale,
    * with [[dequantize]] restoring approximate floats for re-ranking. */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(floor(x.cast("double") / scale + 0.5d).cast("int")))

  /** Approximate inverse of [[quantize]]: qᵢ·scale in double. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
