package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column combinators over `array<float>` embedding columns.
  *
  * All arithmetic is done in double via `zip_with` + `aggregate` — pure
  * Catalyst expressions, so they stay codegen'd and distribute; no UDF, no
  * driver-side math. The fold order is the element order, which makes the
  * result deterministic and reproducible across engines (needed for the
  * DuckDB oracle).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
