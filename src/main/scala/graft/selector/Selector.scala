package graft.selector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composable predicate algebra, the reference's query expression language
  * re-expressed as Catalyst `Column` combinators.
  *
  * Reference: sentinel `utils/Selector.scala:29-88` compiles these to
  * MongoDB query documents; here each selector compiles to a `Column`
  * predicate that Catalyst pushes down to the parquet scan (predicate
  * pushdown is free once the filter is declarative — see
  * `PushedFilters` in `.explain("formatted")`).
  *
  * Empty/absent selectors compile to `lit(true)` (the reference drops
  * them from the `$and` list, same semantics) so Catalyst's
  * `ConstantFolding` removes them from the plan entirely.
  */
sealed trait Selector {
  /** Compile to a Catalyst predicate. */
  def toColumn: Column
  def negate: Selector = Not(this)
}

/** Scalar equality: attr == value (reference Selector.scala:56-58). */
final case class OneMatchOne(attr: String, value: Any) extends Selector {
  def toColumn: Column = col(attr) === lit(value)
}

/** Optional scalar equality — no-op when value absent
  * (reference Selector.scala:60-65). */
final case class OneOptMatchOne(attr: String, value: Option[Any]) extends Selector {
  def toColumn: Column = value.map(v => col(attr) === lit(v)).getOrElse(lit(true))
}

/** Array column contains the value (reference's `$elemMatch $eq`,
  * Selector.scala:67-69). */
final case class OneInMany(attr: String, value: Any) extends Selector {
  def toColumn: Column = array_contains(col(attr), lit(value))
}

/** Optional array-contains (reference Selector.scala:71-76). */
final case class OneOptInMany(attr: String, value: Option[Any]) extends Selector {
  def toColumn: Column =
    value.map(v => array_contains(col(attr), lit(v))).getOrElse(lit(true))
}

/** Scalar ∈ set; empty set is a no-op (reference Selector.scala:78-82). */
final case class ManyContainOne(attr: String, values: Seq[Any]) extends Selector {
  def toColumn: Column =
    if (values.isEmpty) lit(true) else col(attr).isin(values: _*)
}

/** Array ∩ set non-empty; empty set is a no-op
  * (reference Selector.scala:84-88). */
final case class ManyIntersectMany(attr: String, values: Seq[Any]) extends Selector {
  def toColumn: Column =
    if (values.isEmpty) lit(true)
    else arrays_overlap(col(attr), array(values.map(lit): _*))
}

/** Negation of any selector (reference Selector.scala:29-32).
  *
  * Null-safe: Mongo's `$not` matches documents where the attribute is
  * absent, whereas SQL `!(col === v)` is NULL (row dropped) on null
  * columns. `coalesce(_, true)` restores the reference semantics: a row
  * whose attribute is null *does* match the negated query. */
final case class Not(inner: Selector) extends Selector {
  def toColumn: Column = coalesce(!inner.toColumn, lit(true))
}

/** Raw column escape hatch for predicates with no named shape. */
final case class RawPred(c: Column) extends Selector {
  def toColumn: Column = c
}

object Selector {
  /** Conjunction, dropping no-ops (reference `combineAnd`,
    * Selector.scala:37-43). Empty input selects everything. */
  def combineAnd(selectors: Seq[Selector]): Column =
    selectors.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))

  /** Library type of a sequencing unit: paired-end vs single-end. */
  sealed trait LibType
  case object Single extends LibType
  case object Paired extends LibType

  /** `libType` → `isPaired` equality; absent ⇒ no-op
    * (reference Selector.scala:45-48 + FragmentStatsLike.scala:40). */
  def fromLibType(libType: Option[LibType], attr: String = "isPaired"): Selector =
    OneOptMatchOne(attr, libType.map(_ == Paired))

  /** Ownership/visibility filter: admins see everything, other users only
    * their own uploads (reference RunsProcessor.scala:89-95). */
  def visibility(userId: String, isAdmin: Boolean, attr: String = "uploaderId"): Selector =
    if (isAdmin) RawPred(lit(true)) else OneMatchOne(attr, userId)

  /** Soft-delete visibility: exclude tombstoned rows
    * (reference RunsProcessor.scala:391). */
  def notDeleted(attr: String = "deletionTimeUtc"): Selector =
    RawPred(col(attr).isNull)
}
