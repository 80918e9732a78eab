package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.selector.Selector

/** The reference's two analytical query families, Spark-first.
  *
  * - `getStats` (sentinel `processors/StatsProcessor.scala:180-248`):
  *   filtered, projected, time-sorted-or-shuffled, limited data points.
  *   One lazy DataFrame: filter → select → orderBy → limit; Catalyst pushes
  *   the filter and projection into the scan, and `orderBy(..).limit(n)`
  *   compiles to `TakeOrderedAndProject` (no full sort at scale).
  *
  * - `getAggregateStats` (sentinel `processors/StatsProcessor.scala:261-324`):
  *   per-metric descriptive stats. The reference runs one mapReduce per
  *   metric; we compute every metric in a single `agg()` scan.
  *
  * - `globalRunStats` (sentinel `processors/CompositeRunsProcessor
  *   .scala:256-278`): the per-pipeline rollup.
  */
object StatsProcessor {

  /** Data-point query. `sortOrRandom`: Left(seed) ⇒ deterministic random
    * shuffle (reference shuffles client-side, StatsProcessor.scala:240-241;
    * we push the shuffle key into the engine so it distributes);
    * Right(col) ⇒ sort descending by that column (the reference's
    * `timeSorted`).
    *
    * The shuffle key is md5 over "seed:" plus each projected column's
    * own md5 (NULL → the one-char sentinel "-", which no 32-hex digest
    * can collide with) — a seeded content fingerprint rather than
    * `rand(seed)`, whose stream is engine- AND partitioning-dependent.
    * Hashing per column FIRST makes the composite unambiguous: a plain
    * value concat would let ("1:2","3") collide with ("1","2:3") and
    * concat_ws's NULL-skipping would let ("x", NULL) collide with
    * (NULL, "x"). The fingerprint gives the same three properties rand
    * promised (deterministic per seed, uniform, uncorrelated with any
    * data order) plus one it couldn't: any engine replays the identical
    * permutation from the row values alone (the repo's seeded-sampling
    * md5 discipline), so the shuffled sample is oracle-checkable. Ties
    * happen only between rows with identical projections, where order
    * is immaterial. With a limit the plan stays TakeOrderedAndProject:
    * per-partition top-n, no full sort at scale.
    *
    * Castability contract (ADVICE r15): the fingerprint casts each keyed
    * column to string, so with an EMPTY projection the key would span
    * ALL frame columns — including types whose string rendering is
    * engine-dependent (timestamps, doubles) or whose hashing is simply
    * not meaningful as a stable permutation key. An empty-projection
    * Left(seed) therefore keys only on columns whose string rendering
    * is canonical across engines: complex types (map/array/struct) are
    * skipped, and so are float/double/timestamp columns, whose
    * rendering the engine owns (1.0E7 vs 10000000.0, fractional-second
    * and zone formats — ADVICE r16). At least one such column must
    * remain; callers that need a specific permutation should project
    * explicitly, as the registered `sample_random` query does. */
  def getStats(
      units: DataFrame,
      selectors: Seq[Selector],
      projection: Seq[Column],
      sortOrRandom: Either[Long, String],
      nLimit: Option[Int]): DataFrame = {
    val filtered = units.filter(Selector.combineAnd(selectors))
    val projected =
      if (projection.isEmpty) filtered else filtered.select(projection: _*)
    val ordered = sortOrRandom match {
      case Right(sortCol) => projected.orderBy(desc(sortCol))
      case Left(seed) =>
        // empty projection ⇒ key on canonically-rendered atomic columns
        // only (see scaladoc)
        import org.apache.spark.sql.types._
        val keyCols =
          if (projection.nonEmpty) projected.columns.toSeq
          else projected.schema.fields.collect {
            case f if !f.dataType.isInstanceOf[ArrayType] &&
              !f.dataType.isInstanceOf[MapType] &&
              !f.dataType.isInstanceOf[StructType] &&
              f.dataType != FloatType && f.dataType != DoubleType &&
              f.dataType != TimestampType && f.dataType != TimestampNTZType =>
              f.name
          }.toSeq
        require(keyCols.nonEmpty,
          "Left(seed) shuffle needs at least one canonically-rendered " +
            "atomic column to key on; project explicitly for frames of " +
            "only complex/float/double/timestamp columns")
        projected.orderBy(md5(concat_ws(":",
          lit(seed.toString) +:
            keyCols.map(c =>
              coalesce(md5(col(c).cast("string")), lit("-"))): _*)))
    }
    nLimit.map(ordered.limit).getOrElse(ordered)
  }

  /** Aggregate query: all requested metrics in ONE pass. `metrics` maps an
    * output prefix to the metric column (possibly nested, e.g.
    * `col("stats.nReadsInput")`). */
  def getAggregateStats(
      units: DataFrame,
      selectors: Seq[Selector],
      metrics: Seq[(String, Column)],
      kernel: (Column, String) => Seq[Column] = Descriptive.sparkNativeStats): DataFrame = {
    val aggs = metrics.flatMap { case (prefix, c) => kernel(c, prefix) }
    units.filter(Selector.combineAnd(selectors)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group rollup: the reference's `$match notDeleted → $group by
    * pipeline {nRuns, nSamples, nReadGroups} → $sort` — a textbook partial
    * (map-side) + final hash aggregate in Spark. */
  def globalRunStats(
      runs: DataFrame,
      groupCol: String = "pipeline",
      counters: Seq[String] = Seq("nSamples", "nReadGroups")): DataFrame = {
    val aggs = count(lit(1)).as("nRuns") +:
      counters.map(c => sum(col(c)).as(c))
    runs
      .filter(col("deletionTimeUtc").isNull)
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(groupCol))
  }
}
