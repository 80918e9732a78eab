package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.selector.Selector
import graft.selector.Selector.{LibType, Paired, Single}

/** A4: fragment (paired-read) nested aggregation (reference
  * `processors/StatsProcessor.scala:282-315`,
  * `models/FragmentStatsLike.scala:26-61`).
  *
  * A fragment-shaped stats container holds the same metrics under
  * `read1` (required), `read2` (nullable; only paired-end units have it)
  * and `readAll` (nullable combined view). The aggregate computes
  * descriptive stats for every metric under each present read level —
  * still ONE scan: all read levels and metrics go into a single `agg()`,
  * versus the reference's mapReduce-per-field fan-out.
  *
  * libType gating (reference `:292-301`): Single ⇒ only `read1` is
  * aggregated; Paired / unspecified ⇒ read1 + read2 + readAll.
  */
object FragmentStats {

  /** Aggregate fragment metrics. `statsCol` is the fragment container
    * column (e.g. `col("stats")`); `metrics` are the per-read metric
    * field names. Output columns: `<level>_<metric>_<stat>`. */
  def aggregate(
      units: DataFrame,
      statsCol: Column,
      metrics: Seq[String],
      libType: Option[LibType],
      selectors: Seq[graft.selector.Selector] = Seq.empty,
      kernel: (Column, String) => Seq[Column] = Descriptive.sparkNativeStats): DataFrame = {
    val readLevels: Seq[String] = libType match {
      case Some(Single) => Seq("read1")
      case _            => Seq("read1", "read2", "readAll")
    }
    val aggs = for {
      level <- readLevels
      metric <- metrics
      c <- kernel(statsCol.getField(level).getField(metric), s"${level}_$metric")
    } yield c
    val sel = Selector.combineAnd(selectors ++ Selector.fromLibType(libType).pure)
    units.filter(sel).agg(aggs.head, aggs.tail: _*)
  }

  private implicit class SelectorOps(val s: graft.selector.Selector) extends AnyVal {
    def pure: Seq[graft.selector.Selector] = Seq(s)
  }

  /** The pairing discriminator for stream-side filtering (reference
    * `models/FragmentStatsLike.scala:40`). */
  def isPairedFilter(libType: Option[LibType]): Column = libType match {
    case Some(Paired) => col("isPaired") === true
    case Some(Single) => col("isPaired") === false
    case None         => lit(true)
  }
}
