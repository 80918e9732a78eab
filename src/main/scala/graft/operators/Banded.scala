package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The banded two-pass prefix-sum census shared by every operator that
  * replaces a global `Window.orderBy` rank/cumsum with band-local
  * windows plus driver-computed band offsets ([[Reports.mannWhitneyU]],
  * [[Reports.revenueGini]], the userGrowth/vocabGrowth family). Owns
  * the step each caller used to re-implement — and the step one of them
  * can forget: the fail-fast band-count guard.
  *
  * The per-band census is bounded by `value-range / bandWidth`, NOT by
  * row count, so it is "tiny" only when the banded column's domain is
  * bounded (prices, days, quantized scores). A wide-domain column —
  * epoch micros, raw 64-bit ids — silently turns the driver collect
  * into an opaque OOM. The `maxBands` require (the mutualInformation
  * `maxCells` discipline, propagated as round-10/11 verdicts directed)
  * turns that into an actionable error BEFORE any collect happens: the
  * cell count is measured with a distributed `count()` first, never by
  * collecting and hoping.
  */
object Banded {

  /** Pass-1 census: per-(group, band) weight totals → exclusive prefix
    * offsets per group, plus per-group grand totals — all driver-side,
    * behind the `maxBands` gate.
    *
    * @param perBand   frame carrying `groupCols`, a long `__band`
    *                  column, and a long weight column (already reduced
    *                  to one row per banded unit or finer; callers
    *                  localCheckpoint it so census + ranked pass share
    *                  the scan)
    * @param groupCols columns ranks restart over (empty = one global
    *                  rank space)
    * @param weightCol per-row weight to accumulate (1 for plain counts)
    * @param maxBands  fail-fast cap on (group, band) cells
    * @return (offset rows `(groupKey, band, exclusiveOffset)`,
    *         per-group grand totals keyed the same way) */
  def bandCensus(
      perBand: DataFrame,
      groupCols: Seq[String],
      weightCol: String,
      maxBands: Long = 1000000L)
      : (Seq[(Seq[Any], Long, Long)], Map[Seq[Any], Long]) = {
    val (rows, totals) =
      bandCensusN(perBand, groupCols, Seq(weightCol), maxBands)
    (rows.map { case (g, b, offs) => (g, b, offs.head) },
      totals.view.mapValues(_.head).toMap)
  }

  /** [[bandCensus]] for operators carrying SEVERAL weights through one
    * banded pass (e.g. vocabGrowth's parallel token and new-term
    * cumsums): one guarded census, one collect, one exclusive prefix
    * scan per weight — never two censuses over the same frame.
    *
    * @return (offset rows `(groupKey, band, exclusiveOffsets —
    *         one per weightCol, in order)`, per-group grand totals) */
  def bandCensusN(
      perBand: DataFrame,
      groupCols: Seq[String],
      weightCols: Seq[String],
      maxBands: Long = 1000000L)
      : (Seq[(Seq[Any], Long, Seq[Long])], Map[Seq[Any], Seq[Long]]) = {
    require(maxBands > 0, "positive maxBands")
    require(weightCols.nonEmpty, "at least one weight column")
    val keyCols = (groupCols :+ "__band").map(col)
    val aggs = weightCols.zipWithIndex.map { case (w, i) =>
      sum(col(w)).as(s"__t$i") }
    val agg = perBand.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val nBands = agg.count()
    require(nBands <= maxBands,
      s"bandCensus: $nBands (group, band) cells exceed maxBands=$maxBands" +
        " — the banded column's domain is too wide for this bandWidth" +
        " (epoch micros? raw ids?): raise bandWidth, quantize the column," +
        " or raise maxBands deliberately")
    val rows = agg.collect().map { r =>
      (groupCols.indices.map(r.get).toSeq: Seq[Any],
        r.getLong(groupCols.length),
        weightCols.indices.map(i => r.getLong(groupCols.length + 1 + i)))
    }.toSeq
    val byGroup = rows.groupBy(_._1)
    val offsets = byGroup.toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      val offs = sorted.map(_._3)
        .scanLeft(weightCols.map(_ => 0L): Seq[Long]) { (acc, t) =>
          acc.lazyZip(t).map(_ + _) }
        .dropRight(1)
      sorted.map(_._2).zip(offs).map { case (b, off) => (g, b, off) }
    }
    val totals = byGroup.view.mapValues(rs =>
      rs.map(_._3).reduce((a, b) => a.lazyZip(b).map(_ + _))).toMap
    (offsets, totals)
  }
}
