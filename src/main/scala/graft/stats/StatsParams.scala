package graft.stats

import graft.functions.Scalars.AccLevel
import graft.selector._

/** The per-pipeline stats endpoints' query-parameter vocabulary
  * (SURVEY §2.11; reference `api/SentinelServlet.scala:219-273` parses
  * these, deployments compose the selectors): accLevel routes the unit
  * table, libType gates pairing, runIds/references/annotations narrow the
  * corpus, timeSorted vs seeded shuffle orders, nLimit truncates. */
final case class StatsParams(
    accLevel: AccLevel = AccLevel.ReadGroup,
    libType: Option[Selector.LibType] = None,
    runIds: Seq[String] = Seq.empty,
    references: Seq[String] = Seq.empty,
    annotations: Seq[String] = Seq.empty,
    timeSorted: Boolean = false,
    shuffleSeed: Long = 42L,
    nLimit: Option[Int] = None) {

  /** The selector conjunction these params denote. Empty sequences are
    * no-ops, mirroring the reference's dropped empty selectors:
    * runIds → `runId ∈ set`; references → scalar `refId ∈ set` (pref
    * shape); annotations → `annotIds ∩ set ≠ ∅` (pann shape). */
  def selectors: Seq[Selector] = Seq(
    ManyContainOne("runId", runIds),
    ManyContainOne("refId", references),
    ManyIntersectMany("annotIds", annotations),
    Selector.fromLibType(libType))

  def sortOrRandom: Either[Long, String] =
    if (timeSorted) Right("creationTimeUtc") else Left(shuffleSeed)
}
