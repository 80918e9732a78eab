package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Round-close completeness gate: every query registered in
  * `SparkEntry.queries` must have a section in PLANS.md and a timing in
  * the round's TIMINGS json, or this main exits NONZERO listing the
  * gaps. Exists because the regenerate-then-keep-building leak shipped
  * three rounds in a row (r6, r8, r10): feature commits landing AFTER
  * the artifact regeneration left the final-wave queries with green
  * correctness rows but no TIMINGS/PLANS records — and nothing failed.
  * Run as the LAST step of the close sequence:
  * `sbt "runMain graft.tools.CheckArtifacts PLANS.md TIMINGS_rN.json"`.
  *
  * No Spark session: the check reads the query REGISTRY (a Map of
  * closures) and two text artifacts. */
object CheckArtifacts {
  def main(args: Array[String]): Unit = {
    val plansPath = args.headOption.getOrElse("PLANS.md")
    val timingsPath = args.drop(1).headOption.getOrElse {
      System.err.println("usage: CheckArtifacts <PLANS.md> <TIMINGS_rN.json>")
      sys.exit(2); ""
    }
    val registered = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet

    val plans = Files.readString(Paths.get(plansPath))
      .linesIterator.collect { case l if l.startsWith("## ") => l.drop(3).trim }
      .toSet
    // the timings file is one JSON object whose "queries" map keys every
    // benched query — match keys lexically ("name": n) rather than
    // pulling in a JSON dependency
    val timingsText = Files.readString(Paths.get(timingsPath))
    val timed = "\"([A-Za-z0-9_]+)\"\\s*:\\s*[0-9.]".r
      .findAllMatchIn(timingsText).map(_.group(1)).toSet

    val noPlan = (registered -- plans).toSeq.sorted
    val noTime = (registered -- timed).toSeq.sorted
    // stray sections for queries that no longer exist are drift too
    val stalePlan = (plans -- registered).toSeq.sorted

    println(s"registered queries: ${registered.size} " +
      s"(${oracled.size} with SQL oracles, " +
      s"${(registered -- oracled).size} rows-only)")
    println(s"$plansPath sections: ${plans.size}; " +
      s"$timingsPath query keys: ${(timed & registered).size}")
    var bad = false
    if (noPlan.nonEmpty) {
      bad = true
      System.err.println(
        s"MISSING from $plansPath (${noPlan.size}): ${noPlan.mkString(", ")}")
    }
    if (noTime.nonEmpty) {
      bad = true
      System.err.println(
        s"MISSING from $timingsPath (${noTime.size}): ${noTime.mkString(", ")}")
    }
    if (stalePlan.nonEmpty) {
      bad = true
      System.err.println(
        s"STALE sections in $plansPath (${stalePlan.size}): " +
          stalePlan.mkString(", "))
    }
    if (bad) sys.exit(1)
    println("artifacts complete: every registered query has a plan and a timing")
  }
}
