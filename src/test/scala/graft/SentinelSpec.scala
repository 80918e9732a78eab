package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Scalars.AccLevel
import graft.lifecycle.JsonPatch._
import graft.model.Records.User
import graft.selector._

/** End-to-end facade walk: the full user journey the reference's
  * integration suites exercise — users, uploads across pipelines, stats
  * queries at both access levels, patch, delete — through one API. */
class SentinelSpec extends SparkSpec {

  private def fixture(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(getClass.getResource(s"/fixtures/$path").toURI))

  "Sentinel" should "support the full reference user journey" in {
    val s = new Sentinel(spark,
      Files.createTempDirectory("graft-sentinel").toString,
      clock = () => Timestamp.valueOf("2024-06-01 12:00:00"))

    // users
    s.addUser("avg", "avg@test.id", "Passw0rd", "Passw0rd", verified = true)
    val avg = s.getUser("avg").get

    // uploads across pipelines
    val m1 = s.upload(fixture("maple/maple_single_sample_multi_rg.json"), "a.json", "maple", avg)
    s.upload(fixture("maple/maple_multi_sample_multi_rg.json"), "b.json", "maple", avg)
    s.upload(fixture("maple/maple_multi_sample_single_rg.json"), "c.json", "maple", avg)
    s.upload(fixture("plain/plain.json"), "d.json", "plain", avg)
    s.upload(fixture("pref/pref_01.json"), "e.json", "pref", avg)

    // the reference's golden global stats + pref contribution
    val stats = s.globalRunStats().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    stats should contain allOf (("maple", 3L, 5L, 7L), ("plain", 1L, 0L, 0L),
      ("pref", 1L, 2L, 0L))

    // stats queries at both access levels
    val rgStats = s.getAggregateStats(
      s.unitsOf("maple", AccLevel.ReadGroup),
      Seq(Selector.visibility(avg.id, avg.isAdmin)),
      Seq("reads" -> col("stats.nReadsInput"))).collect()(0)
    rgStats.getAs[Long]("reads_n") shouldBe 7L
    val points = s.getStats(
      s.unitsOf("maple", AccLevel.Sample),
      Seq.empty, Seq(col("_id"), col("stats.nSnps"), col("creationTimeUtc")),
      Right("creationTimeUtc"), Some(3))
    points.count() shouldBe 3

    // raw download round-trips
    s.getRunFile(m1, avg) shouldBe fixture("maple/maple_single_sample_multi_rg.json")

    // patch + propagation, then delete with cascade
    s.patchRun(m1, avg, List(ReplaceOp("/labels/runName", "R2"))) shouldBe ((1, 1, 2))
    s.deleteRun(m1, avg)
    s.getRuns(avg, Seq("maple")).count() shouldBe 2
    s.globalRunStats().collect().map(r => (r.getString(0), r.getLong(1)))
      .toMap.apply("maple") shouldBe 2L

    // dictionaries listed
    s.listReferences().count() shouldBe 1
  }

  it should "answer §2.11-shaped stats requests (params object)" in {
    val s = new Sentinel(spark,
      Files.createTempDirectory("graft-sentinel").toString,
      clock = () => Timestamp.valueOf("2024-06-01 12:00:00"))
    s.addUser("uzr", "u@test.id", "Passw0rd", "Passw0rd", verified = true)
    val u = s.getUser("uzr").get
    val m4 = s.upload(fixture("maple/maple_multi_sample_multi_rg.json"), "a.json", "maple", u)
    s.upload(fixture("maple/maple_single_sample_single_rg.json"), "b.json", "maple", u)
    s.upload(fixture("pref/pref_01.json"), "p1.json", "pref", u)
    s.upload(fixture("pref/pref_02.json"), "p2.json", "pref", u)

    // runIds narrowing at read-group level
    val agg = s.getAggregateStats("maple",
      graft.stats.StatsParams(runIds = Seq(m4)),
      Seq("reads" -> col("stats.nReadsInput"))).collect()(0)
    agg.getAs[Long]("reads_n") shouldBe 3L

    // references narrowing at sample level (pref_01's dictionary only)
    val refId = s.warehouse.read(graft.store.Warehouse.References)
      .filter(col("refName") === "testRef").select("refId")
      .collect()(0).getString(0)
    s.getStats("pref",
      graft.stats.StatsParams(
        accLevel = AccLevel.Sample, references = Seq(refId), timeSorted = true),
      Seq(col("_id"), col("creationTimeUtc"))).count() shouldBe 2

    // libType gate at read-group level (maple is paired-end by definition)
    s.getStats("maple",
      graft.stats.StatsParams(libType = Some(Selector.Single), nLimit = Some(10)),
      Seq(col("_id"), col("creationTimeUtc"))).count() shouldBe 0
  }
}
