package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Warehouse snapshot-retention and commit-metadata contracts (the
  * versioning behaviors the rollup/index artifacts build on; the
  * mutation semantics themselves are covered by the lifecycle suites). */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def dir() = Files.createTempDirectory("wh_spec").toString

  private def frame(tag: Int) =
    (0 until 10).map(i => (i.toLong, tag)).toDF("id", "tag")

  "retention" should "keep `retain` prior versions readable while mutations land" in {
    val wh = new Warehouse(spark, dir(), retain = 2)
    wh.overwrite("t", frame(0)) // v0
    wh.rewrite("t", _.withColumn("tag", lit(1))) // v1
    // the long-lived reader: a lazy frame opened at v1
    val openedAtV1 = wh.read("t")
    wh.rewrite("t", _.withColumn("tag", lit(2))) // v2
    wh.rewrite("t", _.withColumn("tag", lit(3))) // v3, v0 vacuumed
    wh.currentVersion("t") shouldBe 3
    // N−2 is still on disk under retain=2 — the reader survives two
    // mutations (under retain=1 this read would hit deleted files)
    openedAtV1.agg(max(col("tag"))).collect()(0).getInt(0) shouldBe 1
    wh.readVersion("t", 1).count() shouldBe 10
    // ...and N−3 (v0) is vacuumed
    an[IllegalArgumentException] should be thrownBy wh.readVersion("t", 0)
  }

  it should "vacuum beyond the window under the default retain=1" in {
    val wh = new Warehouse(spark, dir())
    wh.overwrite("t", frame(0)) // v0
    wh.rewrite("t", _.withColumn("tag", lit(1))) // v1
    wh.rewrite("t", _.withColumn("tag", lit(2))) // v2, v0 vacuumed
    wh.readVersion("t", 1).count() shouldBe 10
    an[IllegalArgumentException] should be thrownBy wh.readVersion("t", 0)
  }

  "commitMeta" should "flip atomically with the data and stay invisible to scans" in {
    val wh = new Warehouse(spark, dir())
    wh.overwrite("t", frame(0), Map("committedBatchId" -> "7", "note" -> "a=b"))
    wh.commitMeta("t") shouldBe Map("committedBatchId" -> "7", "note" -> "a=b")
    // underscore sidecar never leaks into the read
    wh.read("t").columns.toSeq shouldBe Seq("id", "tag")
    wh.read("t").count() shouldBe 10
    // a commit WITHOUT meta clears it (meta describes ITS version only)
    wh.overwrite("t", frame(1))
    wh.commitMeta("t") shouldBe Map.empty
  }
}
