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

  // --- driver-side tiny-commit fast path (optimization r18) ----------

  "the local-relation fast path" should
      "write byte-compatible parquet: read-back equals the distributed write" in {
    val wh = new Warehouse(spark, dir())
    // mixed types incl. array<float> and nulls — the shapes the meta /
    // codebook / anchor tables actually commit
    val local = Seq(
      (1L, Some("a"), Seq(1.0f, 2.5f)),
      (2L, None, Seq.empty[Float]),
      (3L, Some("ü — é"), Seq(-0.0f, Float.MinPositiveValue)))
      .toDF("id", "s", "vec")
    wh.overwrite("tiny", local)                       // LocalRelation → fast path
    wh.overwrite("dist", local.repartition(1))        // non-local plan → Spark writer
    val a = wh.read("tiny").orderBy("id").collect().toSeq
    val b = wh.read("dist").orderBy("id").collect().toSeq
    a shouldBe b
    wh.read("tiny").schema shouldBe wh.read("dist").schema
    // the fast path wrote exactly one driver-side part file, no job
    val v0 = java.nio.file.Paths.get(wh.root, "tiny", "v0")
    val parts = java.nio.file.Files.list(v0).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    parts.length shouldBe 1
    parts.head should include("part-00000-")
  }

  it should "keep the snapshot-isolation contract: an uncommitted version " +
      "dir never reaches readers, and a crashed leftover is clobbered" in {
    val wh = new Warehouse(spark, dir())
    wh.overwrite("t", frame(0)) // v0 committed
    // simulate a crash BETWEEN file write and pointer swing: an orphan
    // v1 exists, the pointer still says v0 — readers stay on v0
    val v1 = java.nio.file.Paths.get(wh.root, "t", "v1")
    java.nio.file.Files.createDirectories(v1)
    java.nio.file.Files.write(v1.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    wh.currentVersion("t") shouldBe 0
    wh.read("t").agg(max(col("tag"))).collect()(0).getInt(0) shouldBe 0
    // the retried commit clobbers the orphan and lands cleanly at v1
    wh.overwrite("t", frame(9))
    wh.currentVersion("t") shouldBe 1
    wh.read("t").agg(max(col("tag"))).collect()(0).getInt(0) shouldBe 9
    wh.read("t").count() shouldBe 10
  }

  it should "write an empty local frame as a schema-bearing readable table" in {
    val wh = new Warehouse(spark, dir())
    wh.overwrite("empty", frame(0).filter(lit(false)).limit(0))
    // (an empty local relation still commits a footer with the schema)
    wh.read("empty").count() shouldBe 0
    wh.read("empty").columns.toSeq shouldBe Seq("id", "tag")
  }

  it should "honor retention and commit meta identically to the Spark writer" in {
    val wh = new Warehouse(spark, dir(), retain = 1)
    wh.overwrite("t", frame(0), Map("batch" -> "1")) // v0, fast path
    wh.overwrite("t", frame(1), Map("batch" -> "2")) // v1, fast path
    wh.overwrite("t", frame(2))                      // v2 → v0 vacuumed
    wh.currentVersion("t") shouldBe 2
    wh.readVersion("t", 1).count() shouldBe 10
    an[IllegalArgumentException] should be thrownBy wh.readVersion("t", 0)
    wh.commitMeta("t") shouldBe Map.empty
  }
}
