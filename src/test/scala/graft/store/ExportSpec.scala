package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 100L).map(i => (i, s"doc $i"))
    .toDF("doc_id", "text")

  "assignShards" should "assign every row a stable shard in [0, nShards)" in {
    val a = Export.assignShards(docs, nShards = 8)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Export.assignShards(docs, nShards = 8)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    a shouldBe b // deterministic across invocations
    a.values.foreach { s => s should (be >= 0 and be < 8) }
    // md5 avalanche: 100 sequential ids should hit every one of 8 shards
    a.values.toSet should have size 8
  }

  it should "change assignment with the seed but keep the row set" in {
    val a = Export.assignShards(docs, 8, seed = 1L).select("shard")
      .collect().map(_.getInt(0)).toSeq
    val b = Export.assignShards(docs, 8, seed = 2L).select("shard")
      .collect().map(_.getInt(0)).toSeq
    a should not be b
    a.length shouldBe 100
  }

  "exportShards" should "write per-shard directories that round-trip the frame" in {
    val dir = Files.createTempDirectory("graft_export").toFile
    try {
      val path = s"${dir.getAbsolutePath}/shards"
      Export.exportShards(docs, path, nShards = 4)
      val dirs = new java.io.File(path).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      dirs shouldBe (0 until 4).map(i => s"shard=$i").toSet
      val back = spark.read.parquet(path)
      back.count() shouldBe 100
      back.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
        docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // the written assignment is the deterministic one
      val expected = Export.assignShards(docs, 4)
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      back.select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap shouldBe expected
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  "exportJsonl" should "write gzip'd line-JSON shards that round-trip with an explicit schema" in {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    try {
      val path = s"${dir.getAbsolutePath}/jsonl"
      Export.exportJsonl(docs, path, nShards = 4)
      val shardDirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      shardDirs.map(_.getName).toSet shouldBe (0 until 4).map(i => s"shard=$i").toSet
      // files are gzip'd line-JSON
      val files = shardDirs.flatMap(_.listFiles()).filter(_.getName.endsWith(".json.gz"))
      files should not be empty
      val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(files.head))
      val firstLine = scala.io.Source.fromInputStream(in, "UTF-8").getLines().next()
      firstLine should startWith("{")
      firstLine should include("\"doc_id\"")
      in.close()
      // schema-supplied read-back round-trips content exactly
      val back = Export.readJsonl(spark, path,
        org.apache.spark.sql.types.StructType(docs.schema.fields))
      back.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
        docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }
}
