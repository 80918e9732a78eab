package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

class AnnArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh = new Warehouse(spark,
    Files.createTempDirectory("ann_artifacts").toString)

  private lazy val emb = (0L until 40L)
    .map(i => (i, Seq.tabulate(16)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 6f)))
    .toDF("vec_id", "embedding")

  "PQ codebook persistence" should "round-trip the exact codebook" in {
    val wh = freshWh
    val cb = Similarity.pqTrainSeed(emb, m = 4, kPerSub = 8, dim = 16)
    AnnArtifacts.savePqCodebook(wh, "cb", cb)
    AnnArtifacts.loadPqCodebook(wh, "cb") shouldBe cb
  }

  it should "load a TRAINED codebook that retrieves identically to the in-memory one" in {
    val wh = freshWh
    val cb = Similarity.pqTrainKmeans(emb, m = 4, kPerSub = 8, dim = 16, iters = 2)
    AnnArtifacts.savePqCodebook(wh, "cbk", cb)
    val loaded = AnnArtifacts.loadPqCodebook(wh, "cbk")
    loaded shouldBe cb
    val queries = emb.filter(col("vec_id") < 3)
    val a = Similarity.pqTopK(emb, queries, cb, k = 5)
      .select("query_id", "neighbor_id", "adc").collect().map(_.toSeq).toSet
    val b = Similarity.pqTopK(emb, queries, loaded, k = 5)
      .select("query_id", "neighbor_id", "adc").collect().map(_.toSeq).toSet
    b shouldBe a
  }

  it should "retrieve identically through a persisted IVF-PQ artifact pair" in {
    val wh = freshWh
    val anchors = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val res = Similarity.ivfResiduals(emb, anchors)
    val cb = Similarity.pqTrainSeed(res, m = 4, kPerSub = 8, dim = 16, vecCol = "rv")
    AnnArtifacts.saveAnchors(wh, "ipq_a", anchors)
    AnnArtifacts.savePqCodebook(wh, "ipq_cb", cb)
    val la = AnnArtifacts.loadAnchors(wh, "ipq_a")
    val lcb = AnnArtifacts.loadPqCodebook(wh, "ipq_cb")
    val queries = emb.filter(col("vec_id") < 3)
    val a = Similarity.ivfPqTopK(emb, queries, anchors, cb, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id", "adc").collect().map(_.toSeq).toSet
    val b = Similarity.ivfPqTopK(emb, queries, la, lcb, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id", "adc").collect().map(_.toSeq).toSet
    b shouldBe a
  }

  "kNN graph persistence" should "round-trip edges bit-identically and validate parameters" in {
    val wh = freshWh
    val anchors = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    AnnArtifacts.saveKnnGraph(wh, "g", emb, anchors, k = 3)
    val (edges, meta) = AnnArtifacts.loadKnnGraph(wh, "g",
      expected = Some(AnnArtifacts.KnnGraphMeta(3, 4, 100000)))
    meta shouldBe AnnArtifacts.KnnGraphMeta(3, 4, 100000)
    val direct = Similarity.knnGraph(emb, anchors, k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .collect().map(_.toSeq).toSet
    edges.collect().map(_.toSeq).toSet shouldBe direct
    direct should not be empty
    // PageRank over loaded edges == PageRank over in-memory edges
    val nodes = emb.select(col("vec_id").as("id"))
    val viaLoaded = graft.operators.Graphs.pageRank(
      edges.select(col("src"), col("dst")), nodes, iters = 3)
      .collect().map(_.toSeq).toSet
    val viaDirect = graft.operators.Graphs.pageRank(
      Similarity.knnGraph(emb, anchors, k = 3)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst")),
      nodes, iters = 3).collect().map(_.toSeq).toSet
    viaLoaded shouldBe viaDirect
  }

  it should "reject a parameter-mismatched load loudly" in {
    val wh = freshWh
    val anchors = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    AnnArtifacts.saveKnnGraph(wh, "g2", emb, anchors, k = 3)
    an[IllegalArgumentException] should be thrownBy
      AnnArtifacts.loadKnnGraph(wh, "g2",
        expected = Some(AnnArtifacts.KnnGraphMeta(10, 4, 100000)))
  }

  "anchor persistence" should "round-trip an IVF anchor set" in {
    val wh = freshWh
    val anchors = Similarity.kmeansAnchors(emb, k = 4, iters = 2, vecCol = "embedding")
    AnnArtifacts.saveAnchors(wh, "anchors", anchors)
    AnnArtifacts.loadAnchors(wh, "anchors") shouldBe anchors.sortBy(_._1)
  }

  "band index persistence" should "round-trip rows and parameters, and validate expectations" in {
    val wh = freshWh
    val docs = (1L to 30L).map(i => (i, s"some shared text plus token$i filler words here"))
      .toDF("doc_id", "text")
    val meta = AnnArtifacts.BandIndexMeta(5, 16, 4, Dedup.FastXx)
    AnnArtifacts.saveBandIndex(wh, "bands", docs, meta = meta)
    val (frame, loadedMeta) = AnnArtifacts.loadBandIndex(wh, "bands")
    loadedMeta shouldBe meta
    val expected = Dedup.bandKeys(docs, "text", "doc_id", 5, 16, 4, Dedup.FastXx)
      .collect().map(_.toSeq).toSet
    frame.collect().map(_.toSeq).toSet shouldBe expected
    // the disjoint-key-space trap is now a loud error
    an[IllegalArgumentException] should be thrownBy
      AnnArtifacts.loadBandIndex(wh, "bands",
        expected = Some(AnnArtifacts.BandIndexMeta(5, 16, 8, Dedup.FastXx)))
  }

  it should "append fresh docs' bands using the persisted parameters" in {
    val wh = freshWh
    val docs = (1L to 10L).map(i => (i, s"alpha beta gamma delta epsilon token$i zeta"))
      .toDF("doc_id", "text")
    AnnArtifacts.saveBandIndex(wh, "bands", docs,
      meta = AnnArtifacts.BandIndexMeta(5, 16, 4, Dedup.FastXx))
    val before = wh.read("bands").count()
    val fresh = Seq((11L, "totally new words never seen in any earlier document at all"))
      .toDF("doc_id", "text")
    AnnArtifacts.appendToBandIndex(wh, "bands", fresh)
    wh.read("bands").count() shouldBe before + 4 // one key per band
    wh.read("bands").filter(col("id") === 11L).count() shouldBe 4
  }

  "admissionStreamIndexed" should "gate a stream against the persisted index" in {
    implicit val sqlCtx = spark.sqlContext
    val wh = freshWh
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"))
      .toDF("doc_id", "text")
    // non-default banding parameters: the stream MUST pick these up from
    // the meta table or its probe keys live in a disjoint space
    AnnArtifacts.saveBandIndex(wh, "gate", corpus,
      meta = AnnArtifacts.BandIndexMeta(4, 16, 4, Dedup.FastXx))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.streaming.EventStreams.admissionStreamIndexed(
      stream.toDF().toDF("doc_id", "text"), wh, "gate",
      (batch, _) => admitted.synchronized {
        admitted ++= batch.select("doc_id").collect().map(_.getLong(0))
      })
    try {
      stream.addData(
        (100L, "the quick brown fox jumps over the lazy dog again and again today"),
        (101L, "completely unrelated fresh content about spark catalyst planning rules"))
      q.processAllAvailable()
      admitted.synchronized(admitted.toSet) shouldBe Set(101L) // dup rejected
    } finally q.stop()
  }
}
