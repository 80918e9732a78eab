package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "an image-ish doc"),
    (1L, "an audio-ish doc"),
    (2L, "a video-ish doc"),
    (5L, "another video doc")
  ).toDF("doc_id", "text")

  "fakeMediaTable" should "produce binary payloads with prunable metadata" in {
    val media = Multimodal.fakeMediaTable(docs)
    media.schema("payload").dataType.typeName shouldBe "binary"
    val types = media.select("doc_id", "meta.mediaType").as[(Long, String)]
      .collect().toMap
    types(0L) shouldBe "image"
    types(1L) shouldBe "audio"
    types(2L) shouldBe "video"
  }

  "decodeFeatures" should "run the batched stub kernel deterministically" in {
    val media = Multimodal.fakeMediaTable(docs)
    val f1 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    f1 shouldBe f2
    f1.map(_.doc_id) shouldBe Array(0L, 1L, 2L, 5L)
    // byteLen must equal the utf-8 payload length
    f1(0).byteLen shouldBe "an image-ish doc".getBytes("UTF-8").length.toLong
    f1(0).checksumByte should (be >= 0L and be < 256L)
  }

  it should "only read metadata when the payload is not needed (column pruning)" in {
    val media = Multimodal.fakeMediaTable(docs)
    val plan = media.select("meta.mediaType").queryExecution.optimizedPlan.toString
    plan should not include "payload"
  }

  "sampleFrames" should "fan out one row per sampled frame, video only" in {
    val media = Multimodal.fakeMediaTable(docs)
    val frames = Multimodal.sampleFrames(media, everyNth = 4)
    // doc 2: nFrames=3 → frames 0; doc 5: nFrames=6 → frames 0, 4
    frames.select("doc_id", "frame_idx").as[(Long, Long)].collect().toSet shouldBe
      Set((2L, 0L), (5L, 0L), (5L, 4L))
  }
}
