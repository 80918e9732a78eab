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

  private def encodeImage(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  "decodeFeatures" should "really decode PNG and JPEG bytes via ImageIO" in {
    val png = encodeImage(20, 10, 0x336699, "png")
    val jpg = encodeImage(8, 8, 0x808080, "jpg")
    val media = Seq(
      Multimodal.MediaRecord(0L, Multimodal.MediaMeta("image", 20, 10, 1), png),
      Multimodal.MediaRecord(3L, Multimodal.MediaMeta("image", 8, 8, 1), jpg),
      // an "image" whose payload is not an encoded image → decode fields null
      Multimodal.MediaRecord(6L, Multimodal.MediaMeta("image", 1, 1, 1),
        "not an image".getBytes("UTF-8")),
      // an "audio" row whose payload is not an audio container → the
      // audio decode attempt fails and every decode field stays null
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("audio", 0, 0, 1), png)
    ).toDS().toDF()
    val f = Multimodal.decodeFeatures(media).collect().map(x => x.doc_id -> x).toMap

    f(0L).decodedWidth shouldBe Some(20)
    f(0L).decodedHeight shouldBe Some(10)
    // solid 0x336699 → exact Rec.601 luma on every sampled pixel
    f(0L).meanLuma.get shouldBe (0.299 * 0x33 + 0.587 * 0x66 + 0.114 * 0x99) +- 1e-9
    f(3L).decodedWidth shouldBe Some(8)
    f(3L).meanLuma.get shouldBe 128.0 +- 3.0 // jpeg is lossy
    f(6L).decodedWidth shouldBe None
    f(6L).byteLen shouldBe 12L // byte stats still computed
    f(1L).decodedWidth shouldBe None // image decode never runs on audio
    f(1L).decodedSampleRate shouldBe None // png bytes are not a WAV
  }

  it should "really decode PCM WAV bytes via javax.sound.sampled" in {
    // 11 samples at 8 kHz: +5, +5, -7, 0, -1, +2, +2, +2, -3, -3, +9
    // peak 9; sum 11; >=0-boundary flips at i=2,3,4,5,8,10 → 6
    val s = Array[Short](5, 5, -7, 0, -1, 2, 2, 2, -3, -3, 9)
    val wav = Multimodal.wavBytes(8000, s)
    val media = Seq(
      Multimodal.MediaRecord(42L, Multimodal.MediaMeta("audio", 0, 0, 1), wav)
    ).toDS().toDF()
    val f = Multimodal.decodeFeatures(media).collect().head
    f.decodedSampleRate shouldBe Some(8000)
    f.decodedChannels shouldBe Some(1)
    f.decodedSamples shouldBe Some(11L)
    f.peakAbs shouldBe Some(9L)
    f.sampleSum shouldBe Some(11L)
    f.zeroCrossings shouldBe Some(6L)
    f.byteLen shouldBe wav.length.toLong // container, not raw PCM, length
  }

  it should "decode the full sample range without sign or endianness errors" in {
    val s = Array[Short](Short.MaxValue, Short.MinValue, 256, -256, 1, -1)
    val wav = Multimodal.wavBytes(16000, s)
    val media = Seq(
      Multimodal.MediaRecord(7L, Multimodal.MediaMeta("audio", 0, 0, 1), wav)
    ).toDS().toDF()
    val f = Multimodal.decodeFeatures(media).collect().head
    f.decodedSampleRate shouldBe Some(16000)
    f.peakAbs shouldBe Some(32768L) // |Short.MinValue|
    f.sampleSum shouldBe Some(s.map(_.toLong).sum)
    f.decodedSamples shouldBe Some(6L)
  }

  "audioFingerprints" should "be gain-invariant on the decoded waveform" in {
    // the same recording at 1x, 3x gain and a clipped-to-half copy: the
    // sign-of-difference fingerprint of the DECODED samples is identical,
    // while the container BYTES differ everywhere (byte dedup sees nothing)
    val base = Array.tabulate(130)(i =>
      (math.sin(i * 0.7) * 1000).toInt.toShort)
    val gained = base.map(s => (s * 3).toShort)
    val wavA = Multimodal.wavBytes(8000, base)
    val wavB = Multimodal.wavBytes(16000, gained) // different rate too
    wavA should not equal wavB
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("audio", 0, 0, 1), wavA),
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("audio", 0, 0, 1), wavB),
      // non-PCM payload on an audio row → byte-stream fallback
      Multimodal.MediaRecord(3L, Multimodal.MediaMeta("audio", 0, 0, 1),
        "not a wav".getBytes("UTF-8"))
    ).toDS().toDF()
    val f = Multimodal.audioFingerprints(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    f(1L)._2 shouldBe true
    f(2L)._2 shouldBe true
    f(1L)._1 shouldBe f(2L)._1 // gain- and rate-label-invariant
    f(3L)._2 shouldBe false // fell back to the byte-stream hash
    val pairs = Multimodal.audioNearDup(media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.keySet should contain((1L, 2L))
    pairs((1L, 2L)) shouldBe 0L
  }

  "fakeAudioGainPairsTable" should "plant one exact fingerprint pair per re-gained family" in {
    // the at-scale stress corpus in miniature: 10 families of (1x, 3x)
    // gain siblings — every payload decodes, each family collides at
    // hamming 0, and NO cross-family pair sneaks in (fingerprints are
    // pseudo-random per family)
    val media = Multimodal.fakeAudioGainPairsTable(
      spark.range(20).select(col("id").as("doc_id")))
    val f = Multimodal.audioFingerprints(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    all(f.values.map(_._2)) shouldBe true // every WAV decodes
    (0L until 10L).foreach { fam =>
      f(2 * fam)._1 shouldBe f(2 * fam + 1)._1 // gain-invariant
    }
    f.values.map(_._1).toSet.size shouldBe 10 // distinct across families
    val pairs = Multimodal.audioNearDup(media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.toSet shouldBe (0L until 10L).map(k => (2 * k, 2 * k + 1, 0L)).toSet
  }

  "audioNearDup" should "never pair a decoded-waveform fingerprint with a byte-dHash fallback" in {
    // forced 64-bit collision across the two hash families: a constant-
    // sample WAV's waveform fingerprint is 0 (no "next larger" step) and
    // an undecodable constant-byte payload's byte-dHash is also 0 — the
    // hamming-0 pair ADVICE r16 warned about. The decoded-flag band
    // space must keep them apart, while same-space pairs still match.
    val flat = Array.fill[Short](130)(500)
    val media = Seq(
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("audio", 0, 0, 1),
        Multimodal.wavBytes(8000, flat)),
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("audio", 0, 0, 1),
        Array.fill[Byte](130)(7)), // undecodable, dHashBytes = 0
      Multimodal.MediaRecord(3L, Multimodal.MediaMeta("audio", 0, 0, 1),
        Array.fill[Byte](130)(9))  // undecodable, dHashBytes = 0
    ).toDS().toDF()
    val f = Multimodal.audioFingerprints(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    f(1L) shouldBe ((0L, true))  // decoded space
    f(2L) shouldBe ((0L, false)) // fallback space, same 64-bit value
    val pairs = Multimodal.audioNearDup(media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((2L, 3L))      // same-space hamming-0 pair kept
    pairs should not contain ((1L, 2L)) // cross-space collision suppressed
    pairs should not contain ((1L, 3L))
  }

  "fakeAudioTable" should "round-trip its square waves through the real decoder" in {
    val audio = Multimodal.fakeAudioTable(Seq(0L, 13L, 101L).toDF("doc_id"))
    val f = Multimodal.decodeFeatures(audio).collect().map(x => x.doc_id -> x).toMap
    def expected(id: Long): (Int, Long, Long, Long, Long) = {
      val h = 2 + (id % 9).toInt
      val n = 400 + (id % 50).toInt * 7
      val a = 1000 + (id % 20).toInt * 100
      val r = n % (2 * h)
      (8000 + (id % 3).toInt * 4000, n.toLong, a.toLong,
        a.toLong * (2 * math.min(r, h) - r), ((n - 1) / h).toLong)
    }
    Seq(0L, 13L, 101L).foreach { id =>
      val (rate, n, peak, sum, zc) = expected(id)
      f(id).decodedSampleRate shouldBe Some(rate)
      f(id).decodedSamples shouldBe Some(n)
      f(id).peakAbs shouldBe Some(peak)
      f(id).sampleSum shouldBe Some(sum)
      f(id).zeroCrossings shouldBe Some(zc)
    }
  }

  private def encodeGradient(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = (x * 255) / (w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  "perceptualHashes" should "pixel-dHash decodable images and fall back to the content stream" in {
    val grad = encodeGradient(90, 80, "png")
    val flat = encodeImage(90, 80, 0x808080, "png")
    val media = Seq(
      Multimodal.MediaRecord(0L, Multimodal.MediaMeta("image", 90, 80, 1), grad),
      Multimodal.MediaRecord(3L, Multimodal.MediaMeta("image", 90, 80, 1), flat),
      Multimodal.MediaRecord(6L, Multimodal.MediaMeta("image", 1, 1, 1),
        "not an image at all".getBytes("UTF-8")),
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("audio", 0, 0, 1),
        // 87 strictly-ascending code points: > 65 of them, so every
        // sampled position advances and every difference bit fires
        (33 until 120).map(_.toChar).mkString.getBytes("UTF-8"))
    ).toDS().toDF()
    val got = Multimodal.perceptualHashes(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // strictly increasing left-to-right luminance ⇒ every "right neighbor
    // brighter" bit fires ⇒ the all-ones hash
    got(0L) shouldBe ((-1L, true))
    // flat image: no bit fires
    got(3L) shouldBe ((0L, true))
    // undecodable image payload and audio route through the code-point
    // fallback (decoded=false), ascending bytes ⇒ all sampled bits fire
    got(6L)._2 shouldBe false
    got(1L) shouldBe ((-1L, false))
  }

  "perceptualNearDup" should "pair re-encoded variants of the same image, not distinct images" in {
    // the same gradient encoded at two sizes (re-encode + rescale), plus
    // a flat image: dHash is scale-invariant by construction here
    val media = Seq(
      Multimodal.MediaRecord(0L, Multimodal.MediaMeta("image", 90, 80, 1),
        encodeGradient(90, 80, "png")),
      Multimodal.MediaRecord(1L, Multimodal.MediaMeta("image", 45, 40, 1),
        encodeGradient(45, 40, "png")),
      Multimodal.MediaRecord(2L, Multimodal.MediaMeta("image", 90, 80, 1),
        encodeImage(90, 80, 0x336699, "png"))
    ).toDS().toDF()
    val pairs = Multimodal.perceptualNearDup(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.keySet shouldBe Set((0L, 1L))
    pairs((0L, 1L)) shouldBe 0L
  }

  it should "match a naive all-pairs hamming filter on the fallback path" in {
    val texts = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and agaiN"),
      (2L, "completely different content with other characters entirely"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"))
    val media = Multimodal.fakeMediaTable(texts.toDF("doc_id", "text"))
    val got = Multimodal.perceptualNearDup(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hashes = Multimodal.perceptualHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = (for {
      a <- texts.map(_._1); b <- texts.map(_._1) if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= 3
    } yield (a, b) -> d.toLong).toMap
    got shouldBe naive
    got.keySet should contain((0L, 3L)) // exact dup survives at distance 0
  }

  "sampleFrames" should "fan out one row per sampled frame, video only" in {
    val media = Multimodal.fakeMediaTable(docs)
    val frames = Multimodal.sampleFrames(media, everyNth = 4)
    // doc 2: nFrames=3 → frames 0; doc 5: nFrames=6 → frames 0, 4
    frames.select("doc_id", "frame_idx").as[(Long, Long)].collect().toSet shouldBe
      Set((2L, 0L), (5L, 0L), (5L, 4L))
  }
}
