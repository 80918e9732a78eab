package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata struct
  * — the layout that keeps a 100 TB multimodal table scannable: metadata
  * predicates prune at the parquet level without ever materializing the
  * bytes, and the binary column is only read by stages that decode.
  *
  * IMAGE decode is REAL: payloads that are valid PNG/JPEG/GIF/BMP decode
  * through the JDK's `javax.imageio` inside the batch loop, yielding the
  * actual dimensions and a sampled mean luminance. AUDIO decode is REAL
  * for the JDK-resident containers (PCM-signed WAV/AIFF/AU via
  * `javax.sound.sampled`): header parse + one PCM pass yielding rate,
  * channels, frame count and waveform stats. VIDEO (and compressed
  * audio codecs like MP3/AAC) needs native libraries that are NOT in
  * this container, so those rows route through a clearly-marked STUB
  * kernel that derives deterministic pseudo-features from the bytes.
  * The Spark-side shape — schema, partition-preserving `mapPartitions`,
  * batch iteration, feature struct — is real, tested plumbing either
  * way; swapping the stub for a JNI/ffmpeg kernel touches only
  * `stubDecodeKernel`.
  */
object Multimodal {

  /** Metadata carried next to the payload; prunable without reading bytes. */
  case class MediaMeta(
      mediaType: String, // image | audio | video
      width: Int,
      height: Int,
      nFrames: Int)

  case class MediaRecord(doc_id: Long, meta: MediaMeta, payload: Array[Byte])

  case class MediaFeatures(
      doc_id: Long,
      mediaType: String,
      byteLen: Long,
      checksumByte: Long, // byte-level signal: payload byte sum mod 256
      sampledFrames: Int,
      // real image decode (javax.imageio); None for audio/video rows and
      // for image rows whose payload is not a decodable encoded image
      decodedWidth: Option[Int],
      decodedHeight: Option[Int],
      meanLuma: Option[Double],
      // real audio decode (javax.sound.sampled); None for image/video
      // rows and for audio rows whose payload is not a parseable
      // PCM-signed WAV/AIFF/AU container
      decodedSampleRate: Option[Int],
      decodedChannels: Option[Int],
      decodedSamples: Option[Long],
      peakAbs: Option[Long],
      sampleSum: Option[Long],
      zeroCrossings: Option[Long])

  /** Wrap a text table into a fake media table: payload = utf-8 bytes,
    * metadata derived deterministically. Stands in for a real
    * `images.parquet` until one exists; the downstream plumbing does not
    * care where the bytes came from. */
  def fakeMediaTable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      struct(
        when(col(idCol) % 3 === 0, "image")
          .when(col(idCol) % 3 === 1, "audio")
          .otherwise("video").as("mediaType"),
        (col(idCol) % 640 + 1).cast("int").as("width"),
        (col(idCol) % 480 + 1).cast("int").as("height"),
        (col(idCol) % 30 + 1).cast("int").as("nFrames")).as("meta"),
      encode(col(textCol), "UTF-8").cast("binary").as("payload"))

  /** Wrap a table into a REAL audio media table: every row becomes a
    * genuine PCM16 mono WAV (RIFF container built by the JDK encoder)
    * whose square-wave parameters derive deterministically from the id
    * — rate ∈ {8000,12000,16000}, half-period 2..10, 400..743 samples,
    * amplitude 1000..2900. The decoded features (rate, sample count,
    * peak, signed sum, zero crossings) are therefore pure id arithmetic
    * that any SQL engine replays: [[decodeAudio]] must actually parse
    * the header and round-trip every PCM sample (sign, endianness,
    * framing) for the oracle to go green. Audio twin of the image
    * path's real-PNG spec fixtures. */
  def fakeAudioTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].map { id =>
      val rate = 8000 + (id % 3).toInt * 4000
      val h = 2 + (id % 9).toInt
      val n = 400 + (id % 50).toInt * 7
      val a = (1000 + (id % 20).toInt * 100).toShort
      val samples =
        Array.tabulate(n)(i => if ((i / h) % 2 == 0) a else (-a).toShort)
      MediaRecord(id, MediaMeta("audio", 0, 0, 1), wavBytes(rate, samples))
    }.toDF()
  }

  /** Audio table of RE-GAINED duplicate families for the at-scale
    * fingerprint stress (ids 2k and 2k+1 form family k): both members
    * share a pseudo-random waveform seeded by the family id (xorshift-
    * mixed, so every family's 64-bit fingerprint is effectively an
    * independent random draw — [[fakeAudioTable]]'s 450 (h, n) square-
    * wave combos would collapse 2M rows onto 450 fingerprints and the
    * bucket cap would drop everything), and the odd member carries 3x
    * gain — bytes differ everywhere, the decoded sign-of-difference
    * fingerprint is identical. Ground truth for [[audioNearDup]] is
    * therefore exactly one hamming-0 pair per family; cross-family
    * hamming ≤ 3 collisions have ~2e-9 probability per candidate pair. */
  def fakeAudioGainPairsTable(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val fam = id / 2
      val nS = 130 + (fam % 50).toInt
      val gain = 1 + 2 * (id % 2).toInt
      val samples = Array.tabulate(nS) { i =>
        var x = fam * 0x9E3779B97F4A7C15L + (i + 1) * 0xBF58476D1CE4E5B9L
        x ^= (x >>> 31); x *= 0x94D049BB133111EBL; x ^= (x >>> 27)
        ((x % 1000L).toInt * gain).toShort
      }
      MediaRecord(id, MediaMeta("audio", 0, 0, 1), wavBytes(8000, samples))
    }.toDF()
  }

  /** REAL image decode via the JDK's ImageIO: dimensions plus mean
    * luminance over a bounded (≤64×64) pixel sample grid, so cost per
    * image is capped regardless of resolution. Returns None when the
    * bytes are not a decodable image — deterministic either way. */
  private[operators] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .map { img =>
          val w = img.getWidth
          val h = img.getHeight
          val stepX = math.max(1, w / 64)
          val stepY = math.max(1, h / 64)
          var sum = 0.0
          var n = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              n += 1
              x += stepX
            }
            y += stepY
          }
          (w, h, if (n == 0) 0.0 else sum / n)
        }
    } catch { case _: java.io.IOException => None }

  /** REAL audio decode via the JDK's javax.sound.sampled: parses the
    * container header (WAV/AIFF/AU are JDK-resident — no native codec
    * needed) and streams the PCM frames once, yielding
    * (sampleRate, channels, nFrames, peak |sample|, signed sample sum,
    * zero crossings) — the last three over channel 0, so multi-channel
    * containers still produce one deterministic waveform signature. The
    * signed sum is the endianness/sign canary: a decoder that flips
    * bytes or signs produces wildly different sums on any non-symmetric
    * waveform. Only PCM_SIGNED 16-bit is claimed (the universal
    * interchange format); anything else returns None rather than a
    * half-right feature row. Compressed codecs (MP3/AAC/opus) need
    * native libs that are NOT in this container and land in the stub
    * path below. */
  private[operators] def decodeAudio(
      payload: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
        else {
          val ch = fmt.getChannels
          val frameBytes = fmt.getFrameSize // = 2 * ch for PCM16
          val be = fmt.isBigEndian
          val buf = new Array[Byte](frameBytes * 1024)
          var n = 0L
          var peak = 0L
          var sum = 0L
          var zc = 0L
          var prevNonNeg = true
          var filled = 0
          var read = ais.read(buf)
          while (read > 0) {
            filled = read
            var off = 0
            while (off + frameBytes <= filled) {
              // channel 0 = first sample of the frame
              val s =
                if (be) ((buf(off) << 8) | (buf(off + 1) & 0xff)).toShort
                else ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort
              val nonNeg = s >= 0
              if (n > 0 && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              sum += s
              if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
              n += 1
              off += frameBytes
            }
            read = ais.read(buf)
          }
          Some((fmt.getSampleRate.toInt, ch, n, peak, sum, zc))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** PCM16 mono WAV bytes via the JDK encoder — the synthesis half of
    * the audio round trip ([[decodeAudio]] is the decode half); used by
    * [[fakeAudioTable]] and the specs. */
  private[operators] def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte // little-endian PCM16
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** STUB decode kernel for VIDEO (and non-container audio bytes) —
    * replace with a real native decoder. Must stay deterministic:
    * features are pure functions of (meta, payload). */
  private def stubDecodeKernel(r: MediaRecord): MediaFeatures = {
    // ??? <- real video decode goes here (codec libs not in container)
    var s = 0L
    var i = 0
    while (i < r.payload.length) { s += r.payload(i) & 0xff; i += 1 }
    MediaFeatures(
      doc_id = r.doc_id,
      mediaType = r.meta.mediaType,
      byteLen = r.payload.length.toLong,
      checksumByte = s % 256,
      sampledFrames = math.min(r.meta.nFrames, 8),
      decodedWidth = None,
      decodedHeight = None,
      meanLuma = None,
      decodedSampleRate = None,
      decodedChannels = None,
      decodedSamples = None,
      peakAbs = None,
      sampleSum = None,
      zeroCrossings = None)
  }

  /** Full kernel: byte stats for every row; real ImageIO decode for image
    * rows, real javax.sound decode for audio rows (None columns when the
    * payload isn't a decodable container of the claimed type). */
  private def decodeKernel(r: MediaRecord): MediaFeatures = {
    val base = stubDecodeKernel(r)
    r.meta.mediaType match {
      case "image" =>
        decodeImage(r.payload) match {
          case Some((w, h, luma)) => base.copy(
            decodedWidth = Some(w), decodedHeight = Some(h), meanLuma = Some(luma))
          case None => base
        }
      case "audio" =>
        decodeAudio(r.payload) match {
          case Some((rate, ch, n, peak, sum, zc)) => base.copy(
            decodedSampleRate = Some(rate), decodedChannels = Some(ch),
            decodedSamples = Some(n), peakAbs = Some(peak),
            sampleSum = Some(sum), zeroCrossings = Some(zc))
          case None => base
        }
      case _ => base
    }
  }

  /** Batched decode / feature extraction over the binary column.
    * `mapPartitions` so a real kernel amortizes per-partition init (model
    * load, codec contexts), and records flow through in fixed-size
    * batches — the same batch shape a vectorized/pandas-style decode UDF
    * sees, so swapping in a real kernel changes only `stubDecodeKernel`
    * (per record) or the batch loop (per batch). */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition init for a native kernel happens here (once);
      // ImageIO is JDK-resident so images need none
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decode: a native kernel hands `batch` to the decoder
        // in one call; ImageIO/the stub map records individually
        batch.map(decodeKernel)
      }
    }
  }

  /** Frame sampling plan: explode 1 row per sampled frame index — the
    * shuffle-free fan-out used before a per-frame featurizer. */
  def sampleFrames(media: DataFrame, everyNth: Int = 4): DataFrame =
    media
      .filter(col("meta.mediaType") === "video")
      .select(col("doc_id"), col("meta.nFrames").as("nFrames"))
      .select(col("doc_id"), col("nFrames"),
        explode(sequence(lit(0), col("nFrames") - 1, lit(everyNth))).as("frame_idx"))

  // ---- perceptual hashing / media near-dup --------------------------

  /** dHash (difference hash) of a decoded image: sample a 9×8 luma grid,
    * bit j = "right neighbor brighter" — the classic 64-bit perceptual
    * key that survives re-encoding, scaling, and mild edits (exact
    * byte-level dedup catches none of those). Deterministic. */
  private[operators] def dHashImage(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    def luma(gx: Int, gy: Int): Double = {
      // grid cell (gx ∈ 0..8, gy ∈ 0..7) sampled at its center pixel
      val x = math.min(w - 1, (gx * w + w / 2) / 9)
      val y = math.min(h - 1, (gy * h + h / 2) / 8)
      val rgb = img.getRGB(x, y)
      0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
    }
    var hash = 0L
    var j = 0
    while (j < 64) {
      val gy = j / 8
      val gx = j % 8
      if (luma(gx + 1, gy) > luma(gx, gy)) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Content-stream fallback dHash for payloads that are not decodable
    * images (audio/video, corrupt bytes, the fake table): interpret the
    * payload as UTF-8 (lossy for true binary — U+FFFD substitution — but
    * deterministic), sample 65 code points evenly over the sequence, bit
    * j = "next sampled code point larger". Same 64-bit shape as the
    * pixel hash, and SQL-replayable over text-backed payloads (DuckDB's
    * string ops are code-point based) — the property the oracle uses. */
  private[operators] def dHashBytes(payload: Array[Byte]): Long = {
    val cps = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    // Long math: 64·n overflows Int past ~33.5M code points (one huge
    // payload would index negative and kill the whole job)
    def at(j: Int): Int = cps((j.toLong * n / 65).toInt)
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (at(j + 1) > at(j)) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Per-row 64-bit perceptual hash: real pixel dHash for decodable
    * image payloads (`decoded = true`), byte-stream dHash otherwise.
    * Runs in the same batched `mapPartitions` shape as
    * [[decodeFeatures]]. */
  def perceptualHashes(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val viaImage =
            if (r.meta.mediaType == "image")
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.payload))).map(dHashImage)
              catch { case _: java.io.IOException => None }
            else None
          (r.doc_id, viaImage.getOrElse(dHashBytes(r.payload)),
            viaImage.isDefined)
        }
      }
    }.toDF("doc_id", "dhash", "decoded")
  }

  /** Perceptual near-duplicate pairs over the media table: dHash per row,
    * then the pigeonhole Hamming join of [[Dedup.simhashNearDup]] — a
    * pair within `maxHamming` of 64 bits must agree exactly on at least
    * one of `nBands` bands (maxHamming < nBands), so candidates come from
    * a band equi-join, never all-pairs; `maxBucketSize` drops degenerate
    * buckets (uniform backgrounds hash alike) before the self-join. The
    * 8-byte hash rides through the join, so the radius filter runs
    * inline before the pair distinct. */
  def perceptualNearDup(
      media: DataFrame,
      maxHamming: Int = 3,
      nBands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    hamming64NearDup(perceptualHashes(media), "dhash",
      maxHamming, nBands, maxBucketSize, spaceCol = col("decoded"))

  /** The pigeonhole Hamming self-join over any 64-bit per-row key — the
    * shared engine of [[perceptualNearDup]] and [[audioNearDup]]: a pair
    * within `maxHamming` bits must agree exactly on at least one of
    * `nBands` bands (maxHamming < nBands), so candidates come from a
    * band equi-join, never all-pairs, and `maxBucketSize` drops
    * degenerate buckets before the self-join.
    *
    * `spaceCol` partitions the band keyspace: both callers emit REAL
    * decoded-content hashes for decodable payloads and byte-stream
    * dHashes otherwise, and those two hash families are semantically
    * unrelated 64-bit values — a chance collision across them would
    * report a meaningless "near-dup" (ADVICE r16). Banding per
    * (space, band) keeps each family's pairs intact while making
    * cross-space pairs structurally impossible. */
  private def hamming64NearDup(
      hashes: DataFrame,
      hashCol: String,
      maxHamming: Int,
      nBands: Int,
      maxBucketSize: Int,
      spaceCol: Column = lit(true)): DataFrame = {
    require(nBands >= 1 && 64 % nBands == 0, "bands must evenly split 64 bits")
    require(maxHamming < nBands, "pigeonhole needs maxHamming < nBands")
    val bandBits = 64 / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val banded = Fan.spread(hashes)
      .select(col("doc_id").as("id"), col(hashCol).as("__h"),
        explode(array((0 until nBands).map(b =>
          concat_ws(":", spaceCol.cast("string"), lit(b),
            shiftright(col(hashCol), b * bandBits).bitwiseAND(mask))): _*))
          .as("band"))
      .localCheckpoint()
    val keptBands = banded.groupBy("band")
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBucketSize)
      .select("band")
    val capped = banded.join(keptBands, Seq("band"))
      .repartition(hashes.sparkSession.sparkContext.defaultParallelism, col("band"))
    capped.select(col("band"), col("id").as("id_a"), col("__h").as("h_a"))
      .join(capped.select(col("band"), col("id").as("id_b"), col("__h").as("h_b")),
        Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- audio fingerprinting / near-dup --------------------------------

  /** 65 evenly spaced channel-0 PCM samples of a decodable PCM-signed
    * 16-bit container — the sample grid [[audioFingerprint]] compares.
    * Frame count comes from the container header, so the pass is one
    * streaming read picking grid points; None for non-PCM payloads. */
  private[operators] def decodeAudioSamples(
      payload: Array[Byte], points: Int = 65): Option[Array[Short]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val nFrames = ais.getFrameLength
        if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || nFrames <= 0) None
        else {
          val frameBytes = fmt.getFrameSize
          val be = fmt.isBigEndian
          val out = new Array[Short](points)
          var p = 0
          var frame = 0L
          val buf = new Array[Byte](frameBytes * 1024)
          // AudioInputStream.read returns an integral number of frames
          // by contract, so frame alignment survives buffer boundaries
          var read = ais.read(buf)
          while (read > 0 && p < points) {
            var off = 0
            while (off + frameBytes <= read && p < points) {
              while (p < points && p.toLong * nFrames / points == frame) {
                out(p) =
                  if (be) ((buf(off) << 8) | (buf(off + 1) & 0xff)).toShort
                  else ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort
                p += 1
              }
              frame += 1
              off += frameBytes
            }
            read = if (p < points) ais.read(buf) else -1
          }
          if (p < points) None else Some(out)
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** 64-bit waveform fingerprint: bit j = "sample at grid point j+1
    * larger than at grid point j" over 65 evenly spaced DECODED PCM
    * points — [[dHashBytes]]' temporal analog on the real waveform, and
    * gain-invariant by construction (sign-of-difference survives any
    * positive amplitude scaling, which byte-level hashing does not). */
  private[operators] def audioFingerprint(samples: Array[Short]): Long = {
    var hash = 0L
    var j = 0
    while (j < 64 && j + 1 < samples.length) {
      if (samples(j + 1) > samples(j)) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Per-row 64-bit audio fingerprint: the decoded-waveform fingerprint
    * for PCM-decodable audio payloads (`decoded = true`), byte-stream
    * dHash otherwise — [[perceptualHashes]]' audio twin, same batched
    * `mapPartitions` shape. */
  def audioFingerprints(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val viaAudio =
            if (r.meta.mediaType == "audio")
              decodeAudioSamples(r.payload).map(audioFingerprint)
            else None
          (r.doc_id, viaAudio.getOrElse(dHashBytes(r.payload)),
            viaAudio.isDefined)
        }
      }
    }.toDF("doc_id", "afp", "decoded")
  }

  /** Waveform near-duplicate pairs over the media table — the same
    * pigeonhole Hamming join as [[perceptualNearDup]], keyed on the
    * decoded-PCM fingerprint: re-encoded, re-gained, or re-containered
    * copies of the same recording collide where byte-level dedup sees
    * nothing. Banded per `decoded` flag (the [[hamming64NearDup]]
    * space column), so a byte-dHash of an undecodable payload can
    * never chance-collide with a decoded-waveform fingerprint. */
  def audioNearDup(
      media: DataFrame,
      maxHamming: Int = 3,
      nBands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame =
    hamming64NearDup(audioFingerprints(media), "afp",
      maxHamming, nBands, maxBucketSize, spaceCol = col("decoded"))
}
