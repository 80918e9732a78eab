package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata struct
  * — the layout that keeps a 100 TB multimodal table scannable: metadata
  * predicates prune at the parquet level without ever materializing the
  * bytes, and the binary column is only read by stages that decode.
  *
  * The decode itself (image decode / resize / frame sampling) needs native
  * media libraries that are NOT in this container, so `decodeFeatures`
  * routes every batch through a clearly-marked STUB kernel that derives
  * deterministic pseudo-features from the bytes. The Spark-side shape —
  * schema, partition-preserving `mapPartitions`, batch iteration, feature
  * struct — is the real, tested plumbing; swapping the stub for a JNI/
  * OpenCV kernel touches only `stubDecodeKernel`.
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
      checksumByte: Long, // stub "decoded" signal: payload byte sum mod 256
      sampledFrames: Int)

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

  /** STUB decode kernel — replace with the real media decoder. Must stay
    * deterministic: features are pure functions of (meta, payload). */
  private def stubDecodeKernel(r: MediaRecord): MediaFeatures = {
    // ??? <- real image/audio decode goes here (lib not in container)
    var s = 0L
    var i = 0
    while (i < r.payload.length) { s += r.payload(i) & 0xff; i += 1 }
    MediaFeatures(
      doc_id = r.doc_id,
      mediaType = r.meta.mediaType,
      byteLen = r.payload.length.toLong,
      checksumByte = s % 256,
      sampledFrames = math.min(r.meta.nFrames, 8))
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
      // per-partition init for the real kernel happens here (once)
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decode: a real kernel hands `batch` to the native
        // decoder in one call; the stub maps records individually
        batch.map(stubDecodeKernel)
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
}
