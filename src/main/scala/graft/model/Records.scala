package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core warehouse schemas — the reference's record hierarchy re-expressed
  * as Spark StructTypes (reference `models/BaseRunRecord.scala:27-117`,
  * `models/UnitLabels.scala:23-96`, `models/BaseFileRecord.scala:22-33`).
  *
  * Design decisions vs the reference (SURVEY §1.6):
  *  - ObjectId → deterministic md5-hex string ids, derivable on executors
  *    with no driver coordination (`uuid()`-style randomness would break
  *    idempotent re-ingest at scale).
  *  - `tags: Map[String, Any]` → `map<string,string>` (values canonicalized
  *    at ingest; Spark has no Any type).
  *  - One labels struct for all unit levels; inapplicable fields stay null.
  *  - Derived counters (`nSamples`, `nReadGroups`) are materialized at
  *    write time like the reference's @Persist fields.
  */
object Records {

  val labelsType: StructType = StructType(Seq(
    StructField("runName", StringType),
    StructField("sampleName", StringType),
    StructField("readGroupName", StringType),
    StructField("notes", StringType),
    StructField("tags", MapType(StringType, StringType))))

  /** `runs` table: one row per uploaded run summary, all pipelines mixed
    * (reference `models/BaseRunRecord.scala:43-82`). */
  val runSchema: StructType = StructType(Seq(
    StructField("runId", StringType, nullable = false),
    StructField("uploaderId", StringType, nullable = false),
    StructField("pipeline", StringType, nullable = false),
    StructField("sampleIds", ArrayType(StringType), nullable = false),
    StructField("readGroupIds", ArrayType(StringType), nullable = false),
    StructField("nSamples", LongType, nullable = false),
    StructField("nReadGroups", LongType, nullable = false),
    StructField("labels", labelsType),
    StructField("deletionTimeUtc", TimestampType),
    StructField("creationTimeUtc", TimestampType, nullable = false)))

  /** `files` table — the GridFS replacement (SURVEY §1.6): raw upload
    * bytes + dedup key (md5, uploaderId). */
  val fileSchema: StructType = StructType(Seq(
    StructField("runId", StringType, nullable = false),
    StructField("md5", StringType, nullable = false),
    StructField("uploaderId", StringType, nullable = false),
    StructField("pipeline", StringType, nullable = false),
    StructField("fileName", StringType),
    StructField("contentType", StringType),
    StructField("creationTimeUtc", TimestampType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Envelope columns shared by every per-pipeline samples table
    * (reference `models/BaseRunRecord.scala:90-99`); pipelines append
    * their own `stats` struct. */
  def sampleSchema(stats: StructType): StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("runId", StringType, nullable = false),
    StructField("uploaderId", StringType, nullable = false),
    StructField("creationTimeUtc", TimestampType, nullable = false),
    StructField("labels", labelsType),
    StructField("stats", stats)))

  /** Read-group envelope (reference `models/BaseRunRecord.scala:102-117`):
    * adds the sample FK and the pairing discriminator. */
  def readGroupSchema(stats: StructType): StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("sampleId", StringType, nullable = false),
    StructField("runId", StringType, nullable = false),
    StructField("uploaderId", StringType, nullable = false),
    StructField("isPaired", BooleanType, nullable = false),
    StructField("creationTimeUtc", TimestampType, nullable = false),
    StructField("labels", labelsType),
    StructField("stats", stats)))

  /** `references` dictionary (reference `models/ReferenceRecord.scala:35-68`). */
  val referenceSchema: StructType = StructType(Seq(
    StructField("refId", StringType, nullable = false),
    StructField("refName", StringType),
    StructField("combinedMd5", StringType, nullable = false),
    StructField("creationTimeUtc", TimestampType, nullable = false),
    StructField("contigs", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("length", LongType),
      StructField("md5", StringType),
      StructField("assembly", StringType),
      StructField("species", StringType),
      StructField("uri", StringType)))))))

  /** `annotations` dictionary (reference `models/AnnotationRecord.scala:35-44`). */
  val annotationSchema: StructType = StructType(Seq(
    StructField("annotId", StringType, nullable = false),
    StructField("annotMd5", StringType, nullable = false),
    StructField("fileName", StringType),
    StructField("extension", StringType),
    StructField("creationTimeUtc", TimestampType, nullable = false)))

  /** `users` table (reference `models/User.scala:41-61`). */
  val userSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("hashedPassword", StringType, nullable = false),
    StructField("activeKey", StringType, nullable = false),
    StructField("verified", BooleanType, nullable = false),
    StructField("isAdmin", BooleanType, nullable = false),
    StructField("creationTimeUtc", TimestampType, nullable = false),
    StructField("updateTimeUtc", TimestampType)))

  /** User row as a driver-side value (auth checks are per-request,
    * never distributed — reference `utils/Implicits.scala:36-43`). */
  final case class User(
      id: String,
      email: String,
      verified: Boolean = true,
      isAdmin: Boolean = false)

  final case class PipelineStats(
      pipelineName: String,
      nRuns: Long,
      nSamples: Long,
      nReadGroups: Long)

  def emptyLabels: (Option[String], Option[String], Option[String], Option[String], Map[String, String]) =
    (None, None, None, None, Map.empty)

  val noTimestamp: Option[Timestamp] = None
}
