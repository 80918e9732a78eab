package graft.pipelines

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline plugin registry — the reference's only extensibility axis
  * (SURVEY §2.10): a pipeline contributes schema validation plus the
  * JSON→units shred. Adding a pipeline never touches core.
  *
  * The shred is the canonical Spark explode pipeline (SURVEY §2.1 S4):
  * `from_json` with a typed nested schema, then one `explode` per
  * hierarchy level. It runs distributed — one uploaded file is one row,
  * a bulk backfill is millions of rows, same plan.
  */
trait PipelinePlugin {
  def name: String

  /** The pipeline's declarative draft-04 schema, loaded from a classpath
    * resource — adding a pipeline means SHIPPING A SCHEMA FILE, the
    * reference's extensibility contract (`utils/JsonValidator.scala:32-77`
    * with the schema resources under `resources/schemas/`). */
  def schema: SchemaValidator

  /** Schema validation errors; empty means valid (reference
    * `utils/JsonValidator.scala:32-77`, HTTP 422 on non-empty). */
  def validate(json: JsonNode): Seq[String] = schema.validate(json)

  def sampleStatsSchema: Option[StructType]
  def readGroupStatsSchema: Option[StructType]

  /** Pre-shred hook for dictionary get-or-create (pref/pann): returns a
    * small string context (e.g. refId) that rides into [[shred]] as a
    * `context` map column and into the run record's label tags. */
  def prepare(json: JsonNode, wh: graft.store.Warehouse,
      now: java.sql.Timestamp): Map[String, String] = Map.empty

  /** Shred a raw-upload frame (`runId, uploaderId, content,
    * creationTimeUtc, context: map<string,string>`) into per-unit frames. */
  def shred(raw: DataFrame): Shredded
}

/** Per-level unit frames produced by a shred; None = level not present. */
final case class Shredded(samples: Option[DataFrame], readGroups: Option[DataFrame])

object PipelinePlugin {
  /** Deterministic unit id, computed engine-side; must agree with
    * [[graft.ingest.Ingest.unitId]]. */
  def idCol(parts: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    md5(concat_ws(" ", parts: _*))

  val nullString: org.apache.spark.sql.Column = lit(null).cast(StringType)
  val emptyTags: org.apache.spark.sql.Column =
    map().cast(MapType(StringType, StringType))

  def labelsCol(
      runName: org.apache.spark.sql.Column,
      sampleName: org.apache.spark.sql.Column = nullString,
      readGroupName: org.apache.spark.sql.Column = nullString): org.apache.spark.sql.Column =
    struct(
      runName.as("runName"),
      sampleName.as("sampleName"),
      readGroupName.as("readGroupName"),
      nullString.as("notes"),
      emptyTags.as("tags"))

  /** Shared shred for the pref/pann sample shape; keeps the `context`
    * column for the caller to mine and drop. */
  def shredNumSamples(raw: DataFrame): DataFrame = {
    val docSchema = StructType(Seq(
      StructField("runName", StringType),
      StructField("samples", MapType(StringType,
        StructType(Seq(StructField("num", LongType)))))))
    raw.select(
      col("runId"), col("uploaderId"), col("creationTimeUtc"), col("context"),
      from_json(col("content"), docSchema).as("doc"))
      .select(col("runId"), col("uploaderId"), col("creationTimeUtc"), col("context"),
        col("doc.runName").as("runName"),
        explode(col("doc.samples")).as(Seq("sampleName", "sample")))
      .select(
        idCol(col("runId"), col("sampleName")).as("_id"),
        col("runId"), col("uploaderId"), col("creationTimeUtc"),
        labelsCol(col("runName"), col("sampleName")).as("labels"),
        struct(col("sample.num").as("num")).as("stats"),
        col("context"))
  }
}

/** The reference's example full pipeline: samples with `nSnps`, read
  * groups with `nReadsInput`/`nReadsAligned`
  * (reference `exts/maple/MapleRunsProcessor.scala:73-112`,
  * `exts/maple/MapleRunRecord.scala:27-74`,
  * schema `schema_examples/maple.json`). */
object MaplePipeline extends PipelinePlugin {
  import PipelinePlugin._

  val name = "maple"

  val sampleStatsSchema: Option[StructType] =
    Some(StructType(Seq(StructField("nSnps", LongType))))
  val readGroupStatsSchema: Option[StructType] =
    Some(StructType(Seq(
      StructField("nReadsInput", LongType),
      StructField("nReadsAligned", LongType))))

  /** Declarative schema (resource `schemas/maple.json`): required
    * samples+runName; per sample required readGroups + integer nSnps; per
    * read group required integer nReadsInput/nReadsAligned — re-expressing
    * reference `schema_examples/maple.json:1-54` as a shipped file. */
  val schema: SchemaValidator = SchemaValidator.fromResource("/schemas/maple.json")

  /** Typed parse schema for the whole summary document. */
  private val docSchema = StructType(Seq(
    StructField("runName", StringType),
    StructField("samples", MapType(StringType, StructType(Seq(
      StructField("nSnps", LongType),
      StructField("readGroups", MapType(StringType, StructType(Seq(
        StructField("nReadsInput", LongType),
        StructField("nReadsAligned", LongType)))))))))))

  def shred(raw: DataFrame): Shredded = {
    val parsed = raw.select(
      col("runId"), col("uploaderId"), col("creationTimeUtc"),
      from_json(col("content"), docSchema).as("doc"))

    val samples = parsed
      .select(col("runId"), col("uploaderId"), col("creationTimeUtc"),
        col("doc.runName").as("runName"),
        explode(col("doc.samples")).as(Seq("sampleName", "sample")))
      .select(
        idCol(col("runId"), col("sampleName")).as("_id"),
        col("runId"), col("uploaderId"), col("creationTimeUtc"),
        labelsCol(col("runName"), col("sampleName")).as("labels"),
        struct(col("sample.nSnps").as("nSnps")).as("stats"))

    val readGroups = parsed
      .select(col("runId"), col("uploaderId"), col("creationTimeUtc"),
        col("doc.runName").as("runName"),
        explode(col("doc.samples")).as(Seq("sampleName", "sample")))
      .select(col("runId"), col("uploaderId"), col("creationTimeUtc"),
        col("runName"), col("sampleName"),
        explode(col("sample.readGroups")).as(Seq("readGroupName", "rg")))
      .select(
        idCol(col("runId"), col("sampleName"), col("readGroupName")).as("_id"),
        idCol(col("runId"), col("sampleName")).as("sampleId"),
        col("runId"), col("uploaderId"),
        // maple read groups are paired-end by definition
        // (exts/maple/MapleRunRecord.scala:63 isPaired = true)
        lit(true).as("isPaired"),
        col("creationTimeUtc"),
        labelsCol(col("runName"), col("sampleName"), col("readGroupName")).as("labels"),
        struct(
          col("rg.nReadsInput").as("nReadsInput"),
          col("rg.nReadsAligned").as("nReadsAligned")).as("stats"))

    Shredded(Some(samples), Some(readGroups))
  }
}

/** Reference-dictionary pipeline (reference
  * `exts/pref/PrefRunsProcessor.scala:50-115`): extracts a reference
  * record, get-or-creates it by combinedMd5 (S8), attaches the refId to
  * every sample row and the run's label tags. */
object PrefPipeline extends PipelinePlugin {
  import PipelinePlugin._
  import graft.store.Dictionaries

  val name = "pref"

  val sampleStatsSchema: Option[StructType] =
    Some(StructType(Seq(StructField("num", LongType))))
  val readGroupStatsSchema: Option[StructType] = None

  /** Declarative schema (resource `schemas/pref.json`): required
    * reference.contigs (each with string md5 + integer length) and the
    * shared `samples: {<name>: {num}}` shape. */
  val schema: SchemaValidator = SchemaValidator.fromResource("/schemas/pref.json")

  override def prepare(json: JsonNode, wh: graft.store.Warehouse,
      now: java.sql.Timestamp): Map[String, String] = {
    val ref = json.get("reference")
    val contigs = ref.get("contigs").properties().asScala.toSeq.map { e =>
      Dictionaries.Contig(e.getKey, e.getValue.get("length").asLong,
        e.getValue.get("md5").asText)
    }
    val refName = Option(ref.get("name")).filter(_.isTextual).map(_.asText)
    Map("refId" -> Dictionaries.getOrCreateReference(wh, refName, contigs, now))
  }

  def shred(raw: DataFrame): Shredded =
    Shredded(Some(shredNumSamples(raw)
      .withColumn("refId", col("context").getItem("refId"))
      .drop("context")), None)
}

/** Annotation-dictionary pipeline (reference
  * `exts/pann/PannRunsProcessor.scala:50-95`): get-or-creates each
  * annotation by annotMd5 (S8), samples carry the annotId array. */
object PannPipeline extends PipelinePlugin {
  import PipelinePlugin._
  import graft.store.Dictionaries

  val name = "pann"

  val sampleStatsSchema: Option[StructType] =
    Some(StructType(Seq(StructField("num", LongType))))
  val readGroupStatsSchema: Option[StructType] = None

  /** Declarative schema (resource `schemas/pann.json`): required
    * annotations (each with string md5) and the shared samples shape. */
  val schema: SchemaValidator = SchemaValidator.fromResource("/schemas/pann.json")

  override def prepare(json: JsonNode, wh: graft.store.Warehouse,
      now: java.sql.Timestamp): Map[String, String] = {
    val ids = json.get("annotations").properties().asScala.toSeq.map { a =>
      Dictionaries.getOrCreateAnnotation(wh,
        a.getValue.get("md5").asText,
        Option(a.getValue.get("path")).filter(_.isTextual).map(_.asText),
        now)
    }
    Map("annotIds" -> ids.mkString(","))
  }

  def shred(raw: DataFrame): Shredded =
    Shredded(Some(shredNumSamples(raw)
      .withColumn("annotIds", split(col("context").getItem("annotIds"), ","))
      .drop("context")), None)
}

/** Schema-free catch-all: accepts any non-empty JSON object/array, stores
  * only the raw file + run record (reference
  * `exts/plain/PlainRunsProcessor.scala:33-56`, `schemas/plain.json`). */
object PlainPipeline extends PipelinePlugin {
  val name = "plain"
  val sampleStatsSchema: Option[StructType] = None
  val readGroupStatsSchema: Option[StructType] = None

  /** Declarative schema (resource `schemas/plain.json`, mirroring
    * reference `resources/schemas/plain.json`): any non-empty object or
    * array. */
  val schema: SchemaValidator = SchemaValidator.fromResource("/schemas/plain.json")

  def shred(raw: DataFrame): Shredded = Shredded(None, None)
}
