package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Records
import graft.pipelines.{PipelinePlugin, Shredded}
import graft.store.Warehouse

/** Upload → gunzip → parse → validate → dedup → shred → store
  * (reference `api/RunsController.scala:294-316` +
  * `processors/RunsProcessor.scala:264-316` +
  * `exts/maple/MapleRunsProcessor.scala:118-147`).
  *
  * Two paths share the same shred plans:
  *  - [[upload]] — one file per call with the reference's full error
  *    semantics (400/403/409/413/422). Driver does the cheap per-file
  *    checks; the shred still runs as a Spark job.
  *  - [[bulkIngest]] — the 100 TB shape: a DataFrame of many uploads,
  *    engine-side md5 dedup (anti-join against the files table and
  *    keep-first within the batch), one shred for the whole corpus, run
  *    records derived by aggregation. No per-file driver loop.
  */
final class RunIngestor(
    wh: Warehouse,
    registry: Map[String, PipelinePlugin],
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  import Ingest._

  private def spark: SparkSession = wh.spark

  /** Single-upload ingest; returns the new run's id. */
  def upload(
      bytes: Array[Byte],
      fileName: String,
      pipelineName: String,
      uploader: Records.User): String = {
    if (!uploader.verified)
      throw new NotAuthorizedException(s"user ${uploader.id} is not verified")
    val plugin = registry.getOrElse(pipelineName,
      throw new UnknownPipelineException(pipelineName))
    if (bytes.length > MaxUploadBytes)
      throw new PayloadTooLargeException(bytes.length, MaxUploadBytes)

    val content = readUncompressed(bytes)
    val json = parseJson(content)
    val errors = plugin.validate(json)
    if (errors.nonEmpty) throw new SchemaException(errors)

    // dedup on (md5 of stored bytes, uploader) — the GridFS unique index
    val fileMd5 = md5Hex(bytes)
    if (wh.exists(Warehouse.Files)) {
      val existing = wh.read(Warehouse.Files)
        .filter(col("md5") === fileMd5 && col("uploaderId") === uploader.id)
        .select("runId").limit(1).collect()
      if (existing.nonEmpty)
        throw new DuplicateFileException(existing(0).getString(0))
    }
    val runId = unitId(fileMd5, uploader.id)
    val now = clock()

    // dictionary get-or-create hook (S8) before anything is stored
    val ctx = plugin.prepare(json, wh, now)

    val fileRow = spark.createDataFrame(
      java.util.List.of(Row(runId, fileMd5, uploader.id, pipelineName,
        fileName, "application/json", now, bytes)),
      Records.fileSchema)
    wh.append(Warehouse.Files, fileRow)

    val raw = rawFrame(Seq((runId, uploader.id, new String(content, "UTF-8"), now)), ctx)
    val shredded = plugin.shred(raw)
    val (sampleIds, readGroupIds) = storeUnits(plugin, shredded)

    val runName = Option(json.get("runName")).filter(_.isTextual).map(_.asText)
    // dictionary ids (refId/annotIds) ride in the run's label tags so the
    // fixed runs schema carries per-pipeline extras without a fork
    val runRow = spark.createDataFrame(
      java.util.List.of(Row(runId, uploader.id, pipelineName,
        sampleIds, readGroupIds, sampleIds.size.toLong, readGroupIds.size.toLong,
        Row(runName.orNull, null, null, null, ctx),
        null, now)),
      Records.runSchema)
    wh.append(Warehouse.Runs, runRow)
    runId
  }

  private def rawFrame(rows: Seq[(String, String, String, Timestamp)],
      ctx: Map[String, String]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("runId", "uploaderId", "content", "creationTimeUtc")
      .withColumn("context", typedLit(ctx))
  }

  private def storeUnits(
      plugin: PipelinePlugin,
      shredded: Shredded): (Seq[String], Seq[String]) = {
    val sampleIds = shredded.samples.map { s =>
      wh.append(Warehouse.samples(plugin.name), s)
      s.select("_id").collect().map(_.getString(0)).toSeq
    }.getOrElse(Seq.empty)
    val readGroupIds = shredded.readGroups.map { r =>
      wh.append(Warehouse.readGroups(plugin.name), r)
      r.select("_id").collect().map(_.getString(0)).toSeq
    }.getOrElse(Seq.empty)
    (sampleIds, readGroupIds)
  }

  /** Bulk ingest: `uploads` must have columns
    * `content: string, fileName: string, uploaderId: string`.
    * Invalid/duplicate rows are dropped (keep-first by fileName within the
    * batch); returns the number of runs ingested. All heavy lifting —
    * digesting, dedup, shredding, run-record assembly — is engine-side. */
  /** Continuous ingest: tail a directory of run-summary JSON files and run
    * [[bulkIngest]] once per micro-batch (`readStream` → `foreachBatch`).
    * Exactly-once into the warehouse comes from two layers: the stream
    * checkpoint replays unprocessed files only, and bulkIngest's
    * (md5, uploader) anti-join makes replays of a processed batch no-ops —
    * so a crash between the two cannot double-ingest. One file = one
    * upload (`wholetext`), mirroring the reference's per-request POST but
    * with the engine-side bulk path per batch. */
  def streamIngest(
      inputDir: String,
      checkpointDir: String,
      pipelineName: String,
      uploaderId: String): org.apache.spark.sql.streaming.StreamingQuery = {
    require(registry.contains(pipelineName),
      s"unknown pipeline $pipelineName") // fail at start, not mid-stream
    val files = spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(inputDir)
      .select(
        col("value").as("content"),
        element_at(split(input_file_name(), "/"), -1).as("fileName"),
        lit(uploaderId).as("uploaderId"))
    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        bulkIngest(batch, pipelineName)
        ()
      }
      .start()
  }

  def bulkIngest(uploads: DataFrame, pipelineName: String): Long = {
    val plugin = registry.getOrElse(pipelineName,
      throw new UnknownPipelineException(pipelineName))
    val now = clock()

    val withIds = uploads
      .withColumn("md5", md5(col("content").cast("binary")))
      .withColumn("runId", md5(concat_ws(" ", col("md5"), col("uploaderId"))))
      .withColumn("creationTimeUtc", lit(now))

    // keep-first within the batch, then anti-join against stored files
    val batchDeduped = withIds
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("md5", "uploaderId").orderBy("fileName")))
      .filter(col("_rn") === 1).drop("_rn")
    // EAGER snapshot, not cache(): the appends below call Spark's
    // refreshByPath on the files table, which invalidates both a cache of
    // this plan and the files table's file index — a later job would
    // re-evaluate the anti-join against the just-appended files and see
    // its own batch as "already stored", silently dropping the run/unit
    // records. localCheckpoint pins the rows and truncates the lineage so
    // nothing downstream can observe the mid-ingest table state.
    val fresh =
      (if (wh.exists(Warehouse.Files))
        batchDeduped.join(
          wh.read(Warehouse.Files).select("md5", "uploaderId"),
          Seq("md5", "uploaderId"), "left_anti")
      else batchDeduped).localCheckpoint()

    wh.append(Warehouse.Files, fresh.select(
      col("runId"), col("md5"), col("uploaderId"), lit(pipelineName).as("pipeline"),
      col("fileName"), lit("application/json").as("contentType"),
      col("creationTimeUtc"), col("content").cast("binary").as("content")))

    val shredded = plugin.shred(
      fresh.select("runId", "uploaderId", "content", "creationTimeUtc")
        .withColumn("context", typedLit(Map.empty[String, String])))
    shredded.samples.foreach(s => wh.append(Warehouse.samples(plugin.name), s))
    shredded.readGroups.foreach(r => wh.append(Warehouse.readGroups(plugin.name), r))

    // run records assembled by aggregation over the shredded units
    val sampleAgg = shredded.samples.map(
      _.groupBy("runId").agg(sort_array(collect_list(col("_id"))).as("sampleIds")))
    val rgAgg = shredded.readGroups.map(
      _.groupBy("runId").agg(sort_array(collect_list(col("_id"))).as("readGroupIds")))
    val emptyIds = array().cast("array<string>")
    var runs = fresh.select(
      col("runId"), col("uploaderId"), col("creationTimeUtc"),
      get_json_object(col("content"), "$.runName").as("runName"))
    runs = sampleAgg.map(a => runs.join(a, Seq("runId"), "left")).getOrElse(
      runs.withColumn("sampleIds", emptyIds))
    runs = rgAgg.map(a => runs.join(a, Seq("runId"), "left")).getOrElse(
      runs.withColumn("readGroupIds", emptyIds))
    val runRows = runs.select(
      col("runId"), col("uploaderId"), lit(pipelineName).as("pipeline"),
      coalesce(col("sampleIds"), emptyIds).as("sampleIds"),
      coalesce(col("readGroupIds"), emptyIds).as("readGroupIds"),
      coalesce(size(col("sampleIds")), lit(0)).cast("bigint").as("nSamples"),
      coalesce(size(col("readGroupIds")), lit(0)).cast("bigint").as("nReadGroups"),
      PipelinePlugin.labelsCol(col("runName")).as("labels"),
      lit(null).cast("timestamp").as("deletionTimeUtc"),
      col("creationTimeUtc"))
    wh.append(Warehouse.Runs, runRows)

    val n = fresh.count()
    fresh.unpersist() // releases the localCheckpoint blocks
    n
  }
}
