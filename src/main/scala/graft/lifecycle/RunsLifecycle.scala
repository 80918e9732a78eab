package graft.lifecycle

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.lifecycle.JsonPatch._
import graft.model.Records
import graft.store.Warehouse

/** Run lifecycle: listing/point-get with label enrichment, RFC-6902-subset
  * patching with hierarchical propagation, and soft delete with cascade.
  *
  * Division of labor (same as the reference, which did point lookups on
  * the driver too): per-request row loads and patch-op validation are
  * driver-side (a handful of rows); every table rewrite is a distributed
  * copy-on-write job keyed by a broadcast patch/delete set.
  */
object RunsLifecycle {

  final class NotFoundException(msg: String) extends RuntimeException(msg)
  /** Deleted resource ⇒ 410, distinguishable from 404
    * (reference `processors/RunsProcessor.scala:421-438`). */
  final class GoneException(msg: String) extends RuntimeException(msg)
  final class ForbiddenException(msg: String) extends RuntimeException(msg)

  // ---- labels as a driver-side value -------------------------------------

  final case class Labels(
      runName: Option[String] = None,
      sampleName: Option[String] = None,
      readGroupName: Option[String] = None,
      notes: Option[String] = None,
      tags: Map[String, String] = Map.empty) {
    def toRow: Row = Row(runName.orNull, sampleName.orNull,
      readGroupName.orNull, notes.orNull, tags)
  }

  object Labels {
    def fromRow(r: Row): Labels =
      if (r == null) Labels()
      else Labels(
        Option(r.getAs[String]("runName")),
        Option(r.getAs[String]("sampleName")),
        Option(r.getAs[String]("readGroupName")),
        Option(r.getAs[String]("notes")),
        Option(r.getAs[Map[String, String]]("tags")).getOrElse(Map.empty))
  }

  /** Unit levels with their whitelisted name-label paths (reference
    * `RunsProcessor.scala:496`, `SamplesAdapter.scala:147`,
    * `ReadGroupsAdapter.scala:171`). */
  sealed abstract class Level(val nameFields: Set[String])
  case object RunLevel extends Level(Set("runName"))
  case object SampleLevel extends Level(Set("runName", "sampleName"))
  case object ReadGroupLevel extends Level(Set("runName", "sampleName", "readGroupName"))

  private def canonical(v: Any): String = v match {
    case s: String => s
    case other     => String.valueOf(other)
  }

  /** Apply one whitelisted op to a labels value; anything else is a 422
    * (reference `adapters/UnitsAdapter.scala:112-187` patch functions). */
  def applyOp(labels: Labels, op: PatchOp, level: Level): Labels = op match {
    // name labels: add ≡ replace, string values only
    case v: WithValue if (v.op == "add" || v.op == "replace") &&
        v.pathTokens.length == 2 && v.pathTokens.head == "labels" &&
        level.nameFields.contains(v.pathTokens(1)) =>
      val s = v.stringValue.getOrElse(
        throw new PatchValidationException(s"${v.path}: expected a string value"))
      v.pathTokens(1) match {
        case "runName"       => labels.copy(runName = Some(s))
        case "sampleName"    => labels.copy(sampleName = Some(s))
        case "readGroupName" => labels.copy(readGroupName = Some(s))
      }
    // tags: add/replace any scalar (canonicalized to string), remove must exist
    case v: WithValue if (v.op == "add" || v.op == "replace") &&
        v.pathTokens.length == 3 && v.pathTokens.take(2) == List("labels", "tags") =>
      val value = v.atomicValue.getOrElse(
        throw new PatchValidationException(s"${v.path}: expected a scalar value"))
      labels.copy(tags = labels.tags + (v.pathTokens(2) -> canonical(value)))
    case r: RemoveOp if r.pathTokens.length == 3 &&
        r.pathTokens.take(2) == List("labels", "tags") =>
      val key = r.pathTokens(2)
      if (!labels.tags.contains(key))
        throw new PatchValidationException(s"tag '$key' does not exist for removal")
      labels.copy(tags = labels.tags - key)
    // notes: add/replace string, remove must exist
    case v: WithValue if (v.op == "add" || v.op == "replace") &&
        v.path == "/labels/notes" =>
      val s = v.stringValue.getOrElse(
        throw new PatchValidationException("/labels/notes: expected a string value"))
      labels.copy(notes = Some(s))
    case r: RemoveOp if r.path == "/labels/notes" =>
      if (labels.notes.isEmpty)
        throw new PatchValidationException("notes do not exist for removal")
      labels.copy(notes = None)
    case other =>
      throw new PatchValidationException(
        s"op '${other.op}' on '${other.path}' is not allowed")
  }

  /** Label patches whose run-level application propagates to children
    * (reference `RunsProcessor.scala:63-66`). */
  private val runPropagated = Set("/labels/runName")
  private val samplePropagated = Set("/labels/sampleName")

  private val hexId = "^[0-9a-f]{32}$".r

  /** Routed patch sets per level (reference
    * `RunsProcessor.scala:98-129` jsonPatches2unitPatches). */
  final case class Routed(
      runOps: List[PatchOp],
      sampleOps: Map[String, List[PatchOp]],
      readGroupOps: Map[String, List[PatchOp]])

  def route(ops: List[PatchOp]): Routed = {
    var runOps = List.empty[PatchOp]
    var sampleOps = Map.empty[String, List[PatchOp]].withDefaultValue(Nil)
    var rgOps = Map.empty[String, List[PatchOp]].withDefaultValue(Nil)
    ops.foreach { op =>
      op.pathTokens match {
        case unit :: rest if unit == "sampleLabels" || unit == "readGroupLabels" =>
          val id = rest.headOption.getOrElse(
            throw new PatchValidationException(s"'$unit' does not point to any IDs"))
          if (hexId.findFirstIn(id).isEmpty)
            throw new PatchValidationException(s"'$unit' targets an invalid ID: '$id'")
          val attr = rest.drop(1)
          if (attr.isEmpty)
            throw new PatchValidationException(s"'$unit' on '$id' has no target attribute")
          val rewritten = op.withPath("labels" +: attr)
          if (unit == "sampleLabels") sampleOps += id -> (sampleOps(id) :+ rewritten)
          else rgOps += id -> (rgOps(id) :+ rewritten)
        case _ => runOps = runOps :+ op
      }
    }
    Routed(runOps, sampleOps, rgOps)
  }

  // ---- point lookups (driver-side by design, F12-F14) --------------------

  private def loadRun(wh: Warehouse, runId: String, user: Records.User,
      allowDeleted: Boolean = false): Row = {
    val rows =
      if (!wh.exists(Warehouse.Runs)) Array.empty[Row]
      else wh.read(Warehouse.Runs).filter(col("runId") === runId).collect()
    if (rows.isEmpty) throw new NotFoundException(s"run $runId not found")
    val run = rows(0)
    // per-row authorization: uploader or admin (reference utils/Implicits.scala:36-43)
    if (!user.isAdmin && run.getAs[String]("uploaderId") != user.id)
      throw new ForbiddenException(s"user ${user.id} cannot access run $runId")
    if (!allowDeleted && run.getAs[Timestamp]("deletionTimeUtc") != null)
      throw new GoneException(s"run $runId has been deleted")
    run
  }

  /** Batch id lookup with the strict cardinality check (J1, reference
    * `adapters/UnitsAdapter.scala:50-64`). */
  def getUnitsByIds(units: DataFrame, ids: Seq[String]): Seq[Row] = {
    val distinct = ids.distinct
    val rows = units.filter(col("_id").isin(distinct: _*)).collect()
    if (rows.length != distinct.length)
      throw new NotFoundException(
        s"only ${rows.length}/${distinct.length} unit IDs could be retrieved")
    rows.toSeq
  }

  /** Read-group ids for the given samples (J3, FK traversal —
    * reference `adapters/ReadGroupsAdapter.scala:104-124`). */
  def readGroupIdsOf(readGroups: DataFrame, sampleIds: Seq[String]): Seq[String] =
    readGroups.filter(col("sampleId").isin(sampleIds.distinct: _*))
      .select("_id").collect().map(_.getString(0)).toSeq

  // ---- listings (F10, F11, O1, J4) ---------------------------------------

  /** Visible runs for a user: admin sees all, others their own; tombstones
    * excluded; newest first; hidden attributes dropped (P4). `pipelines`
    * empty = all (J4 — one partitioned table makes the reference's
    * per-processor fan-out a plain filter). */
  def getRuns(wh: Warehouse, user: Records.User,
      pipelines: Seq[String] = Seq.empty): DataFrame = {
    val visible = if (user.isAdmin) lit(true) else col("uploaderId") === user.id
    val pipelineSel =
      if (pipelines.isEmpty) lit(true) else col("pipeline").isin(pipelines: _*)
    // readOr: a fresh deployment with no upload yet must list [] like the
    // reference's empty collection, not fail on a missing table
    wh.readOr(Warehouse.Runs, Records.runSchema)
      .filter(visible && pipelineSel && col("deletionTimeUtc").isNull)
      .orderBy(desc("creationTimeUtc"))
      .drop("sampleIds", "readGroupIds")
  }

  /** Point get with optional child-label enrichment (J2, reference
    * `processors/RunsProcessor.scala:355-375`): the run row gains
    * `sampleLabels`/`readGroupLabels` maps of unitId → labels, built
    * engine-side with collect_list + map_from_entries. */
  def getRun(wh: Warehouse, runId: String, user: Records.User,
      showUnitsLabels: Boolean = false): DataFrame = {
    loadRun(wh, runId, user) // 404/403/410 gates
    val run = wh.read(Warehouse.Runs).filter(col("runId") === runId)
    if (!showUnitsLabels) run.drop("sampleIds", "readGroupIds")
    else {
      val pipeline = run.select("pipeline").collect()(0).getString(0)
      def labelMap(table: String): Option[DataFrame] =
        if (!wh.exists(table)) None
        else Some(wh.read(table).filter(col("runId") === runId)
          .groupBy("runId")
          .agg(map_from_entries(
            collect_list(struct(col("_id"), col("labels")))).as(s"${table}_map")))
      var enriched = run
      labelMap(Warehouse.samples(pipeline)).foreach { m =>
        enriched = enriched.join(
          m.withColumnRenamed(s"${Warehouse.samples(pipeline)}_map", "sampleLabels"),
          Seq("runId"), "left")
      }
      labelMap(Warehouse.readGroups(pipeline)).foreach { m =>
        enriched = enriched.join(
          m.withColumnRenamed(s"${Warehouse.readGroups(pipeline)}_map", "readGroupLabels"),
          Seq("runId"), "left")
      }
      enriched.drop("sampleIds", "readGroupIds")
    }
  }

  // ---- patch (M1-M4) -----------------------------------------------------

  /** Patch a run (and, via routing/propagation, its children). Returns
    * (runsModified, samplesModified, readGroupsModified) like the
    * reference (`processors/RunsProcessor.scala:194-252`). */
  def patchRun(wh: Warehouse, runId: String, user: Records.User,
      ops: List[PatchOp]): (Int, Int, Int) = {
    val run = loadRun(wh, runId, user)
    val pipeline = run.getAs[String]("pipeline")
    val sampleIds = run.getAs[collection.Seq[String]]("sampleIds")
    val rgIds = run.getAs[collection.Seq[String]]("readGroupIds")
    val routed = route(ops)

    val samplesTable = Warehouse.samples(pipeline)
    val rgTable = Warehouse.readGroups(pipeline)

    // propagation (M3): run-level runName → all children; sample-level
    // sampleName → that sample's read groups
    val runPropOps = routed.runOps.filter(op => runPropagated.contains(op.path))
    val samplePatches: Map[String, List[PatchOp]] = {
      val fromRun = if (runPropOps.nonEmpty)
        sampleIds.map(id => id -> runPropOps).toMap else Map.empty[String, List[PatchOp]]
      merge(fromRun, routed.sampleOps)
    }
    val rgFromSamples: Map[String, List[PatchOp]] = {
      val propagating = routed.sampleOps.view.mapValues(
        _.filter(op => samplePropagated.contains(op.path))).filter(_._2.nonEmpty).toMap
      if (propagating.isEmpty || !wh.exists(rgTable)) Map.empty
      else {
        val rgs = wh.read(rgTable)
        propagating.toSeq.flatMap { case (sid, sOps) =>
          rgs.filter(col("sampleId") === sid).select("_id").collect()
            .map(r => r.getString(0) -> sOps)
        }.groupBy(_._1).view.mapValues(_.flatMap(_._2).toList).toMap
      }
    }
    val rgPatches: Map[String, List[PatchOp]] = {
      val fromRun = if (runPropOps.nonEmpty)
        rgIds.map(id => id -> runPropOps).toMap else Map.empty[String, List[PatchOp]]
      merge(merge(fromRun, rgFromSamples), routed.readGroupOps)
    }

    // validate + compute ALL new labels driver-side FIRST: a 422 anywhere
    // in the batch must reject the whole request with nothing written
    // (reference PatchRunIdRunsControllerSpec pins "invalid entry ⇒ run
    // unchanged when queried afterwards") — only then commit one
    // distributed rewrite per touched table
    val newRunLabels = routed.runOps.foldLeft(
      Labels.fromRow(run.getAs[Row]("labels")))((l, op) => applyOp(l, op, RunLevel))
    val (newSampleLabels, sampleRunIds) =
      computeUnitLabels(wh, samplesTable, samplePatches, SampleLevel)
    val (newRgLabels, rgRunIds) =
      computeUnitLabels(wh, rgTable, rgPatches, ReadGroupLevel)

    // each table rewrite is scoped to the hash buckets of the patched
    // units' OWNING runs — taken from the loaded rows, not from the
    // request's runId: unit ops address units by _id table-wide (matching
    // the reference), so a directly-addressed unit of another run must
    // rewrite that run's bucket, not this one's — O(touched buckets),
    // not O(table)
    rewriteLabels(wh, samplesTable, "_id", newSampleLabels, sampleRunIds.toSeq.sorted)
    rewriteLabels(wh, rgTable, "_id", newRgLabels, rgRunIds.toSeq.sorted)
    // unit-only patches leave the run's labels untouched: skip the run
    // table's partition rewrite entirely (the reference re-writes the
    // identical dbo — same observable state, ours without copying a whole
    // pipeline partition for a no-op). The returned runsModified stays 1,
    // matching the reference's always-written run count.
    if (routed.runOps.nonEmpty)
      rewriteLabels(wh, Warehouse.Runs, "runId", Map(runId -> newRunLabels),
        scopeRunIds = Nil, scopePipeline = Some(pipeline))
    (1, newSampleLabels.size, newRgLabels.size)
  }

  private def merge(a: Map[String, List[PatchOp]],
      b: Map[String, List[PatchOp]]): Map[String, List[PatchOp]] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, Nil) ++ b.getOrElse(k, Nil))).toMap

  /** Validation half of a unit patch: load the targeted rows (404 on any
    * miss) and fold the ops into their new labels (422 on any bad op).
    * Pure driver-side computation — nothing is written. Returns the new
    * labels AND the distinct runIds owning the touched units, which scope
    * the subsequent bucket rewrite. */
  private def computeUnitLabels(wh: Warehouse, table: String,
      patches: Map[String, List[PatchOp]],
      level: Level): (Map[String, Labels], Set[String]) = {
    if (patches.isEmpty) return (Map.empty, Set.empty)
    if (!wh.exists(table))
      throw new NotFoundException(s"no units table $table to patch")
    val rows = getUnitsByIds(wh.read(table), patches.keys.toSeq)
    val labels = rows.map { r =>
      val id = r.getAs[String]("_id")
      id -> patches(id).foldLeft(Labels.fromRow(r.getAs[Row]("labels")))(
        (l, op) => applyOp(l, op, level))
    }.toMap
    (labels, rows.map(_.getAs[String]("runId")).toSet)
  }

  /** Distributed copy-on-write labels update: broadcast-join the patched
    * (id → labels) set and coalesce. Scoped to the owning run's bucket
    * (or the run table's pipeline partition) when known, so only the
    * touched partition rewrites. */
  private def rewriteLabels(wh: Warehouse, table: String, key: String,
      newLabels: Map[String, Labels], scopeRunIds: Seq[String] = Nil,
      scopePipeline: Option[String] = None): Unit = {
    if (newLabels.isEmpty) return
    val spark = wh.spark
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(key,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__newLabels", Records.labelsType)))
    val patchRows = newLabels.toSeq.map { case (id, l) => Row(id, l.toRow) }
    val patchDf = spark.createDataFrame(
      spark.sparkContext.parallelize(patchRows, 1), schema)
    val f = (df: DataFrame) =>
      df.join(broadcast(patchDf), Seq(key), "left")
        .withColumn("labels", coalesce(col("__newLabels"), col("labels")))
        .drop("__newLabels")
    (scopeRunIds, scopePipeline) match {
      case (rids, _) if rids.nonEmpty => wh.rewriteForRuns(table, rids, f)
      case (_, Some(p))               => wh.rewriteScoped(table, Seq(p), f)
      case _                          => wh.rewrite(table, f)
    }
  }

  /** S9: raw-file download (reference `processors/CompositeRunsProcessor
    * .scala:120-125`, `api/RunsController.scala:246-257`): the stored
    * upload bytes, gated by the same 404/403/410 checks as point gets. */
  def getRunFile(wh: Warehouse, runId: String, user: Records.User): Array[Byte] = {
    loadRun(wh, runId, user)
    // partition-pruned: only the run's hash bucket is listed and scanned
    val rows = wh.readForRuns(Warehouse.Files, Seq(runId))
      .filter(col("runId") === runId).select("content").collect()
    if (rows.isEmpty) throw new NotFoundException(s"file for run $runId not found")
    rows(0).getAs[Array[Byte]](0)
  }

  // ---- delete (M5, M6 analog) --------------------------------------------

  /** Soft delete + cascade (reference `processors/RunsProcessor
    * .scala:404-474`): raw file and child units are hard-deleted, the run
    * record is tombstoned (kept for 410 semantics). Second delete ⇒ 410. */
  def deleteRun(wh: Warehouse, runId: String, user: Records.User,
      now: () => Timestamp =
        () => new Timestamp(System.currentTimeMillis())): Unit = {
    val run = loadRun(wh, runId, user, allowDeleted = true)
    if (run.getAs[Timestamp]("deletionTimeUtc") != null)
      throw new GoneException(s"run $runId already deleted")
    val pipeline = run.getAs[String]("pipeline")

    // run-scoped cascade: each table rewrite touches only the run's hash
    // bucket (runs: its pipeline partition)
    wh.rewriteForRuns(Warehouse.Files, Seq(runId), _.filter(col("runId") =!= runId))
    Seq(Warehouse.samples(pipeline), Warehouse.readGroups(pipeline)).foreach { t =>
      if (wh.exists(t))
        wh.rewriteForRuns(t, Seq(runId), _.filter(col("runId") =!= runId))
    }
    val ts = now()
    wh.rewriteScoped(Warehouse.Runs, Seq(pipeline), df =>
      df.withColumn("deletionTimeUtc",
        when(col("runId") === runId, lit(ts)).otherwise(col("deletionTimeUtc"))))
  }
}
