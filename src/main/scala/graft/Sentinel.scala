package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ingest.RunIngestor
import graft.lifecycle.{JsonPatch, RunsLifecycle, UsersOps}
import graft.model.Records
import graft.pipelines.{MaplePipeline, PannPipeline, PipelinePlugin, PlainPipeline, PrefPipeline}
import graft.selector.Selector
import graft.stats.{Descriptive, StatsProcessor}
import graft.store.{Dictionaries, Warehouse}

/** The engine's front door — the surface a LUMC/sentinel deployment uses,
  * re-expressed over the Spark warehouse. One instance per warehouse root;
  * everything below it is the library documented in README.md.
  *
  * HTTP status mapping for the error taxonomy (driver-side exceptions):
  * NotJson→400, InvalidEnum/PatchParse→400, NotAuthorized/Forbidden→403,
  * NotFound→404, Conflict/DuplicateFile→409, Gone→410,
  * PayloadTooLarge→413, Schema/PatchValidation/Validation→422.
  */
final class Sentinel(
    val spark: SparkSession,
    val root: String,
    extraPipelines: Seq[PipelinePlugin] = Seq.empty,
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  val warehouse = new Warehouse(spark, root)

  /** §2.10 plugin registry: the reference's built-ins + deployment extras. */
  val pipelines: Map[String, PipelinePlugin] =
    (Seq(MaplePipeline, PlainPipeline, PrefPipeline, PannPipeline) ++ extraPipelines)
      .map(p => p.name -> p).toMap

  private val ingestor = new RunIngestor(warehouse, pipelines, clock)

  // ---- ingest (S1-S8) ----------------------------------------------------

  def upload(bytes: Array[Byte], fileName: String, pipeline: String,
      uploader: Records.User): String =
    ingestor.upload(bytes, fileName, pipeline, uploader)

  def bulkIngest(uploads: DataFrame, pipeline: String): Long =
    ingestor.bulkIngest(uploads, pipeline)

  // ---- runs (F10-F14, J2-J4, O1, S9, M1-M5) ------------------------------

  def getRuns(user: Records.User, pipelines: Seq[String] = Seq.empty): DataFrame =
    RunsLifecycle.getRuns(warehouse, user, pipelines)

  def getRun(runId: String, user: Records.User,
      showUnitsLabels: Boolean = false): DataFrame =
    RunsLifecycle.getRun(warehouse, runId, user, showUnitsLabels)

  def getRunFile(runId: String, user: Records.User): Array[Byte] =
    RunsLifecycle.getRunFile(warehouse, runId, user)

  def patchRun(runId: String, user: Records.User,
      ops: List[JsonPatch.PatchOp]): (Int, Int, Int) =
    RunsLifecycle.patchRun(warehouse, runId, user, ops)

  def deleteRun(runId: String, user: Records.User): Unit =
    RunsLifecycle.deleteRun(warehouse, runId, user, clock)

  // ---- stats (P1-P3, A1-A4, O1-O3) ---------------------------------------

  /** accLevel routing: sample vs read-group units for a pipeline. */
  def unitsOf(pipeline: String, accLevel: graft.functions.Scalars.AccLevel): DataFrame = {
    val table = accLevel match {
      case graft.functions.Scalars.AccLevel.Sample    => Warehouse.samples(pipeline)
      case graft.functions.Scalars.AccLevel.ReadGroup => Warehouse.readGroups(pipeline)
    }
    warehouse.read(table)
  }

  def getStats(
      units: DataFrame,
      selectors: Seq[Selector],
      projection: Seq[Column],
      sortOrRandom: Either[Long, String],
      nLimit: Option[Int]): DataFrame =
    StatsProcessor.getStats(units, selectors, projection, sortOrRandom, nLimit)

  def getAggregateStats(
      units: DataFrame,
      selectors: Seq[Selector],
      metrics: Seq[(String, Column)]): DataFrame =
    StatsProcessor.getAggregateStats(units, selectors, metrics,
      Descriptive.sparkNativeStats)

  /** §2.11 endpoint shape: accLevel/libType/runIds/references/annotations/
    * timeSorted/nLimit as a typed params object. */
  def getStats(pipeline: String, params: graft.stats.StatsParams,
      projection: Seq[Column]): DataFrame =
    StatsProcessor.getStats(unitsOf(pipeline, params.accLevel),
      params.selectors, projection, params.sortOrRandom, params.nLimit)

  def getAggregateStats(pipeline: String, params: graft.stats.StatsParams,
      metrics: Seq[(String, Column)]): DataFrame =
    StatsProcessor.getAggregateStats(unitsOf(pipeline, params.accLevel),
      params.selectors, metrics, Descriptive.sparkNativeStats)

  def globalRunStats(): DataFrame =
    StatsProcessor.globalRunStats(warehouse.read(Warehouse.Runs))

  // ---- dictionaries (S8, O4) ---------------------------------------------

  def listReferences(maxReturn: Option[Int] = None): DataFrame =
    Dictionaries.listReferences(warehouse, maxReturn)

  def listAnnotations(maxReturn: Option[Int] = None): DataFrame =
    Dictionaries.listAnnotations(warehouse, maxReturn)

  /** Point-gets: 404 (NotFoundException) on invalid or unknown id. */
  def getReference(refId: String): DataFrame =
    Dictionaries.getReference(warehouse, refId)

  def getAnnotation(annotId: String): DataFrame =
    Dictionaries.getAnnotation(warehouse, annotId)

  // ---- users (S10, M6) ---------------------------------------------------

  def addUser(id: String, email: String, password: String,
      confirmPassword: String, verified: Boolean = false,
      isAdmin: Boolean = false): Unit =
    UsersOps.addUser(warehouse, id, email, password, confirmPassword,
      verified, isAdmin, clock)

  def getUser(id: String): Option[Records.User] = UsersOps.getUser(warehouse, id)

  def patchUser(requester: Records.User, userId: String,
      ops: List[JsonPatch.PatchOp]): Unit =
    UsersOps.patchUser(warehouse, requester, userId, ops, clock)

  def deleteUser(requester: Records.User, userId: String): Unit =
    UsersOps.deleteUser(warehouse, requester, userId)
}
