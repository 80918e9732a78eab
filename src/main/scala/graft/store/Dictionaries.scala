package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ingest.Ingest
import graft.model.Records

/** Reference / annotation dictionaries with get-or-create-by-checksum
  * semantics (S8; reference `adapters/ReferencesAdapter.scala:40-59`,
  * `adapters/AnnotationsAdapter.scala:40-79`).
  *
  * The natural keys are content checksums: `combinedMd5` = md5 of the
  * alphabetically sorted contig md5s (C2, `models/ReferenceRecord
  * .scala:43`) and `annotMd5` (the annotation file's own digest). Ids are
  * derived from the checksums, so get-or-create is idempotent even under
  * replays — no unique index needed, matching the write-path-enforced
  * uniqueness SURVEY §7.3 calls for.
  */
object Dictionaries {

  final case class Contig(
      name: String,
      length: Long,
      md5: String,
      assembly: Option[String] = None,
      species: Option[String] = None,
      uri: Option[String] = None)

  /** C2: md5 over the concatenation of alphabetically sorted contig md5s. */
  def combinedMd5(contigs: Seq[Contig]): String =
    Ingest.md5Hex(contigs.map(_.md5).sorted.mkString(""))

  /** C7: lower-cased file extension. */
  def extensionOf(fileName: Option[String]): Option[String] =
    fileName.flatMap { f =>
      val i = f.lastIndexOf('.')
      if (i >= 0 && i < f.length - 1) Some(f.substring(i + 1).toLowerCase) else None
    }

  /** Get-or-create a reference record by combinedMd5; returns its refId. */
  def getOrCreateReference(
      wh: Warehouse,
      refName: Option[String],
      contigs: Seq[Contig],
      now: Timestamp): String = {
    val key = combinedMd5(contigs)
    val refId = Ingest.unitId("ref", key)
    // probe + append under the warehouse lock: concurrent ingests of the
    // same reference must not both pass the probe and double-insert (the
    // reference leaned on a Mongo unique index for this)
    wh.synchronized {
      val exists = wh.exists(Warehouse.References) &&
        wh.read(Warehouse.References)
          .filter(col("combinedMd5") === key).limit(1).count() > 0
      if (!exists) {
        val row = Row(refId, refName.orNull, key, now,
          contigs.map(c => Row(c.name, c.length, c.md5,
            c.assembly.orNull, c.species.orNull, c.uri.orNull)))
        wh.append(Warehouse.References,
          wh.spark.createDataFrame(java.util.List.of(row), Records.referenceSchema))
      }
    }
    refId
  }

  /** Get-or-create one annotation record by annotMd5; returns its annotId. */
  def getOrCreateAnnotation(
      wh: Warehouse,
      annotMd5: String,
      fileName: Option[String],
      now: Timestamp): String = {
    val annotId = Ingest.unitId("annot", annotMd5)
    wh.synchronized { // same probe+append race guard as references
      val exists = wh.exists(Warehouse.Annotations) &&
        wh.read(Warehouse.Annotations)
          .filter(col("annotMd5") === annotMd5).limit(1).count() > 0
      if (!exists) {
        val row = Row(annotId, annotMd5, fileName.orNull,
          extensionOf(fileName).orNull, now)
        wh.append(Warehouse.Annotations,
          wh.spark.createDataFrame(java.util.List.of(row), Records.annotationSchema))
      }
    }
    annotId
  }

  /** Time-desc listing with optional maxReturn (O1/O4, reference
    * `adapters/ReferencesAdapter.scala:68-78`). */
  def listReferences(wh: Warehouse, maxReturn: Option[Int] = None) =
    limitOpt(wh.readOr(Warehouse.References, Records.referenceSchema)
      .orderBy(desc("creationTimeUtc")), maxReturn)

  def listAnnotations(wh: Warehouse, maxReturn: Option[Int] = None) =
    limitOpt(wh.readOr(Warehouse.Annotations, Records.annotationSchema)
      .orderBy(desc("creationTimeUtc")), maxReturn)

  /** Point-get by id, 404 on an invalid OR unknown id — the reference
    * folds both into 404 (`api/ReferencesController.scala:64-86`,
    * `api/AnnotationsController.scala:64-87`: an unparseable ObjectId and
    * a missing record return the same "not found"). The invalid-id check
    * short-circuits the scan entirely. */
  def getReference(wh: Warehouse, refId: String): org.apache.spark.sql.DataFrame =
    pointGet(wh, Warehouse.References, Records.referenceSchema, "refId", refId,
      s"reference $refId not found")

  def getAnnotation(wh: Warehouse, annotId: String): org.apache.spark.sql.DataFrame =
    pointGet(wh, Warehouse.Annotations, Records.annotationSchema, "annotId", annotId,
      s"annotation $annotId not found")

  private def pointGet(wh: Warehouse, table: String,
      schema: org.apache.spark.sql.types.StructType, idCol: String,
      id: String, notFoundMsg: String): org.apache.spark.sql.DataFrame = {
    if (!graft.functions.Scalars.isValidId(id))
      throw new graft.lifecycle.RunsLifecycle.NotFoundException(notFoundMsg)
    val df = wh.readOr(table, schema).filter(col(idCol) === id)
    if (df.limit(1).count() == 0)
      throw new graft.lifecycle.RunsLifecycle.NotFoundException(notFoundMsg)
    df
  }

  private def limitOpt(df: org.apache.spark.sql.DataFrame, n: Option[Int]) =
    n.filter(_ > 0).map(df.limit).getOrElse(df)
}
