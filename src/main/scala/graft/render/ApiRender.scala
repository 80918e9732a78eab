package graft.render

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Response-shaping operators (P3-P5).
  *
  * P3/P4 are engine-side column transforms; P5 (blank pruning) runs on
  * the driver because it is the HTTP serialization step — by then the
  * result set is already request-sized.
  */
object ApiRender {

  /** P3: attach labels+runId to data points only when the requester is
    * the uploader, else null them out (reference
    * `processors/StatsProcessor.scala:220-234`). */
  def conditionalLabels(df: DataFrame, userId: Option[String],
      labelsCol: String = "labels"): DataFrame =
    df.withColumn(labelsCol,
      when(col("uploaderId") === userId.orNull, col(labelsCol))
        .otherwise(lit(null).cast(df.schema(labelsCol).dataType)))

  /** P4: hide internal attributes from API output (reference
    * `utils/package.scala:137-148`, `models/BaseRunRecord.scala:84-87`). */
  val hiddenRunAttributes: Seq[String] = Seq("sampleIds", "readGroupIds")
  def hideAttributes(df: DataFrame, attrs: Seq[String] = hiddenRunAttributes): DataFrame =
    df.drop(attrs: _*)

  /** Rows → JSON strings engine-side; null fields dropped by the codegen'd
    * `to_json`, container pruning left to [[pruneBlanks]]. */
  def toJsonRows(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*),
      Map("ignoreNullFields" -> "true")).as("json"))

  private val mapper = new ObjectMapper()

  /** P5: `showBlanks=false` recursively removes nulls, empty arrays, and
    * empty objects from a JSON document (reference
    * `api/SentinelServlet.scala:43-62, 99-109`). Returns None if the
    * whole document prunes away. */
  def pruneBlanks(json: String): Option[String] = {
    val pruned = prune(mapper.readTree(json))
    pruned.map(_.toString)
  }

  private def prune(node: JsonNode): Option[JsonNode] = node match {
    case _ if node == null || node.isNull => None
    case o: ObjectNode =>
      val kept = mapper.createObjectNode()
      o.properties().forEach { e =>
        prune(e.getValue).foreach(v => kept.set[JsonNode](e.getKey, v))
      }
      if (kept.isEmpty) None else Some(kept)
    case a: ArrayNode =>
      val kept = mapper.createArrayNode()
      a.forEach(el => prune(el).foreach(kept.add))
      if (kept.isEmpty) None else Some(kept)
    case other => Some(other)
  }

  /** Driver-side rendering of a request-sized result: JSON array string
    * with optional blank suppression. */
  def renderRows(df: DataFrame, showBlanks: Boolean = true): String = {
    val rows = toJsonRows(df).collect().map(_.getString(0))
    val kept =
      if (showBlanks) rows.toSeq
      else rows.toSeq.flatMap(pruneBlanks)
    kept.mkString("[", ",", "]")
  }
}
