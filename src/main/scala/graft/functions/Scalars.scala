package graft.functions

import java.sql.Timestamp
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small scalar vocabulary from the reference's utils (SURVEY §2.8). */
object Scalars {

  /** C3: percentage, curried like the reference (`utils/package.scala:48`). */
  def pctOf(denom: Column)(numer: Column): Column = numer * 100.0 / denom

  /** C5: current UTC time (`utils/package.scala:134`); session TZ is UTC
    * so `current_timestamp()` is the engine-side equivalent. */
  def utcTimeNow: Timestamp =
    Timestamp.from(Instant.now().atOffset(ZoneOffset.UTC).toInstant)
  val utcNowCol: Column = current_timestamp()

  /** C6: our ids are 32-hex md5 strings (the reference's were 24-hex
    * ObjectIds — `utils/package.scala:116-131`). */
  private val idPattern = "^[0-9a-f]{32}$".r
  def isValidId(s: String): Boolean = idPattern.findFirstIn(s).isDefined
  def tryMakeId(s: String): Option[String] = idPattern.findFirstIn(s)
  /** Splits raw strings into (valid ids, invalid strings) — the
    * reference's `separateObjectIds`. */
  def partitionIds(raw: Seq[String]): (Seq[String], Seq[String]) =
    raw.partition(isValidId)
  /** Engine-side id validity predicate. */
  def isValidIdCol(c: Column): Column = c.rlike("^[0-9a-f]{32}$")

  /** C7: lower-cased file extension, engine-side
    * (`models/AnnotationRecord.scala:43`). */
  def fileExtension(c: Column): Column =
    lower(regexp_extract(c, "\\.([^.]+)$", 1))

  /** C11: multi-valued query param split on ','
    * (`api/SentinelServlet.scala:139, 251-256`). */
  def splitParam(s: Option[String]): Seq[String] =
    s.map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)

  /** C12: enum parsing with a 400-style error on invalid input
    * (`api/SentinelServlet.scala:219-249`; enums `models/package.scala:42-81`). */
  final class InvalidEnumException(param: String, value: String)
    extends RuntimeException(s"invalid value for $param: '$value'")

  sealed trait AccLevel
  object AccLevel {
    case object Sample extends AccLevel
    case object ReadGroup extends AccLevel
    def parse(s: String): AccLevel = s.toLowerCase match {
      case "sample"    => Sample
      case "readgroup" => ReadGroup
      case other       => throw new InvalidEnumException("accLevel", other)
    }
  }

  def parseLibType(s: String): graft.selector.Selector.LibType = s.toLowerCase match {
    case "single" => graft.selector.Selector.Single
    case "paired" => graft.selector.Selector.Paired
    case other    => throw new InvalidEnumException("libType", other)
  }

  /** AggrStat vocabulary (reference `models/package.scala:71-81`). */
  val aggrStats: Set[String] =
    Set("sum", "min", "max", "mean", "median", "variance", "stdev")
  def parseAggrStat(s: String): String =
    if (aggrStats.contains(s.toLowerCase)) s.toLowerCase
    else throw new InvalidEnumException("aggrStat", s)
}
