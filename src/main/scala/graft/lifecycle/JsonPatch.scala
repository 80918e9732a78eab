package graft.lifecycle

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

/** RFC-6902 subset parser + model (reference `models/JsonPatch.scala:26-122`,
  * `utils/JsonExtractor.scala:108-139`, schema `schemas/json_patch.json`).
  *
  * All six op types parse; only add/remove/replace are ever *applicable*
  * (the reference whitelists per-path, everything else is a 422 —
  * `adapters/UnitsAdapter.scala:112-115`).
  */
object JsonPatch {

  sealed trait PatchOp {
    def op: String
    def path: String
    final lazy val pathTokens: List[String] =
      path.split("/").filter(_.nonEmpty).toList
    def withPath(tokens: Seq[String]): PatchOp
  }

  /** Scalar payload or None for null/array/object values
    * (reference `JsonPatch.scala:67-77` atomicValue). */
  sealed trait WithValue extends PatchOp {
    def value: Any
    def atomicValue: Option[Any] = value match {
      case null                 => None
      case i: Int               => Some(i)
      case l: Long              => Some(l)
      case d: Double            => Some(d)
      case s: String            => Some(s)
      case b: Boolean           => Some(b)
      case _                    => None
    }
    def stringValue: Option[String] =
      atomicValue.collect { case s: String => s }
  }

  final case class AddOp(path: String, value: Any) extends WithValue {
    val op = "add"
    def withPath(t: Seq[String]): PatchOp = copy(path = "/" + t.mkString("/"))
  }
  final case class ReplaceOp(path: String, value: Any) extends WithValue {
    val op = "replace"
    def withPath(t: Seq[String]): PatchOp = copy(path = "/" + t.mkString("/"))
  }
  final case class RemoveOp(path: String) extends PatchOp {
    val op = "remove"
    def withPath(t: Seq[String]): PatchOp = copy(path = "/" + t.mkString("/"))
  }
  final case class CopyOp(path: String, from: String) extends PatchOp {
    val op = "copy"
    def withPath(t: Seq[String]): PatchOp = copy(path = "/" + t.mkString("/"))
  }
  final case class MoveOp(path: String, from: String) extends PatchOp {
    val op = "move"
    def withPath(t: Seq[String]): PatchOp = copy(path = "/" + t.mkString("/"))
  }
  final case class TestOp(path: String, value: Any) extends WithValue {
    val op = "test"
    def withPath(t: Seq[String]): PatchOp = copy(path = "/" + t.mkString("/"))
  }

  /** 400-level parse failure (malformed patch document). */
  final class PatchParseException(msg: String) extends RuntimeException(msg)
  /** 422-level validation failure (well-formed but not applicable). */
  final class PatchValidationException(msg: String) extends RuntimeException(msg)

  private def jsonValue(n: JsonNode): Any = n match {
    case _ if n == null      => null
    case _ if n.isTextual    => n.asText
    case _ if n.isBoolean    => n.asBoolean
    case _ if n.isInt        => n.asInt
    case _ if n.isLong       => n.asLong
    case _ if n.isIntegralNumber =>
      val bi = n.bigIntegerValue
      if (bi.bitLength < 32) bi.intValue
      else if (bi.bitLength < 64) bi.longValue
      else null
    case _ if n.isNumber     => n.asDouble
    case _                   => null // arrays/objects are non-atomic
  }

  private def parseOne(n: JsonNode): PatchOp = {
    if (!n.isObject) throw new PatchParseException("patch op must be an object")
    val op = Option(n.get("op")).filter(_.isTextual).map(_.asText)
      .getOrElse(throw new PatchParseException("missing 'op'"))
    val path = Option(n.get("path")).filter(_.isTextual).map(_.asText)
      .getOrElse(throw new PatchParseException("missing 'path'"))
    if (!path.startsWith("/"))
      throw new PatchParseException(s"path must start with '/': $path")
    def value = Option(n.get("value"))
      .getOrElse(throw new PatchParseException("missing 'value'"))
    def from = Option(n.get("from")).filter(_.isTextual).map(_.asText)
      .getOrElse(throw new PatchParseException("missing 'from'"))
    op match {
      case "add"     => AddOp(path, jsonValue(value))
      case "replace" => ReplaceOp(path, jsonValue(value))
      case "remove"  => RemoveOp(path)
      case "copy"    => CopyOp(path, from)
      case "move"    => MoveOp(path, from)
      case "test"    => TestOp(path, jsonValue(value))
      case other     => throw new PatchParseException(s"unknown op '$other'")
    }
  }

  /** Parse a patch body: an array of ops, or a single op auto-wrapped
    * (reference `utils/JsonExtractor.scala:108-139`). */
  def parse(body: JsonNode): List[PatchOp] =
    if (body.isArray) {
      if (body.isEmpty) throw new PatchParseException("empty patch array")
      body.elements().asScala.map(parseOne).toList
    } else List(parseOne(body))
}
