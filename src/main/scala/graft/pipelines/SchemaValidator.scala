package graft.pipelines

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Declarative JSON-schema validation — the reference's extensibility
  * contract: a pipeline author ships a draft-04 schema FILE, not
  * validation code (reference `utils/JsonValidator.scala:32-77`, loading
  * e.g. `src/main/resources/schemas/plain.json` and
  * `src/test/resources/schema_examples/maple.json:1-54`).
  *
  * This is a self-contained interpreter for the draft-04 subset those
  * schemas (and RFC-6902's `schemas/json_patch.json`) actually use:
  * `type`, `required`, `properties`, `additionalProperties`,
  * intra-document `$ref`, `enum`, `pattern`, `minProperties`,
  * `minItems`, `items`, `allOf` / `anyOf` / `oneOf`. No external
  * library, no network resolution — refs outside `#/` are rejected at
  * construction.
  *
  * Validation never throws on malformed instances: it returns the error
  * list (HTTP 422 material). Only a malformed SCHEMA (author error)
  * throws, at load time.
  */
final class SchemaValidator(val schema: JsonNode) {

  // fail fast on schema-author errors: walk every $ref once at load
  private def walkRefs(node: JsonNode): Unit = {
    if (node.isObject) {
      Option(node.get("$ref")).foreach(r => resolveRef(r.asText))
      node.properties().asScala.foreach(e => walkRefs(e.getValue))
    } else if (node.isArray) node.elements().asScala.foreach(walkRefs)
  }
  walkRefs(schema)

  /** Resolve a `$ref` fully: a ref may point at a node that is itself a
    * ref (chained refs), so follow until the target has none — with a
    * seen-set so a ref cycle is a load-time schema error, not an
    * infinite loop (or, worse, a schema that silently validates
    * everything). */
  private def resolveRef(ref: String): JsonNode = {
    var cur = ref
    val seen = scala.collection.mutable.Set.empty[String]
    while (true) {
      require(seen.add(cur), s"$$ref cycle: ${seen.mkString(" -> ")} -> $cur")
      require(cur.startsWith("#/"), s"only intra-document $$refs are supported: $cur")
      val node = cur.stripPrefix("#/").split('/').foldLeft(schema) { (n, seg) =>
        val child = n.get(seg)
        require(child != null, s"unresolvable $$ref: $cur")
        child
      }
      val next = Option(node.get("$ref")).filter(_ => node.isObject)
      next match {
        case Some(r) => cur = r.asText
        case None    => return node
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Validation errors for `instance`; empty means valid. */
  def validate(instance: JsonNode): Seq[String] = check(schema, instance, "")

  private def typeOk(t: String, j: JsonNode): Boolean = t match {
    case "object"  => j.isObject
    case "array"   => j.isArray
    case "string"  => j.isTextual
    case "integer" => j.isIntegralNumber
    case "number"  => j.isNumber
    case "boolean" => j.isBoolean
    case "null"    => j.isNull
    case _         => true
  }

  private def check(rawSchema: JsonNode, j: JsonNode, path: String): Seq[String] = {
    val s =
      if (rawSchema.has("$ref")) resolveRef(rawSchema.get("$ref").asText)
      else rawSchema
    val here = if (path.isEmpty) "root" else path
    def at(p: String) = if (path.isEmpty) p else s"$path/$p"
    val errs = Seq.newBuilder[String]

    Option(s.get("type")).foreach { t =>
      val types =
        if (t.isArray) t.elements().asScala.map(_.asText).toSeq else Seq(t.asText)
      if (!types.exists(typeOk(_, j)))
        errs += s"$here: expected ${types.mkString("|")}"
    }
    Option(s.get("enum")).foreach { e =>
      if (!e.elements().asScala.exists(_ == j)) // JsonNode.equals is deep
        errs += s"$here: not one of the allowed values"
    }
    Option(s.get("pattern")).filter(_ => j.isTextual).foreach { p =>
      if (!java.util.regex.Pattern.compile(p.asText).matcher(j.asText).find())
        errs += s"$here: does not match pattern ${p.asText}"
    }

    if (j.isObject) {
      Option(s.get("required")).foreach(_.elements().asScala.foreach { r =>
        if (!j.has(r.asText)) errs += s"${at(r.asText)}: required"
      })
      Option(s.get("minProperties")).foreach { m =>
        if (j.size() < m.asInt)
          errs += s"$here: expected at least ${m.asInt} properties"
      }
      val props = Option(s.get("properties"))
      val addl = Option(s.get("additionalProperties")).filter(_.isObject)
      j.properties().asScala.foreach { e =>
        props.flatMap(p => Option(p.get(e.getKey))) match {
          case Some(sub) => errs ++= check(sub, e.getValue, at(e.getKey))
          case None => addl.foreach(a => errs ++= check(a, e.getValue, at(e.getKey)))
        }
      }
    }

    if (j.isArray) {
      Option(s.get("minItems")).foreach { m =>
        if (j.size() < m.asInt) errs += s"$here: expected at least ${m.asInt} items"
      }
      Option(s.get("items")).filter(_.isObject).foreach { it =>
        j.elements().asScala.zipWithIndex.foreach {
          case (el, i) => errs ++= check(it, el, at(i.toString))
        }
      }
    }

    Option(s.get("allOf")).foreach(
      _.elements().asScala.foreach(sub => errs ++= check(sub, j, path)))
    Option(s.get("anyOf")).foreach { alts =>
      if (!alts.elements().asScala.exists(a => check(a, j, path).isEmpty))
        errs += s"$here: matches no anyOf alternative"
    }
    Option(s.get("oneOf")).foreach { alts =>
      val n = alts.elements().asScala.count(a => check(a, j, path).isEmpty)
      if (n != 1) errs += s"$here: matches $n oneOf alternatives (want exactly 1)"
    }
    errs.result()
  }
}

object SchemaValidator {
  private val mapper = new ObjectMapper()

  /** Load a schema from the classpath (e.g. `/schemas/maple.json`). */
  def fromResource(path: String): SchemaValidator = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"schema resource not found: $path")
    try new SchemaValidator(mapper.readTree(in))
    finally in.close()
  }

  def fromString(schemaJson: String): SchemaValidator =
    new SchemaValidator(mapper.readTree(schemaJson))
}
