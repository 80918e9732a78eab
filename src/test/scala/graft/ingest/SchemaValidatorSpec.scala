package graft.ingest

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.pipelines.{MaplePipeline, PannPipeline, PlainPipeline, PrefPipeline, SchemaValidator}

/** The declarative validation contract: pipelines validate uploads against
  * their SHIPPED draft-04 schema files (reference
  * `utils/JsonValidator.scala:32-77` + the schemas resource dir), and the
  * interpreter implements the draft-04 subset those files use. */
class SchemaValidatorSpec extends AnyFlatSpec with Matchers {

  private val mapper = new ObjectMapper()
  private def j(s: String) = mapper.readTree(s)

  private def fixture(path: String): String = new String(
    Files.readAllBytes(Paths.get(getClass.getResource(s"/fixtures/$path").toURI)),
    "UTF-8")

  "the maple schema file" should "accept the reference fixtures verbatim" in {
    Seq("maple/maple_single_sample_multi_rg.json",
      "maple/maple_multi_sample_multi_rg.json",
      "maple/maple_multi_sample_single_rg.json",
      "maple/maple_single_sample_single_rg.json").foreach { f =>
      MaplePipeline.validate(j(fixture(f))) shouldBe empty
    }
  }

  it should "reject structural violations with one error per violation site" in {
    MaplePipeline.validate(j("{}")) should have size 2 // samples + runName
    MaplePipeline.validate(j(
      """{"runName": 3, "samples": {}}""")) should have size 2 // type + minProperties
    MaplePipeline.validate(j(
      """{"runName": "r", "samples": {"s1": {"readGroups": {"rg": {}}}}}"""
    )) should contain allOf (
      "samples/s1/nSnps: required",
      "samples/s1/readGroups/rg/nReadsInput: required",
      "samples/s1/readGroups/rg/nReadsAligned: required")
    MaplePipeline.validate(j(
      """{"runName": "r",
        |"samples": {"s1": {"nSnps": "many", "readGroups": {
        |  "rg": {"nReadsInput": 1, "nReadsAligned": 2.5}}}}}""".stripMargin
    )) should contain allOf (
      "samples/s1/nSnps: expected integer",
      "samples/s1/readGroups/rg/nReadsAligned: expected integer")
  }

  "the plain schema file" should "accept any non-empty object or array, reject the rest" in {
    PlainPipeline.validate(j("""{"anything": 1}""")) shouldBe empty
    PlainPipeline.validate(j("""[1]""")) shouldBe empty
    PlainPipeline.validate(j("{}")) should not be empty
    PlainPipeline.validate(j("[]")) should not be empty
    PlainPipeline.validate(j("42")) should not be empty
  }

  "the pref/pann schema files" should "pin the dictionary shapes" in {
    PrefPipeline.validate(j(fixture("pref/pref_01.json"))) shouldBe empty
    PannPipeline.validate(j(fixture("pann/pann_01.json"))) shouldBe empty
    PrefPipeline.validate(j("""{"samples": {}}""")).head should include("reference")
    PrefPipeline.validate(j(
      """{"reference": {"contigs": {"c": {"md5": 5, "length": "x"}}},
        |"samples": {"s": {"num": 1}}}""".stripMargin)) should have size 2
    PannPipeline.validate(j(
      """{"annotations": {"a": {}}, "samples": {"s": {}}}""")) shouldBe Seq(
      "annotations/a/md5: required", "samples/s/num: required")
  }

  "the interpreter" should "support enum, pattern, items, allOf and oneOf" in {
    val v = SchemaValidator.fromString(
      """{"type": "array", "minItems": 1,
        |"items": {"allOf": [
        |  {"type": "object", "required": ["op", "path"],
        |   "properties": {"path": {"type": "string", "pattern": "^(/[^/~]*(~[01][^/~]*)*)*$"}}},
        |  {"oneOf": [
        |    {"properties": {"op": {"enum": ["add", "replace", "test"]}}, "required": ["value"]},
        |    {"properties": {"op": {"enum": ["remove"]}}},
        |    {"properties": {"op": {"enum": ["move", "copy"]}}, "required": ["from"]}]}]}}""".stripMargin)
    v.validate(j("""[{"op": "add", "path": "/a", "value": 1}]""")) shouldBe empty
    v.validate(j("""[{"op": "remove", "path": "/a"}]""")) shouldBe empty
    v.validate(j("""[]""")) should not be empty // minItems
    v.validate(j("""[{"op": "add", "path": "/a"}]""")) should not be empty // no value
    v.validate(j("""[{"op": "nope", "path": "/a"}]""")) should not be empty // enum
    v.validate(j("""[{"op": "remove", "path": "bad pointer"}]""")) should not be empty // pattern
  }

  it should "reject malformed schemas at load time, never at validate time" in {
    an[IllegalArgumentException] should be thrownBy
      SchemaValidator.fromString("""{"$ref": "http://example.com/x"}""")
    an[IllegalArgumentException] should be thrownBy
      SchemaValidator.fromString("""{"$ref": "#/definitions/missing"}""")
    an[IllegalArgumentException] should be thrownBy
      SchemaValidator.fromResource("/schemas/nope.json")
  }

  it should "follow chained $refs to the terminal schema" in {
    // a -> b -> the actual integer schema; a one-level dereference would
    // see {"$ref": ...} as an empty schema and validate anything
    val v = SchemaValidator.fromString(
      """{"$ref": "#/definitions/a",
        |"definitions": {
        |  "a": {"$ref": "#/definitions/b"},
        |  "b": {"type": "integer"}}}""".stripMargin)
    v.validate(j("3")) shouldBe empty
    v.validate(j(""""not an int"""")) should not be empty
  }

  it should "reject $ref cycles at load time" in {
    an[IllegalArgumentException] should be thrownBy
      SchemaValidator.fromString(
        """{"$ref": "#/definitions/a",
          |"definitions": {
          |  "a": {"$ref": "#/definitions/b"},
          |  "b": {"$ref": "#/definitions/a"}}}""".stripMargin)
  }
}
