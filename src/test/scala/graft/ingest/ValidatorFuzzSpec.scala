package graft.ingest

import scala.util.Random

import graft.SparkSpec
import graft.pipelines.{MaplePipeline, PannPipeline, PipelinePlugin, PlainPipeline, PrefPipeline}

/** Seeded fuzz over the pipeline validators: arbitrary JSON documents must
  * produce error LISTS (422 material), never exceptions — a validator that
  * throws turns a bad upload into a 500. */
class ValidatorFuzzSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val plugins: Seq[PipelinePlugin] =
    Seq(MaplePipeline, PlainPipeline, PrefPipeline, PannPipeline)

  private def randomJson(rnd: Random, depth: Int = 0): String = {
    def value: String = rnd.nextInt(if (depth > 2) 5 else 7) match {
      case 0 => rnd.nextInt(100000).toString
      case 1 => "\"" + rnd.alphanumeric.take(rnd.nextInt(8)).mkString + "\""
      case 2 => "null"
      case 3 => if (rnd.nextBoolean()) "true" else "false"
      case 4 => (rnd.nextDouble() * 1000).toString
      case 5 => randomJson(rnd, depth + 1)
      case 6 =>
        (0 until rnd.nextInt(3)).map(_ => randomJson(rnd, depth + 1))
          .mkString("[", ",", "]")
    }
    val keys = Seq("samples", "readGroups", "nSnps", "nReadsInput", "runName",
      "reference", "contigs", "annotations", "md5", "num", "length", "path", "x")
    (0 until rnd.nextInt(4)).map { _ =>
      "\"" + keys(rnd.nextInt(keys.size)) + "\": " + value
    }.mkString("{", ",", "}")
  }

  "pipeline validators" should "never throw on arbitrary JSON (seeded fuzz)" in {
    val rnd = new Random(1234)
    (1 to 200).foreach { _ =>
      val doc = randomJson(rnd)
      val node = mapper.readTree(doc)
      plugins.foreach { p =>
        noException should be thrownBy p.validate(node)
      }
    }
  }

  "JsonPatch.parse" should "reject arbitrary JSON with typed errors, never other exceptions (seeded fuzz)" in {
    import graft.lifecycle.JsonPatch
    val rnd = new Random(4321)
    val docs =
      Seq("[]", "{}", "null", "42", "\"op\"",
        """[{"op":"add"}]""", """[{"path":"/x"}]""",
        """[{"op":"move","path":"/a"}]""", """{"op":"test","path":"/a"}""") ++
        (1 to 200).map(_ => randomJson(rnd))
    docs.foreach { doc =>
      val node = mapper.readTree(doc)
      try { JsonPatch.parse(node); () }
      catch {
        case _: JsonPatch.PatchParseException      => () // 400 material
        case _: JsonPatch.PatchValidationException => () // 422 material
      }
    }
  }

  "Ingest.parseJson" should "reject junk with typed errors, never other exceptions" in {
    val rnd = new Random(99)
    val junk = Seq("", "not json", "{", "[1,", "\"scalar\"", "42", "true") ++
      (1 to 50).map(_ => rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
    junk.foreach { s =>
      val bytes = s.getBytes("UTF-8")
      try { Ingest.parseJson(bytes); () }
      catch {
        case _: Ingest.NotJsonException => () // the only allowed failure
      }
    }
  }
}
