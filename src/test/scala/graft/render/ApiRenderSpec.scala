package graft.render

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ApiRenderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, "u1", "runA", 10L),
    (2L, "u2", "runB", 20L)
  ).toDF("id", "uploaderId", "runName", "metric")
    .withColumn("labels", struct(col("runName"), col("id").as("runId")))

  "conditionalLabels" should "attach labels only to the requester's own rows (P3)" in {
    val r = ApiRender.conditionalLabels(points, Some("u1"))
      .select("id", "labels.runName").collect()
      .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    r(1L) shouldBe Some("runA")
    r(2L) shouldBe None
  }

  it should "strip all labels for anonymous requesters" in {
    ApiRender.conditionalLabels(points, None)
      .select("labels").collect().forall(_.isNullAt(0)) shouldBe true
  }

  "hideAttributes" should "drop the internal id arrays (P4)" in {
    val df = Seq((1L, Seq("a"), Seq("b"))).toDF("runId", "sampleIds", "readGroupIds")
    ApiRender.hideAttributes(df).columns shouldBe Array("runId")
  }

  "pruneBlanks" should "recursively remove nulls and empty containers (P5)" in {
    ApiRender.pruneBlanks(
      """{"a":1,"b":null,"c":{},"d":[],"e":{"f":null},"g":[1,null]}""") shouldBe
      Some("""{"a":1,"g":[1]}""")
    ApiRender.pruneBlanks("""{"a":null,"b":{}}""") shouldBe None
  }

  "renderRows" should "serialize with null suppression and optional blank pruning" in {
    val df = Seq((1L, Option.empty[String])).toDF("id", "note")
    ApiRender.renderRows(df) shouldBe """[{"id":1}]"""
    // engine-side to_json already drops nulls; blank pruning additionally
    // removes empty containers
    val nested = Seq((1L, Seq.empty[String])).toDF("id", "tags")
    ApiRender.renderRows(nested, showBlanks = false) shouldBe """[{"id":1}]"""
  }
}
