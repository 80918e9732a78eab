package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BloomFunctions, BloomRef}

import graft.SparkSpec

/** Bloom build/probe expressions: no false negatives, bounded false
  * positives, merge-order invariance (bit-or), and structural equality
  * of the probe expression (the anchors-as-data convention). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def build(n: Int, parts: Int): Array[Byte] =
    spark.range(n).selectExpr("concat('member_', id) AS s")
      .repartition(parts)
      .agg(BloomFunctions.bloomBuild(col("s"), expectedItems = 100000, fpp = 0.001))
      .collect()(0).getAs[Array[Byte]](0)

  behavior of "BloomBuildAgg / BloomMightContain"

  it should "never produce a false negative" in {
    val bytes = build(20000, 8)
    val misses = spark.range(20000)
      .selectExpr("concat('member_', id) AS s")
      .filter(!BloomFunctions.bloomContains(col("s"), bytes))
      .count()
    misses shouldBe 0L
  }

  it should "hold the configured false-positive rate within 5x" in {
    val bytes = build(20000, 8)
    val fps = spark.range(100000)
      .selectExpr("concat('outsider_', id) AS s")
      .filter(BloomFunctions.bloomContains(col("s"), bytes))
      .count()
    fps.toDouble / 100000.0 should be < 0.005
  }

  it should "serialize identically under any partitioning (bit-or merge)" in {
    java.util.Arrays.equals(build(20000, 1), build(20000, 16)) shouldBe true
  }

  it should "probe inside higher-order-function lambdas (interpreted eval)" in {
    val bytes = build(100, 1)
    val hits = Seq(Seq("member_1", "member_2", "nope_xyzzy"))
      .toDF("grams")
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(col("grams"),
          g => BloomFunctions.bloomContains(g, bytes))).as("n"))
      .collect()(0).getInt(0)
    hits shouldBe 2
  }

  it should "compare probe expressions structurally (digest equality)" in {
    val bytes = build(100, 1)
    new BloomRef(bytes) shouldBe new BloomRef(bytes.clone())
    new BloomRef(bytes).hashCode shouldBe new BloomRef(bytes.clone()).hashCode
  }
}
