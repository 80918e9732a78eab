package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Seq(
    (1L, "hot", 10.0), (2L, "hot", 20.0), (3L, "hot", 30.0),
    (4L, "cold", 40.0), (5L, "warm", 50.0)
  ).toDF("id", "k", "v")

  private lazy val dim = Seq(
    ("hot", "H"), ("cold", "C"), ("warm", "W"), ("unused", "U")
  ).toDF("k", "label")

  "saltedJoin" should "produce exactly the plain-join result" in {
    val plain = fact.join(dim, Seq("k")).select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Joins.saltedJoin(fact, dim, "k", saltFactor = 4)
      .select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    salted shouldBe plain
    salted should have size 5
  }

  it should "support left joins preserving unmatched fact rows" in {
    val extra = fact.union(Seq((6L, "nokey", 0.0)).toDF("id", "k", "v"))
    val r = Joins.saltedJoin(extra, dim, "k", saltFactor = 3, joinType = "left")
    r.count() shouldBe 6
    r.filter(col("k") === "nokey").select("label").collect()(0).isNullAt(0) shouldBe true
  }

  it should "spread a hot key over multiple salt values" in {
    val many = (1L to 200L).map(i => (i, "hot", i.toDouble)).toDF("id", "k", "v")
    val salts = many.withColumn("__salt",
      pmod(xxhash64(many.columns.map(col): _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    salts should be > 4L // 200 distinct rows hash across most of 8 buckets
  }

  "broadcastJoin" should "force a broadcast hash join" in {
    val plan = Joins.broadcastJoin(fact, dim, "k")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  "keyFrequency" should "rank keys by count" in {
    val r = Joins.keyFrequency(fact, "k").collect()
    r(0).getString(0) shouldBe "hot"
    r(0).getLong(1) shouldBe 3L
  }
}
