package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64Function}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{HllCountAgg, SketchFunctions}
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** HyperLogLog sketch aggregate: error bounds at several cardinalities,
  * merge laws (the property that makes it a correct PARTIAL aggregate),
  * partitioning invariance, and the SQL registration. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Long, parts: Int): Long =
    spark.range(n).repartition(parts)
      .agg(SketchFunctions.hllCount(xxhash64(col("id"))).as("est"))
      .collect()(0).getLong(0)

  behavior of "HllCountAgg"

  it should "estimate within 3 sigma (1.04/sqrt(4096)) across cardinalities" in {
    for (n <- Seq(100L, 5000L, 50000L, 500000L)) {
      val est = estimate(n, 8)
      val relErr = math.abs(est - n).toDouble / n
      withClue(s"n=$n est=$est: ") { relErr should be < 3 * 1.04 / 64.0 }
    }
  }

  it should "be exact-ish at tiny cardinalities (linear counting regime)" in {
    estimate(10L, 4) shouldBe 10L
    estimate(1L, 1) shouldBe 1L
  }

  it should "return 0 for an empty input" in {
    spark.range(10).filter(col("id") < 0)
      .agg(SketchFunctions.hllCount(xxhash64(col("id"))))
      .collect()(0).getLong(0) shouldBe 0L
  }

  it should "be invariant to partitioning (merge is order-blind)" in {
    val a = estimate(40000L, 1)
    val b = estimate(40000L, 32)
    a shouldBe b
  }

  it should "merge as elementwise register max (associative, commutative)" in {
    val agg = HllCountAgg(BoundReference(0, LongType, nullable = false))
    def sketch(vals: Seq[Long]): Array[Byte] = {
      val b = agg.createAggregationBuffer()
      vals.foreach { v =>
        agg.update(b, InternalRow(XxHash64Function.hash(v, LongType, 42L)))
      }
      b
    }
    val x = sketch((1L to 1000L).toSeq)
    val y = sketch((500L to 1500L).toSeq)
    val xy = agg.merge(x.clone(), y.clone())
    val yx = agg.merge(y.clone(), x.clone())
    xy.toSeq shouldBe yx.toSeq
    // merged estimate ~= union cardinality (1500 distinct)
    val est = agg.eval(xy).asInstanceOf[Long]
    math.abs(est - 1500L).toDouble / 1500.0 should be < 0.1
  }

  it should "answer through the SQL surface after registration" in {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.range(20000).createOrReplaceTempView("__hll_in")
    val est = spark.sql(
      "SELECT graft_hll_count(xxhash64(id)) FROM __hll_in")
      .collect()(0).getLong(0)
    math.abs(est - 20000L).toDouble / 20000.0 should be < 0.05
  }

  it should "skip null inputs (hash guarded by isNotNull)" in {
    val df = Seq(Some(1L), None, Some(2L), None, Some(3L)).toDF("v")
    df.agg(SketchFunctions.hllCount(
        when(col("v").isNotNull, xxhash64(col("v")))))
      .collect()(0).getLong(0) shouldBe 3L
  }

  behavior of "CmsSketchAgg"

  // Zipf-ish stream: key k appears ~N/k times — a realistic frequency
  // skew with known exact counts
  private def cmsStream(parts: Int) = {
    val rows = (1L to 50L).flatMap(k => Seq.fill((500 / k).toInt)(k))
    rows.toDF("k").repartition(parts)
      .select(col("k"),
        graft.functions.HashFunctions.md5Bucket(1L, col("k")).as("h1"),
        graft.functions.HashFunctions.md5Bucket(2L, col("k")).as("h2"))
  }

  private def cmsEstimates(parts: Int, width: Int = 1024): Map[Long, Long] = {
    val sk = cmsStream(parts)
      .agg(SketchFunctions.cmsSketch(col("h1"), col("h2"), 4, width).as("sk"))
    cmsStream(1).select(col("k"), col("h1"), col("h2")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("k"),
        SketchFunctions.cmsEstimate(col("sk"), col("h1"), col("h2")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  it should "never underestimate, and be exact at a comfortable width" in {
    val exact = (1L to 50L).map(k => k -> (500 / k)).toMap
    val est = cmsEstimates(parts = 8)
    exact.foreach { case (k, n) =>
      withClue(s"key $k exact=$n est=${est(k)}: ") {
        est(k) should be >= n.toLong // overestimate-only guarantee
        // 50 distinct keys in 4x1024 counters: collisions are rare enough
        // that the estimate should be exact for almost every key
        est(k) should be <= n.toLong + 50L
      }
    }
  }

  it should "degrade to bounded overestimates when the width is squeezed" in {
    val exact = (1L to 50L).map(k => k -> (500 / k)).toMap
    val n = exact.values.sum // stream length
    val est = cmsEstimates(parts = 4, width = 16)
    // err <= eps*N with eps = e/width, here over a 4-row min — allow the
    // full single-row bound
    exact.foreach { case (k, cnt) =>
      est(k) should be >= cnt.toLong
      est(k) should be <= cnt.toLong + (math.E / 16.0 * n * 4).toLong
    }
  }

  it should "be invariant to partitioning (merge is elementwise add)" in {
    cmsEstimates(1) shouldBe cmsEstimates(32)
  }

  it should "register in SQL and agree with the DataFrame surface" in {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    cmsStream(4).createOrReplaceTempView("__cms_in")
    val viaSql = spark.sql(
      """SELECT k, graft_cms_estimate(sk, h1, h2) AS est
        |FROM (SELECT DISTINCT k, h1, h2 FROM __cms_in)
        |CROSS JOIN (SELECT graft_cms_sketch(h1, h2) AS sk FROM __cms_in)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaSql shouldBe cmsEstimates(4)
  }

  behavior of "TopKByKeyAgg"

  private def topkRows(
      rows: Seq[(String, Long, Long)], k: Int, parts: Int): Map[String, Seq[Long]] =
    rows.toDF("g", "key", "payload").repartition(parts)
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.graft.TopKFunctions
        .topKByKey(col("key"), col("payload"), k).as("picks"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  it should "keep the k smallest (key, payload) pairs per group, payload-ascending on key ties" in {
    val rows = Seq(
      ("a", 5L, 50L), ("a", 1L, 10L), ("a", 3L, 30L), ("a", 1L, 5L), ("a", 9L, 90L),
      ("b", 2L, 20L))
    val got = topkRows(rows, k = 3, parts = 2)
    got("a") shouldBe Seq(5L, 10L, 30L) // (1,5) < (1,10) < (3,30)
    got("b") shouldBe Seq(20L)          // fewer than k rows: all kept
  }

  it should "be a pure function of the input multiset (partitioning-invariant)" in {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(5000)((s"g${rnd.nextInt(7)}", rnd.nextLong(), rnd.nextLong()))
    topkRows(rows, k = 8, parts = 1) shouldBe topkRows(rows, k = 8, parts = 32)
  }

  it should "match the window row_number formulation exactly" in {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(2000)((s"g${rnd.nextInt(5)}", rnd.nextInt(50).toLong, rnd.nextLong()))
    val df = rows.toDF("g", "key", "payload")
    val viaWindow = df
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("key"), col("payload"))))
      .filter(col("rk") <= 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = topkRows(rows, k = 6, parts = 8).toSeq.flatMap { case (g, ps) =>
      ps.map(p => (g, rows.find(r => r._1 == g && r._3 == p).get._2, p))
    }.toSet
    viaAgg shouldBe viaWindow
  }

  it should "skip null keys/payloads and register in SQL" in {
    Seq((1L, Option(2L), Option(20L)), (1L, None, Option(9L)), (1L, Option(1L), None))
      .toDF("g", "key", "payload").createOrReplaceTempView("__topk_in")
    val r = spark.sql(
      "SELECT graft_topk_by_key(key, payload, 5) FROM __topk_in GROUP BY g")
      .collect()(0).getSeq[Long](0)
    r shouldBe Seq(20L)
  }
}
