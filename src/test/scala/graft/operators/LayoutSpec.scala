package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  behavior of "morton2"

  it should "interleave bits with x in the odd positions" in {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (3L, 3L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      Layout.morton2(col("x"), col("y"), bits = 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got((0L, 0L)) shouldBe 0L
    got((1L, 0L)) shouldBe 2L  // x bit 0 → position 1
    got((0L, 1L)) shouldBe 1L  // y bit 0 → position 0
    got((3L, 1L)) shouldBe 11L // 1011: x=11 odd positions, y=01 even
    got((3L, 3L)) shouldBe 15L
  }

  it should "match a reference interleave on random 8-bit inputs" in {
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i + 1)) |
        (((y >> i) & 1L) << (2 * i))).sum
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.morton2(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => got((x, y)) shouldBe ref(x, y) }
  }

  behavior of "zOrderLayout"

  it should "cut buckets as equal-width z ranges and reject non-power-of-two" in {
    val df = (0L until 256L).flatMap(x => Seq((x, x))).toDF("x", "y")
    val laid = Layout.zOrderLayout(df, col("x"), col("y"), bits = 8, nBuckets = 32)
      .collect()
    laid.foreach { r =>
      r.getAs[Long]("bucket") shouldBe r.getAs[Long]("zindex") / 2048L
    }
    // the diagonal walk starts in bucket 0 and ends in the last bucket,
    // never leaving the 32-bucket range
    val buckets = laid.map(_.getAs[Long]("bucket"))
    buckets.min shouldBe 0L
    buckets.max shouldBe 31L
    all(buckets) should (be >= 0L and be <= 31L)
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrderLayout(df, col("x"), col("y"), 8, nBuckets = 5)
  }

  it should "keep a 2-D box query inside a small set of buckets" in {
    val pts = for (x <- 0L until 256L by 4; y <- 0L until 256L by 4) yield (x, y)
    val laid = Layout.zOrderLayout(pts.toDF("x", "y"), col("x"), col("y"), 8, 64)
    // a 16×16 box in one corner of the 256×256 space: with z-order it
    // touches very few of the 64 buckets (perfect locality would be 1)
    val touched = laid.filter(col("zx") < 16 && col("zy") < 16)
      .select(col("bucket")).distinct().count()
    touched should be <= 4L
    // the same box under a row-major layout (x*256+y) spans 16 stripes —
    // z-order must beat that clustering by a wide margin
    touched should be < 16L
  }

  behavior of "zOrderWrite"

  it should "produce partitions covering disjoint zindex ranges" in {
    val rnd = new scala.util.Random(9)
    val pts = Seq.fill(2000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val laid = Layout.zOrderWrite(pts.toDF("x", "y"), col("x"), col("y"),
      bits = 8, nPartitions = 8)
    val ranges = laid
      .select(spark_partition_id().as("pid"), col("zindex"))
      .groupBy("pid").agg(min("zindex").as("lo"), max("zindex").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => hi1 should be <= lo2
      case _ =>
    }
  }

  behavior of "zOrderPruningReport"

  it should "prune z-order files to the query rectangle while arrival order scans everything" in {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 10000L).map(i =>
      (i, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("seq", "x", "y").repartition(8)
    val got = Layout.zOrderPruningReport(
      df, col("x"), col("y"), col("seq"), bits = 8, nFiles = 64,
      xRange = (0L, 15L), yRange = (0L, 15L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val trueMatches = rows.count { case (_, x, y) => x <= 15 && y <= 15 }
    // both layouts hold the same rows: identical match counts
    got("arrival")._4 shouldBe trueMatches
    got("zorder")._4 shouldBe trueMatches
    // the rect [0,15]^2 is z-range [0,256) — a sliver of the 65536-value
    // z-space; file widths need not align with Morton quadrant borders,
    // so allow a straddling neighbor, but the pruning must be drastic
    got("zorder")._2 should be <= 3L
    // arrival order correlates with neither dimension: every footer is
    // wide open and nothing prunes
    got("arrival")._2 shouldBe got("arrival")._1
    got("arrival")._3 shouldBe 10000L
    got("zorder")._3 should be < 1500L
  }

  behavior of "compactionPlan"

  it should "ceil-divide byte mass into files clamped to [1, n_rows]" in {
    // p1: 10 rows x 100 B = 1000 B at target 256 -> ceil = 4 files
    // p2: 3 rows x 1000 B = 3000 B -> ceil = 12, clamped to 3 rows
    // p3: 5 rows x 0 B -> 1 file holds everything
    val rows =
      Seq.fill(10)(("p1", 100L)) ++ Seq.fill(3)(("p2", 1000L)) ++
        Seq.fill(5)(("p3", 0L))
    val got = Layout.compactionPlan(
      rows.toDF("part", "sz"), Seq("part"), col("sz"), targetBytes = 256L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    got("p1") shouldBe ((10L, 1000L, 4L, 3L, 250L))
    got("p2") shouldBe ((3L, 3000L, 3L, 1L, 1000L))
    got("p3") shouldBe ((5L, 0L, 1L, 5L, 0L))
  }

  it should "be partitioning-invariant and respect exact ceil boundaries" in {
    // 256 B at target 256 is exactly 1 file; 257 B tips to 2
    val df = Seq(("a", 256L), ("b", 257L)).toDF("part", "sz")
    for (parts <- Seq(1, 8)) {
      val got = Layout.compactionPlan(
        df.repartition(parts), Seq("part"), col("sz"), 256L)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      got shouldBe Map("a" -> 1L, "b" -> 1L) // 2 clamps to n_rows = 1
    }
    val wide = Seq(("b", 200L), ("b", 57L)).toDF("part", "sz")
    Layout.compactionPlan(wide, Seq("part"), col("sz"), 256L)
      .collect().head.getLong(3) shouldBe 2L
  }
}
