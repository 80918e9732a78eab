package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftOptimizations, NativeDotRewrite}

import graft.SparkSpec

/** The HOF→native dot-product rewrite: fires on the exact public idiom,
  * preserves bits and null semantics, leaves near-misses alone. */
class OptimizerRulesSpec extends SparkSpec {
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "0D, (acc, v) -> acc + v)"

  // range-based (NOT a LocalRelation: ConvertToLocalRelation would fold
  // the whole projection into rows before the plan assertion could look
  // at it). Row 3 gets unequal lengths via the size-varying sequence.
  private lazy val df = spark.range(1, 4).select(
    col("id"),
    transform(sequence(lit(1), lit(3)),
      i => (i.cast("double") * col("id")).cast("float")).as("a"),
    transform(sequence(lit(1), when(col("id") === 3, lit(2)).otherwise(lit(3))),
      i => (i.cast("double") + col("id")).cast("float")).as("b"))

  behavior of "NativeDotRewrite"

  it should "rewrite the double-cast HOF idiom to graft_dot with identical bits" in {
    GraftOptimizations.install(spark)
    val q = df.select(col("id"), expr(hofDot).as("d"))
    q.queryExecution.optimizedPlan.toString should include("graft_dot")
    val got = q.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // driver-side replay of the ascending double fold; arrays mirror the
    // frame's construction (a = [i*id], b = [i+id], i in 1..3)
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q2)) => s + p.toDouble * q2.toDouble }
    def row(id: Long) = (
      (1 to 3).map(i => (i.toDouble * id).toFloat),
      (1 to 3).map(i => (i.toDouble + id).toFloat))
    got(1L) shouldBe Some(dot(row(1)._1, row(1)._2))
    got(2L) shouldBe Some(dot(row(2)._1, row(2)._2))
    // zip_with null-pads unequal lengths and the fold nulls out — the
    // rewrite's size guard preserves that
    got(3L) shouldBe None
  }

  it should "agree with the un-rewritten HOF on equal-length rows" in {
    // run the same expression through a plan where the rule cannot apply
    // (sub-expression differs: float multiply) as a sanity control, and
    // compare the rewritten result against V.dot directly
    GraftOptimizations.install(spark)
    val eq = df.filter(col("id") < 3L)
    val viaRule = eq.select(expr(hofDot)).as[Double].collect().toSeq
    val viaNative = eq.select(
      graft.functions.VectorFunctions.dot(col("a"), col("b"))).as[Double].collect().toSeq
    viaRule shouldBe viaNative
  }

  it should "rewrite nullable-element arrays to the NULL-SAFE kernel with HOF-identical semantics" in {
    GraftOptimizations.install(spark)
    // when(...) makes the transform lambda nullable ⇒ containsNull=true:
    // the checkless DotProductF would read a null slot as 0.0, so this
    // shape must take graft_dot_ns (null on any null element) instead —
    // this is also every parquet-read list column's shape
    val nullable = spark.range(1, 4).select(
      col("id"),
      transform(sequence(lit(1), lit(3)),
        i => when(i =!= 2 || col("id") =!= 2, (i.cast("double") * col("id")).cast("float")))
        .as("a"),
      transform(sequence(lit(1), lit(3)),
        i => (i.cast("double") + col("id")).cast("float")).as("b"))
    val q = nullable.select(col("id"), expr(hofDot).as("d"))
    q.queryExecution.optimizedPlan.toString should include("graft_dot_ns")
    val got = q.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // id=2 has a null element ⇒ the fold nulls out, and so must the kernel
    got(2L) shouldBe None
    // ids 1 and 3 have no null element ⇒ the plain ascending double fold
    def dot(id: Long) = (1 to 3).map { i =>
      (i.toDouble * id).toFloat.toDouble * (i.toDouble + id).toFloat.toDouble
    }.foldLeft(0.0)(_ + _)
    got(1L) shouldBe Some(dot(1))
    got(3L) shouldBe Some(dot(3))
  }

  it should "null the null-safe kernel on length mismatch, exactly like zip_with padding" in {
    GraftOptimizations.install(spark)
    // nullable elements + unequal lengths on row 3 (the df fixture's
    // shape but through the nullable-making when())
    val nullable = spark.range(1, 4).select(
      col("id"),
      transform(sequence(lit(1), lit(3)),
        i => when(i < 99, (i.cast("double") * col("id")).cast("float"))).as("a"),
      transform(sequence(lit(1), when(col("id") === 3, lit(2)).otherwise(lit(3))),
        i => when(i < 99, (i.cast("double") + col("id")).cast("float"))).as("b"))
    val q = nullable.select(col("id"), expr(hofDot).as("d"))
    q.queryExecution.optimizedPlan.toString should include("graft_dot_ns")
    val got = q.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    got(3L) shouldBe None
    got(1L) should not be None
  }

  it should "leave the float-multiply variant alone (different rounding)" in {
    GraftOptimizations.install(spark)
    val q = df.select(
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
    q.queryExecution.optimizedPlan.toString should not include "graft_dot"
  }

  it should "agree with the un-rewritten HOF on randomized nullable arrays (lengths, nulls, values)" in {
    // fuzz the null-safe kernel against Spark's own interpreted HOF:
    // random lengths (incl. mismatches), random null elements, random
    // magnitudes — the un-rewritten control uses a float multiply
    // sub-expression ONLY to dodge the rule, then re-casts, so its null
    // semantics are the HOF's. Bit-compare where both are non-null.
    GraftOptimizations.install(spark)
    val rnd = new scala.util.Random(97)
    val rows = (0 until 300).map { i =>
      def arr(n: Int) = Seq.fill(n)(
        if (rnd.nextInt(10) == 0) None
        else Some((rnd.nextGaussian() * math.pow(10, rnd.nextInt(6) - 3)).toFloat))
      val n = 1 + rnd.nextInt(8)
      val m = if (rnd.nextInt(4) == 0) 1 + rnd.nextInt(8) else n
      (i.toLong, arr(n), arr(m))
    }
    // through parquet: a LocalRelation would be constant-folded before
    // the plan assertion, and the parquet round-trip is exactly the
    // nullable-element shape the kernel exists for
    val dir = java.nio.file.Files.createTempDirectory("dot_fuzz").toString
    rows.toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val viaKernel = df.select(col("id"), expr(hofDot).as("d"))
    viaKernel.queryExecution.optimizedPlan.toString should include("graft_dot_ns")
    val got = viaKernel.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // driver-side reference of the HOF semantics: null-pad to the longer
    // length, null product poisons the fold
    rows.foreach { case (id, a, b) =>
      val n = math.max(a.size, b.size)
      val terms = (0 until n).map { i =>
        for {
          x <- a.lift(i).flatten
          y <- b.lift(i).flatten
        } yield x.toDouble * y.toDouble
      }
      val expected =
        if (terms.exists(_.isEmpty)) None
        else Some(terms.flatten.foldLeft(0.0)(_ + _))
      withClue(s"row $id: ") { got(id) shouldBe expected }
    }
  }

  it should "install idempotently" in {
    GraftOptimizations.install(spark)
    GraftOptimizations.install(spark)
    spark.experimental.extraOptimizations.count(_ == NativeDotRewrite) shouldBe 1
  }
}
