package graft.functions

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.GraftFunctions

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(0.5f, -1f), Seq(2f, 2f))
  ).toDF("a", "b")

  "DotProductF" should "match the interpreted HOF formulation bit-for-bit" in {
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotHof(col("a"), col("b")).as("slow")).collect()
    r.foreach(row => row.getDouble(0) shouldBe row.getDouble(1))
    r(0).getDouble(0) shouldBe 32.0
    r(1).getDouble(0) shouldBe -1.0
  }

  it should "be null-safe and handle empty arrays" in {
    val d = Seq(
      (Some(Seq(1f)), Option.empty[Seq[Float]]),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float]))
    ).toDF("a", "b")
    val r = d.select(VectorFunctions.dot(col("a"), col("b")).as("d")).collect()
    r(0).isNullAt(0) shouldBe true
    r(1).getDouble(0) shouldBe 0.0
  }

  it should "register as a SQL function via GraftFunctions/extensions" in {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("vecs")
    spark.sql("SELECT graft_dot(a, b) AS d FROM vecs")
      .as[Double].collect().toSet shouldBe Set(32.0, -1.0)
    Seq((Seq(2, 3), Seq(4, 5))).toDF("ia", "ib").createOrReplaceTempView("ivecs")
    spark.sql("SELECT graft_dot_int(ia, ib) AS d FROM ivecs")
      .as[Long].collect().toSeq shouldBe Seq(23L)
  }

  it should "appear inside a whole-stage codegen span" in {
    // a parquet scan, not a local relation — ConvertToLocalRelation would
    // otherwise evaluate the projection before any codegen stage exists
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = e.select(VectorFunctions.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    plan should include("*(1) Project [graft_dot")
  }

  "DotProductI" should "compute exact integer dots in long" in {
    val d = Seq(
      (Seq(127, -127, 3), Seq(127, 127, 2)),
      (Seq.empty[Int], Seq.empty[Int])
    ).toDF("a", "b")
    val r = d.select(VectorFunctions.dotInt(col("a"), col("b")).as("d"))
      .as[Long].collect()
    r(0) shouldBe (127L * 127 - 127L * 127 + 6)
    r(1) shouldBe 0L
  }

  it should "agree between codegen and interpreted eval" in {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val lit = Literal.create(new GenericArrayData(Array(5, -3, 7)),
      ArrayType(IntegerType))
    val expr = org.apache.spark.sql.graft.DotProductI(lit, lit)
    expr.eval(null) shouldBe (25L + 9 + 49) // interpreted path
  }

  "NearestCellF" should "assign argmax-cosine cells with ties to the smallest aid" in {
    val anchors = Seq(
      (0L, Seq(1f, 0f)),   // +x
      (1L, Seq(0f, 1f)),   // +y
      (2L, Seq(-1f, 0f)))  // -x
    val d = Seq(
      (10L, Seq(3f, 0.1f)),   // near +x -> 0
      (11L, Seq(-2f, 0.2f)),  // near -x -> 2
      (12L, Seq(0.1f, 5f)),   // near +y -> 1
      (13L, Seq(1f, 1f))      // exact tie between 0 and 1 -> smallest aid 0
    ).toDF("id", "v")
    val cells = d.select(col("id"),
      graft.operators.Similarity.cellOf(anchors, col("v")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cells shouldBe Map(10L -> 0L, 11L -> 2L, 12L -> 1L, 13L -> 0L)
  }

  "NearestCellsF" should "return nprobe cells best-first, first equal to cellOf" in {
    val anchors = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(-1f, 0f)))
    val d = Seq(
      (10L, Seq(3f, 1f)),    // closest +x, then +y
      (11L, Seq(-1f, 4f))    // closest +y, then -x
    ).toDF("id", "v")
    val r = d.select(col("id"),
      graft.operators.Similarity.cellsOf(anchors, col("v"), 2).as("cells"),
      graft.operators.Similarity.cellOf(anchors, col("v")).as("cell"))
      .collect().map(x => x.getLong(0) -> (x.getSeq[Long](1), x.getLong(2))).toMap
    r(10L) shouldBe (Seq(0L, 1L), 0L)
    r(11L) shouldBe (Seq(1L, 2L), 1L)
    // nprobe past the anchor count is clamped
    d.select(graft.operators.Similarity.cellsOf(anchors, col("v"), 99).as("c"))
      .collect().foreach(_.getSeq[Long](0).size shouldBe 3)
  }

  it should "generate value-independent codegen source across anchor sets" in {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // the whole point of anchors-as-data: two DIFFERENT anchor sets must
    // produce byte-identical generated source (one Janino compile serves
    // every Lloyd round), with values reaching the code via references
    def sourceFor(seed: Float): String = {
      val ctx = new CodegenContext
      val e = org.apache.spark.sql.graft.NearestCellF(
        BoundReference(0, ArrayType(FloatType), nullable = false),
        Seq(0L, 1L), Seq(Seq(seed, 1f), Seq(2f, seed)),
        Seq(1.0, 2.0))
      val code = e.genCode(ctx)
      code.code.toString
    }
    sourceFor(1.5f) shouldBe sourceFor(-42f)
  }

  it should "compare structurally (semanticEquals) across separately-built instances" in {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // anchors carried as Seq, not Array: two independently-constructed but
    // value-identical expressions must be equal, or canonicalization /
    // subexpression reuse silently never fires
    def mk = org.apache.spark.sql.graft.NearestCellF(
      BoundReference(0, ArrayType(FloatType), nullable = false),
      Seq(0L, 1L), Seq(Seq(1f, 2f), Seq(3f, 4f)), Seq(1.0, 2.0))
    mk shouldBe mk
    assert(mk.semanticEquals(mk))
    def mks = org.apache.spark.sql.graft.NearestCellsF(
      BoundReference(0, ArrayType(FloatType), nullable = false),
      Seq(0L, 1L), Seq(Seq(1f, 2f), Seq(3f, 4f)), Seq(1.0, 2.0), 2)
    mks shouldBe mks
    assert(mks.semanticEquals(mks))
  }

  "graft_nfc / normalizeText" should "compose combining marks and canonicalize whitespace" in {
    import graft.functions.TextFunctions
    val eAcuteDecomposed = "e\u0301" // e + COMBINING ACUTE
    val eAcuteComposed = "\u00e9"
    val docs = Seq(
      (1L, s"Caf$eAcuteDecomposed  du\tMonde "),
      (2L, s"Caf$eAcuteComposed du monde"),
      (3L, "plain ascii text")
    ).toDF("id", "t")
    val r = docs.select(col("id"), TextFunctions.normalizeText(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    r(1L) shouldBe s"caf$eAcuteComposed du monde"
    r(1L) shouldBe r(2L)
    r(3L) shouldBe "plain ascii text"
    // SQL surface registered alongside the dot products
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.sql(s"SELECT graft_nfc('$eAcuteDecomposed') AS x")
      .as[String].collect().head shouldBe eAcuteComposed
  }

  it should "skip the copy when the input is already NFC" in {
    import org.apache.spark.sql.graft.NfcHelper
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString("A\u030a b e\u0301") // A-ring, e-acute decomposed
    NfcHelper.nfc(decomposed).toString shouldBe "\u00c5 b \u00e9"
    // already-NFC input comes back as the SAME object (no copy on the hot path)
    val ascii = UTF8String.fromString("just ascii")
    NfcHelper.nfc(ascii) should be theSameInstanceAs ascii
  }

  "cosine" should "compute the normalized similarity" in {
    val r = Seq((Seq(1f, 0f), Seq(1f, 0f)), (Seq(1f, 0f), Seq(0f, 1f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[Double].collect()
    r(0) shouldBe 1.0
    r(1) shouldBe 0.0
  }

  "quantize" should "map to int8 range symmetrically and round-trip within one step" in {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f, 2.0f)),
      (2L, Seq(0f, 0f, 0f, 0f)) // zero vector: scale 0, all-zero qvec
    ).toDF("vec_id", "v")
      .withColumn("scale", VectorFunctions.quantScale(col("v")))
      .withColumn("q", VectorFunctions.quantize(col("v"), col("scale")))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getDouble(2), r.getSeq[Int](3))).toMap
    rows(1L)._1 shouldBe (2.0 / 127.0) +- 1e-12
    rows(1L)._2 shouldBe Seq(64, -127, 32, 127) // floor(x/s + 0.5)
    rows(2L)._1 shouldBe 0.0
    rows(2L)._2 shouldBe Seq(0, 0, 0, 0)
    // dequantize restores within one quantization step
    val back = df.select(col("vec_id"),
      VectorFunctions.dequantize(col("q"), col("scale")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    back(1L).zip(Seq(1.0, -2.0, 0.5, 2.0)).foreach { case (a, e) =>
      math.abs(a - e) should be <= (2.0 / 127.0)
    }
  }
}
