package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, SQLOrderingUtil}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the dense-vector dot product over
  * `array<float>` columns.
  *
  * Why an Expression and not `zip_with`+`aggregate`: Spark's higher-order
  * functions are interpreted (no codegen), allocate a lambda frame per
  * element, and re-box every float. For the ANN/near-dup operators the dot
  * product IS the hot loop — at 100 TB it runs trillions of times. This
  * expression participates in whole-stage codegen via [[doGenCode]]: the
  * generated Java is a tight primitive loop over the unsafe array data,
  * and the fold order (ascending index, double accumulator) is identical
  * to the `zip_with` formulation and the DuckDB oracle replay, so results
  * stay bit-for-bit equal.
  *
  * Lives in the `org.apache.spark.sql` namespace because the expression
  * SPI (`AbstractDataType`, `ExpressionUtils`) is `private[sql]` — the
  * standard packaging for third-party native expressions.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** [[DotProductF]] with the exact null semantics of the HOF idiom
  * `aggregate(zip_with(l, r, (x,y) -> double(x)*double(y)), 0D, +)` over
  * NULLABLE-element arrays: NULL when the lengths differ (zip_with pads
  * the shorter side with null, the product nulls, the fold sticks at
  * null) or when ANY element is null, else the ascending-index double
  * fold. This is the rewrite target for user SQL over PARQUET-read
  * vector columns — parquet list elements are nullable in the schema
  * even when no null was ever written, so [[NativeDotRewrite]] would
  * otherwise never fire on real tables (the plain [[DotProductF]] reads
  * a null slot as 0.0 and would change results). The null checks ride
  * inside the same codegen'd loop; one branch per element against the
  * interpreted HOF's per-element lambda invocation. */
case class DotProductNullSafe(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_ns"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductNullSafe =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over `array<int>` columns (the int8-quantized
  * ANN scoring hot loop — after [[graft.functions.VectorFunctions.quantize]]
  * shrinks embeddings 4×, candidate scoring runs on these). Long
  * accumulator: products of int8-range values can't overflow it at any
  * realistic dimension, and exact integer results make the score
  * oracle-replayable bit-for-bit (no FP fold-order concerns at all). */
case class DotProductI(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_int"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI =
    copy(left = newLeft, right = newRight)
}

/** Nearest-anchor (IVF cell) assignment over an `array<float>` vector
  * column, with the anchor set carried as PLAIN DATA on the expression
  * (not as child literals).
  *
  * Why not `least(struct(-cosine(vec, lit(anchor)), lit(aid)), …)`: that
  * formulation contains `sqrt(graft_dot(lit, lit))` sub-expressions which
  * ConstantFolding collapses into bare double literals INLINED into the
  * generated Java source. Different anchor values ⇒ different source ⇒ a
  * fresh Janino compile for every anchor set — in k-means refinement
  * (each Lloyd round produces new anchors) every round recompiled its
  * assignment stage, ~2 s/round of pure compilation at any data size.
  * Here the anchors live in the codegen `references` array, the generated
  * source is value-independent, and ONE compiled class serves every round
  * and every anchor set.
  *
  * Semantics are bit-identical to the folded formulation (and to the
  * DuckDB oracle replay): cosᵢ = dot(v,aᵢ) / (‖v‖·‖aᵢ‖) with the same
  * ascending-index double fold for dots, driver-precomputed ‖aᵢ‖ equal to
  * what ConstantFolding produced (`Math.sqrt` of the self-dot), argmin of
  * (-cosᵢ, aidᵢ) under Spark's double ordering
  * ([[org.apache.spark.sql.catalyst.util.SQLOrderingUtil]], the same
  * comparator struct-`least` uses) with ties to the smallest anchor id.
  * `aids`/`anchors`/`norms` must be parallel arrays sorted by aid.
  */
case class NearestCellF(
    child: Expression,
    aids: Seq[Long],
    anchors: Seq[Seq[Float]],
    norms: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {

  require(aids.nonEmpty && aids.length == anchors.length &&
    aids.length == norms.length, "aids/anchors/norms must be parallel and non-empty")

  // Seq fields give case-class equals structural semantics (Array fields
  // compare by reference identity, silently defeating semanticEquals /
  // canonicalization / subexpression reuse); eval and codegen still run
  // over primitive arrays via these transient caches.
  @transient private lazy val aidsArr: Array[Long] = aids.toArray
  @transient private lazy val anchorsArr: Array[Array[Float]] = anchors.map(_.toArray).toArray
  @transient private lazy val normsArr: Array[Double] = norms.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_cell"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var nv = 0.0
    var j = 0
    while (j < n) {
      nv += v.getFloat(j).toDouble * v.getFloat(j).toDouble
      j += 1
    }
    nv = java.lang.Math.sqrt(nv)
    var bestNeg = 0.0
    var bestId = 0L
    var i = 0
    while (i < anchorsArr.length) {
      val anchor = anchorsArr(i)
      val m = math.min(n, anchor.length)
      var d = 0.0
      j = 0
      while (j < m) {
        d += v.getFloat(j).toDouble * anchor(j).toDouble
        j += 1
      }
      val neg = -(d / (nv * normsArr(i)))
      if (i == 0 || SQLOrderingUtil.compareDoubles(neg, bestNeg) < 0) {
        bestNeg = neg
        bestId = aidsArr(i)
      }
      i += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aidsRef = ctx.addReferenceObj("aids", aidsArr, "long[]")
      val anchRef = ctx.addReferenceObj("anchors", anchorsArr, "float[][]")
      val normRef = ctx.addReferenceObj("norms", normsArr, "double[]")
      val n = ctx.freshName("n")
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val neg = ctx.freshName("neg")
      val bestNeg = ctx.freshName("bestNeg")
      val anchor = ctx.freshName("anchor")
      s"""
         |int $n = $a.numElements();
         |double $nv = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  $nv += (double) $a.getFloat($j) * (double) $a.getFloat($j);
         |}
         |$nv = java.lang.Math.sqrt($nv);
         |double $bestNeg = 0.0;
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $anchRef.length; $i++) {
         |  float[] $anchor = $anchRef[$i];
         |  int $m = java.lang.Math.min($n, $anchor.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $d += (double) $a.getFloat($j) * (double) $anchor[$j];
         |  }
         |  double $neg = -($d / ($nv * $normRef[$i]));
         |  if ($i == 0 ||
         |      org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($neg, $bestNeg) < 0) {
         |    $bestNeg = $neg;
         |    ${ev.value} = $aidsRef[$i];
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellF =
    copy(child = newChild)
}

/** [[NearestCellF]]'s L2 sibling: nearest anchor by SQUARED Euclidean
  * distance over a SLICE of the input vector — the per-subspace code
  * assignment of product quantization (PQ splits a d-dim vector into m
  * contiguous sub-vectors and quantizes each against its own codebook;
  * slicing inside the expression means the plan never materializes m
  * slice arrays per row). Same anchors-as-data design (codegen source is
  * value-independent; one compiled class serves every codebook), argmin
  * with ties to the smallest anchor id, `SQLOrderingUtil` double order.
  * `offset` is 0-based; elements past the vector's length are treated as
  * absent (distance contribution of the anchor element alone). */
case class NearestCellL2F(
    child: Expression,
    aids: Seq[Long],
    anchors: Seq[Seq[Float]],
    offset: Int,
    width: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(aids.nonEmpty && aids.length == anchors.length &&
    offset >= 0 && width > 0,
    "aids/anchors must be parallel and non-empty; offset >= 0; width > 0")

  @transient private lazy val aidsArr: Array[Long] = aids.toArray
  @transient private lazy val anchorsArr: Array[Array[Float]] = anchors.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_cell_l2"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bestD = 0.0
    var bestId = 0L
    var i = 0
    while (i < anchorsArr.length) {
      val anchor = anchorsArr(i)
      var d = 0.0
      var j = 0
      while (j < width && j < anchor.length) {
        val x = if (offset + j < n) v.getFloat(offset + j).toDouble else 0.0
        val diff = x - anchor(j).toDouble
        d += diff * diff
        j += 1
      }
      if (i == 0 || SQLOrderingUtil.compareDoubles(d, bestD) < 0) {
        bestD = d
        bestId = aidsArr(i)
      }
      i += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aidsRef = ctx.addReferenceObj("aids", aidsArr, "long[]")
      val anchRef = ctx.addReferenceObj("anchors", anchorsArr, "float[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val anchor = ctx.freshName("anchor")
      s"""
         |int $n = $a.numElements();
         |double $bestD = 0.0;
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $anchRef.length; $i++) {
         |  float[] $anchor = $anchRef[$i];
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $width && $j < $anchor.length; $j++) {
         |    double $x = ($offset + $j < $n) ? (double) $a.getFloat($offset + $j) : 0.0;
         |    double $diff = $x - (double) $anchor[$j];
         |    $d += $diff * $diff;
         |  }
         |  if ($i == 0 ||
         |      org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($d, $bestD) < 0) {
         |    $bestD = $d;
         |    ${ev.value} = $aidsRef[$i];
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellL2F =
    copy(child = newChild)
}

/** [[NearestCellL2F]]'s DISTANCE sibling: the minimum squared-L2 itself
  * instead of the argmin anchor id — the per-row quantization-error term
  * behind a distributed distortion audit (mean over the corpus of
  * Σ-over-subspaces of this value is exactly the Lloyd objective
  * [[graft.operators.Similarity.pqTrainKmeans]] minimizes, computed in
  * ONE codegen'd corpus pass instead of a driver collect). Same slice
  * semantics, same anchors-as-references design, same
  * `SQLOrderingUtil` double order as the argmin twin — the two
  * expressions MUST pick the same cell for the distortion to be the
  * assignment's cost. */
case class NearestCellL2DistF(
    child: Expression,
    aids: Seq[Long],
    anchors: Seq[Seq[Float]],
    offset: Int,
    width: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(aids.nonEmpty && aids.length == anchors.length &&
    offset >= 0 && width > 0,
    "aids/anchors must be parallel and non-empty; offset >= 0; width > 0")

  @transient private lazy val anchorsArr: Array[Array[Float]] = anchors.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_nearest_cell_l2_dist"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bestD = 0.0
    var i = 0
    while (i < anchorsArr.length) {
      val anchor = anchorsArr(i)
      var d = 0.0
      var j = 0
      while (j < width && j < anchor.length) {
        val x = if (offset + j < n) v.getFloat(offset + j).toDouble else 0.0
        val diff = x - anchor(j).toDouble
        d += diff * diff
        j += 1
      }
      if (i == 0 || SQLOrderingUtil.compareDoubles(d, bestD) < 0) bestD = d
      i += 1
    }
    bestD
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val anchRef = ctx.addReferenceObj("anchors", anchorsArr, "float[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val anchor = ctx.freshName("anchor")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $anchRef.length; $i++) {
         |  float[] $anchor = $anchRef[$i];
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $width && $j < $anchor.length; $j++) {
         |    double $x = ($offset + $j < $n) ? (double) $a.getFloat($offset + $j) : 0.0;
         |    double $diff = $x - (double) $anchor[$j];
         |    $d += $diff * $diff;
         |  }
         |  if ($i == 0 ||
         |      org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($d, ${ev.value}) < 0) {
         |    ${ev.value} = $d;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellL2DistF =
    copy(child = newChild)
}

/** The `nprobe` nearest anchors, best-first — [[NearestCellF]]'s
  * multi-cell sibling for the QUERY side of an IVF probe. Deliberately
  * `CodegenFallback`: it runs only over the broadcast query frame (a
  * handful of rows by the IVF contract), where interpreted eval costs
  * nothing and skipping codegen means zero compile cost per anchor set —
  * the corpus-side hot path stays [[NearestCellF]]. Ordering is the same
  * (-cos, aid) comparator, so cell 1 of `nprobe` cells always equals
  * [[NearestCellF]]'s assignment. */
case class NearestCellsF(
    child: Expression,
    aids: Seq[Long],
    anchors: Seq[Seq[Float]],
    norms: Seq[Double],
    nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(aids.nonEmpty && aids.length == anchors.length &&
    aids.length == norms.length && nprobe >= 1,
    "aids/anchors/norms must be parallel and non-empty, nprobe >= 1")

  // Seq fields for structural case-class equality (see [[NearestCellF]]);
  // interpreted eval runs over these primitive caches.
  @transient private lazy val aidsArr: Array[Long] = aids.toArray
  @transient private lazy val anchorsArr: Array[Array[Float]] = anchors.map(_.toArray).toArray
  @transient private lazy val normsArr: Array[Double] = norms.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var nv = 0.0
    var j = 0
    while (j < n) {
      nv += v.getFloat(j).toDouble * v.getFloat(j).toDouble
      j += 1
    }
    nv = java.lang.Math.sqrt(nv)
    val scored = Array.tabulate(anchorsArr.length) { i =>
      val anchor = anchorsArr(i)
      val m = math.min(n, anchor.length)
      var d = 0.0
      var k = 0
      while (k < m) {
        d += v.getFloat(k).toDouble * anchor(k).toDouble
        k += 1
      }
      (-(d / (nv * normsArr(i))), aidsArr(i))
    }
    val best = scored.sortWith { (x, y) =>
      val c = SQLOrderingUtil.compareDoubles(x._1, y._1)
      c < 0 || (c == 0 && x._2 < y._2)
    }.take(math.min(nprobe, aidsArr.length)).map(_._2)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(best)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsF =
    copy(child = newChild)
}

/** SQL-surface registration: `SELECT graft_dot(a, b)` after installing
  * via `.withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
    ext.injectFunction(GraftFunctions.dotIntDescriptor)
    ext.injectFunction(TextExpressionFunctions.nfcDescriptor)
    ext.injectFunction(SketchFunctions.hllDescriptor)
    ext.injectFunction(SketchFunctions.cmsDescriptor)
    ext.injectFunction(SketchFunctions.cmsEstimateDescriptor)
    ext.injectFunction(FrequencyFunctions.mgDescriptor)
    ext.injectFunction(FrequencyFunctions.kmvDescriptor)
    ext.injectFunction(TopKFunctions.topKDescriptor)
    ext.injectOptimizerRule(_ => NativeDotRewrite)
  }
}

object GraftFunctions {
  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProductF(children(0), children(1)))

  val dotIntDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot_int"),
    new ExpressionInfo(classOf[DotProductI].getName, "graft_dot_int"),
    (children: Seq[Expression]) => DotProductI(children(0), children(1)))

  /** Imperative registration for sessions built without extensions.
    * (NearestCellF/NearestCellsF carry driver-side anchor arrays and have
    * no SQL-literal surface — DataFrame builders below only.) */
  def register(spark: SparkSession): Unit =
    Seq(dotDescriptor, dotIntDescriptor, TextExpressionFunctions.nfcDescriptor,
      SketchFunctions.hllDescriptor,
      SketchFunctions.cmsDescriptor, SketchFunctions.cmsEstimateDescriptor,
      FrequencyFunctions.mgDescriptor, FrequencyFunctions.kmvDescriptor,
      TopKFunctions.topKDescriptor)
      .foreach { d =>
        spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
      }

  /** DataFrame-API surface for the native dot product. */
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductF(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** DataFrame-API surface for the exact integer dot product. */
  def dotIntColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductI(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** DataFrame-API surface for nearest-cell assignment; parallel arrays
    * sorted by aid, `norms(i)` = ‖anchors(i)‖₂ in double. */
  def nearestCellColumn(vec: Column, aids: Array[Long],
      anchors: Array[Array[Float]], norms: Array[Double]): Column =
    ExpressionUtils.column(NearestCellF(
      ExpressionUtils.expression(vec),
      aids.toSeq, anchors.map(_.toSeq).toSeq, norms.toSeq))

  /** DataFrame-API surface for per-subspace PQ code assignment: argmin
    * squared-L2 over `anchors` against the vector slice
    * [offset, offset+width). Anchor VALUES ride as codegen references
    * (one compiled class per (offset, width) slice shape, reused across
    * every codebook — k-means refinement never recompiles). */
  def nearestCellL2Column(vec: Column, aids: Array[Long],
      anchors: Array[Array[Float]], offset: Int, width: Int): Column =
    ExpressionUtils.column(NearestCellL2F(
      ExpressionUtils.expression(vec),
      aids.toSeq, anchors.map(_.toSeq).toSeq, offset, width))

  /** DataFrame-API surface for the minimum squared-L2 itself (the
    * quantization-error term of the slice) — [[nearestCellL2Column]]'s
    * distance twin for distributed distortion audits. */
  def nearestCellL2DistColumn(vec: Column, aids: Array[Long],
      anchors: Array[Array[Float]], offset: Int, width: Int): Column =
    ExpressionUtils.column(NearestCellL2DistF(
      ExpressionUtils.expression(vec),
      aids.toSeq, anchors.map(_.toSeq).toSeq, offset, width))

  /** DataFrame-API surface for the nprobe-nearest-cells (query-side) variant. */
  def nearestCellsColumn(vec: Column, aids: Array[Long],
      anchors: Array[Array[Float]], norms: Array[Double], nprobe: Int): Column =
    ExpressionUtils.column(NearestCellsF(
      ExpressionUtils.expression(vec),
      aids.toSeq, anchors.map(_.toSeq).toSeq, norms.toSeq, nprobe))
}
