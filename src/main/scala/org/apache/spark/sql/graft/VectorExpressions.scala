package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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

/** SQL-surface registration: `SELECT graft_dot(a, b)` after installing
  * via `.withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
  }
}

object GraftFunctions {
  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProductF(children(0), children(1)))

  /** Imperative registration for sessions built without extensions. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotDescriptor._1, dotDescriptor._2, dotDescriptor._3)

  /** DataFrame-API surface for the native dot product. */
  def dotColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductF(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
