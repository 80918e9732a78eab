package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, EqualTo, Expression, If, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Size, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the public higher-order-function dot-product
  * idiom over `array<float>` columns,
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               0D, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd native [[DotProductF]]. Spark's HOFs are
  * interpreted — a lambda frame per element, every float re-boxed — while
  * the native expression is a tight primitive loop inside whole-stage
  * codegen; in the ANN operators that difference was measured at 123×
  * for the winnowing kernel and motivates every native expression in
  * this package. The rule closes the remaining gap for USER-written
  * queries: declare the dot product with public Spark SQL, get the
  * native kernel.
  *
  * Strictly semantics-preserving, which is why the match is narrow:
  *  - both sides must be `array<float>` (DotProductF's input type) and
  *    deterministic (the rewrite references them twice);
  *  - the element product must be computed IN DOUBLE (the two casts) —
  *    a float-typed multiply rounds differently and is left alone;
  *  - zero must be literal 0.0 and the merge a bare `acc + v`, so the
  *    fold is the same ascending-index double sum the native loop runs —
  *    results are bit-for-bit identical;
  *  - `zip_with` null-pads when lengths differ, which nulls the whole
  *    fold; the rewrite preserves that with a `size(a) = size(b)` guard
  *    (DotProductF alone truncates to the shorter side instead);
  *  - arrays with NULLABLE elements (every parquet-read list column,
  *    whatever was actually written) rewrite to [[DotProductNullSafe]]
  *    instead, whose codegen'd loop reproduces the HOF's null semantics
  *    exactly (null on any null element or length mismatch) — plain
  *    [[DotProductF]] would read a null slot as 0.0, so it is reserved
  *    for provably non-nullable elements where its checkless loop is
  *    bit-identical anyway.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def nonNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  private object DoubleOf {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(DoubleOf(x), DoubleOf(y), _),
              Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
          Literal(zero: Double, DoubleType),
          LambdaFunction(Add(a1: NamedLambdaVariable, a2: NamedLambdaVariable, _),
            Seq(m1: NamedLambdaVariable, m2: NamedLambdaVariable), _),
          finish)
        // raw-bits +0.0 only: -0.0 == 0.0 under pattern equality, but an
        // empty-array fold seeded with -0.0 returns -0.0 while the native
        // loop returns +0.0 — a bit-level divergence this codebase's
        // hash-exact contract cannot absorb
        if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
          isFloatArray(l) && isFloatArray(r) &&
          l.deterministic && r.deterministic &&
          x.exprId == xv.exprId && y.exprId == yv.exprId &&
          ((a1.exprId == m1.exprId && a2.exprId == m2.exprId) ||
            (a1.exprId == m2.exprId && a2.exprId == m1.exprId)) &&
          isIdentity(finish) =>
      if (nonNullElements(l) && nonNullElements(r)) {
        If(EqualTo(Size(l), Size(r)), DotProductF(l, r),
          Literal(null, DoubleType))
      } else {
        DotProductNullSafe(l, r)
      }
  }
}

object GraftOptimizations {
  /** Install the rewrite into an EXISTING session (the extension path is
    * [[GraftExtensions]] at session build). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(NativeDotRewrite)) {
      spark.experimental.extraOptimizations = cur :+ NativeDotRewrite
    }
  }
}
