package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * first step of corpus text canonicalization (composed accents collapse
  * to single codepoints so visually-identical strings hash/dedup
  * identically). Spark has no built-in normalizer; a Scala UDF would
  * break whole-stage codegen around it, while this stays inline (the
  * generated code is a single static call, value-independent).
  *
  * The common case is pure-ASCII text, which is NFC by construction:
  * [[NfcHelper.nfc]] short-circuits on `Normalizer.isNormalized` (a scan,
  * no allocation) so the hot path never copies. Semantics match any
  * correct Unicode NFC implementation (e.g. DuckDB's `nfc_normalize`),
  * which is what lets the oracle replay it. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcHelper.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcHelper.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcHelper {
  /** NFC-normalize, returning the input object untouched when already
    * normalized (ASCII and most real text). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object TextExpressionFunctions {
  val nfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (children: Seq[Expression]) => NfcNormalize(children.head))

  /** DataFrame-API surface. */
  def nfcColumn(s: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(s)))
}
