package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build/probe as native Catalyst pieces — the broadcast
  * semi-join tier for membership gates (decontamination, blocklists,
  * seen-before checks). At 100 TB the exact formulation is a shuffle
  * join of the corpus's n-gram stream against the benchmark set; the
  * bloom formulation builds one ~MB filter with a partial aggregate
  * (buffers merge by bit-or, only buffers cross the wire) and probes it
  * ROW-LOCALLY on the big side — the corpus never shuffles at all. The
  * price is a bounded false-positive rate, which for a "flag if overlap
  * >= threshold" gate only ever over-flags by ~fpp.
  *
  * Mirrors Spark's own runtime-filter machinery
  * (`BloomFilterAggregate`/`BloomFilterMightContain`, which are
  * `private[sql]` and subquery-shaped) with the repo's anchors-as-data
  * convention: the built filter travels to the probe expression as a
  * reference object with digest-based structural equality, so
  * canonicalization and `semanticEquals` work (the round-5 ADVICE lesson
  * on array-carrying expressions, applied from the start).
  */
final class BloomRef(val bytes: Array[Byte]) extends Serializable {
  @transient lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  override def equals(other: Any): Boolean = other match {
    case o: BloomRef => java.util.Arrays.equals(bytes, o.bytes)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(bytes)
}

/** Aggregate: fold string values into one serialized Bloom filter.
  * Buffers are `BloomFilter`s merging by bit-or (associative,
  * commutative, idempotent → a correct partial aggregate under any
  * partitioning); the result is the serialized filter, ~`1.2·n·ln(1/fpp)
  * /ln²2` bits. */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long = 1L << 20,
    fpp: Double = 0.001,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] with ImplicitCastInputTypes {

  require(expectedItems > 0 && fpp > 0 && fpp < 1,
    s"need expectedItems > 0 and fpp in (0,1), got $expectedItems/$fpp")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

/** Probe: `string ∈ bloom` as a codegen'd scalar. The filter rides the
  * task closure as a reference object (deserialized once per executor,
  * not per row); works at top level AND inside higher-order-function
  * lambdas (interpreted `eval` path), which is how the per-document
  * overlap count uses it. */
case class BloomMightContain(child: Expression, bloom: BloomRef)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(v: Any): Any =
    bloom.filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomRef", bloom, classOf[BloomRef].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.filter().mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** DataFrame surface: aggregate strings into a serialized bloom. */
  def bloomBuild(values: Column, expectedItems: Long = 1L << 20,
      fpp: Double = 0.001): Column =
    ExpressionUtils.column(
      BloomBuildAgg(ExpressionUtils.expression(values), expectedItems, fpp)
        .toAggregateExpression())

  /** DataFrame surface: probe a driver-held serialized bloom. */
  def bloomContains(value: Column, serialized: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContain(
      ExpressionUtils.expression(value), new BloomRef(serialized)))
}
