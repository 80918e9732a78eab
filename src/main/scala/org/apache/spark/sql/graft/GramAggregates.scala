package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Exact second-moment (Gram) accumulation over int8-quantized embedding
  * codes as ONE native mergeable aggregate: the buffer is a fixed
  * `1 + d + d(d+1)/2` long array holding the row count, the per-dimension
  * code sums Σqᵢ, and the upper-triangle co-moments Σqᵢqⱼ (i ≤ j) — every
  * entry an EXACT integer, so the merged result is a pure function of the
  * input multiset (partitioning-invariant, bit-replayable in SQL) and the
  * d×d covariance matrix derives from it with one IEEE expression per
  * cell. This is the one-pass/fixed-state shape covariance needs at
  * 100 TB: each task folds its partition into a ~17 KB buffer (d = 64),
  * the shuffle moves one buffer per task, and NOTHING explodes to
  * (row × d²) intermediate rows — versus the declarative formulation
  * (posexplode + self-join on the row id), whose shuffle is n·d rows
  * joined against itself.
  *
  * Update cost is d(d+1)/2 integer multiply-adds per row — the same
  * arithmetic any covariance pass pays, kept in primitive longs. A
  * d = 64 code never overflows: |q| ≤ 127 ⇒ |Σqᵢqⱼ| ≤ 1.6e4 per row,
  * ~5.7e14 rows to reach 2⁶³ — beyond any corpus this library meets.
  *
  * Rows with a NULL array or any NULL element are skipped (quantized
  * codes are never null; gate upstream). Arrays shorter/longer than `d`
  * throw — a silent skip would ship a wrong covariance.
  */
case class GramMatrixAgg(
    child: Expression,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  require(d >= 1 && d <= 512, s"dimension out of range: $d")

  private val triLen = d * (d + 1) / 2
  private val bufLen = 1 + d + triLen

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_matrix"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != d) throw new IllegalArgumentException(
      s"graft_gram_matrix: expected $d-dim code array, got $n elements")
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return buf; i += 1 }
    val q = new Array[Long](d)
    i = 0
    while (i < d) { q(i) = arr.getInt(i).toLong; i += 1 }
    buf(0) += 1L
    i = 0
    var t = 1 + d
    while (i < d) {
      buf(1 + i) += q(i)
      val qi = q(i)
      var j = i
      while (j < d) {
        buf(t) += qi * q(j)
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bufLen)
    var i = 0
    while (i < bufLen) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrixAgg =
    copy(child = newChildren.head)
}

object GramFunctions {
  /** Buffer layout of [[GramMatrixAgg]]'s output array (0-based): slot 0
    * is the row count, slots 1..d the code sums, then the upper triangle
    * row-major — (i, j ≥ i) at `1 + d + triIndex(i, j, d)`. */
  def triIndex(i: Int, j: Int, d: Int): Int = {
    require(0 <= i && i <= j && j < d, s"bad triangle index ($i, $j) for d=$d")
    i * d - i * (i - 1) / 2 + (j - i)
  }

  /** DataFrame-API surface: the flat (count, sums, upper-triangle gram)
    * long array over a d-dim `array<int>` code column. */
  def gramMatrix(codes: Column, d: Int): Column =
    ExpressionUtils.column(
      GramMatrixAgg(ExpressionUtils.expression(codes), d).toAggregateExpression())
}
