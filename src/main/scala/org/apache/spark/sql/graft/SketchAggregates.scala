package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** HyperLogLog distinct-count sketch as a native Catalyst aggregate
  * (Flajolet et al. 2007; the standard mergeable cardinality sketch every
  * warehouse ships — the reference's count/exists surface generalized to
  * the approximate regime a 100 TB corpus needs).
  *
  * Why a `TypedImperativeAggregate`: the sketch state is a fixed 2^p-byte
  * register array that MERGES associatively+commutatively (elementwise
  * max), so Spark runs it as a proper partial aggregate — each task folds
  * its partition into one 4 KiB buffer, the shuffle moves only the
  * buffers (never the values), and the final merge is register-max. That
  * is the exact shape a 1000-executor distinct-count needs: constant
  * memory per group, one tiny shuffle row per (group × task).
  *
  * The input is a PRE-HASHED 64-bit value — compose as
  * `graft_hll_count(xxhash64(col))`. Keeping the hash outside the
  * aggregate keeps it in whole-stage codegen (xxhash64 is a codegen'd
  * builtin) and makes the sketch hash-agnostic. Estimates are therefore
  * fully deterministic for a given input set — same answer on every run,
  * any partitioning (register-max is order-blind) — just approximate
  * (σ ≈ 1.04/√m; p=12 → ~1.6%).
  *
  * Bias handling: the classic small-range linear-counting fallback when
  * the raw estimate ≤ 2.5·m and empty registers remain; the 32-bit
  * large-range correction does not apply to the 64-bit-hash variant.
  */
case class HllCountAgg(
    child: Expression,
    precision: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  require(precision >= 4 && precision <= 18,
    s"precision must be in [4, 18], got $precision")

  private val m: Int = 1 << precision
  private val alphaMM: Double =
    (precision match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }) * m * m

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_count"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> (64 - precision)).toInt
      val w = h << precision
      // rank of the first set bit among the remaining 64-p bits, 1-based;
      // all-zero remainder gets the max rank 64-p+1
      val rho = if (w == 0L) 65 - precision
                else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > buffer(idx)) buffer(idx) = rho.toByte
    }
    buffer
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buffer(i) & 0xff
      invSum += java.lang.Math.scalb(1.0, -r) // 2^-r exactly
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alphaMM / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllCountAgg =
    copy(child = newChildren.head)
}

object SketchFunctions {
  val hllDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hll_count"),
    new ExpressionInfo(classOf[HllCountAgg].getName, "graft_hll_count"),
    (children: Seq[Expression]) => children match {
      case Seq(c) => HllCountAgg(c)
      case Seq(c, p) =>
        // foldability guard: a non-literal precision would otherwise hit
        // eval(null) and die with an opaque NPE inside analysis
        if (!p.foldable) throw new IllegalArgumentException(
          "graft_hll_count(hashedLong[, precision]): precision must be a literal")
        p.eval(null) match {
          case n: Number => HllCountAgg(c, n.intValue())
          case other => throw new IllegalArgumentException(
            s"graft_hll_count(hashedLong[, precision]): integer precision expected, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "graft_hll_count(hashedLong[, precision])")
    })

  /** DataFrame-API surface: HLL distinct count of a pre-hashed long
    * column (compose with `xxhash64`). */
  def hllCount(hashed: Column, precision: Int = 12): Column =
    ExpressionUtils.column(
      HllCountAgg(ExpressionUtils.expression(hashed), precision)
        .toAggregateExpression())
}
