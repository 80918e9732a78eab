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

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a native mergeable
  * aggregate: `depth` hash rows × `width` counters, update = +1 in one
  * counter per row, merge = elementwise add — associative+commutative, so
  * Spark runs it as a proper partial aggregate and the shuffle moves only
  * the depth×width counter block (32 KiB at the 4×1024 default), never
  * the stream. Point queries ([[CmsEstimateF]]) return min over rows:
  * an OVERESTIMATE-ONLY guarantee (err ≤ εN with ε ≈ e/width at the
  * standard depth ≈ ln 1/δ). The frequency-estimation complement of
  * [[HllCountAgg]] (cardinality) and Misra-Gries (candidates): MG tells
  * you WHICH keys might be heavy, CMS estimates ANY key's count without
  * a second exact pass.
  *
  * Inputs are TWO pre-hashed longs (Kirsch–Mitzenmacher double hashing:
  * row i probes (h1 + i·h2) mod width). Keeping the hashes outside the
  * aggregate makes the sketch hash-agnostic; with the md5Bucket hash
  * pair the whole structure is a deterministic function of the input
  * multiset — same bytes on any partitioning — and replays in plain SQL. */
case class CmsSketchAgg(
    h1: Expression,
    h2: Expression,
    depth: Int = 4,
    width: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 16 && width <= (1 << 22), s"width out of range: $width")

  override def children: Seq[Expression] = Seq(h1, h2)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = h1.eval(input)
    val v2 = h2.eval(input)
    if (v1 != null && v2 != null) {
      val a = v1.asInstanceOf[Long]
      val b = v2.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val idx = java.lang.Math.floorMod(a + i.toLong * b, width.toLong).toInt
        buffer(i * width + idx) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  /** Wire/eval format: [depth:int][width:int][counters:long×(d·w)],
    * big-endian — the layout [[CmsEstimateF]] reads, so the sketch can be
    * persisted and probed later like any other index artifact. */
  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buffer.length)
    bb.putInt(depth).putInt(width)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt(); val w = bb.getInt()
    require(d == depth && w == width,
      s"sketch shape mismatch: got ${d}x$w, expected ${depth}x$width")
    Array.fill(d * w)(bb.getLong())
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

/** Point-estimate a key's count from a [[CmsSketchAgg]] sketch: min over
  * the depth rows of the probed counters. `CodegenFallback` on purpose —
  * it runs over candidate rows (bounded by construction), not the stream. */
case class CmsEstimateF(sketch: Expression, h1: Expression, h2: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def first: Expression = sketch
  override def second: Expression = h1
  override def third: Expression = h2
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override protected def nullSafeEval(sk: Any, a: Any, b: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(sk.asInstanceOf[Array[Byte]])
    val depth = bb.getInt(); val width = bb.getInt()
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val idx = java.lang.Math.floorMod(x + i.toLong * y, width.toLong).toInt
      val c = bb.getLong(8 + 8 * (i * width + idx))
      if (c < best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CmsEstimateF =
    copy(sketch = newFirst, h1 = newSecond, h2 = newThird)
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

  val cmsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cms_sketch"),
    new ExpressionInfo(classOf[CmsSketchAgg].getName, "graft_cms_sketch"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => CmsSketchAgg(a, b)
      case Seq(a, b, d, w) if d.foldable && w.foldable =>
        (d.eval(null), w.eval(null)) match {
          case (dn: Number, wn: Number) => CmsSketchAgg(a, b, dn.intValue(), wn.intValue())
          case other => throw new IllegalArgumentException(
            s"graft_cms_sketch(h1, h2[, depth, width]): integer literals expected, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "graft_cms_sketch(h1, h2[, depth, width]) with literal depth/width")
    })

  val cmsEstimateDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cms_estimate"),
    new ExpressionInfo(classOf[CmsEstimateF].getName, "graft_cms_estimate"),
    (children: Seq[Expression]) => children match {
      case Seq(s, a, b) => CmsEstimateF(s, a, b)
      case _ => throw new IllegalArgumentException(
        "graft_cms_estimate(sketch, h1, h2)")
    })

  /** DataFrame-API surface: HLL distinct count of a pre-hashed long
    * column (compose with `xxhash64`). */
  def hllCount(hashed: Column, precision: Int = 12): Column =
    ExpressionUtils.column(
      HllCountAgg(ExpressionUtils.expression(hashed), precision)
        .toAggregateExpression())

  /** DataFrame-API surface: count-min sketch of a double-hashed stream
    * (compose with two seeded hashes of the key, e.g. md5Bucket(1, k) /
    * md5Bucket(2, k)). Returns the serialized sketch bytes. */
  def cmsSketch(h1: Column, h2: Column, depth: Int = 4, width: Int = 1024): Column =
    ExpressionUtils.column(
      CmsSketchAgg(ExpressionUtils.expression(h1), ExpressionUtils.expression(h2),
        depth, width).toAggregateExpression())

  /** Point estimate (overestimate-only) of a key's count from a
    * [[cmsSketch]] result, probing with the SAME hash pair. */
  def cmsEstimate(sketch: Column, h1: Column, h2: Column): Column =
    ExpressionUtils.column(
      CmsEstimateF(ExpressionUtils.expression(sketch),
        ExpressionUtils.expression(h1), ExpressionUtils.expression(h2)))
}
