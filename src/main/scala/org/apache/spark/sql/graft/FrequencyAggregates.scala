package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a native Catalyst aggregate
  * (Misra & Gries 1982; merge rule from Agarwal et al. 2012, "Mergeable
  * Summaries" — the two papers behind every production heavy-hitter
  * pipeline).
  *
  * State is at most k-1 (item, counter) pairs, independent of stream
  * length: an unseen item either claims a free slot or decrements every
  * counter by one (the "pigeonhole" step). The mergeable-summaries rule
  * keeps the same bound across partials: add counters pointwise, then
  * subtract the k-th largest counter from all and drop non-positives.
  * GUARANTEE: any item with true frequency > N/k survives with a positive
  * counter, so the summary is a superset of the true heavy hitters.
  *
  * This is the CANDIDATE half of the exact two-pass pattern
  * ([[graft.operators.Frequency.heavyHitters]]): pass 1 folds each
  * partition into one ≤(k-1)-entry map (the shuffle moves only summaries,
  * never the token stream), pass 2 exact-counts the candidates only. The
  * candidate SET may vary with merge order; the exact pass makes the
  * final answer deterministic — which is why [[eval]] returns just the
  * sorted candidate items, not the (order-dependent) residual counters.
  *
  * Scale shape: constant memory per group, one ≤(k-1)-entry buffer per
  * (group × task) on the wire — the 1000-executor shape for "top terms
  * over 100 TB" where a full vocab groupBy would shuffle billions of
  * distinct keys.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with ImplicitCastInputTypes {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_candidates"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buffer.get(item) match {
        case Some(c) => buffer.update(item, c + 1)
        case None if buffer.size < k - 1 =>
          // copy: the map retains the key beyond this row's buffer
          buffer.update(item.clone(), 1L)
        case None =>
          // pigeonhole decrement; O(k) but amortized O(1) per stream item
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buffer.foreach { case (it, c) =>
            if (c == 1L) dead += it else buffer.update(it, c - 1)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (it, c) =>
      b1.update(it, b1.getOrElse(it, 0L) + c)
    }
    if (b1.size > k - 1) {
      // Agarwal et al. 2012: subtract the k-th largest counter, keep > 0
      val sorted = b1.values.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - k) // k-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b1.foreach { case (it, c) =>
        if (c - sub <= 0L) dead += it else b1.update(it, c - sub)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val items = buffer.keysIterator.toArray
    java.util.Arrays.sort(items, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(items.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (it, c) =>
      val bytes = it.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

/** K-minimum-values distinct-value sketch (Beyer et al. 2007; the bottom-k
  * form of the theta sketch). State: the k smallest DISTINCT hashed values
  * seen, in unsigned 64-bit order. Union-merges by keeping the k smallest
  * of the combined value sets — associative, commutative, order-blind —
  * so the result is a DETERMINISTIC function of the input value set: same
  * sketch on every run, any partitioning. That makes downstream estimates
  * (distinct count, and crucially set INTERSECTION — which HLL cannot do)
  * exactly replayable by any engine that can sort and take k
  * ([[graft.operators.Frequency.kmvOverlap]] pins it against a DuckDB
  * window-limit replay).
  *
  * Input is a PRE-HASHED long — compose with
  * [[graft.functions.HashFunctions.md5Bucket]] (portable tier, values in
  * [0, 2^32)) or `xxhash64` (fast tier, full unsigned-64 range).
  *
  * Scale shape: ≤k longs per group buffer; the shuffle moves sketches,
  * never values — constant-memory audience-overlap over any number of
  * rows.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 128,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes {

  require(k >= 1, s"k must be >= 1, got $k")

  // unsigned 64-bit order (flip the sign bit): correct for xxhash64's full
  // range; identical to natural order for md5Bucket's [0, 2^32) values
  private def unsignedComparator: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a, b)

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](unsignedComparator)

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) {
      buf.add(v)
    } else if (java.lang.Long.compareUnsigned(v, buf.last()) < 0 && !buf.contains(v)) {
      buf.add(v)
      buf.pollLast()
    }
  }

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr) // ascending unsigned order
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add(in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object FrequencyFunctions {

  private def literalInt(e: Expression, sig: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(s"$sig: k must be a literal")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$sig: integer k expected, got $other")
    }
  }

  val mgDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_mg_candidates"),
    new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_mg_candidates"),
    (children: Seq[Expression]) => children match {
      case Seq(c) => MisraGriesAgg(c)
      case Seq(c, kk) =>
        MisraGriesAgg(c, literalInt(kk, "graft_mg_candidates(item[, k])"))
      case _ => throw new IllegalArgumentException("graft_mg_candidates(item[, k])")
    })

  val kmvDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_kmv_sketch"),
    new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv_sketch"),
    (children: Seq[Expression]) => children match {
      case Seq(c) => KmvSketchAgg(c)
      case Seq(c, kk) =>
        KmvSketchAgg(c, literalInt(kk, "graft_kmv_sketch(hashedLong[, k])"))
      case _ => throw new IllegalArgumentException("graft_kmv_sketch(hashedLong[, k])")
    })

  /** DataFrame-API surface: sorted Misra-Gries candidate items (superset
    * of every item with frequency > N/k). */
  def mgCandidates(item: Column, k: Int = 64): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(item), k).toAggregateExpression())

  /** DataFrame-API surface: k smallest distinct pre-hashed values,
    * ascending. */
  def kmvSketch(hashed: Column, k: Int = 128): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(hashed), k).toAggregateExpression())
}
