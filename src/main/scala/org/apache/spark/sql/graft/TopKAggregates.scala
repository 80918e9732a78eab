package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Bounded top-k selection as a native mergeable aggregate: keep the `k`
  * (key, payload) pairs with the SMALLEST keys (ties broken by payload),
  * emit the payloads in ascending (key, payload) order.
  *
  * This is the scale tier for per-group deterministic sampling
  * (`row_number() OVER (PARTITION BY g ORDER BY hash, id) <= k`): the
  * window form SORTS every group's full row set after the shuffle, while
  * this aggregate is a proper partial agg — each task folds its partition
  * into a k-entry heap, the shuffle moves only k pairs per (group × task)
  * instead of every row, and the final merge re-heaps. At a 10⁹-row group
  * with k = 5 that is the difference between shuffling-and-sorting 10⁹
  * rows and shuffling a few thousand 80-byte buffers. Exact, not
  * approximate: heap-select is order-blind, so the result is a pure
  * function of the input multiset — identical on any partitioning, and
  * it replays in SQL as the window form (the oracle).
  *
  * Pairs are (long key, long payload); compose the key outside the
  * aggregate (seeded md5/xxhash of the id — stays in whole-stage codegen
  * and keeps the aggregate hash-agnostic). Null key or payload rows are
  * skipped, matching `row_number`-over-non-null semantics upstream.
  */
case class TopKByKeyAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
    with ImplicitCastInputTypes {

  require(k >= 1 && k <= 100000, s"k out of range: $k")

  override def children: Seq[Expression] = Seq(key, payload)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_by_key"

  // natural tuple ordering, max at head — the evictable worst pair
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def offer(
      q: mutable.PriorityQueue[(Long, Long)], pair: (Long, Long)): Unit = {
    if (q.size < k) q.enqueue(pair)
    else if (Ordering[(Long, Long)].lt(pair, q.head)) {
      q.dequeue(); q.enqueue(pair)
    }
  }

  override def update(
      q: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null) {
      offer(q, (kv.asInstanceOf[Long], pv.asInstanceOf[Long]))
    }
    q
  }

  override def merge(
      q1: mutable.PriorityQueue[(Long, Long)],
      q2: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    q2.foreach(offer(q1, _))
    q1
  }

  override def eval(q: mutable.PriorityQueue[(Long, Long)]): Any =
    new GenericArrayData(q.toArray.sorted.map(_._2))

  override def serialize(q: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * q.size)
    buf.putInt(q.size)
    q.foreach { case (a, b) => buf.putLong(a); buf.putLong(b) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((buf.getLong, buf.getLong)); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByKeyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByKeyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByKeyAgg =
    copy(key = newChildren(0), payload = newChildren(1))
}

object TopKFunctions {
  val topKDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk_by_key"),
    new ExpressionInfo(classOf[TopKByKeyAgg].getName, "graft_topk_by_key"),
    (children: Seq[Expression]) => children match {
      case Seq(key, payload, kExpr) =>
        if (!kExpr.foldable) throw new IllegalArgumentException(
          "graft_topk_by_key(key, payload, k): k must be a literal")
        kExpr.eval(null) match {
          case n: Number => TopKByKeyAgg(key, payload, n.intValue())
          case other => throw new IllegalArgumentException(
            s"graft_topk_by_key(key, payload, k): integer k expected, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "graft_topk_by_key(key, payload, k)")
    })

  /** DataFrame-API surface: payloads of the k smallest (key, payload)
    * pairs, ascending — `posexplode` the result to recover ranks. */
  def topKByKey(key: Column, payload: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByKeyAgg(ExpressionUtils.expression(key),
        ExpressionUtils.expression(payload), k).toAggregateExpression())

  /** DataFrame-API surface for [[LastKValuesAgg]]: the values of the k
    * LARGEST (ts, id) rows, emitted ascending by (ts, id). */
  def lastKValues(ts: Column, id: Column, value: Column, k: Int): Column =
    ExpressionUtils.column(
      LastKValuesAgg(ExpressionUtils.expression(ts),
        ExpressionUtils.expression(id),
        ExpressionUtils.expression(value), k).toAggregateExpression())
}

/** Bounded suffix selection as a native mergeable aggregate: keep the `k`
  * (ts, id, value) rows with the LARGEST (ts, id) keys, emit the values
  * ascending by (ts, id) — i.e. the event-time-ordered tail of a per-key
  * series, with per-group state bounded at k rows NO MATTER how many
  * events the key has.
  *
  * This is [[TopKByKeyAgg]]'s discipline pointed at recursive smoothers
  * (EWMA): the smoother needs its input ORDERED and is inherently
  * sequential, but geometric decay makes contributions beyond ~60 steps
  * smaller than a double ulp, so the bounded suffix is the scale tier —
  * each task folds its partition into a k-entry heap, the shuffle moves
  * ≤ k 24-byte entries per (group × task) instead of the key's whole
  * history (the difference between a bounded buffer and a multi-GB row
  * on a 10⁸-event bot key). Exact heap-select over the (ts, id) total
  * order: the result is a pure function of the input multiset,
  * partitioning-invariant, and replays in SQL as sort + array slice.
  * Rows with a NULL ts, id, or value are skipped.
  */
case class LastKValuesAgg(
    ts: Expression,
    id: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long, Double)]]
    with ImplicitCastInputTypes {

  require(k >= 1 && k <= 100000, s"k out of range: $k")

  override def children: Seq[Expression] = Seq(ts, id, value)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, org.apache.spark.sql.types.DoubleType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_last_k_values"

  private val keyOrd: Ordering[(Long, Long, Double)] =
    Ordering.by[(Long, Long, Double), (Long, Long)](t => (t._1, t._2))

  // REVERSED ordering: the smallest (ts, id) sits at the head, ready to
  // be evicted when a later row arrives
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Long, Double)](keyOrd.reverse)

  private def offer(
      q: mutable.PriorityQueue[(Long, Long, Double)],
      row: (Long, Long, Double)): Unit = {
    if (q.size < k) q.enqueue(row)
    else if (keyOrd.gt(row, q.head)) {
      q.dequeue(); q.enqueue(row)
    }
  }

  override def update(
      q: mutable.PriorityQueue[(Long, Long, Double)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long, Double)] = {
    val tv = ts.eval(input)
    val iv = id.eval(input)
    val vv = value.eval(input)
    if (tv != null && iv != null && vv != null) {
      offer(q, (tv.asInstanceOf[Long], iv.asInstanceOf[Long],
        vv.asInstanceOf[Double]))
    }
    q
  }

  override def merge(
      q1: mutable.PriorityQueue[(Long, Long, Double)],
      q2: mutable.PriorityQueue[(Long, Long, Double)]): mutable.PriorityQueue[(Long, Long, Double)] = {
    q2.foreach(offer(q1, _))
    q1
  }

  override def eval(q: mutable.PriorityQueue[(Long, Long, Double)]): Any =
    new GenericArrayData(q.toArray.sorted(keyOrd).map(_._3))

  override def serialize(q: mutable.PriorityQueue[(Long, Long, Double)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 24 * q.size)
    buf.putInt(q.size)
    q.foreach { case (a, b, v) => buf.putLong(a); buf.putLong(b); buf.putDouble(v) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long, Double)] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((buf.getLong, buf.getLong, buf.getDouble)); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LastKValuesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LastKValuesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LastKValuesAgg =
    copy(ts = newChildren(0), id = newChildren(1), value = newChildren(2))
}
