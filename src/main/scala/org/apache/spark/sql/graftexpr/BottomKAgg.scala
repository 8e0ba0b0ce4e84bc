package org.apache.spark.sql.graftexpr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded-heap BOTTOM-k aggregate over an integral key:
  * `bottom_k_ids(id, key, k)` keeps the k (id, key) pairs with the
  * SMALLEST key (ties toward the smaller id) and returns them sorted
  * key-asc. The [[TopKAgg]] mirror for ascending selections whose key
  * is an exact long — hash priorities, timestamps, sequence numbers —
  * where routing through a double score would round away low bits
  * (2⁶⁰-range hashes exceed double's 2⁵³ integer precision) and
  * silently change tie-breaking.
  *
  * Same scale shape as TopKAgg: one partial-aggregation pass, a k-row
  * heap per task, heap-union merge — per-group bottom-k (deterministic
  * samples, per-key earliest-n, quota winners) without a per-group
  * window sort.
  */
case class BottomKAgg(
    idExpr: Expression,
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKAgg.Heap]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k >= 0, s"bottom_k_ids: k must be >= 0, got $k")

  override def children: Seq[Expression] = Seq(idExpr, keyExpr)
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("key", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bottom_k_ids"

  override def createAggregationBuffer(): BottomKAgg.Heap = new BottomKAgg.Heap(k)

  override def update(buf: BottomKAgg.Heap, input: InternalRow): BottomKAgg.Heap = {
    val idv = idExpr.eval(input)
    val kv = keyExpr.eval(input)
    if (idv != null && kv != null) {
      buf.offer(idv.asInstanceOf[Long], kv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BottomKAgg.Heap, other: BottomKAgg.Heap): BottomKAgg.Heap = {
    other.foreach((id, key) => buf.offer(id, key))
    buf
  }

  override def eval(buf: BottomKAgg.Heap): Any =
    new GenericArrayData(buf.sortedAsc().map { case (id, key) =>
      InternalRow(id, key)
    }.toArray[Any])

  override def serialize(buf: BottomKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (id, key) => out.writeLong(id); out.writeLong(key) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new BottomKAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readLong(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(idExpr = newChildren(0), keyExpr = newChildren(1))
}

object BottomKAgg {
  /** Max-heap under (key asc, id asc) "goodness": the root is the WORST
    * retained element — largest key, ties toward the larger id — and is
    * evicted when a better (smaller) one arrives.
    */
  final class Heap(k: Int) {
    private val ids = new Array[Long](k)
    private val keys = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // a is worse than b (nearer the root): larger key, or same key and
    // larger id
    private def worse(ai: Int, bi: Int): Boolean =
      keys(ai) > keys(bi) || (keys(ai) == keys(bi) && ids(ai) > ids(bi))

    private def swap(a: Int, b: Int): Unit = {
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
      val tk = keys(a); keys(a) = keys(b); keys(b) = tk
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(): Unit = {
      var i = 0
      var continue = true
      while (continue) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var w = i
        if (l < n && worse(l, w)) w = l
        if (r < n && worse(r, w)) w = r
        if (w == i) continue = false
        else { swap(i, w); i = w }
      }
    }

    def offer(id: Long, key: Long): Unit = {
      if (n < k) {
        ids(n) = id; keys(n) = key; n += 1; siftUp(n - 1)
      } else if (k > 0 &&
          (keys(0) > key || (keys(0) == key && ids(0) > id))) {
        // new element beats the current worst (root) → replace
        ids(0) = id; keys(0) = key; siftDown()
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ids(i), keys(i)); i += 1 }
    }

    /** (id, key) pairs, key asc then id asc. */
    def sortedAsc(): Seq[(Long, Long)] =
      (0 until n).map(i => (ids(i), keys(i)))
        .sortBy { case (id, key) => (key, id) }
  }

  /** Column API: array<struct<id,key>> of the bottom-k by key. */
  def bottomKIds(id: Column, key: Column, k: Int): Column =
    ExpressionUtils.column(
      BottomKAgg(ExpressionUtils.expression(id), ExpressionUtils.expression(key), k)
        .toAggregateExpression())
}
