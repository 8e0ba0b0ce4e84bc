package org.apache.spark.sql.graftexpr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded-heap top-k aggregate: `top_k_ids(id, score, k)` keeps the k
  * (id, score) pairs with the greatest score (ties broken toward the
  * smaller id, which also makes the result deterministic) and returns
  * them as an array of structs sorted score-desc.
  *
  * This is the custom-AGGREGATE tier of the engine (the fourth Catalyst
  * extension class after expression / planner strategy / optimizer
  * rule): a TypedImperativeAggregate whose buffer is a size-k heap, so
  * top-k runs as one partial-aggregation pass — each task keeps k rows,
  * the shuffle carries one k-row buffer per partition, and merge is
  * heap-union. Compare the sort+limit form: a RangePartitioning total
  * sort samples the child (executing it twice) and shuffles EVERY row
  * to sort it; at 100 TB the heap form ships ~k·partitions rows total.
  *
  * Buffer serialization is a flat (long, double) stream — no row
  * encoders needed, stable across shuffles.
  */
case class TopKAgg(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k >= 0, s"top_k_ids: k must be >= 0, got $k")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  // fail a wrongly-typed call at analysis, not with a ClassCastException
  // per row in the executor
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(LongType, DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_ids"

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val idv = idExpr.eval(input)
    val sv = scoreExpr.eval(input)
    if (idv != null && sv != null) {
      buf.offer(idv.asInstanceOf[Long], sv.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach((id, s) => buf.offer(id, s))
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val arr = buf.sortedDesc()
    new GenericArrayData(arr.map { case (id, s) =>
      InternalRow(id, s)
    }.toArray[Any])
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (id, s) => out.writeLong(id); out.writeDouble(s) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readLong(), in.readDouble()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

object TopKAgg {
  /** Min-heap of (id, score) under (score asc, id desc) — the root is
    * the WORST element, evicted when a better one arrives. "Better" =
    * higher score, or equal score with smaller id.
    */
  final class Heap(k: Int) {
    private val ids = new Array[Long](k)
    private val scores = new Array[Double](k)
    private var n = 0

    def size: Int = n

    // a is worse than b (a should sit nearer the root)
    private def worse(ai: Int, bi: Int): Boolean =
      scores(ai) < scores(bi) || (scores(ai) == scores(bi) && ids(ai) > ids(bi))

    private def swap(a: Int, b: Int): Unit = {
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
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

    def offer(id: Long, s: Double): Unit = {
      if (n < k) {
        ids(n) = id; scores(n) = s; n += 1; siftUp(n - 1)
      } else if (k > 0 &&
          (scores(0) < s || (scores(0) == s && ids(0) > id))) {
        // new element beats the current worst (root) → replace
        ids(0) = id; scores(0) = s; siftDown()
      }
    }

    def foreach(f: (Long, Double) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ids(i), scores(i)); i += 1 }
    }

    /** (id, score) pairs, score desc then id asc. */
    def sortedDesc(): Seq[(Long, Double)] =
      (0 until n).map(i => (ids(i), scores(i)))
        .sortBy { case (id, s) => (-s, id) }
  }

  /** Column API: array<struct<id,score>> of the top-k by score. */
  def topKIds(id: Column, score: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAgg(ExpressionUtils.expression(id), ExpressionUtils.expression(score), k)
        .toAggregateExpression())
}
