package org.apache.spark.sql.graftexpr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Misra-Gries frequent-items summary: `freq_items_mg(key, k)` keeps at
  * most k (key, counter) pairs and returns them as an
  * array<struct<key,est>> sorted est-desc (key-asc tiebreak).
  *
  * This is the distributed heavy-hitters primitive: counts are UNDER-
  * estimates with error at most N/(k+1) (N = rows aggregated), so every
  * key with true count > N/(k+1) is guaranteed present — without ever
  * shuffling on the key. Each task keeps k counters, the shuffle carries
  * one k-entry summary per partition, and merge (counter-sum, then
  * subtract the (k+1)-th largest and drop non-positive — Agarwal et al.,
  * "Mergeable Summaries", PODS'12) preserves the same bound. Compare the
  * exact plan: a full groupBy shuffles every distinct key; at 100 TB a
  * skew scan ("which keys are hot?") must not pay that — this summary
  * answers it from one bounded pass, and an exact recheck of the ≤ k
  * candidates (a tiny second aggregation) removes the approximation from
  * the final answer (see SkewOps.heavyHitters).
  *
  * The summary CONTENT depends on encounter order (which decrements fire
  * when), so downstream logic may rely only on the order-independent
  * guarantee above — never on the exact counter values.
  */
case class FreqItemsAgg(
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsAgg.Summary]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(k >= 1, s"freq_items_mg: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(keyExpr)
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items_mg"

  override def createAggregationBuffer(): FreqItemsAgg.Summary =
    new FreqItemsAgg.Summary(k)

  override def update(buf: FreqItemsAgg.Summary, input: InternalRow): FreqItemsAgg.Summary = {
    val v = keyExpr.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: FreqItemsAgg.Summary, other: FreqItemsAgg.Summary): FreqItemsAgg.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: FreqItemsAgg.Summary): Any = {
    val arr = buf.sortedDesc()
    new GenericArrayData(arr.map { case (key, est) =>
      InternalRow(key, est)
    }.toArray[Any])
  }

  override def serialize(buf: FreqItemsAgg.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (key, c) => out.writeLong(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsAgg.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new FreqItemsAgg.Summary(k)
    var i = 0
    while (i < n) { s.offer(in.readLong(), in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(keyExpr = newChildren.head)
}

object FreqItemsAgg {
  /** Mutable MG summary: ≤ k counters. `offer(key, w)` admits a key with
    * weight w (weights let deserialize/merge replay counters in one
    * call); overflow decrements all counters by the smallest admitted
    * weight instead of the classic per-row 1 — equivalent bound, fewer
    * passes.
    */
  final class Summary(k: Int) {
    private val counts = new java.util.HashMap[Long, Long](k * 2)

    def size: Int = counts.size

    def offer(key: Long, w: Long): Unit = {
      val cur = counts.get(key)
      if (cur != 0L || counts.containsKey(key)) {
        counts.put(key, cur + w)
      } else if (counts.size < k) {
        counts.put(key, w)
      } else {
        // no slot: decrement everyone by min(w, current minimum)+…;
        // classic MG decrements by 1 per unmatched row — decrementing by
        // the full admissible amount at once is the standard weighted
        // variant (same error bound, O(k) once instead of w times)
        var dec = w
        val it0 = counts.values().iterator()
        while (it0.hasNext) { val c = it0.next(); if (c < dec) dec = c }
        if (dec > 0L) {
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val nv = e.getValue - dec
            if (nv <= 0L) it.remove() else e.setValue(nv)
          }
        }
        val rem = w - dec
        if (rem > 0L && counts.size < k) counts.put(key, rem)
      }
    }

    /** Counter-sum merge, then shrink back to ≤ k by subtracting the
      * (k+1)-th largest counter from all and dropping non-positive.
      */
    def mergeIn(other: Summary): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      if (counts.size > k) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val vi = counts.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - k - 1) // (k+1)-th largest
        val ei = counts.entrySet().iterator()
        while (ei.hasNext) {
          val e = ei.next()
          val nv = e.getValue - cut
          if (nv <= 0L) ei.remove() else e.setValue(nv)
        }
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); f(e.getKey, e.getValue) }
    }

    /** (key, est) pairs, est desc then key asc. */
    def sortedDesc(): Seq[(Long, Long)] = {
      val b = Seq.newBuilder[(Long, Long)]
      foreach((key, c) => b += ((key, c)))
      b.result().sortBy { case (key, c) => (-c, key) }
    }
  }

  /** Column API: array<struct<key,est>> of ≤ k frequent-item candidates. */
  def freqItems(key: Column, k: Int): Column =
    ExpressionUtils.column(
      FreqItemsAgg(ExpressionUtils.expression(key), k).toAggregateExpression())
}
