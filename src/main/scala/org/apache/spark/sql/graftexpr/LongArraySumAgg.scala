package org.apache.spark.sql.graftexpr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** `long_array_sum(arr)` — element-wise sum of `array<bigint>` rows: the
  * vector accumulator behind distributed centroid computation
  * ([[graft.functions.Clustering]]'s k-means recompute step). One
  * partial-aggregation pass: each task folds its rows into a single
  * dim-length buffer, the shuffle carries one buffer per (partition ×
  * group), merge is element-wise add — the same map-side-combine shape
  * `sum` has for scalars, so a 100 TB corpus shuffles `groups × dims ×
  * 8 bytes`, not the vectors themselves.
  *
  * All input rows of a group must share one length (the first non-null
  * row fixes it; a mismatch raises with both lengths named). Null rows
  * are skipped; a group with no non-null rows sums to NULL.
  */
case class LongArraySumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongArraySumAgg.Buf] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_array_sum"

  override def createAggregationBuffer(): LongArraySumAgg.Buf =
    new LongArraySumAgg.Buf(null)

  override def update(buf: LongArraySumAgg.Buf, input: InternalRow): LongArraySumAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Long](n)
      else if (buf.sums.length != n)
        throw new IllegalArgumentException(
          s"long_array_sum: mixed array lengths in one group (${buf.sums.length} vs $n)")
      var i = 0
      while (i < n) { buf.sums(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(buf: LongArraySumAgg.Buf, other: LongArraySumAgg.Buf): LongArraySumAgg.Buf = {
    if (other.sums != null) {
      if (buf.sums == null) buf.sums = other.sums.clone()
      else {
        if (buf.sums.length != other.sums.length)
          throw new IllegalArgumentException(
            s"long_array_sum: mixed array lengths across partitions " +
              s"(${buf.sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      }
    }
    buf
  }

  override def eval(buf: LongArraySumAgg.Buf): Any =
    if (buf.sums == null) null else new GenericArrayData(buf.sums)

  override def serialize(buf: LongArraySumAgg.Buf): Array[Byte] = {
    val n = if (buf.sums == null) -1 else buf.sums.length
    val bos = new ByteArrayOutputStream(4 + 8 * math.max(n, 0))
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeLong(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): LongArraySumAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) new LongArraySumAgg.Buf(null)
    else {
      val sums = new Array[Long](n)
      var i = 0
      while (i < n) { sums(i) = in.readLong(); i += 1 }
      new LongArraySumAgg.Buf(sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongArraySumAgg =
    copy(child = newChildren.head)
}

object LongArraySumAgg {
  final class Buf(var sums: Array[Long])

  /** Column API: element-wise sum of an `array<bigint>` column. */
  def column(arr: Column): Column =
    ExpressionUtils.column(
      LongArraySumAgg(ExpressionUtils.expression(arr)).toAggregateExpression())
}
