package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** HyperLogLog sketches as FIRST-CLASS mergeable columns: `hll_build`
  * aggregates keys into a fixed-size register blob, `hll_union`
  * OR-merges (register-wise max) already-built sketches, `hll_card`
  * reads an estimate off a blob.
  *
  * Spark's own `approx_count_distinct` answers "how many distinct in
  * THIS aggregation" but never exposes the sketch, so cardinality can't
  * be re-aggregated without the raw data. Materializing the sketch is
  * what a serving layer needs at 100 TB: hourly sketches (kilobytes per
  * window — 2^p registers, one byte each) roll up to days/weeks/ad-hoc
  * unions via `hll_union` WITHOUT rescanning events, the same
  * re-aggregation contract the t-digest quantile sketch provides for
  * percentiles. This mirrors the reference's intended ClickHouse DWS
  * layer (SURVEY.md §2.8), where `uniqCombinedState`-style sketch
  * columns fill the same role.
  *
  * Blob layout: byte 0 = precision p, bytes 1..2^p = registers.
  * Hashing: splitmix64 ([[GraftBloom.mix64]]); register index = top p
  * hash bits, register value = leading-zero count of the remaining
  * 64-p bits + 1 (≤ 64-p+1 < 128, fits a byte). Estimator: standard
  * HLL harmonic mean with the linear-counting small-range correction;
  * no large-range correction is needed with 64-bit hashing.
  *
  * Error: rse ≈ 1.04/√(2^p); p=14 (16 KB) ⇒ ~0.8%.
  */
object GraftHll {

  def emptySketch(p: Int): Array[Byte] = {
    require(p >= 4 && p <= 16, s"hll precision must be in [4,16], got $p")
    val blob = new Array[Byte](1 + (1 << p))
    blob(0) = p.toByte
    blob
  }

  private def checkBlob(blob: Array[Byte], who: String): Int = {
    val p = if (blob.length < 1) -1 else blob(0).toInt
    if (p < 4 || p > 16 || blob.length != 1 + (1 << p))
      throw new IllegalArgumentException(
        s"$who: malformed hll sketch (${blob.length} bytes, p=$p) — " +
          "build sketches with hll_build")
    p
  }

  /** Register-update for one key, in place. */
  def add(blob: Array[Byte], value: Long): Unit = {
    val p = blob(0).toInt
    val h = GraftBloom.mix64(value)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = (if (w == 0) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rho > blob(1 + idx)) blob(1 + idx) = rho
  }

  /** Register-wise max merge of `other` into `acc`, in place. */
  def merge(acc: Array[Byte], other: Array[Byte]): Array[Byte] = {
    val p = checkBlob(acc, "hll_union")
    val po = checkBlob(other, "hll_union")
    if (p != po) throw new IllegalArgumentException(
      s"hll_union: cannot merge sketches of different precision ($p vs $po)")
    var i = 1
    while (i < acc.length) {
      if (other(i) > acc(i)) acc(i) = other(i)
      i += 1
    }
    acc
  }

  /** Cardinality estimate off a sketch blob. */
  def estimate(blob: Array[Byte]): Long = {
    val p = checkBlob(blob, "hll_card")
    val m = 1 << p
    var sum = 0.0
    var zeros = 0
    var i = 1
    while (i < blob.length) {
      val r = blob(i).toInt
      sum += java.lang.Math.scalb(1.0, -r) // 2^-reg
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** Column API: aggregate long keys into an HLL sketch blob. */
  def build(key: Column, p: Int): Column =
    ExpressionUtils.column(
      HllBuildAgg(ExpressionUtils.expression(key), p).toAggregateExpression())

  /** Column API: merge already-built sketch blobs. */
  def union(sketch: Column): Column =
    ExpressionUtils.column(
      HllUnionAgg(ExpressionUtils.expression(sketch)).toAggregateExpression())

  /** Column API: cardinality estimate of a sketch blob. */
  def cardinality(sketch: Column): Column =
    ExpressionUtils.column(HllCardinality(ExpressionUtils.expression(sketch)))
}

/** `hll_build(key, p)` — see [[GraftHll]]. */
case class HllBuildAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {

  require(p >= 4 && p <= 16, s"hll_build: precision must be in [4,16], got $p")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_build"

  override def createAggregationBuffer(): Array[Byte] = GraftHll.emptySketch(p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) GraftHll.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    GraftHll.merge(buf, other)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllBuildAgg =
    copy(child = newChildren.head)
}

/** `hll_union(sketch)` — register-wise max of already-built sketches.
  * The buffer starts empty (precision unknown until the first input) and
  * adopts the first sketch it sees; mixed precisions are an error.
  */
case class HllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_union"

  /** Empty marker: precision is adopted from the first merged sketch. */
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def mergeInto(buf: Array[Byte], sketch: Array[Byte]): Array[Byte] =
    if (sketch.isEmpty) buf
    else if (buf.isEmpty) sketch.clone()
    else GraftHll.merge(buf, sketch)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else mergeInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllUnionAgg =
    copy(child = newChildren.head)
}

/** `hll_card(sketch)` — cardinality estimate, codegen'd via the mirror
  * class's static forwarder (never `.MODULE$`, which Janino can't
  * resolve — see [[BloomMightContain.doGenCode]]).
  */
case class HllCardinality(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_card"

  override protected def nullSafeEval(blob: Any): Any =
    GraftHll.estimate(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hllCls = GraftHll.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, blob => s"${ev.value} = $hllCls.estimate($blob);")
  }

  override protected def withNewChildInternal(newChild: Expression): HllCardinality =
    copy(child = newChild)
}
