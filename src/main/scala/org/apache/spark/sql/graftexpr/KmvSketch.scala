package org.apache.spark.sql.graftexpr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** KMV (k-minimum-values / theta) sketches: mergeable distinct-count
  * summaries that — unlike HLL — support SET ALGEBRA: intersection and
  * pairwise-union cardinalities of independently built sketches
  * (`kmv_intersect_card`, `kmv_union_card`), the segment-overlap
  * questions ("users in A ∩ B?") a serving layer cannot answer from HLL
  * registers at any precision. This is the same capability split as
  * Apache DataSketches' theta family vs its HLL family.
  *
  * A sketch keeps the k smallest DISTINCT values of a bijective 64-bit
  * mix ([[GraftBloom.mix64]]) of the key. Mergeability is exact and
  * order-invariant: the k smallest of a union do not depend on
  * encounter order, so union-of-parts equals sketch-of-whole
  * byte-for-byte (asserted in KmvSpec — a stronger property than MG or
  * HLL give). Two regimes:
  *  - n < k (sketch not full): the sketch holds EVERY distinct hash,
  *    and because the mix is a bijection there are no collisions — all
  *    cardinalities are exact. The oracle checks this regime at full
  *    value strength.
  *  - n = k: standard estimators. θ = k-th smallest hash as a fraction
  *    F(θ) of the hash space: distinct ≈ (k-1)/F(θ); intersection via
  *    the theta rule — common values below θ = min(θa, θb), scaled by
  *    1/F(θ). RSE ≈ 1/√(k-2) (~1.6% at k=4096). Bounded in KmvSpec.
  *
  * Blob layout: int32 k, int32 n, then n int64 hashes sorted unsigned-
  * ascending. A k=4096 sketch is ≤ 32 KB; per (group × day) sketches
  * roll up to arbitrary segments/date ranges without rescanning events.
  */
object GraftKmv {

  private val UMAX = java.lang.Long.compareUnsigned _

  final class Buffer(val k: Int) {
    // unsigned-ascending ordered distinct hashes, capped at k
    val set = new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          UMAX(a, b)
      })

    def add(hash: Long): Unit = {
      if (set.size < k) { set.add(hash); () }
      else if (UMAX(hash, set.last()) < 0 && set.add(hash)) {
        set.remove(set.last()); ()
      }
    }

    def mergeIn(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }
  }

  def toBlob(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 8 * buf.set.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  def fromBlob(blob: Array[Byte]): Buffer = {
    if (blob.length < 8) malformed(blob)
    val in = new DataInputStream(new ByteArrayInputStream(blob))
    val k = in.readInt()
    val n = in.readInt()
    if (k < 1 || n < 0 || n > k || blob.length != 8 + 8 * n) malformed(blob)
    val buf = new Buffer(k)
    var i = 0
    while (i < n) { buf.set.add(in.readLong()); i += 1 }
    buf
  }

  private def malformed(blob: Array[Byte]): Nothing =
    throw new IllegalArgumentException(
      s"malformed kmv sketch (${blob.length} bytes) — build sketches with kmv_build")

  /** Hash-space fraction of θ, a 53-bit approximation (the exact regime
    * never consults it).
    */
  private def frac(theta: Long): Double =
    (theta >>> 11).toDouble / (1L << 53).toDouble

  /** Distinct-count estimate; exact when the sketch never filled. */
  def estimate(blob: Array[Byte]): Long = {
    val buf = fromBlob(blob)
    if (buf.set.size < buf.k) buf.set.size.toLong
    else math.round((buf.k - 1).toDouble / frac(buf.set.last()))
  }

  /** |A ∪ B| via a merged sketch at k = min(ka, kb). */
  def unionCard(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = fromBlob(a); val bb = fromBlob(b)
    val merged = new Buffer(math.min(ba.k, bb.k))
    merged.mergeIn(ba); merged.mergeIn(bb)
    estimate(toBlob(merged))
  }

  /** |A ∩ B| via the theta rule; exact when both sketches never filled. */
  def intersectCard(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = fromBlob(a); val bb = fromBlob(b)
    val exactA = ba.set.size < ba.k
    val exactB = bb.set.size < bb.k
    if (exactA && exactB) {
      var n = 0L
      val it = ba.set.iterator()
      while (it.hasNext) if (bb.set.contains(it.next())) n += 1
      n
    } else {
      // θ = min of the estimating sides' k-th minima; survivors strictly
      // below θ form a uniform sample of the intersection at rate F(θ)
      var theta = -1L // unsigned max
      if (!exactA && UMAX(ba.set.last(), theta) < 0) theta = ba.set.last()
      if (!exactB && UMAX(bb.set.last(), theta) < 0) theta = bb.set.last()
      var common = 0L
      val it = ba.set.iterator()
      while (it.hasNext) {
        val h = it.next()
        if (UMAX(h, theta) < 0 && bb.set.contains(h)) common += 1
      }
      math.round(common.toDouble / frac(theta))
    }
  }

  /** Column API: aggregate long keys into a KMV sketch blob. */
  def build(key: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvBuildAgg(ExpressionUtils.expression(key), k).toAggregateExpression())

  /** Column API: merge already-built sketch blobs. */
  def union(sketch: Column): Column =
    ExpressionUtils.column(
      KmvUnionAgg(ExpressionUtils.expression(sketch)).toAggregateExpression())

  /** Column API: distinct-count estimate off a sketch blob. */
  def cardinality(sketch: Column): Column =
    ExpressionUtils.column(KmvCardinality(ExpressionUtils.expression(sketch)))

  /** Column API: union cardinality of two sketch blobs. */
  def unionCardCol(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvSetCard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      intersect = false))

  /** Column API: intersection cardinality of two sketch blobs. */
  def intersectCardCol(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvSetCard(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      intersect = true))
}

/** `kmv_build(key, k)` — see [[GraftKmv]]. */
case class KmvBuildAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftKmv.Buffer] with ExpectsInputTypes {

  require(k >= 16 && k <= (1 << 20),
    s"kmv_build: k must be in [16, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_build"

  override def createAggregationBuffer(): GraftKmv.Buffer = new GraftKmv.Buffer(k)

  override def update(buf: GraftKmv.Buffer, input: InternalRow): GraftKmv.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(GraftBloom.mix64(v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: GraftKmv.Buffer, other: GraftKmv.Buffer): GraftKmv.Buffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: GraftKmv.Buffer): Any = GraftKmv.toBlob(buf)

  override def serialize(buf: GraftKmv.Buffer): Array[Byte] = GraftKmv.toBlob(buf)
  override def deserialize(bytes: Array[Byte]): GraftKmv.Buffer =
    GraftKmv.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBuildAgg =
    copy(child = newChildren.head)
}

/** `kmv_union(sketch)` — merge already-built sketches; the buffer adopts
  * the smallest k it sees (merging sketches of different k is legal and
  * yields a min-k sketch).
  */
case class KmvUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[GraftKmv.Buffer]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_union"

  override def createAggregationBuffer(): Option[GraftKmv.Buffer] = None

  private def mergeInto(
      buf: Option[GraftKmv.Buffer],
      other: GraftKmv.Buffer): Option[GraftKmv.Buffer] = buf match {
    case None => Some(other)
    case Some(b) if other.k < b.k =>
      // adopt the tighter k: re-cap by replaying into a min-k buffer
      val shrunk = new GraftKmv.Buffer(other.k)
      shrunk.mergeIn(b); shrunk.mergeIn(other)
      Some(shrunk)
    case Some(b) =>
      b.mergeIn(other); Some(b)
  }

  override def update(buf: Option[GraftKmv.Buffer], input: InternalRow): Option[GraftKmv.Buffer] = {
    val v = child.eval(input)
    if (v == null) buf
    else mergeInto(buf, GraftKmv.fromBlob(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(
      buf: Option[GraftKmv.Buffer],
      other: Option[GraftKmv.Buffer]): Option[GraftKmv.Buffer] =
    other match {
      case None => buf
      case Some(o) => mergeInto(buf, o)
    }

  override def eval(buf: Option[GraftKmv.Buffer]): Any =
    buf.map(GraftKmv.toBlob).orNull

  override def serialize(buf: Option[GraftKmv.Buffer]): Array[Byte] =
    buf.map(GraftKmv.toBlob).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[GraftKmv.Buffer] =
    if (bytes.isEmpty) None else Some(GraftKmv.fromBlob(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = newChildren.head)
}

/** `kmv_card(sketch)` — distinct-count estimate (exact while the sketch
  * never filled). Codegen via the mirror class's static forwarder.
  */
case class KmvCardinality(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_card"

  override protected def nullSafeEval(blob: Any): Any =
    GraftKmv.estimate(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftKmv.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, blob => s"${ev.value} = $cls.estimate($blob);")
  }

  override protected def withNewChildInternal(newChild: Expression): KmvCardinality =
    copy(child = newChild)
}

/** `kmv_union_card(a, b)` / `kmv_intersect_card(a, b)` — set-algebra
  * cardinalities of two sketch blobs.
  */
case class KmvSetCard(left: Expression, right: Expression, intersect: Boolean)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (intersect) "kmv_intersect_card" else "kmv_union_card"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (intersect)
      GraftKmv.intersectCard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    else
      GraftKmv.unionCard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftKmv.getClass.getName.stripSuffix("$")
    val fn = if (intersect) "intersectCard" else "unionCard"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSetCard =
    copy(left = newLeft, right = newRight)
}
