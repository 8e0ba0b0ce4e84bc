package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Hashing

/** Count-Min sketch: mergeable point-frequency summary, completing the
  * engine's sketch family (bloom = membership, HLL/KMV = cardinality,
  * Misra-Gries = heavy hitters, t-digest = quantiles; CM = "how often is
  * key k?" for keys NOT known in advance — the question Misra-Gries's
  * fixed-k summary cannot answer after the fact).
  *
  * d×w counter matrix: each of d rows hashes the key to one of w
  * buckets and increments it; the estimate is the MIN across rows —
  * always ≥ the true count (every occurrence lands in each row's
  * bucket), overestimating only by collision mass (≤ εN with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉). Partial buffers merge
  * by elementwise ADD, so the build is one map-side pass per partition
  * plus a tiny reduce of d·w longs — the same scale shape as the other
  * sketch aggregates.
  *
  * Hashing is the engine's oracle-portable family: h31 = md5-prefix-60
  * of the key's decimal string reduced mod P31, row r's bucket =
  * ((a_r·h31 + b_r) mod P31) mod w with LCG-derived coefficients
  * ([[Hashing.cmA]]/[[Hashing.cmB]]) — every count in the matrix is
  * therefore EXACTLY reproducible in DuckDB SQL, so the correctness
  * check is a full value-level replay of the sketch, not a tolerance
  * band.
  *
  * Blob layout: 4-byte big-endian d, 4-byte w, then d·w big-endian
  * longs, row-major.
  */
object GraftCountMin {
  val P: Long = Hashing.P31

  def h31(key: Long): Long =
    TextHash.md5Prefix60(UTF8String.fromString(key.toString)) % P

  def bucket(r: Int, keyH31: Long, w: Int): Int =
    (((Hashing.cmA(r) * keyH31 + Hashing.cmB(r)) % P) % w).toInt

  final class Buffer(val d: Int, val w: Int, val counts: Array[Long]) {
    def add(key: Long): Unit = {
      val h = h31(key)
      var r = 0
      while (r < d) { counts(r * w + bucket(r, h, w)) += 1; r += 1 }
    }
    def addInPlace(other: Buffer): Unit = {
      var i = 0
      while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    }
    def estimate(key: Long): Long = {
      val h = h31(key)
      var min = Long.MaxValue
      var r = 0
      while (r < d) {
        val c = counts(r * w + bucket(r, h, w))
        if (c < min) min = c
        r += 1
      }
      min
    }
    def toBlob: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 8 * counts.length)
      bb.putInt(d).putInt(w)
      counts.foreach(bb.putLong)
      bb.array()
    }
  }

  private def checkHeader(d: Int, w: Int, len: Int): Unit =
    if (d < 1 || d > 32 || w < 1 || w > (1 << 24) || len != 8 + 8L * d * w)
      throw new IllegalArgumentException(
        "cm_estimate: malformed count-min blob (expected header d in [1,32], " +
          s"w in [1,2^24] and 8+8*d*w bytes; got d=$d, w=$w, ${len} bytes) — " +
          "build the sketch with cm_build")

  def fromBlob(blob: Array[Byte]): Buffer = {
    if (blob.length < 8)
      checkHeader(-1, -1, blob.length)
    val bb = java.nio.ByteBuffer.wrap(blob)
    val d = bb.getInt(); val w = bb.getInt()
    checkHeader(d, w, blob.length)
    val counts = new Array[Long](d * w)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong(); i += 1 }
    new Buffer(d, w, counts)
  }

  def estimate(blob: Array[Byte], key: Long): Long = fromBlob(blob).estimate(key)

  /** Column API: aggregate long keys into a CM blob. */
  def build(key: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMinBuildAgg(ExpressionUtils.expression(key), depth, width)
        .toAggregateExpression())

  /** Column API: probe a sketch column/literal directly. */
  def estimateCol(sketch: Column, key: Column): Column =
    ExpressionUtils.column(CountMinEstimate(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(key)))

  /** Probe bound via scalar subquery — the one-row sketch frame executes
    * once and rides the probing stage as a constant (the
    * [[GraftBloom.mightContainScalar]] pattern; a joined-in blob would
    * re-copy the matrix out of every probed row's UnsafeRow).
    */
  def estimateScalar(sketchDf: DataFrame, key: Column): Column =
    ExpressionUtils.column(CountMinEstimate(
      ScalarSubquery(sketchDf.queryExecution.analyzed),
      ExpressionUtils.expression(key)))

  // ---- DuckDB twins -----------------------------------------------------

  /** `(r, a, b)` coefficient VALUES list for the replay. */
  def sqlCoefs(depth: Int): String =
    (0 until depth)
      .map(r => s"(${r}, ${Hashing.cmA(r)}, ${Hashing.cmB(r)})")
      .mkString("(VALUES ", ", ", ") AS coefs(r, a, b)")

  /** DuckDB twin of [[h31]] over a BIGINT expression. */
  def sqlH31(keyExpr: String): String =
    s"(${Hashing.sqlMd5Prefix60(s"CAST($keyExpr AS VARCHAR)")} % $P)"
}

/** `cm_build(key, depth, width)` — see [[GraftCountMin]]. */
case class CountMinBuildAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftCountMin.Buffer] with ExpectsInputTypes {

  require(depth >= 1 && depth <= 32, s"cm_build: depth must be in [1,32], got $depth")
  require(width >= 1 && width <= (1 << 24),
    s"cm_build: width must be in [1,2^24], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cm_build"

  override def createAggregationBuffer(): GraftCountMin.Buffer =
    new GraftCountMin.Buffer(depth, width, new Array[Long](depth * width))

  override def update(buf: GraftCountMin.Buffer, input: InternalRow): GraftCountMin.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: GraftCountMin.Buffer, other: GraftCountMin.Buffer): GraftCountMin.Buffer = {
    buf.addInPlace(other)
    buf
  }

  override def eval(buf: GraftCountMin.Buffer): Any = buf.toBlob

  override def serialize(buf: GraftCountMin.Buffer): Array[Byte] = buf.toBlob
  override def deserialize(bytes: Array[Byte]): GraftCountMin.Buffer =
    GraftCountMin.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinBuildAgg =
    copy(child = newChildren.head)
}

/** `cm_estimate(sketch, key)` — min across the d row counters. The blob
  * parses per evaluation; probe cardinality is distinct-keys, not
  * corpus rows, so allocation here is off the hot path by construction.
  */
case class CountMinEstimate(sketchExpr: Expression, keyExpr: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = sketchExpr
  override def right: Expression = keyExpr
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_estimate"

  override protected def nullSafeEval(blob: Any, key: Any): Any =
    GraftCountMin.estimate(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // static forwarder on the mirror class — MODULE$ does not compile
    // under Janino (the GraftBloom lesson)
    val cls = GraftCountMin.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (blob, key) =>
      s"${ev.value} = $cls.estimate($blob, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(sketchExpr = newLeft, keyExpr = newRight)
}
