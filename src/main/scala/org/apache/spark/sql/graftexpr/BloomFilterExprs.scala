package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter join pre-filter: the runtime-filter pattern for
  * fact-to-fact joins at scale, as a first-class expression pair.
  *
  * `bloom_build(key, numBits, numHashes)` aggregates the SMALL side's
  * join keys into one bitset (partial buffers merge by OR, so the build
  * is one map-side pass plus a tiny final reduce); the resulting blob —
  * kilobytes, independent of the big side — rides a broadcast to every
  * scan task, where `bloom_might_contain(bloom, key)` drops most
  * non-matching rows BEFORE the join's shuffle. No false negatives, so
  * the subsequent exact join keeps the result identical (the oracle for
  * the demo query is the plain join); false positives only cost the
  * bytes they ship. At 100 TB this converts "shuffle every fact row" to
  * "shuffle the ~selectivity fraction that can match" — the same shape
  * Spark's own `spark.sql.optimizer.runtime.bloomFilter` injects, made
  * explicit so it applies to any join the optimizer can't see through
  * (custom operators, pre-aggregated frames, cross-job reuse of one
  * built filter).
  *
  * Reference behavior anchored: the dim-route lookup discards unmatched
  * records before any downstream work
  * (gmall-realtime/src/main/java/com/yb/gmall/app/function/TableProcessFunction.java:163-176
  * drops "no such key" records at the head of the stream) — this is the
  * scale-out form of that early-discard for shuffled joins.
  *
  * Layout of the blob: 4-byte big-endian hash count `k`, then the
  * bitset, bit `j` at byte `4 + (j >> 3)`, mask `1 << (j & 7)`.
  * Membership reads bits straight off the byte array — no
  * deserialization per row, so probe codegen stays allocation-free.
  * Hashing: two independent 64-bit avalanche mixes (splitmix64
  * finalizer) combined by double hashing `h1 + i*h2`.
  */
object GraftBloom {

  /** splitmix64 finalizer — a public-domain avalanche mix. */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def bitPos(value: Long, i: Int, numBits: Int): Int = {
    val h1 = mix64(value)
    val h2 = mix64(value ^ 0x9e3779b97f4a7c15L) | 1L // odd → full period
    (((h1 + i * h2) >>> 1) % numBits).toInt
  }

  /** The two splitmix64 multiply constants as unsigned decimal literals
    * for DuckDB oracle replays (0xbf58476d1ce4e5b9, 0x94d049bb133111eb).
    */
  val SqlMixC1 = "13787848793156543929"
  val SqlMixC2 = "10723151780598845931"

  /** DuckDB expression for `a * b mod 2^64` over UBIGINT operands. The
    * naive HUGEINT product overflows INT128 (two 64-bit factors reach
    * 2^128), so the left factor is split into 32-bit halves:
    * `(hi(a)·b mod 2^32)·2^32 + lo(a)·b`, every intermediate ≤ 2^96.
    */
  def sqlMulMod64(a: String, b: String): String =
    s"CAST(((CAST(($a) >> 32 AS HUGEINT) * $b) % 4294967296 * 4294967296" +
      s" + CAST(($a) & 4294967295 AS HUGEINT) * $b) % 18446744073709551616 AS UBIGINT)"

  /** DuckDB CTE chain computing [[mix64]] bit-exactly: emits three
    * SELECT steps `<p>1`, `<p>2`, `<p>3` over a source relation exposing
    * UBIGINT column `z0` plus `carry` columns; `<p>3` has `hash`.
    */
  def sqlMix64Ctes(prefix: String, src: String, carry: String): String =
    s"""${prefix}1 AS (SELECT $carry, ${sqlMulMod64("xor(z0, z0 >> 30)", SqlMixC1)} AS z1 FROM $src),
       |${prefix}2 AS (SELECT $carry, ${sqlMulMod64("xor(z1, z1 >> 27)", SqlMixC2)} AS z2 FROM ${prefix}1),
       |${prefix}3 AS (SELECT $carry, xor(z2, z2 >> 31) AS hash FROM ${prefix}2)""".stripMargin

  /** Reject blobs that cannot have come from [[BloomBuildAgg]] with a
    * named error instead of an index crash — `bloom_might_contain` is
    * SQL-registered, so arbitrary BINARY values can reach this.
    */
  private def checkBlob(blob: Array[Byte], k: Int): Unit =
    if (blob.length < 5 || k < 1 || k > 16)
      throw new IllegalArgumentException(
        "bloom_might_contain: malformed bloom blob (expected >=5 bytes with " +
          s"a hash count in [1,16]; got ${blob.length} bytes, k=$k) — " +
          "build the filter with bloom_build")

  def contains(blob: Array[Byte], value: Long): Boolean = {
    val k =
      if (blob.length < 4) -1
      else ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
        ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    checkBlob(blob, k)
    val numBits = (blob.length - 4) * 8
    var i = 0
    while (i < k) {
      val j = bitPos(value, i, numBits)
      if ((blob(4 + (j >> 3)) & (1 << (j & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Mutable build buffer: a byte bitset plus the hash count. */
  final class Buffer(val k: Int, val bits: Array[Byte]) {
    def add(value: Long): Unit = {
      val numBits = bits.length * 8
      var i = 0
      while (i < k) {
        val j = bitPos(value, i, numBits)
        bits(j >> 3) = (bits(j >> 3) | (1 << (j & 7))).toByte
        i += 1
      }
    }
    def orInPlace(other: Buffer): Unit = {
      var i = 0
      while (i < bits.length) { bits(i) = (bits(i) | other.bits(i)).toByte; i += 1 }
    }
    def toBlob: Array[Byte] = {
      val out = new Array[Byte](4 + bits.length)
      out(0) = (k >>> 24).toByte; out(1) = (k >>> 16).toByte
      out(2) = (k >>> 8).toByte; out(3) = k.toByte
      System.arraycopy(bits, 0, out, 4, bits.length)
      out
    }
  }

  def fromBlob(blob: Array[Byte]): Buffer = {
    val k =
      if (blob.length < 4) -1
      else ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
        ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    checkBlob(blob, k)
    val bits = new Array[Byte](blob.length - 4)
    System.arraycopy(blob, 4, bits, 0, bits.length)
    new Buffer(k, bits)
  }

  /** Column API: aggregate long keys into a bloom blob. */
  def build(key: Column, numBits: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      BloomBuildAgg(ExpressionUtils.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: probe a bloom blob (no false negatives). */
  def mightContain(bloom: Column, key: Column): Column =
    ExpressionUtils.column(BloomMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(key)))

  /** Probe against the single blob `bloomDf` produces (one row, one
    * BINARY column), bound via a SCALAR SUBQUERY — the runtime-filter
    * shape Spark's own `InjectRuntimeFilter` plans. The subquery
    * executes once and its result is inlined as a constant reference in
    * the probing stage, so the blob is materialized once per executor.
    * Joining the blob in instead (`crossJoin(broadcast(blobDf))`) puts
    * the bytes INSIDE every probed row, and each row's `getBinary` then
    * copies the full blob out of the UnsafeRow — ~20 GB of memcpy per
    * 600k probed rows at 32 KB blobs, which benchmarked 8× slower than
    * the plain un-prefiltered join it was meant to beat.
    */
  def mightContainScalar(bloomDf: DataFrame, key: Column): Column =
    ExpressionUtils.column(BloomMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      ExpressionUtils.expression(key)))
}

/** `bloom_build(key, numBits, numHashes)` — see [[GraftBloom]]. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftBloom.Buffer] with ExpectsInputTypes {

  require(numBits >= 8 && numBits % 8 == 0,
    s"bloom_build: numBits must be a positive multiple of 8, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_build: numHashes must be in [1,16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): GraftBloom.Buffer =
    new GraftBloom.Buffer(numHashes, new Array[Byte](numBits / 8))

  override def update(buf: GraftBloom.Buffer, input: InternalRow): GraftBloom.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: GraftBloom.Buffer, other: GraftBloom.Buffer): GraftBloom.Buffer = {
    buf.orInPlace(other)
    buf
  }

  override def eval(buf: GraftBloom.Buffer): Any = buf.toBlob

  override def serialize(buf: GraftBloom.Buffer): Array[Byte] = buf.toBlob
  override def deserialize(bytes: Array[Byte]): GraftBloom.Buffer =
    GraftBloom.fromBlob(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

/** `bloom_might_contain(bloom, key)` — bit probes straight off the blob
  * bytes, fully codegen'd (stays inside WholeStageCodegen, zero
  * allocation per row).
  */
case class BloomMightContain(bloomExpr: Expression, keyExpr: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = bloomExpr
  override def right: Expression = keyExpr
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(blob: Any, key: Any): Any =
    GraftBloom.contains(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The mirror class (name without '$') exposes static forwarders; the
    // MODULE$ field lives only on the module class. Call the forwarder —
    // `GraftBloom.MODULE$` does not compile under Janino.
    val bloomCls = GraftBloom.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (blob, key) =>
      s"${ev.value} = $bloomCls.contains($blob, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomExpr = newLeft, keyExpr = newRight)
}
