package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Hashing

/** Codegen'd text-hashing kernels for the dedup/LSH operator family.
  *
  * The oracle-portable hash primitive is the 60-bit md5 hex prefix
  * ([[graft.functions.Hashing.md5Prefix60]]). Composed from built-ins it
  * is `conv(substring(md5(c),1,15),16,10) cast bigint` — four string
  * allocations per value (hex encode, substring, base-conv string,
  * decimal parse). These expressions compute the same values directly
  * from the digest bytes in one pass, and fuse the per-document loops
  * (shingling, MinHash signature, SimHash fingerprint) that previously
  * ran as explode → shuffle → wide aggregations.
  *
  * Scale rationale: each is a NARROW per-row kernel, so the dedup
  * pipelines shuffle only candidate keys (band signatures, bit blocks) —
  * one row per document crosses the wire, never the token stream. At
  * 100 TB the token explode was the dominant shuffle; now it never
  * leaves the scan stage.
  *
  * Values are bit-identical to the composed forms (proven in
  * TextHashSpec), so the DuckDB oracle SQL generated from
  * [[graft.functions.Hashing]] constants is unchanged.
  */
object TextHash {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 as a long = high 60 bits of the first 8
    * digest bytes (big-endian, dropping the 16th nibble).
    */
  def md5Prefix60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    val hi =
      ((bytes(0) & 0xffL) << 56) | ((bytes(1) & 0xffL) << 48) |
      ((bytes(2) & 0xffL) << 40) | ((bytes(3) & 0xffL) << 32) |
      ((bytes(4) & 0xffL) << 24) | ((bytes(5) & 0xffL) << 16) |
      ((bytes(6) & 0xffL) << 8) | (bytes(7) & 0xffL)
    hi >>> 4
  }

  private val Space = UTF8String.fromString(" ")

  /** Rolling n-word shingles: element i = tokens[i..i+n-1] joined by a
    * single space (null tokens skipped, matching concat_ws). Fewer than
    * n tokens → empty array (the explicit guard the composed form needed
    * because Spark's sequence(0,-1) is descending).
    */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val num = arr.numElements()
    if (num < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](num - n + 1)
    var i = 0
    while (i <= num - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash permutation coefficients, shared with the oracle SQL gen. */
  private val A: Array[Long] = Array.tabulate(64)(Hashing.minhashA)
  private val B: Array[Long] = Array.tabulate(64)(Hashing.minhashB)
  private val P = Hashing.P31

  /** MinHash signature over a shingle array in one pass:
    * sig[j] = min over shingles of (a_j * (md5p60 % P31) + b_j) % P31.
    * Duplicate shingles cannot change a min, so the input need not be
    * distinct. Empty input → NULL (a fingerprint of nothing is
    * undefined; matches the groupBy form where such docs had no rows).
    */
  def minhashSig(arr: ArrayData, numPerm: Int): ArrayData = {
    if (arr.numElements() == 0) return null
    val mins = Array.fill(numPerm)(P)
    val num = arr.numElements()
    var i = 0
    while (i < num) {
      if (!arr.isNullAt(i)) {
        val h = md5Prefix60(arr.getUTF8String(i)) % P
        var j = 0
        while (j < numPerm) {
          val v = (A(j) * h + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** SimHash fingerprint over a token array in one pass: per token the
    * 60-bit hash votes on each of `bits` positions; bit i of the result
    * is set iff more than half the tokens have bit i set
    * (2·count > n, with n counting all elements — the count(lit(1))
    * semantics of the aggregation form). Empty input → NULL (handled in
    * the expression wrapper; matches the groupBy form).
    */
  def simhashFp(arr: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val num = arr.numElements()
    var i = 0
    while (i < num) {
      if (!arr.isNullAt(i)) {
        val h = md5Prefix60(arr.getUTF8String(i))
        var b = 0
        while (b < bits) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (2L * counts(b) > num) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** 60-bit md5-prefix hash of a string (see [[TextHash.md5Prefix60]]). */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(v: Any): Any =
    TextHash.md5Prefix60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TextHash.md5Prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

/** Rolling n-word shingles of a token array (see [[TextHash.wordShingles]]). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_shingles: shingle width must be >= 1, got $n")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    TextHash.wordShingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TextHash.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** MinHash signature array of a shingle array (see [[TextHash.minhashSig]]).
  * NULL (not a sentinel array) on an empty shingle array.
  */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numPerm >= 1 && numPerm <= 64,
    s"minhash_sig: numPerm must be in [1, 64] (coefficient table size), got $numPerm")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input → null
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    TextHash.minhashSig(v.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = org.apache.spark.sql.graftexpr.TextHash.minhashSig($c, $numPerm);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SimHash fingerprint of a token array (see [[TextHash.simhashFp]]).
  * NULL on an empty token array.
  */
case class SimHashFp(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 64,
    s"simhash_fp: bits must be in [1, 64] (long fingerprint), got $bits")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty input → null
  override def prettyName: String = "simhash_fp"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else TextHash.simhashFp(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |if ($c.numElements() == 0) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = org.apache.spark.sql.graftexpr.TextHash.simhashFp($c, $bits);
       |}
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}
