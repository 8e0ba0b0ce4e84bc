package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Custom Catalyst expression: integer dot product of two BIGINT arrays.
  *
  * The hot loop of the embedding operators (quantized cosine: dot, norm)
  * was first written with `aggregate(zip_with(...))` higher-order
  * functions, which execute interpreted per element — ~40× slower across
  * the 2M-pair near-dup join. This expression participates in whole-stage
  * codegen: the generated Java is a tight primitive loop over the two
  * `ArrayData`, no lambda dispatch, no boxing.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the usual packaging for
  * third-party Catalyst expressions.
  *
  * Null semantics: null array → null (BinaryExpression default); array
  * elements are assumed non-null (quantized vectors come from
  * `transform` over non-null floats). Lengths may differ — the shorter
  * bound wins, matching `zip_with`'s truncation on these inputs.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Static kernel shared by [[LshBucketPack]]'s interpreted and codegen
  * paths — the plane-weight matrix is derived once per (table count ×
  * plane count) from the closed-form [[graft.functions.Hashing.planeWeight]]
  * stream and cached per JVM.
  */
object LshBucketKernel {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Long]]]

  private def planes(n: Int): Array[Array[Long]] =
    planeCache.computeIfAbsent(n, _ =>
      Array.tabulate(n, 64)((p, i) => graft.functions.Hashing.planeWeight(p, i)))

  /** Bucket id per table: bit p of table t's bucket is set iff
    * dot(q, plane[t·planesPerTable + p]) > 0 — bit-identical to the
    * composed per-plane `when(long_array_dot(q, lit) > 0, 1<<p)` sum.
    */
  def pack(q: ArrayData, numTables: Int, planesPerTable: Int): ArrayData = {
    val w = planes(numTables * planesPerTable)
    val dim = math.min(q.numElements(), 64)
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val row = w(t * planesPerTable + p)
        var s = 0L
        var i = 0
        while (i < dim) { s += q.getLong(i) * row(i); i += 1 }
        if (s > 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** All LSH bucket ids of a quantized vector in ONE kernel call:
  * `array(bucket_0, …, bucket_{numTables-1})`, table t hashed by planes
  * `t·planesPerTable … t·planesPerTable+planesPerTable-1` of the shared
  * closed-form weight stream.
  *
  * Why an expression and not the composed per-plane form: the multi-table
  * bucketing expands to numTables × planesPerTable separate
  * `long_array_dot(q, <64-long literal>)` sub-expressions — 56 inlined
  * codegen loops at sf1's plane count, which pushes the generated consume
  * method past the JIT's compilable-method budget and the whole stage
  * drops to interpreted bytecode (measured 4.4 s for a 20k-row bucket
  * projection; this kernel computes the identical values in one
  * pre-compiled loop nest). Values are bit-identical FOR NON-NULL
  * INPUTS, so the generated DuckDB oracle SQL (which replays the same
  * weight stream as list literals) is unchanged. NULL semantics differ
  * from the composed form deliberately: a NULL vector returns NULL
  * (standard UnaryExpression propagation, pinned by ArrayOpsSpec),
  * where the per-plane `when(dot > 0, …).otherwise(0)` composition
  * mapped NULL to bucket 0 — a silent all-NULLs-collide bucket. The
  * engine's quantized vectors are never null; SQL callers of the
  * registered function get the honest NULL.
  */
case class LshBucketPack(child: Expression, numTables: Int, planesPerTable: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numTables >= 1 && planesPerTable >= 1 && planesPerTable <= 63,
    s"lsh_bucket_pack: need numTables >= 1 and 1 <= planesPerTable <= 63, " +
      s"got ($numTables, $planesPerTable)")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bucket_pack"

  override def nullSafeEval(v: Any): Any =
    LshBucketKernel.pack(v.asInstanceOf[ArrayData], numTables, planesPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = org.apache.spark.sql.graftexpr.LshBucketKernel.pack(
       |  $c, $numTables, $planesPerTable);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): LshBucketPack =
    copy(child = newChild)
}

object GraftExpressions {
  /** Dot product of two array<bigint> columns (codegen'd). */
  def longArrayDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Squared L2 norm of an array<bigint> column. */
  def longArrayNormSq(a: Column): Column = longArrayDot(a, a)

  /** All LSH bucket ids of a quantized vector (codegen'd, one call). */
  def lshBucketPack(q: Column, numTables: Int, planesPerTable: Int): Column =
    ExpressionUtils.column(
      LshBucketPack(ExpressionUtils.expression(q), numTables, planesPerTable))

  /** 60-bit md5-prefix hash of a string column (codegen'd). */
  def md5Prefix60(c: Column): Column =
    ExpressionUtils.column(Md5Prefix60(ExpressionUtils.expression(c)))

  /** Rolling n-word shingles of a token-array column (codegen'd). */
  def wordShingles(c: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(c), n))

  /** MinHash signature array of a shingle-array column (codegen'd). */
  def minhashSig(c: Column, numPerm: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(c), numPerm))

  /** SimHash fingerprint of a token-array column (codegen'd). */
  def simhashFp(c: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashFp(ExpressionUtils.expression(c), bits))

  /** NFC + control-strip + space-collapse of a string column (codegen'd). */
  def normalizeText(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))

  /** Lowercase alnum-run tokenizer of a string column (codegen'd). */
  def tokenize(c: Column): Column =
    ExpressionUtils.column(Tokenize(ExpressionUtils.expression(c)))

  /** Fixed-width space-joined tiles of a token-array column (codegen'd). */
  def wordTiles(c: Column, tileLen: Int): Column =
    ExpressionUtils.column(WordTiles(ExpressionUtils.expression(c), tileLen))

  /** One-pass first-occurrence tile-dedup stats struct (codegen'd). */
  def tileDedupStats(c: Column): Column =
    ExpressionUtils.column(TileDedupStats(ExpressionUtils.expression(c)))

  /** Rank-sorted string projection of array<struct<rank, value>>
    * (codegen'd) — replaces `transform(array_sort(...), x -> x.v)`.
    */
  def structSortProject(c: Column): Column =
    ExpressionUtils.column(StructSortProject(ExpressionUtils.expression(c)))

  /** Consecutive (w1, w2) token bigram structs (codegen'd). */
  def tokenBigrams(c: Column): Column =
    ExpressionUtils.column(TokenBigrams(ExpressionUtils.expression(c)))

  /** Span-removal document rebuild: (tokens, sorted removal-gram
    * starts, k) → struct(n_tokens, n_removed, clean_text) (codegen'd).
    */
  def spanRemove(toks: Column, starts: Column, k: Int): Column =
    ExpressionUtils.column(SpanRemove(
      ExpressionUtils.expression(toks), ExpressionUtils.expression(starts), k))

  /** k best (s, cid) centroid scores of a quantized vector (codegen'd)
    * — replaces `slice(array_sort(transform(cents, ...)), 1, k)`.
    */
  def centroidRank(q: Column, cents: Column, k: Int, addQNorm: Boolean): Column =
    ExpressionUtils.column(CentroidRank(
      ExpressionUtils.expression(q), ExpressionUtils.expression(cents), k, addQNorm))

  /** One-pass per-doc token statistics struct (codegen'd). */
  def tokenProfile(c: Column, stopwords: Seq[String]): Column =
    ExpressionUtils.column(TokenProfile(ExpressionUtils.expression(c), stopwords))

  /** RAKE candidate phrases: maximal stopword-free token runs joined
    * by ' ' (codegen'd).
    */
  def rakePhrases(c: Column, stopwords: Seq[String]): Column =
    ExpressionUtils.column(RakePhrases(ExpressionUtils.expression(c), stopwords))

  /** Phrase-adjacency stats struct of a token array (codegen'd). */
  def phraseHits(c: Column, w1: String, w2: String): Column =
    ExpressionUtils.column(PhraseHits(ExpressionUtils.expression(c), w1, w2))

  /** Two-term proximity stats struct of a token array (codegen'd). */
  def proxStats(c: Column, t1: String, t2: String, window: Int): Column =
    ExpressionUtils.column(ProxStats(ExpressionUtils.expression(c), t1, t2, window))

  /** LIX readability counts struct of a raw text column (codegen'd). */
  def lixCounts(c: Column, longLen: Int): Column =
    ExpressionUtils.column(LixCounts(ExpressionUtils.expression(c), longLen))

  /** Int8 quantization stats struct of a long vector (codegen'd). */
  def int8QuantStats(c: Column): Column =
    ExpressionUtils.column(Int8QuantStats(ExpressionUtils.expression(c)))

  /** PQ nearest-codeword reconstruction of a vector (codegen'd). */
  def pqReconstruct(q: Column, cb: Column, m: Int, sub: Int): Column =
    ExpressionUtils.column(PqReconstruct(
      ExpressionUtils.expression(q), ExpressionUtils.expression(cb), m, sub))

  /** floor(x * factor) scalar quantization of a float array (codegen'd). */
  def quantizeFloats(c: Column, factor: Long): Column =
    ExpressionUtils.column(QuantizeFloats(ExpressionUtils.expression(c), factor))

  /** Positionwise equality count of two long arrays (codegen'd). */
  def longArrayEqCount(a: Column, b: Column): Column =
    ExpressionUtils.column(LongArrayEqCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Basket a<b pairs + per-part and total markers (codegen'd). */
  def basketPairsMarkers(c: Column): Column =
    ExpressionUtils.column(BasketPairsMarkers(ExpressionUtils.expression(c)))

  /** Morton Z-value of two bigint columns (codegen'd). */
  def zValue2(x: Column, y: Column): Column =
    ExpressionUtils.column(
      ZValue2(ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}
