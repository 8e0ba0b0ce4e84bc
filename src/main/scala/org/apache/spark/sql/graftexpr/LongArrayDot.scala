package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object GraftExpressions {
  /** Dot product of two array<bigint> columns (codegen'd). */
  def longArrayDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      LongArrayDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Squared L2 norm of an array<bigint> column. */
  def longArrayNormSq(a: Column): Column = longArrayDot(a, a)

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

  /** Morton Z-value of two bigint columns (codegen'd). */
  def zValue2(x: Column, y: Column): Column =
    ExpressionUtils.column(
      ZValue2(ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}
