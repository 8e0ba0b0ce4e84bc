package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Morton (Z-order) interleave for multi-dimensional data layout.
  *
  * Linear sort clusters ONE column: a layout sorted by `a` prunes
  * row-groups for predicates on `a` and nothing else. The Z-value
  * interleaves the bits of two keys, so sorting by it clusters BOTH —
  * a range predicate on either column (or both) maps to a bounded set
  * of Z-ranges, and parquet min/max row-group stats prune files for
  * 2-D slices of a 100 TB table. This is the layout trick behind
  * Delta/Iceberg `ZORDER BY`, here as a first-class engine expression
  * (the writer side is [[graft.operators.Bucketing.writeZOrdered]]).
  *
  * Bit spreading is the standard magic-mask sequence (Morton codes via
  * parallel bit deposit — public-domain bit-twiddling); each input is
  * masked to its low 31 bits so the interleaved result stays positive
  * in a signed 64-bit integer for BOTH engines (DuckDB `<<` on BIGINT
  * has no unsigned escape hatch). The identical arithmetic is emitted
  * as oracle SQL by [[ZOrder.sqlZValue2]] — engine parity is per-row
  * value-checked, not assumed.
  */
object ZOrder {
  /** (shift, mask) steps spreading 31 bits to even positions. */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  val Low31 = 0x7FFFFFFFL

  def spread(v: Long): Long = {
    var x = v & Low31
    var i = 0
    while (i < SpreadSteps.length) {
      val (sh, m) = SpreadSteps(i)
      x = (x | (x << sh)) & m
      i += 1
    }
    x
  }

  /** Z-value of two keys (low 31 bits each): x at even bits, y at odd. */
  def zValue2(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** DuckDB twin of [[spread]] over a SQL expression. */
  def sqlSpread(expr: String): String =
    SpreadSteps.foldLeft(s"(CAST($expr AS BIGINT) & $Low31)") {
      case (e, (sh, m)) => s"((($e) | (($e) << $sh)) & $m)"
    }

  /** DuckDB twin of [[zValue2]]. */
  def sqlZValue2(xExpr: String, yExpr: String): String =
    s"(${sqlSpread(xExpr)} | (${sqlSpread(yExpr)} << 1))"
}

/** Z-value of two BIGINT columns (see [[ZOrder.zValue2]]). */
case class ZValue2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.zValue2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftexpr.ZOrder.zValue2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue2 =
    copy(left = newLeft, right = newRight)
}
