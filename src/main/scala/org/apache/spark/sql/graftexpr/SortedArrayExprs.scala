package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: drop from a string array every element
  * present in a SORTED string array, preserving order and duplicates of
  * the survivors.
  *
  * This is the membership kernel of the cross-document boilerplate
  * removal (`CorpusPipeline.boilerplateCleanStream`): each document's
  * tile list is filtered against the corpus-wide boilerplate set, which
  * arrives as ONE sorted-array row (`sort_array(collect_list(...))`) on
  * the broadcast side of a 1-row cross join. The first implementation
  * used `filter(tl, t -> !array_contains(bp, t))` — an interpreted
  * higher-order function doing a LINEAR scan of the bp array per tile,
  * O(tiles·|bp|) lambda-dispatched work per row and the dominant cost
  * of `pipeline_boilerplate_tiles` (6.0 s of a 126 s suite at sf0.1).
  * Here the probe is a binary search over the sorted array —
  * O(tiles·log|bp|) — and the whole loop runs in one compiled call
  * from whole-stage-codegen'd Java, no per-element dispatch.
  *
  * Correctness contract: the needle side is compared with
  * `UTF8String.compareTo` (byte-lexicographic), the SAME ordering
  * `sort_array` applies to `StringType` — the search is sound iff the
  * right operand is sorted that way, which `boilerplateSet`
  * guarantees by construction. Null handling: null arrays propagate
  * null (BinaryExpression default); array ELEMENTS are assumed
  * non-null (tiles come from `split`; the bp set from `collect_list`,
  * which drops nulls).
  */
case class SortedArrayRemoveAll(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = left.dataType
  override def prettyName: String = "sorted_array_remove_all"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayRemoveAll.remove(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // codegen emits one static call — the loop itself is compiled Scala,
  // so the expression stays inside the whole-stage span (same stance as
  // Spark's own StaticInvoke-backed expressions)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftexpr.SortedArrayRemoveAll.remove($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayRemoveAll =
    copy(left = newLeft, right = newRight)
}

object SortedArrayRemoveAll {
  /** True iff `t` occurs in `sorted` (byte-lexicographically sorted). */
  private def contains(sorted: ArrayData, t: UTF8String): Boolean = {
    var lo = 0
    var hi = sorted.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = sorted.getUTF8String(mid).compareTo(t)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  def remove(arr: ArrayData, sorted: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null || !contains(sorted, t)) out.add(t)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Elements of `arr` not present in the sorted array `sortedSet`
    * (binary search, codegen'd).
    */
  def removeAll(arr: Column, sortedSet: Column): Column =
    ExpressionUtils.column(SortedArrayRemoveAll(
      ExpressionUtils.expression(arr), ExpressionUtils.expression(sortedSet)))
}
