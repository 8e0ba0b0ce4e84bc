package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused centroid ranking kernel for the k-means / IVF / SemDeDup
  * family.
  *
  * Every member of that family scores each corpus vector against a
  * broadcast centroid array and keeps the best one or few: Lloyd
  * assignment and inertia (argmin of `|q|² − 2·q·c + |c|²`), the
  * simplified silhouette (top-2 of the same score), IVF cell
  * assignment and multi-cell probing (`|c|² − 2·q·c`, |q|² constant
  * per row), and SemDeDup's cell partition. The original derivation
  * was `array_sort(transform(cents, c -> struct(<score>, cid)))` —
  * `ArrayTransform`/`ArraySort` are CodegenFallback, so the per-row
  * loop over K centroids ran interpreted (per-element lambda dispatch
  * plus a K-struct array allocation per corpus row), with the
  * codegen'd `long_array_dot` trapped INSIDE the interpreted lambda.
  * That tower sat under eight registered queries
  * (cluster_kmeans_assign/inertia/silhouette/centroids via the Lloyd
  * steps, sim_ivf_topk/recall, sim_ivfpq via the shared cells,
  * dedup_semantic).
  *
  * [[CentroidKernel.rank]] fuses score + selection into one pass of
  * primitive long arithmetic: per centroid one dot product
  * (shorter-length-wins, the [[LongArrayDot]] contract; a null
  * element/struct/field raises a NAMED error at its read site — see
  * [[CentroidKernel.rank]] — since the registered SQL function admits
  * containsNull inputs the in-repo quantized producers never emit), score
  * `(addQNorm ? |q|² : 0) − 2·dot + cnorm2` in wrapping Long math
  * (identical to the SQL expression's codegen arithmetic), then the
  * `k` smallest by `(s, cid)` — exactly `slice(array_sort(...), 1, k)`
  * of the tower (struct sort is lexicographic by field). Output field
  * names are `(s, cid)`; the k-means consumers alias `s` to their
  * `d2`/`dist2` protocol names at the select edge, so oracle column
  * contracts are untouched.
  *
  * Scale: narrow per-row kernel against a broadcast centroid row — the
  * corpus never shuffles to learn its cell/cluster, same plan as
  * before, minus the interpreted island. Parity pinned by
  * CentroidExprSpec (kernel == HOF tower on the real corpus and edge
  * shapes) plus the eight consumers' DuckDB oracle gates.
  */
object CentroidKernel {
  /** The `k` best (score, cid) structs, ascending by (score, cid).
    *
    * Null elements fail with the expression's name instead of an NPE
    * in `getStruct`/`getArray` or an undefined-bytes read through
    * `UnsafeArrayData.getLong` (the [[PqKernel.reconstruct]]
    * malformed-input precedent): the in-repo consumers never produce
    * nulls, but `centroid_rank` is a registered SQL function whose
    * typecheck admits containsNull arrays.
    */
  def rank(q: ArrayData, cents: ArrayData, k: Int, addQNorm: Boolean): ArrayData = {
    val n = cents.numElements()
    val dim = q.numElements()
    // null guards sit AT each read site (never a separate pre-scan
    // pass): only elements actually read can hit the undefined-bytes /
    // NPE hazard, and an always-false branch fused into the existing
    // loop is predicted free while an extra O(dim) scan per centroid
    // is not — this is the engine's hottest per-row loop
    def nullAt(what: String, pos: Int): Nothing =
      throw new IllegalArgumentException(
        s"centroid_rank: null $what at position $pos")
    var qnorm = 0L
    if (addQNorm) {
      var i = 0
      while (i < dim) {
        if (q.isNullAt(i)) nullAt("vector element", i)
        val v = q.getLong(i); qnorm += v * v; i += 1
      }
    }
    val ss = new Array[Long](n)
    val ids = new Array[Long](n)
    var ci = 0
    while (ci < n) {
      if (cents.isNullAt(ci)) nullAt("centroid struct", ci)
      val row = cents.getStruct(ci, 3)
      if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2))
        nullAt("centroid struct field (cid/cv/cnorm2)", ci)
      val cv = row.getArray(1)
      val m = math.min(dim, cv.numElements())
      var dot = 0L
      var j = 0
      while (j < m) {
        if (q.isNullAt(j)) nullAt("vector element", j)
        if (cv.isNullAt(j)) nullAt(s"centroid cid=${row.getLong(0)} element", j)
        dot += q.getLong(j) * cv.getLong(j); j += 1
      }
      ss(ci) = qnorm - 2L * dot + row.getLong(2)
      ids(ci) = row.getLong(0)
      ci += 1
    }
    val take = math.min(k, n)
    // selection by repeated min: K is small (8/16 cells) and take is
    // 1, 2 or NProbe — O(take·n) beats sorting allocations per row
    val out = new Array[Any](take)
    val used = new Array[Boolean](n)
    var t = 0
    while (t < take) {
      var best = -1
      var i = 0
      while (i < n) {
        if (!used(i) && (best < 0 || ss(i) < ss(best) ||
            (ss(i) == ss(best) && ids(i) < ids(best)))) best = i
        i += 1
      }
      used(best) = true
      out(t) = new GenericInternalRow(Array[Any](ss(best), ids(best)))
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** SQL-facing wrapper of [[CentroidKernel.rank]]:
  * `centroid_rank(q, cents, k, add_qnorm)` over
  * `array<struct<cid: bigint, cv: array<bigint>, cnorm2: bigint>>`.
  */
case class CentroidRank(left: Expression, right: Expression,
    k: Int, addQNorm: Boolean)
    extends BinaryExpression {
  require(k >= 1, s"centroid_rank: k must be >= 1, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == ArrayType(LongType, containsNull = false) ||
      left.dataType == ArrayType(LongType, containsNull = true)
    val centsOk = right.dataType match {
      case ArrayType(s: StructType, _) if s.length == 3 =>
        s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] &&
          s(1).dataType.asInstanceOf[ArrayType].elementType == LongType &&
          s(2).dataType == LongType
      case _ => false
    }
    if (ok && centsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "centroid_rank expects (array<bigint>, array<struct<bigint, array<bigint>, bigint>>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "centroid_rank"

  override def nullSafeEval(q: Any, cents: Any): Any =
    CentroidKernel.rank(q.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], k, addQNorm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c) =>
      s"org.apache.spark.sql.graftexpr.CentroidKernel.rank($q, $c, $k, $addQNorm)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidRank =
    copy(left = newLeft, right = newRight)
}
