package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode + reconstruct kernel.
  *
  * The PQ paths (`sim_pq_*`, `sim_ivfpq_*`) derive, per corpus vector,
  * the nearest codeword per subspace (exact integer argmin of
  * ‖sub(q) − sub(codeword)‖², lowest-cid tiebreak) and then score
  * against the CONCATENATED chosen codeword slices (the exact-integer
  * form of PQ's asymmetric-distance lookup). The original derivation
  * was a Catalyst HOF tower — `transform(sequence(...), m ->
  * element_at(array_sort(transform(cb, c -> struct(aggregate(zip_with(
  * slice(...), slice(...), ...)), ...))), 1).cid)` followed by a
  * `flatten(transform(codes, filter(cb, ...)))` reconstruction — every
  * level interpreted (HigherOrderFunction is CodegenFallback), costing
  * thousands of lambda dispatches and dozens of intermediate arrays per
  * row in the encode loop that IS the PQ family's per-vector cost.
  *
  * [[PqKernel.reconstruct]] fuses argmin and reconstruction into one
  * pass of primitive long arithmetic: M × codes × sub multiply-adds,
  * no intermediate allocation beyond the output array. Semantics are
  * pinned by PqExprSpec (kernel == HOF tower on the real corpus) and
  * the four `sim_pq*`/`sim_ivfpq*` DuckDB gates.
  *
  * Scale: narrow per-row kernel against a broadcast 1-row codebook —
  * the corpus never shuffles to learn its codes, same as before, just
  * two orders of magnitude fewer interpreter round-trips per vector.
  */
object PqKernel {
  /** Concatenation of the nearest codeword slice per subspace.
    *
    * @param q  the vector to encode, length >= m * sub
    * @param cb codebook: array of struct(cid: long, cv: array<long>),
    *           every cv length >= m * sub
    */
  def reconstruct(q: ArrayData, cb: ArrayData, m: Int, sub: Int): ArrayData = {
    val nCodes = cb.numElements()
    // fail with the expression's name and the malformed shape, not a
    // raw getStruct(-1)/index crash deep in generated code: an empty
    // codebook has no argmin, and a short vector/codeword would read
    // past its end
    if (nCodes == 0) throw new IllegalArgumentException(
      "pq_reconstruct: empty codebook (no nearest codeword exists)")
    if (q.numElements() < m * sub) throw new IllegalArgumentException(
      s"pq_reconstruct: vector has ${q.numElements()} elements, geometry " +
        s"m=$m x sub=$sub needs ${m * sub}")
    val out = new Array[Long](m * sub)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var bestD = Long.MaxValue
      var bestCid = Long.MaxValue
      var bestIdx = -1
      var ci = 0
      while (ci < nCodes) {
        val row = cb.getStruct(ci, 2)
        val cid = row.getLong(0)
        val cv = row.getArray(1)
        if (cv.numElements() < m * sub) throw new IllegalArgumentException(
          s"pq_reconstruct: codeword cid=$cid has ${cv.numElements()} elements, " +
            s"geometry m=$m x sub=$sub needs ${m * sub}")
        var d = 0L
        var j = 0
        while (j < sub) {
          val diff = q.getLong(off + j) - cv.getLong(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD || (d == bestD && cid < bestCid)) {
          bestD = d; bestCid = cid; bestIdx = ci
        }
        ci += 1
      }
      val cv = cb.getStruct(bestIdx, 2).getArray(1)
      var j = 0
      while (j < sub) {
        out(off + j) = cv.getLong(off + j)
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }
}

/** PQ nearest-codeword reconstruction of a quantized vector against a
  * codebook column (see [[PqKernel.reconstruct]]).
  */
case class PqReconstruct(left: Expression, right: Expression, m: Int, sub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(m >= 1 && sub >= 1, s"pq_reconstruct: bad geometry m=$m sub=$sub")
  override def inputTypes: Seq[AbstractDataType] = Seq(
    ArrayType(LongType),
    ArrayType(StructType(Seq(
      StructField("cid", LongType),
      StructField("cv", ArrayType(LongType))))))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override def nullSafeEval(q: Any, cb: Any): Any =
    PqKernel.reconstruct(q.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, cb) =>
      s"org.apache.spark.sql.graftexpr.PqKernel.reconstruct($q, $cb, $m, $sub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqReconstruct =
    copy(left = newLeft, right = newRight)
}
