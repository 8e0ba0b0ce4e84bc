package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector-column kernels for the embedding and minhash hot paths.
  *
  * [[VecKernel.quantizeFloats]] is the scalar quantizer
  * `transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * F) AS
  * BIGINT))` as one codegen'd pass. `Dedup.quantized` is the base of
  * EVERY embedding consumer (the dedup_embedding family, all sim_*
  * paths, the k-NN graph and its downstream components/classify
  * queries), and `transform` is a CodegenFallback HigherOrderFunction —
  * so the interpreted lambda sat under roughly twenty queries' scans.
  *
  * [[VecKernel.longArrayEqCount]] is the minhash signature-agreement
  * count `size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))` as one
  * loop — evaluated once per CANDIDATE PAIR in the banded minhash join
  * (the shared pair set eval_split_leakage / threshold sweep / the
  * pipeline family all consume) and in the incremental-snapshot dedup.
  * Per the original's zip_with-to-longer-length semantics, positions
  * past the shorter array (and null elements) compare to null and are
  * dropped by the filter, so the kernel counts equal non-null positions
  * up to the SHORTER length.
  *
  * Both are narrow per-row kernels: no shuffle, no state, inlined into
  * whole-stage codegen. Parity is pinned by VecExprSpec (kernel == HOF
  * form on the real corpus plus edge shapes) and the oracle gates of
  * every consumer.
  */
object VecKernel {
  /** floor(x * factor) per float element, widened through double —
    * bit-identical to the SQL `CAST(floor(CAST(x AS DOUBLE) * factor)
    * AS BIGINT)` INCLUDING Spark 4's default-ANSI failure mode: a NaN
    * or out-of-long-range product raises (named after this expression)
    * exactly where the ANSI cast would raise CAST_INVALID_INPUT /
    * CAST_OVERFLOW, instead of silently saturating through
    * `Double.toLong`. Null elements stay null.
    */
  def quantizeFloats(arr: ArrayData, factor: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out(i) = null
      else {
        val d = math.floor(arr.getFloat(i).toDouble * factor)
        // d in [-2^63, 2^63) converts exactly; 9.223372036854776E18 is
        // 2^63 as a double, so >= catches +Inf and the overflow edge
        if (d.isNaN || d < -9.223372036854776e18 || d >= 9.223372036854776e18)
          throw new ArithmeticException(
            s"quantize_floats: element ${arr.getFloat(i)} * $factor = $d " +
              "is not representable as BIGINT (ANSI cast would overflow)")
        out(i) = d.toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All a<b index pairs of `parts` as (a, b) structs, followed by one
    * (p, null) marker per element and one (null, null) total marker —
    * the tagged-explode source of the basket-lift single-pass plan,
    * built in one allocation. The HOF form
    * (`concat(flatten(transform(parts, (p, i) -> transform(slice(parts,
    * i + 2, ...), ...))), ...)`) allocated k slice arrays per basket
    * (O(k²) intermediate arrays) and dispatched an interpreted lambda
    * per emitted struct; same output, same order.
    */
  def pairsAndMarkers(parts: ArrayData): ArrayData = {
    val k = parts.numElements()
    // size the output in Long: at k >= ~65536 the Int expression
    // k*(k-1)/2 overflows to a wrong/negative array size. A basket that
    // large is also a denormalized-input bug worth naming — the lift
    // plan's cost is quadratic in basket width by definition.
    val sz = k.toLong * (k - 1) / 2 + k + 1
    if (sz > Int.MaxValue) throw new IllegalArgumentException(
      s"basket_pairs_markers: basket of $k items would emit $sz structs " +
        "(exceeds a single array); split or cap the basket upstream")
    val vals = new Array[Any](k)
    var i = 0
    while (i < k) {
      vals(i) = if (parts.isNullAt(i)) null else java.lang.Long.valueOf(parts.getLong(i))
      i += 1
    }
    val out = new Array[Any](sz.toInt)
    var o = 0
    i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](vals(i), vals(j)))
        o += 1
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < k) {
      out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](vals(i), null))
      o += 1
      i += 1
    }
    out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](null, null))
    new GenericArrayData(out)
  }

  /** Count of positions (up to the shorter length) where both elements
    * are non-null and equal.
    */
  def longArrayEqCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Int8 scalar-quantization statistics of a long vector in ONE pass:
    * `scale = max |x|` (0 on empty — the seeded `greatest` fold),
    * `checksum = Σ vᵢ·i` over the 1-based positions of
    * `vᵢ = scale = 0 ? 0 : (xᵢ·127) div scale` (Java long division ≡
    * Spark's `div`, truncation toward zero, wrapping multiply), and
    * `v_min`/`v_max` (NULL on empty — `array_min`/`array_max`
    * contract). Replaces three chained HOF towers (`aggregate` max
    * fold, `transform` quantize, `zip_with`+`aggregate` checksum) that
    * each re-walked the vector interpreted per corpus row.
    *
    * Empty-vector checksum is NULL, replicating the tower exactly: the
    * original's `sequence(1, size(v))` on size 0 is the DESCENDING
    * `[1, 0]`, so `zip_with` null-pads and the sum fold nulls out —
    * pinned in VecExprSpec so the equivalence is honest even on the
    * shape the corpus never produces. Null ELEMENTS raise a named
    * error at the read site (quantized vectors are non-null by
    * construction; the centroid_rank/pq_reconstruct malformed-input
    * precedent).
    */
  def int8QuantStats(arr: ArrayData): GenericInternalRow = {
    val n = arr.numElements()
    // exact (raising) arithmetic throughout: the session runs Spark 4's
    // default-ANSI mode, where the tower's abs/multiply/add would raise
    // on Long overflow rather than wrap — the kernel must not silently
    // differ on the overflow edge
    try {
      var scale = 0L
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"int8_quant_stats: null element at position $i (quantized vectors are non-null)")
        val a = Math.absExact(arr.getLong(i))
        if (a > scale) scale = a
        i += 1
      }
      var checksum = 0L
      var vMin = Long.MaxValue
      var vMax = Long.MinValue
      i = 0
      while (i < n) {
        val v = if (scale == 0L) 0L
          else Math.multiplyExact(arr.getLong(i), 127L) / scale
        checksum = Math.addExact(checksum, Math.multiplyExact(v, i + 1L))
        if (v < vMin) vMin = v
        if (v > vMax) vMax = v
        i += 1
      }
      new GenericInternalRow(Array[Any](scale,
        if (n == 0) null else java.lang.Long.valueOf(checksum),
        if (n == 0) null else java.lang.Long.valueOf(vMin),
        if (n == 0) null else java.lang.Long.valueOf(vMax)))
    } catch {
      // Contract note: what is pinned against the HOF tower is
      // RAISE-vs-SILENT parity — every input the ANSI tower would have
      // raised on raises here too, with the kernel's own message. The
      // exception TYPE differs (bare ArithmeticException /
      // IllegalArgumentException vs Spark's SparkArithmeticException +
      // error class); no oracle gate or caller dispatches on the error
      // class, so the kernel keeps the simpler named error rather than
      // routing through Spark's internal QueryExecutionErrors factory.
      case _: ArithmeticException => throw new ArithmeticException(
        "int8_quant_stats: Long overflow (ANSI arithmetic would raise here too)")
    }
  }
}

/** Int8 quantization statistics of a long-vector column (see
  * [[VecKernel.int8QuantStats]]).
  */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", LongType, nullable = false),
    StructField("checksum", LongType, nullable = true),
    StructField("v_min", LongType, nullable = true),
    StructField("v_max", LongType, nullable = true)))
  override def prettyName: String = "int8_quant_stats"

  override def nullSafeEval(v: Any): Any =
    VecKernel.int8QuantStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.VecKernel.int8QuantStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

/** Scalar quantization of a float-array column (see
  * [[VecKernel.quantizeFloats]]).
  */
case class QuantizeFloats(child: Expression, factor: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(factor >= 1, s"quantize_floats: factor must be >= 1, got $factor")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "quantize_floats"

  override def nullSafeEval(v: Any): Any =
    VecKernel.quantizeFloats(v.asInstanceOf[ArrayData], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.VecKernel.quantizeFloats($c, ${factor}L)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeFloats =
    copy(child = newChild)
}

/** Basket pair/marker emitter (see [[VecKernel.pairsAndMarkers]]). */
case class BasketPairsMarkers(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = true),
    StructField("b", LongType, nullable = true))), containsNull = false)
  override def prettyName: String = "basket_pairs_markers"

  override def nullSafeEval(v: Any): Any =
    VecKernel.pairsAndMarkers(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.VecKernel.pairsAndMarkers($c)")

  override protected def withNewChildInternal(newChild: Expression): BasketPairsMarkers =
    copy(child = newChild)
}

/** Positionwise equality count of two long-array columns (see
  * [[VecKernel.longArrayEqCount]]).
  */
case class LongArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.longArrayEqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftexpr.VecKernel.longArrayEqCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayEqCount =
    copy(left = newLeft, right = newRight)
}
