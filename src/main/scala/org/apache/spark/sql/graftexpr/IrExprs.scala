package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernels for the scan-side IR retrieval operators
  * (`ir_phrase_search`, `ir_proximity_search`) — the third kernel
  * wave's closing entries. Both operators are deliberately
  * ZERO-SHUFFLE (each document answers its own match question inside
  * the scan; only the top-k leaves the stage), which made their HOF
  * towers the last interpreted per-corpus-row loops in the registry:
  * the phrase mask was `zip_with(t, slice(t, 2, n-1), ...)` +
  * `filter` (two array allocations and per-element lambda dispatch
  * per document), and the proximity fold was a nested
  * `transform`/`filter`/`aggregate` over the two position lists. The
  * kernels compute the same statistics in one pass of primitive
  * arithmetic with no intermediate arrays and inline into whole-stage
  * codegen. Equivalence with the HOF chains is pinned element-by-
  * element by IrExprSpec (real corpus + edge shapes).
  */
object IrKernel {
  /** Phrase-adjacency statistics: over tokens `t`, the number of
    * positions i with `t(i) = w1 ∧ t(i+1) = w2`, the 1-based first
    * such position (0 when none — `array_position`'s not-found
    * contract), and the token count. Exactly the zip-against-tail
    * mask: the zip_with null-padded tail cell folds to null there,
    * which the count filter and array_position both drop — so the
    * last position can never match, same as here where the loop stops
    * at n−1. Null tokens never equal a literal (three-valued ⇒ cell
    * null ⇒ dropped), so they are skipped, matching the mask.
    */
  def phraseHits(arr: ArrayData, w1: UTF8String, w2: UTF8String): GenericInternalRow = {
    val n = arr.numElements()
    var count = 0L
    var first = 0L
    var i = 0
    while (i < n - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i).equals(w1) && arr.getUTF8String(i + 1).equals(w2)) {
        count += 1
        if (first == 0L) first = i + 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, count, first))
  }

  /** Proximity statistics of two terms in one pass: 1-based positions
    * of `t1` and `t2` are collected (null tokens match neither term —
    * the HOF's `x === lit(term)` is null there, filtered out), then
    * the pair loop computes `min |i−j|` and the number of pairs with
    * `|i−j| ≤ window`. Field contract mirrors the HOF chain exactly:
    * `min_dist` is NULL unless both terms occur (`array_min` over an
    * empty/all-null transform), `near_pairs` is 0 then (seeded fold
    * over an empty array). The pair loop is O(tf₁·tf₂) — bounded by
    * per-document term frequency, not document length, same as the
    * fold it replaces.
    */
  def proxStats(arr: ArrayData, t1: UTF8String, t2: UTF8String,
      window: Int): GenericInternalRow = {
    val n = arr.numElements()
    val pa = new java.util.ArrayList[Long](4)
    val pb = new java.util.ArrayList[Long](4)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.equals(t1)) pa.add(i + 1L)
        if (t.equals(t2)) pb.add(i + 1L)
      }
      i += 1
    }
    val na = pa.size()
    val nb = pb.size()
    var minDist = Long.MaxValue
    var near = 0L
    var a = 0
    while (a < na) {
      val ia = pa.get(a)
      var b = 0
      while (b < nb) {
        val d = math.abs(ia - pb.get(b))
        if (d < minDist) minDist = d
        if (d <= window) near += 1
        b += 1
      }
      a += 1
    }
    new GenericInternalRow(Array[Any](na.toLong, nb.toLong,
      if (na == 0 || nb == 0) null else java.lang.Long.valueOf(minDist), near))
  }
}

/** SQL-facing wrapper of [[IrKernel.phraseHits]]:
  * struct<n_tokens, phrase_count, first_pos> of a token array for a
  * baked two-word phrase.
  */
case class PhraseHits(child: Expression, w1: String, w2: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("phrase_count", LongType, nullable = false),
    StructField("first_pos", LongType, nullable = false)))
  override def prettyName: String = "phrase_hits"

  @transient private lazy val u1 = UTF8String.fromString(w1)
  @transient private lazy val u2 = UTF8String.fromString(w2)

  override def nullSafeEval(v: Any): Any =
    IrKernel.phraseHits(v.asInstanceOf[ArrayData], u1, u2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r1 = ctx.addReferenceObj("w1", u1, "org.apache.spark.unsafe.types.UTF8String")
    val r2 = ctx.addReferenceObj("w2", u2, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.IrKernel.phraseHits($c, $r1, $r2)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHits =
    copy(child = newChild)
}

/** SQL-facing wrapper of [[IrKernel.proxStats]]:
  * struct<n_a, n_b, min_dist, near_pairs> of a token array for two
  * baked terms and a token-distance window.
  */
case class ProxStats(child: Expression, t1: String, t2: String, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 0, s"prox_stats: window must be >= 0, got $window")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_a", LongType, nullable = false),
    StructField("n_b", LongType, nullable = false),
    StructField("min_dist", LongType, nullable = true),
    StructField("near_pairs", LongType, nullable = false)))
  override def prettyName: String = "prox_stats"

  @transient private lazy val u1 = UTF8String.fromString(t1)
  @transient private lazy val u2 = UTF8String.fromString(t2)

  override def nullSafeEval(v: Any): Any =
    IrKernel.proxStats(v.asInstanceOf[ArrayData], u1, u2, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r1 = ctx.addReferenceObj("t1", u1, "org.apache.spark.unsafe.types.UTF8String")
    val r2 = ctx.addReferenceObj("t2", u2, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.IrKernel.proxStats($c, $r1, $r2, $window)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProxStats =
    copy(child = newChild)
}
