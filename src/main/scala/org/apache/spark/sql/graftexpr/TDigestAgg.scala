package org.apache.spark.sql.graftexpr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Approximate-quantile aggregate over a merging t-digest (Dunning &
  * Ertl, "Computing extremely accurate quantiles using t-digests") —
  * the scale-out companion to the exact window-rank median
  * ([[graft.operators.AnalyticsOps.medianValueByType]]): exact
  * per-group quantiles need a per-group sort, while the digest is a
  * constant-size mergeable summary, so quantiles run as one
  * partial-aggregation pass (each task folds its rows into a ~δ-centroid
  * digest, the shuffle ships one digest per partition, merge is
  * digest-union). Distinct from Spark's built-in `percentile_approx`
  * (Greenwald-Khanna): the t-digest's k₁ scale function concentrates
  * centroids at the tails, giving relative-error behavior for
  * p→0/p→1 — the tail-latency / contamination-rate quantiles a
  * training-data pipeline actually asks for.
  *
  * Accuracy: rank error per quantile is bounded by ~O(q(1-q)/δ); at
  * δ = 100 the p50 error is well under 1% of n and shrinks toward the
  * tails. Merge order across partitions is not deterministic, so the
  * estimate may vary run-to-run within that band — the oracle therefore
  * checks the RANK BOUND (|rank(q̂) − p·n| ≤ ε·n), which holds for any
  * merge order, rather than a value hash.
  */
case class TDigestAgg(
    valueExpr: Expression,
    percentiles: Seq[Double],
    compression: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestAgg.Digest]
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(compression >= 20, s"t-digest compression too low: $compression")
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1),
    s"percentiles must be in [0,1]: $percentiles")

  override def children: Seq[Expression] = Seq(valueExpr)
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_quantiles"

  override def createAggregationBuffer(): TDigestAgg.Digest =
    new TDigestAgg.Digest(compression)

  override def update(buf: TDigestAgg.Digest, input: InternalRow): TDigestAgg.Digest = {
    val v = valueExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(buf: TDigestAgg.Digest, other: TDigestAgg.Digest): TDigestAgg.Digest = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: TDigestAgg.Digest): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(percentiles.map(buf.quantile).toArray[Any])

  override def serialize(buf: TDigestAgg.Digest): Array[Byte] = {
    buf.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(buf.min)
    out.writeDouble(buf.max)
    out.writeInt(buf.size)
    buf.foreach { (m, w) => out.writeDouble(m); out.writeDouble(w) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TDigestAgg.Digest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new TDigestAgg.Digest(compression)
    val mn = in.readDouble()
    val mx = in.readDouble()
    val n = in.readInt()
    var i = 0
    while (i < n) { d.add(in.readDouble(), in.readDouble()); i += 1 }
    d.restoreBounds(mn, mx)
    d
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(valueExpr = newChildren(0))
}

object TDigestAgg {

  /** Merging t-digest: centroids kept sorted by mean; incoming points
    * buffer until a merge-compress pass. The k₁ scale function
    * k(q) = (δ/2π)·asin(2q−1) bounds each centroid to one unit of
    * k-space, which is what concentrates resolution at the tails.
    */
  final class Digest(compression: Double) {
    private val bufCap = math.max(64, (4 * compression).toInt)
    private var means = new Array[Double](bufCap * 2)
    private var weights = new Array[Double](bufCap * 2)
    private var n = 0          // merged centroids in [0, n)
    private var pending = 0    // unmerged tail entries in [n, n + pending)
    var min: Double = Double.PositiveInfinity
    var max: Double = Double.NegativeInfinity

    def isEmpty: Boolean = n == 0 && pending == 0
    def size: Int = { compress(); n }
    def totalWeight: Double = {
      var s = 0.0; var i = 0
      while (i < n + pending) { s += weights(i); i += 1 }
      s
    }

    def foreach(f: (Double, Double) => Unit): Unit = {
      var i = 0
      while (i < n) { f(means(i), weights(i)); i += 1 }
    }

    def add(mean: Double, weight: Double): Unit = {
      if (n + pending == means.length) {
        compress()
        if (n + pending == means.length) { // pathological no-merge pass
          means = java.util.Arrays.copyOf(means, means.length * 2)
          weights = java.util.Arrays.copyOf(weights, weights.length * 2)
        }
      }
      means(n + pending) = mean
      weights(n + pending) = weight
      pending += 1
      if (mean < min) min = mean
      if (mean > max) max = mean
      if (pending >= bufCap) compress()
    }

    def addAll(other: Digest): Unit = {
      other.compress()
      var i = 0
      while (i < other.n) { add(other.means(i), other.weights(i)); i += 1 }
      if (other.min < min) min = other.min
      if (other.max > max) max = other.max
    }

    /** deserialize helper: exact bounds survive the roundtrip even
      * though centroid means sit inside them */
    def restoreBounds(mn: Double, mx: Double): Unit = { min = mn; max = mx }

    private def k(q: Double): Double =
      compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

    /** Merge-compress: sort all centroids by mean, then greedily merge
      * adjacent ones while the merged centroid spans ≤ 1 unit of
      * k-space.
      */
    def compress(): Unit = {
      val total = n + pending
      if (pending == 0 || total == 0) { pending = 0; return }
      val idx = (0 until total).sortBy(means(_)).toArray
      val sm = idx.map(means(_))
      val sw = idx.map(weights(_))
      val w = sw.sum
      var out = 0
      means(0) = sm(0); weights(0) = sw(0)
      var cumBefore = 0.0 // total weight strictly before centroid `out`
      var qLeft = k(0.0)
      var i = 1
      while (i < total) {
        val proposed = weights(out) + sw(i)
        val qRight = k((cumBefore + proposed) / w)
        if (qRight - qLeft <= 1.0) {
          // weighted mean keeps the centroid centered on its mass
          means(out) = (means(out) * weights(out) + sm(i) * sw(i)) / proposed
          weights(out) = proposed
        } else {
          cumBefore += weights(out)
          qLeft = k(cumBefore / w)
          out += 1
          means(out) = sm(i); weights(out) = sw(i)
        }
        i += 1
      }
      n = out + 1
      pending = 0
    }

    /** Quantile by linear interpolation between centroid midpoints,
      * clamped to the exact observed [min, max].
      */
    def quantile(p: Double): Double = {
      compress()
      if (n == 0) return Double.NaN
      if (n == 1) return means(0)
      val w = totalWeight
      val target = p * w
      // cumulative weight at centroid i's midpoint
      var cum = 0.0
      var prevMid = 0.0
      var prevMean = min
      var i = 0
      while (i < n) {
        val mid = cum + weights(i) / 2
        if (target < mid) {
          val frac = if (mid == prevMid) 0.0 else (target - prevMid) / (mid - prevMid)
          val lo = if (i == 0) min else prevMean
          return math.min(max, math.max(min, lo + frac * (means(i) - lo)))
        }
        cum += weights(i)
        prevMid = mid
        prevMean = means(i)
        i += 1
      }
      // top tail: mirror the i == 0 case — interpolate between the last
      // centroid's midpoint and the exact max rather than snapping to
      // max, so upper-tail quantiles are not biased to the observed max
      val frac = if (w == prevMid) 1.0 else (target - prevMid) / (w - prevMid)
      math.min(max, math.max(min, prevMean + frac * (max - prevMean)))
    }
  }

  /** Column API: array<double> of quantile estimates, one per requested
    * percentile, from one shared digest per group.
    */
  def quantiles(value: Column, percentiles: Seq[Double],
      compression: Double = 100.0): Column =
    ExpressionUtils.column(
      TDigestAgg(ExpressionUtils.expression(value), percentiles, compression)
        .toAggregateExpression())
}
