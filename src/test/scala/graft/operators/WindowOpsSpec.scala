package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Batch DWS windows: the HLL UV variant was the one registry entry with
  * only a rows-only oracle check (sketch contents are engine-specific) —
  * this spec closes that gap by bounding it against the exact operator.
  */
class WindowOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"

  test("HLL uv per hour is within 5% of exact uv in EVERY window") {
    val exact = WindowOps.uvPerHour(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = WindowOps.uvPerHourEstimates(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet, "window sets must agree")
    assert(exact.nonEmpty)
    exact.foreach { case (w, uv) =>
      val est = approx(w)
      // the operator defaults to rsd = 0.01, where HLL++ is near-exact
      // at these per-window cardinalities; at Spark's 0.05 default the
      // small-window quantization error reaches ~20% and this would flake
      assert(math.abs(est - uv).toDouble / uv <= 0.05,
        s"window $w: exact=$uv approx=$est")
    }
  }

  test("uvPerHourApprox guarantee output: every window within_bounds") {
    val rows = WindowOps.uvPerHourApprox(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"window ${r.getString(0)} out of bounds")
    }
  }
}
