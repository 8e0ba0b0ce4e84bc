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

  test("visitor stats: planted sessions land in their start hours with exact durations") {
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("graft-vs").toString
    val t = (h: Int, m: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: session A starts 08:50, crosses into 09 (2 events, 20 min);
    //         31-min gap; session B at 09:41 (1 event). user 2: one view 08:10.
    spark.createDataFrame(Seq(
      (1L, t(8, 50), 1L, "view", 0.0, "{}"),
      (2L, t(9, 10), 1L, "click", 0.0, "{}"),
      (3L, t(9, 41), 1L, "view", 0.0, "{}"),
      (4L, t(8, 10), 2L, "view", 0.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = WindowOps.visitorStats(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // hour 08: pv 2 (both views), 2 events, uv 2, 2 sessions started
    // (A at 08:50 with 1200 s, user 2's singleton with 0 s)
    assert(got("2024-01-01 08:00:00") === ((2L, 2L, 2L, 2L, 1200L)))
    // hour 09: click + view = 1 pv, 2 events, uv 1, session B only (0 s)
    assert(got("2024-01-01 09:00:00") === ((1L, 2L, 1L, 1L, 0L)))
  }

  test("visitor stats on driver data: windows reconcile with their parts") {
    import org.apache.spark.sql.functions._
    import graft.ColStr
    val out = WindowOps.visitorStats(spark, dir).cache()
    try {
      assert(out.where($"uv" > $"n_events" || $"pv" > $"n_events" ||
        $"sv" < 0 || $"dur_sec" < 0).count() === 0)
      val totals = out.agg(sum($"n_events"), sum($"sv")).head()
      assert(totals.getLong(0) === graft.Tables.events(spark, dir).count())
      val sessions = AnalyticsOps.sessionize(spark, dir).count()
      assert(totals.getLong(1) === sessions,
        "every session is attributed to exactly one start hour")
    } finally out.unpersist()
  }

  test("uvPerHourApprox guarantee output: every window within_bounds") {
    val rows = WindowOps.uvPerHourApprox(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"window ${r.getString(0)} out of bounds")
    }
  }
}
