package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Gap-fill densification and OHLC downsampling invariants, checked on
  * the driver's sf0.001 events plus a hand-built series with known gaps.
  */
class TimeSeriesOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  val sf = "/root/testdata/sf0.001"

  test("gapfill emits exactly one row per user per day of the user's span") {
    val out = TimeSeriesOps.gapfillForwardFill(spark, sf)
    val spans = out.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), countDistinct($"day").as("nd"),
        min($"day").as("d0"), max($"day").as("d1"))
      .withColumn("expect", datediff(to_date($"d1"), to_date($"d0")) + 1)
    assert(spans.where($"n" =!= $"expect" || $"nd" =!= $"n").count() === 0)
  }

  test("filled_cents is never null, equals day_cents on observed days, and carries the last observation across gaps") {
    val out = TimeSeriesOps.gapfillForwardFill(spark, sf).cache()
    try {
      assert(out.where($"filled_cents".isNull).count() === 0)
      assert(out.where($"day_cents".isNotNull && $"day_cents" =!= $"filled_cents").count() === 0)
      // replay the fill driver-side for the densest user
      val uid = out.groupBy($"user_id").count().orderBy($"count".desc).first().getLong(0)
      val rows = out.where($"user_id" === uid).orderBy($"day")
        .select($"day_cents", $"filled_cents")
        .collect()
      var lastSeen: Option[Long] = None
      rows.foreach { r =>
        if (!r.isNullAt(0)) lastSeen = Some(r.getLong(0))
        assert(Some(r.getLong(1)) === lastSeen)
      }
    } finally out.unpersist()
  }

  test("gapfill forward-fills a constructed series with a known hole") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    spark.createDataFrame(Seq(
      (1L, ts(1), 7L, "view", 2.00, "{}"),
      (2L, ts(1), 7L, "view", 1.50, "{}"),
      (3L, ts(4), 7L, "view", 9.00, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = TimeSeriesOps.gapfillForwardFill(spark, dir)
      .orderBy($"day")
      .select($"day", $"day_cents", $"filled_cents")
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 350L, 350L),
      ("2024-01-02", null, 350L),
      ("2024-01-03", null, 350L),
      ("2024-01-04", 900L, 900L)))
  }

  test("MAD anomaly flags exactly the planted spike; exact odd/even medians") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // type "a": 5 flat days + one 100x spike (odd count -> single-row
    // median); type "b": 4 flat days (even count -> middle-pair median),
    // no spike
    val rows =
      (1 to 5).map(d => (d.toLong, ts(d), 1L, "a", 10.00, "{}")) :+
        (6L, ts(6), 1L, "a", 1000.00, "{}") :++
        (11 to 14).map(d => (d.toLong + 10, ts(d), 2L, "b", 5.00 + (d - 11), "{}"))
    spark.createDataFrame(rows).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = TimeSeriesOps.anomalyMad(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    // type a: med2 = 2000 (6 days, middle pair 1000+1000), dev2 of the
    // spike day = |200000-2000| = 198000, mad4 = 2*median(dev2)=0 for
    // flat days... dev2 flat = 0, sorted dev2 = [0,0,0,0,0,198000],
    // middle pair (rn 3,4) = 0+0 -> mad4=0 -> spike flagged (198000*2>5*0),
    // flat days 0*2 > 0 false
    val aFlags = got.filter(_._1 == "a")
    assert(aFlags.count(_._4) === 1)
    assert(aFlags.find(_._4).get._2 === "2024-01-06")
    // type b: values 5,6,7,8 -> cents 500..800, med2 = 600+700 = 1300,
    // dev2 = [300,100,100,300], sorted [100,100,300,300] middle pair
    // 100+300 -> mad4 = 400; worst dev2=300: 600 > 5*400 false
    val bFlags = got.filter(_._1 == "b")
    assert(bFlags.size === 4 && !bFlags.exists(_._4))
  }

  test("EWMA replays the exact 3^k·4^(W−1−k) weights and warm-up normalization") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // 3-day series: 1.00, 2.00, 4.00 -> cents 100, 200, 400
    spark.createDataFrame(Seq(
      (1L, ts(1), 1L, "a", 1.00, "{}"),
      (2L, ts(2), 1L, "a", 2.00, "{}"),
      (3L, ts(3), 1L, "a", 4.00, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = TimeSeriesOps.ewmaSmooth(spark, dir).orderBy($"day")
      .select($"ewma_num", $"ewma_den", $"ewma").collect()
    val w = (0 until TimeSeriesOps.EwmaWindow).map(TimeSeriesOps.ewmaWeight)
    assert(w.head === (1L << 14) && w(1) === 3L * (1L << 12), "w0 = 4^7, w1 = 3·4^6")
    // day 1: only its own weight present
    assert((got(0).getLong(0), got(0).getLong(1)) === (100L * w(0), w(0)))
    assert(got(0).getDouble(2) === 100.0)
    // day 2: 200·w0 + 100·w1, den w0+w1
    assert((got(1).getLong(0), got(1).getLong(1)) ===
      (200L * w(0) + 100L * w(1), w(0) + w(1)))
    // day 3: 400·w0 + 200·w1 + 100·w2
    assert((got(2).getLong(0), got(2).getLong(1)) ===
      (400L * w(0) + 200L * w(1) + 100L * w(2), w(0) + w(1) + w(2)))
    assert(got(2).getDouble(2) ===
      got(2).getLong(0).toDouble / got(2).getLong(1).toDouble)
  }

  test("EWMA on driver data stays within the trailing window's bounds") {
    val out = TimeSeriesOps.ewmaSmooth(spark, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.where($"ewma_den" <= 0 || $"ewma".isNull).count() === 0)
      // smoothed value is a convex combination of trailing day_cents:
      // bounded by the running min/max over the window
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"day")
        .rowsBetween(-(TimeSeriesOps.EwmaWindow - 1), 0)
      val bounded = out
        .withColumn("lo", min($"day_cents").over(w))
        .withColumn("hi", max($"day_cents").over(w))
      assert(bounded.where($"ewma" < $"lo" - 0.5 || $"ewma" > $"hi" + 0.5).count() === 0)
    } finally out.unpersist()
  }

  test("OHLC bars bound their members and replay the (ts, event_id) order") {
    val out = TimeSeriesOps.ohlcDownsample(spark, sf).cache()
    try {
      assert(out.where($"high" < $"low" || $"open" > $"high" || $"open" < $"low" ||
        $"close" > $"high" || $"close" < $"low" || $"n_events" < 1).count() === 0)
      // replay three buckets driver-side from the raw events
      val sample = out.orderBy($"n_events".desc).limit(3).collect()
      val ev = graft.Tables.events(spark, sf)
        .select($"event_type",
          date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00").as("bucket"),
          unix_micros($"ts").as("us"), $"event_id", $"value")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      sample.foreach { bar =>
        val members = ev.filter(e => e._1 == bar.getString(0) && e._2 == bar.getString(1))
          .sortBy(e => (e._3, e._4))
        assert(bar.getDouble(2) === members.head._5, "open")
        assert(bar.getDouble(3) === members.map(_._5).max, "high")
        assert(bar.getDouble(4) === members.map(_._5).min, "low")
        assert(bar.getDouble(5) === members.last._5, "close")
        assert(bar.getLong(7) === members.length.toLong, "n_events")
      }
    } finally out.unpersist()
  }

  test("linear trend replays exact least-squares sums on a constructed series") {
    import spark.implicits._
    // y = 100x + 7 exactly: slope must be exactly 100, intercept exactly 7
    val days = (1 to 9).map(d => (f"2024-01-$d%02d", 100L * d + 7))
    val df = days.zipWithIndex.map { case ((day, cents), i) =>
      (i.toLong, Timestamp.valueOf(s"$day 12:00:00"), 1L, "lin",
        cents.toDouble / 100.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // drive the same arithmetic through a temp parquet dir the op reads
    val tmp = java.nio.file.Files.createTempDirectory("trend").toString
    try {
      df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val r = TimeSeriesOps.linearTrend(spark, tmp).collect()
      assert(r.length === 1)
      val row = r.head
      assert(row.getLong(1) === 9L, "n")
      // slope in cents/day: y was built in cents via value*100
      assert(row.getDouble(4) === 100.0, "slope")
      assert(row.getDouble(5) === 7.0, "intercept (cents)")
      assert(row.getLong(2) === row.getLong(3) * 100L,
        "num/den reduce to the planted slope exactly")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("linear trend on driver data: exact identity n·sxx−sx² for contiguous ranks") {
    val out = TimeSeriesOps.linearTrend(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(1)
      // x = 1..n means slope_den is the closed form n²(n²−1)/12
      assert(r.getLong(3) === n * n * (n * n - 1) / 12, r.getString(0))
      if (n > 1) assert(!r.isNullAt(4) && !r.isNullAt(5))
    }
  }

  test("seasonal decompose: additive identity, edge nulls, DOW-constant seasonal") {
    val out = TimeSeriesOps.seasonalDecompose(spark, sf).orderBy($"day").collect()
    assert(out.length >= 14, "a month of events decomposes to its day domain")
    // trend/residual exist exactly where the centered 7-day window is complete
    out.take(3).foreach(r => assert(r.isNullAt(2) && r.isNullAt(4), s"leading edge: $r"))
    out.takeRight(3).foreach(r => assert(r.isNullAt(2) && r.isNullAt(4), s"trailing edge: $r"))
    out.drop(3).dropRight(3).foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(4), s"interior day incomplete: $r")
      // revenue = trend + seasonal + residual (exact-integer derivation -> tight tolerance)
      val recon = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(recon - r.getDouble(1)) < 1e-6, s"additive identity: $r")
    }
    // seasonal is a pure function of day-of-week: 7 distinct values over the series
    val eps = 1e-9
    val byDow = out.filter(!_.isNullAt(3)).groupBy { r =>
      java.time.LocalDate.parse(r.getString(0)).getDayOfWeek
    }
    byDow.values.foreach { rs =>
      val vs = rs.map(_.getDouble(3))
      assert(vs.max - vs.min < eps, "seasonal varies within one DOW")
    }
  }

  test("Holt smoothing replays bit-exactly against a driver-side fold") {
    val out = TimeSeriesOps.holtSmooth(spark, sf).collect()
      .sortBy(_.getString(0))
    assert(out.length >= 14)
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("c"))
      .orderBy($"d").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    var (l, b) = (0.0, 0.0)
    daily.zipWithIndex.foreach { case ((day, c), i) =>
      val y = c.toDouble
      val (f, l2, b2) =
        if (i == 0) (y, y, 0.0)
        else {
          val nl = 0.5 * y + 0.5 * (l + b)
          (l + b, nl, 0.25 * (nl - l) + 0.75 * b)
        }
      val row = out(i)
      assert(row.getString(0) === day)
      assert(row.getDouble(2) === l2 / 100.0, s"level at $day")
      assert(row.getDouble(3) === b2 / 100.0, s"trend at $day")
      assert(row.getDouble(4) === f / 100.0, s"fitted at $day")
      l = l2; b = b2
    }
  }

  test("ACF: lag-0 identity implied, driver-side replay exact, pair counts shrink with lag") {
    val out = TimeSeriesOps.autocorrelation(spark, sf).orderBy($"k").collect()
    assert(out.map(_.getLong(0)).toSeq === (1L to TimeSeriesOps.AcfMaxLag.toLong))
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("y"))
      .orderBy($"d").collect().map(_.getLong(1))
    val n = daily.length
    val sTot = daily.sum
    val dev = daily.map(y => BigInt(y) * n - sTot)
    val den = dev.map(d => d * d).sum
    out.foreach { r =>
      val k = r.getLong(0).toInt
      // contiguous day domain in this dataset -> pairs = n - k
      assert(r.getLong(1) === (n - k).toLong)
      val num = (0 until n - k).map(t => dev(t) * dev(t + k)).sum
      assert(r.getDouble(2) === num.toDouble / den.toDouble, s"lag $k")
    }
  }
}
