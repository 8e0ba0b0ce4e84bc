package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Distribution-drift and planner-statistics invariants: the KS
  * statistic replayed by hand on a constructed two-sample corpus, and
  * the join-cardinality estimate cross-checked against the join it
  * predicts (which the operator itself never executes).
  */
class StatsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  val sf = "/root/testdata/sf0.001"

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    spark.createDataFrame(rows.map { case (id, ts, u, t, v) => (id, ts, u, t, v, "{}") })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("ksDrift reproduces a hand-computed two-sample KS statistic") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // purchase values {1.00, 2.00}, click values {2.00, 3.00}:
    // CDF gap numerator |cum_a*nb - cum_b*na| is 2 at v=100 and v=200,
    // 0 at v=300 -> D = 2/(2*2) = 0.5, reported at the SMALLEST
    // arg-max value (1.00)
    val dir = eventsDir(Seq(
      (1L, ts, 1L, "purchase", 1.00),
      (2L, ts, 2L, "purchase", 2.00),
      (3L, ts, 3L, "click", 2.00),
      (4L, ts, 4L, "click", 3.00),
      (5L, ts, 5L, "view", 99.0))) // other types must be ignored
    val r = StatsOps.ksDrift(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getDouble(0) === 500000.0) // ks_ppm
    assert(r(0).getDouble(1) === 1.0) // at_value
    assert(r(0).getLong(2) === 2L && r(0).getLong(3) === 2L)
  }

  test("ksDrift on two identical samples is zero") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = eventsDir(Seq(
      (1L, ts, 1L, "purchase", 5.00),
      (2L, ts, 2L, "purchase", 7.00),
      (3L, ts, 3L, "click", 5.00),
      (4L, ts, 4L, "click", 7.00)))
    val r = StatsOps.ksDrift(spark, dir).collect()
    assert(r(0).getDouble(0) === 0.0)
  }

  test("joinCardinality predicts the exact row count of the join it never runs") {
    val predicted = StatsOps.joinCardinality(spark, sf).collect()(0)
    val actual = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf),
        $"o_orderkey" === $"l_orderkey").count()
    assert(predicted.getLong(0) === actual)
    // heaviest key's contribution is a real per-key maximum
    val heaviest = graft.Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey").count().agg(max($"count")).collect()(0).getLong(0)
    assert(predicted.getLong(3) === heaviest) // n_o is 1 per orderkey
    assert(predicted.getDouble(4) >= 1000000.0 * 0.999) // skew >= mean
  }

  test("rollingUv counts each user once per trailing window and skips empty anchor days") {
    val t = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // A active on day 1 only; B appears on day 10 (9 days later, outside
    // A's 7-day reach). Anchor days 8-9 have no contributors and 1-7
    // carry A exactly once despite the fan-out.
    val dir = eventsDir(Seq(
      (1L, t(1), 100L, "view", 1.0),
      (2L, t(1), 100L, "click", 1.0), // same user+day: must not double-count
      (3L, t(10), 200L, "view", 1.0)))
    val got = TimeSeriesOps.rollingUv(spark, dir)
      .orderBy($"day").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = (1 to 7).map(d => (f"2024-01-$d%02d", 1L)) :+ ("2024-01-10", 1L)
    assert(got === expect)
  }

  test("rankSumDrift: exact AUC on separable, tied and interleaved samples") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // perfectly separable: every purchase outranks every click -> AUC 1
    val sep = eventsDir(Seq(
      (1L, ts, 1L, "purchase", 3.00), (2L, ts, 2L, "purchase", 4.00),
      (3L, ts, 3L, "click", 1.00), (4L, ts, 4L, "click", 2.00)))
    val r1 = StatsOps.rankSumDrift(spark, sep).collect()(0)
    assert(r1.getLong(2) === 8L) // 2U = 2 * n_a*n_b
    assert(r1.getDouble(3) === 1.0)
    // all tied -> AUC exactly 0.5 via the midrank correction
    val tie = eventsDir(Seq(
      (1L, ts, 1L, "purchase", 2.00), (2L, ts, 2L, "click", 2.00)))
    val r2 = StatsOps.rankSumDrift(spark, tie).collect()(0)
    assert(r2.getLong(2) === 1L && r2.getDouble(3) === 0.5)
    // interleaved: a=200 beats b=100, loses to b=300 -> U=1, AUC=0.5
    val mix = eventsDir(Seq(
      (1L, ts, 1L, "purchase", 2.00),
      (2L, ts, 2L, "click", 1.00), (3L, ts, 3L, "click", 3.00)))
    val r3 = StatsOps.rankSumDrift(spark, mix).collect()(0)
    assert(r3.getLong(2) === 2L && r3.getDouble(3) === 0.5)
  }

  test("prCurve: monotone recall, lowest threshold recalls everything, counts exact") {
    val rows = StatsOps.prCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // recall decreases as the threshold rises; at the lowest it's 1.0
    assert(rows.head._5 === 1.0)
    rows.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._5 >= hi._5); case _ =>
    }
    val na = graft.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.head._2 === na, "lowest threshold's TP = all purchases")
    rows.foreach { case (_, tp, fp, p, r) =>
      assert(p === tp.toDouble / (tp + fp).toDouble && r === tp.toDouble / na.toDouble)
    }
  }

  test("reconFullOuter: every order day appears; diffs equal the independent recompute") {
    val out = StatsOps.reconFullOuter(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val nDays = graft.Tables.orders(spark, sf)
      .select(date_format($"o_orderdate", "yyyy-MM-dd")).distinct().count()
    assert(out.size.toLong === nDays)
    out.foreach { case (_, (o, l, d)) => assert(d === l - o) }
    // lines-side totals exclude tax -> at least one honest mismatch
    assert(out.values.exists(_._3 != 0L))
  }

  test("giniRevenue: 0 on perfect equality, known value on a hand case, no single-task window") {
    val df = StatsOps.giniRevenue(spark, sf)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "the global rank must come from the range exchange, not an empty-over() window")
    // hand replay on the fixture
    val cents = graft.Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(sum((RelationalOps.dec($"o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = cents.length.toLong
    val sx = cents.map(BigInt(_)).sum
    val srx = cents.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expect = 2.0 * srx.toDouble / (n.toDouble * sx.toDouble) -
      (n + 1).toDouble / n.toDouble
    val got = df.collect()(0)
    assert(got.getLong(0) === n)
    assert(math.abs(got.getDouble(2) - expect) < 1e-12)
    assert(got.getDouble(2) > 0.0 && got.getDouble(2) < 1.0)
  }

  test("stickiness is DAU/WAU and bounded by (0, 1]") {
    val rows = StatsOps.stickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau, s) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dau <= wau)
      assert(s === dau.toDouble / wau.toDouble)
      assert(s > 0.0 && s <= 1.0)
    }
  }

  test("trimmedMean: outlier excluded at the exact rank cut; plain mean poisoned") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // 20 purchases: nineteen at 1.00, one wild outlier. 5% trim keeps
    // ranks 2..19 -> outlier (rank 20) and one 1.00 (rank 1) drop.
    val dir = eventsDir(
      (1 to 19).map(i => (i.toLong, ts, i.toLong, "purchase", 1.00)) :+
        (20L, ts, 20L, "purchase", 400.00))
    val r = StatsOps.trimmedMean(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (n, kept, tm) = r("purchase")
    assert(n === 20L && kept === 18L)
    assert(tm === 1.0, "trimmed mean must shrug off the outlier")
    // per-row replay of the kept-band overlap on the fixture
    val all = graft.Tables.events(spark, sf)
      .select($"event_type", (RelationalOps.dec($"value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = StatsOps.trimmedMean(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    all.foreach { case (t, vs) =>
      val nn = vs.length.toLong
      val lo = nn * StatsOps.TrimPct / 100
      val hi = nn * (100 - StatsOps.TrimPct) / 100
      val keptVs = vs.slice(lo.toInt, hi.toInt)
      assert(got(t)._1 === keptVs.length.toLong, s"kept count for $t")
      assert(got(t)._2 === keptVs.sum.toDouble / keptVs.length.toDouble / 100.0,
        s"trimmed mean for $t")
    }
  }

  test("cusumDaily: clamped recursion replayed by hand; level shift accumulates") {
    val t = (d: Int, i: Int) => Timestamp.valueOf(f"2024-01-$d%02d 0$i:00:00")
    // days 1-2: one event/day; days 3-4: three events/day.
    // mean = 8 div 4 = 2 -> devs -1,-1,+1,+1
    val rows = (1 to 2).map(d => (d.toLong, t(d, 1), d.toLong, "view", 1.0)) ++
      (3 to 4).flatMap(d => (1 to 3).map(i =>
        (d * 10L + i, t(d, i), d.toLong, "view", 1.0)))
    val dir = eventsDir(rows)
    val got = TimeSeriesOps.cusumDaily(spark, dir)
      .orderBy($"day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 1L, -1L, 0L, -1L),  // sp clamps at 0, sn tracks
      ("2024-01-02", 1L, -1L, 0L, -2L),
      ("2024-01-03", 3L, 1L, 1L, -1L),   // shift starts recovering sn
      ("2024-01-04", 3L, 1L, 2L, 0L)))   // sn clamps back at 0
  }

  test("valueHistogram: bins partition the corpus exactly") {
    val rows = StatsOps.valueHistogram(spark, sf).collect()
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(1) - r.getLong(0) === StatsOps.HistBinCents)
    }
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1000000.0) < 1.0)
  }

  test("multiDistinctDaily avoids the multi-countDistinct Expand") {
    val df = StatsOps.multiDistinctDaily(spark, sf)
    assert(!df.queryExecution.executedPlan.toString.contains("Expand"),
      "each distinct must fold over its own pre-deduplicated projection")
    // values agree with the naive (Expand-rewritten) form
    val naive = graft.Tables.events(spark, sf)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("uv"),
        countDistinct($"event_type").as("n_types"))
    assert(df.exceptAll(naive).count() === 0 && naive.exceptAll(df).count() === 0)
  }

  test("rollingUvBitmap equals rollingUv on a gap-free calendar; anchors only on event days") {
    // fixture calendar is gap-free -> the two forms agree row for row
    val a = TimeSeriesOps.rollingUv(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = TimeSeriesOps.rollingUvBitmap(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    // with a calendar gap, the bitmap form anchors only on event days
    val t = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val dir = eventsDir(Seq(
      (1L, t(1), 100L, "view", 1.0),
      (2L, t(10), 200L, "view", 1.0)))
    val gotB = TimeSeriesOps.rollingUvBitmap(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(gotB === Seq(("2024-01-01", 1L), ("2024-01-10", 1L)))
  }

  test("rollingUv dominates the per-day UV and is bounded by the 7-day union") {
    val rolling = TimeSeriesOps.rollingUv(spark, sf)
    val daily = graft.Tables.events(spark, sf)
      .select(date_format(to_date($"ts"), "yyyy-MM-dd").as("day"), $"user_id")
      .distinct().groupBy($"day").agg(count(lit(1)).as("uv"))
    val joined = rolling.join(daily, "day")
    assert(joined.where($"uv_7d" < $"uv").count() === 0)
    val total = graft.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(rolling.where($"uv_7d" > total).count() === 0)
  }

  test("pareto frontier: output is mutually non-dominated and covers every non-dominated point") {
    val sf = "/root/testdata/sf0.001"
    val out = StatsOps.paretoFrontier(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // brute-force replay on the (price, size) grid
    val pts = graft.Tables.part(spark, sf)
      .selectExpr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "CAST(p_size AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def dominated(p: (Long, Long)) = pts.exists(q =>
      q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2))
    out.foreach { case (pc, sz, _) =>
      assert(!dominated((pc, sz)), s"dominated point on frontier: ($pc, $sz)")
    }
    val expect = pts.distinct.filterNot(dominated).toSet
    assert(out.map(p => (p._1, p._2)).toSet === expect)
    // multiplicity is the point's population
    val byPoint = pts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { case (pc, sz, n) => assert(n === byPoint((pc, sz))) }
  }

  test("PSI is zero for identical halves and replays exactly on driver data") {
    // identical base/current distributions -> every term (p-q)ln(p/q) = 0
    val dir = java.nio.file.Files.createTempDirectory("graft-psi").toString
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    spark.createDataFrame(Seq(
      (1L, ts(2), 1L, "view", 10.00, "{}"), (2L, ts(2), 1L, "view", 80.00, "{}"),
      (3L, ts(20), 1L, "view", 10.00, "{}"), (4L, ts(20), 1L, "view", 80.00, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val flat = StatsOps.psiValue(spark, dir).collect().head
    assert(flat.getDouble(3) === 0.0)
    // driver data: per-bin integer table replayed driver-side, then the
    // psiValue scalar against an independent bin-ordered fold
    val sf = "/root/testdata/sf0.001"
    val binsExp = graft.Tables.events(spark, sf)
      .selectExpr(s"date_format(ts, 'yyyy-MM-dd') < '${StatsOps.PsiCutoff}' AS base",
        s"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div ${StatsOps.HistBinCents} AS bin")
      .groupBy("bin").agg(
        sum(when($"base", 1L).otherwise(0L)).as("cb"),
        sum(when(!$"base", 1L).otherwise(0L)).as("cc"))
      .orderBy("bin").collect()
    val nb = binsExp.map(_.getLong(1)).sum; val nc = binsExp.map(_.getLong(2)).sum
    val k = binsExp.length
    val binsGot = StatsOps.psiDrift(spark, sf).orderBy($"bin").collect()
    assert(binsGot.length === k)
    binsGot.zip(binsExp).foreach { case (g, e) =>
      assert(g.getLong(0) === e.getLong(0) && g.getLong(1) === e.getLong(1) &&
        g.getLong(2) === e.getLong(2))
      assert(g.getLong(3) === nb && g.getLong(4) === nc && g.getLong(5) === k.toLong)
    }
    var psi = 0.0
    binsExp.foreach { r =>
      val (cb, cc) = (r.getLong(1) + StatsOps.PsiSmooth, r.getLong(2) + StatsOps.PsiSmooth)
      val (db, dc) = (nb + StatsOps.PsiSmooth * k, nc + StatsOps.PsiSmooth * k)
      psi += (cb.toDouble / db - cc.toDouble / dc) *
        math.log(cb.toDouble * dc / (cc.toDouble * db))
    }
    val got = StatsOps.psiValue(spark, sf).collect().head
    assert(got.getLong(0) === k.toLong && got.getLong(1) === nb && got.getLong(2) === nc)
    assert(math.abs(got.getDouble(3) - psi) < 1e-12)
  }

  test("floorDiv floors like DuckDB's // on negative numerators at long scale") {
    val rows = spark.range(1).selectExpr(
      "-3L AS a", "3L AS b", "-5000L AS c", "-4999L AS d",
      "-9223372036854775000L AS e")
    val r = rows.select(
      RelationalOps.floorDiv(col("a"), 5000L),
      RelationalOps.floorDiv(col("b"), 5000L),
      RelationalOps.floorDiv(col("c"), 5000L),
      RelationalOps.floorDiv(col("d"), 5000L),
      RelationalOps.floorDiv(col("e"), 5000L)).collect().head
    assert(r.getLong(0) === -1L && r.getLong(1) === 0L && r.getLong(2) === -1L
      && r.getLong(3) === -1L)
    assert(r.getLong(4) === Math.floorDiv(-9223372036854775000L, 5000L))
  }

  test("Benford census: digits partition orders, expected shares sum to ~1, chi2 replays") {
    val sf = "/root/testdata/sf0.001"
    val out = StatsOps.benfordDigits(spark, sf).orderBy($"digit").collect()
    assert(out.map(_.getLong(0)).toSeq === (1L to 9L))
    val nt = graft.Tables.orders(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === nt, "digit census partitions the table")
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-8)
    out.foreach { r =>
      val (n, e) = (r.getLong(1), StatsOps.BenfordExpectedPpb(r.getLong(0).toInt - 1))
      val dev = BigInt(n) * 1000000000L - BigInt(nt) * e
      val expect = (dev * dev).toDouble / (BigInt(nt) * e * 1000000000L).toDouble
      assert(r.getDouble(4) === expect, s"chi2 digit ${r.getLong(0)}")
    }
  }

  test("Cramer's V: bounded in [0,1], chi2 replays from the contingency table") {
    val sf = "/root/testdata/sf0.001"
    val row = StatsOps.cramersV(spark, sf).collect().head
    val cells = graft.Tables.events(spark, sf)
      .groupBy($"event_type",
        pmod(datediff(to_date($"ts"), lit("1970-01-05")), lit(7)).as("dow"))
      .count().collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    val nn = cells.values.sum
    val rSum = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cSum = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    var chi2 = 0.0
    cells.toSeq.sortBy(_._1).foreach { case ((t, d), o) =>
      val diff = BigInt(o) * nn - BigInt(rSum(t)) * cSum(d)
      chi2 += (diff * diff).toDouble / (BigInt(nn) * rSum(t) * cSum(d)).toDouble
    }
    assert(row.getLong(0) === nn)
    assert(row.getDouble(1) === chi2)
    val v = row.getDouble(2)
    assert(v >= 0.0 && v <= 1.0)
    assert(v === math.sqrt(chi2 / (nn.toDouble *
      math.min(rSum.size - 1, cSum.size - 1).toDouble)))
  }
}
