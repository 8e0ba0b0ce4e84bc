package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ordered-funnel semantics (strictly-after step entry) and the cohort
  * triangle, checked on hand-built event histories.
  */
class FunnelOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(dir: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

  test("funnel counts only strictly-ordered step sequences") {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    write(dir, Seq(
      // user 1: full ordered funnel
      (1L, t(1), 1L, "view", 0.0, "{}"),
      (2L, t(2), 1L, "click", 0.0, "{}"),
      (3L, t(3), 1L, "purchase", 0.0, "{}"),
      // user 2: click BEFORE the first view -> stalls at view
      (4L, t(1), 2L, "click", 0.0, "{}"),
      (5L, t(2), 2L, "view", 0.0, "{}"),
      // user 3: purchase BEFORE the click -> stalls at click
      (6L, t(1), 3L, "view", 0.0, "{}"),
      (7L, t(2), 3L, "purchase", 0.0, "{}"),
      (8L, t(3), 3L, "click", 0.0, "{}")))
    val got = FunnelOps.funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(
      (1L, "view", 3L, 1.0),
      (2L, "click", 2L, 2.0 / 3.0),
      (3L, "purchase", 1L, 1.0 / 3.0)))
  }

  test("windowed funnel rejects steps outside the budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wfunnel").toString
    val t = (day: Int, h: Int) => Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    write(dir, Seq(
      // user 1: click 2h after view -> converts
      (1L, t(1, 8), 1L, "view", 0.0, "{}"),
      (2L, t(1, 10), 1L, "click", 0.0, "{}"),
      // user 2: click 25h after first view -> outside the 24h budget
      (3L, t(1, 8), 2L, "view", 0.0, "{}"),
      (4L, t(2, 9), 2L, "click", 0.0, "{}")))
    val got = FunnelOps.funnelWindowed(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got === Map("view" -> 2L, "click" -> 1L, "purchase" -> 0L))
    // the unwindowed funnel counts user 2's late click
    val plain = FunnelOps.funnel(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(plain("click") === 2L)
  }

  test("retention triangle: offsets measured from each user's first active day") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cohort").toString
    val d = (day: Int, id: Long, u: Long) =>
      (id, Timestamp.valueOf(f"2024-01-$day%02d 09:00:00"), u, "view", 0.0, "{}")
    write(dir, Seq(
      d(1, 1, 10L), d(2, 2, 10L), d(4, 3, 10L), // user 10: cohort d1
      d(2, 4, 20L),                             // user 20: cohort d2
      d(2, 5, 10L)))                            // same-day duplicate: no double count
    val got = FunnelOps.retentionCohorts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(
      ("2024-01-01", 0L, 1L, 1.0),
      ("2024-01-01", 1L, 1L, 1.0),
      ("2024-01-01", 3L, 1L, 1.0),
      ("2024-01-02", 0L, 1L, 1.0)))
  }

  test("path analysis: session gaps split paths, prefix cap holds, users dedup") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paths").toString
    val t = (h: Int, m: Int) => Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    write(dir, Seq(
      // user 1, session 1: view>click; 31-min gap; session 2: view
      (1L, t(8, 0), 1L, "view", 0.0, "{}"),
      (2L, t(8, 5), 1L, "click", 0.0, "{}"),
      (3L, t(8, 40), 1L, "view", 0.0, "{}"),
      // user 2, one session: view>click (same path as user 1's s1)
      (4L, t(9, 0), 2L, "view", 0.0, "{}"),
      (5L, t(9, 10), 2L, "click", 0.0, "{}"),
      // user 3: 10 rapid views -> capped at PathCap
      ) ++ (1 to 10).map(i => (10L + i, t(10, i), 3L, "view", 0.0, "{}")))
    val got = FunnelOps.pathAnalysis(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ordered by n_sessions desc, path asc
    val expectCapped = Seq.fill(FunnelOps.PathCap)("view").mkString(">")
    assert(got.toSeq === Seq(
      ("view>click", 2L, 2L),
      ("view", 1L, 1L), // "view" precedes its longer extension
      (expectCapped, 1L, 1L)))
  }

  test("path analysis on driver data: top paths cover sessions, n_users <= n_sessions") {
    val out = FunnelOps.pathAnalysis(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= FunnelOps.PathTopN)
    assert(out.forall { case (p, s, u) => p.nonEmpty && u >= 1 && u <= s })
    // descending by count with path tiebreak
    assert(out.map(x => (-x._2, x._1)).toSeq === out.map(x => (-x._2, x._1)).sortBy(identity).toSeq)
    // no path longer than the cap
    assert(out.forall(_._1.split(">").length <= FunnelOps.PathCap))
  }

  test("markov transitions replay the per-user (sec, event_id) stream exactly") {
    val sf = "/root/testdata/sf0.001"
    val raw = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "unix_timestamp(ts) AS sec")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect: Map[(String, String), Long] =
      raw.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        val types = es.sortBy(e => (e._4, e._2)).map(_._3).toSeq
        types.zip(types.drop(1))
      }.groupBy(x => x).map { case (k, xs) => k -> xs.length.toLong }
    val got = FunnelOps.markovTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === expect.keySet)
    val totals = expect.groupBy(_._1._1)
      .map { case (s, xs) => s -> xs.values.sum }
    expect.foreach { case (k, n) =>
      assert(got(k)._1 === n, s"count drift at $k")
      assert(got(k)._2 === n.toDouble / totals(k._1).toDouble,
        s"probability at $k is one exact IEEE division")
    }
    // a transition exists for every user with >= 2 events, none invented
    assert(expect.values.sum ===
      raw.groupBy(_._1).values.map(es => math.max(0, es.length - 1)).sum)
  }

  test("retentionBitmap reproduces retentionCohorts cell for cell") {
    val sf = "/root/testdata/sf0.001"
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val a = m(FunnelOps.retentionCohorts(spark, sf))
    val b = m(FunnelOps.retentionBitmap(spark, sf))
    assert(a === b,
      "bitmap algebra is an implementation strategy, not a semantic change")
  }

  test("RFM: scores in 1..4, monotone in their dimension, segment code composes") {
    val out = FunnelOps.rfmSegments(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, _, r, f, m, seg) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
      assert(seg === r * 100 + f * 10 + m)
    }
    // monotone: more recent never scores lower, more frequent never lower
    val byR = out.sortBy(_._1)
    byR.sliding(2).foreach { case Array(a, b) =>
      if (a._1 < b._1) assert(a._4 >= b._4, s"recency monotonicity: $a vs $b"); ()
    }
    val byF = out.sortBy(_._2)
    byF.sliding(2).foreach { case Array(a, b) =>
      if (a._2 < b._2) assert(a._5 <= b._5, s"frequency monotonicity: $a vs $b"); ()
    }
    // every score class reachable from the rank rule: the top class is
    // non-empty on any non-degenerate distribution
    assert(out.exists(_._5 === 4L) || out.map(_._2).distinct.length < 4)
  }

  test("LTV curve: cumulative is monotone, final cum equals cohort total revenue") {
    val sf = "/root/testdata/sf0.001"
    val out = FunnelOps.retentionLtv(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._3).sum === sorted.last._4, "cum accumulates the cells")
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 === a._4 + b._3); ()
      }
    }
    out.foreach(r => assert(r._6 === r._4.toDouble / r._5 / 100.0))
  }

  test("streaks: consecutive-day runs are maximal and partition active days") {
    val sf = "/root/testdata/sf0.001"
    val out = FunnelOps.activityStreaks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.nonEmpty)
    val active = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(ts AS DATE) AS d").distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    out.foreach { case (u, s0, e0, len) =>
      val start = java.time.LocalDate.parse(s0)
      val end = java.time.LocalDate.parse(e0)
      assert(java.time.temporal.ChronoUnit.DAYS.between(start, end) + 1 === len)
      (0L until len).foreach(i => assert(active((u, start.plusDays(i)))))
      // maximality: the days just outside the streak are inactive
      assert(!active((u, start.minusDays(1))), s"streak $u not left-maximal")
      assert(!active((u, end.plusDays(1))), s"streak $u not right-maximal")
    }
    assert(out.map(_._4).sum === active.size.toLong, "streaks partition active days")
  }
}
