package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SQL join-condition markers (`asof_match`, `range_bin_match`) and the
  * RewriteMarkerJoins rule: value equivalence with the Scala forms,
  * strict/inclusive semantics through SQL, multi-conjunct range joins,
  * and the loud failure modes (wrong join type, cross-side references,
  * marker outside a join).
  */
class MarkerJoinsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def mkViews(): Unit = {
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "b", 5L),
      (5L, "c", 100L))
      .toDF("trade_id", "sym", "t").createOrReplaceTempView("mj_trades")
    Seq((100L, "a", 5L, 1.0), (101L, "a", 20L, 2.0), (102L, "a", 30L, 3.0),
      (103L, "b", 6L, 9.0))
      .toDF("quote_id", "qsym", "qt", "px").createOrReplaceTempView("mj_quotes")
  }

  test("asof_match SQL: strict and inclusive match the native API semantics") {
    mkViews()
    def run(strict: Boolean): Map[Long, Any] = spark.sql(
      s"""SELECT t.trade_id, q.quote_id FROM mj_trades t LEFT JOIN mj_quotes q
         |  ON asof_match(t.sym, q.qsym, t.t, q.qt, $strict)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val inc = run(strict = false)
    assert(inc(1L) == 100L && inc(2L) == 101L && inc(3L) == 101L)
    assert(inc(4L) == null && inc(5L) == null)
    val st = run(strict = true)
    assert(st(1L) == 100L && st(2L) == 100L && st(3L) == 100L)
    assert(st(4L) == null && st(5L) == null)
  }

  test("asof_match SQL: struct order tuples compare lexicographically") {
    mkViews()
    // order tuples (t, trade_id) vs (qt, quote_id), inclusive: at t=20
    // quote 101's tuple (20, 101) EXCEEDS trade 2's (20, 2) — the
    // second component breaks the tie — so the lexicographic
    // predecessor is quote 100 (qt=5), unlike the single-column
    // inclusive form where (20) <= (20) matches quote 101
    val m = spark.sql(
      """SELECT t.trade_id, q.quote_id FROM mj_trades t LEFT JOIN mj_quotes q
        |  ON asof_match(t.sym, q.qsym,
        |    struct(t.t, t.trade_id), struct(q.qt, q.quote_id), false)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(m(1L) == 100L && m(2L) == 100L && m(3L) == 100L)
    assert(m(4L) == null && m(5L) == null)
  }

  test("asof_match INNER JOIN drops unmatched left rows (DuckDB ASOF default)") {
    mkViews()
    val got = spark.sql(
      """SELECT t.trade_id, q.quote_id FROM mj_trades t JOIN mj_quotes q
        |  ON asof_match(t.sym, q.qsym, t.t, q.qt, false)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same matches as the inclusive LEFT form, minus the null rows
    assert(got === Map(1L -> 100L, 2L -> 101L, 3L -> 101L))
  }

  test("LEFT asof_match under a null-rejecting filter still plans (EliminateOuterJoin)") {
    mkViews()
    // the optimizer converts LEFT + WHERE right-col IS NOT NULL into an
    // INNER marker join BEFORE the rewrite runs — the documented
    // workaround for inner semantics must not error
    val df = spark.sql(
      """SELECT t.trade_id, q.quote_id FROM mj_trades t LEFT JOIN mj_quotes q
        |  ON asof_match(t.sym, q.qsym, t.t, q.qt, false)
        |WHERE q.quote_id IS NOT NULL""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 100L, 2L -> 101L, 3L -> 101L))
  }

  test("asof_match SQL rejects unsupported join types loudly") {
    mkViews()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT t.trade_id, q.quote_id FROM mj_trades t RIGHT JOIN mj_quotes q
          |  ON asof_match(t.sym, q.qsym, t.t, q.qt)""".stripMargin).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("LEFT OUTER"),
      s"unexpected: ${e.getMessage}")
  }

  test("asof_match marker outside a join fails loudly, not silently") {
    mkViews()
    val e = intercept[Exception] {
      spark.sql(
        "SELECT asof_match(trade_id, trade_id, t, t) FROM mj_trades").collect()
    }
    // two loud failure paths, both acceptable: over local relations
    // ConvertToLocalRelation evals the projection in an EARLIER batch
    // (runtime-marker error); otherwise the rule's post-transform
    // validation reports the placement contract
    assert(e.getMessage != null &&
      (e.getMessage.contains("top-level AND conjunct") ||
        e.getMessage.contains("join-condition marker")), s"unexpected: ${e.getMessage}")
  }

  test("marker under OR in a join condition gets the placement-contract error") {
    mkViews()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT t.trade_id FROM mj_trades t LEFT JOIN mj_quotes q
          |  ON asof_match(t.sym, q.qsym, t.t, q.qt) OR t.t > 100""".stripMargin)
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("top-level AND conjunct"),
      s"unexpected: ${e.getMessage}")
  }

  test("asof_match composes with a cross-side equality and a right-side filter") {
    mkViews()
    // extra key: same parity group; right filter: px >= 2.0.
    // truth per trade (strict, keys (sym, parity)):
    //   trade 1 (a, odd t=10): quotes a with qt<10, parity(qt)=parity(10)=even
    //     -> quote 100 qt=5 odd... parity(t)=t%2: 10%2=0; qt%2: 5->1, 20->0, 30->0
    //     candidates for trade1: qt<10 & qt%2=0 & px>=2.0 -> none => null
    //   trade 2 (a, t=20, parity 0): qt<20, parity 0, px>=2.0 -> none (101 qt=20 not <20) => null
    //   trade 3 (a, t=20): same => null... too degenerate; use px filter only for one case
    val got = spark.sql(
      """SELECT t.trade_id, q.quote_id FROM mj_trades t LEFT JOIN mj_quotes q
        |  ON asof_match(t.sym, q.qsym, t.t, q.qt, false)
        |  AND t.t % 2 = q.qt % 2
        |  AND q.px >= 2.0""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    // inclusive; keys (sym, t%2); right side filtered to px>=2 (quotes 101, 102)
    //   trade 1 (a, t=10, par 0): quotes par 0 with qt<=10 among {101 qt=20, 102 qt=30} -> none
    //   trade 2 (a, t=20, par 0): qt<=20 -> quote 101
    //   trade 3 (a, t=20, par 0): -> quote 101
    //   trade 4 (b, t=5, par 1): quote 103 par 0 (qt=6) filtered px 9.0 ok but par differs -> null
    //   trade 5 (c): no c quotes -> null
    assert(got(1L) == null && got(2L) == 101L && got(3L) == 101L)
    assert(got(4L) == null && got(5L) == null)
  }

  test("cross-side equality composes as a KEY: earlier-same-day candidate wins") {
    // Pins the DELIBERATE divergence from standard ON-filter semantics
    // (documented on AsOfMark): `AND l.day = r.day` restricts the
    // candidate set BEFORE the latest-not-after pick. Trade (day 5,
    // t=20); quotes: 100 (day 5, qt=10) and 101 (day 6, qt=15). The
    // latest-overall candidate is 101 — a standard post-match ON filter
    // would test day(101)=6 vs 5, fail, and yield NULL. Key composition
    // instead picks the latest SAME-DAY quote: 100.
    Seq((1L, "a", 5L, 20L)).toDF("trade_id", "sym", "day", "t")
      .createOrReplaceTempView("mj_day_trades")
    Seq((100L, "a", 5L, 10L), (101L, "a", 6L, 15L))
      .toDF("quote_id", "qsym", "qday", "qt")
      .createOrReplaceTempView("mj_day_quotes")
    val got = spark.sql(
      """SELECT t.trade_id, q.quote_id FROM mj_day_trades t
        |LEFT JOIN mj_day_quotes q
        |  ON asof_match(t.sym, q.qsym, t.t, q.qt) AND t.day = q.qday""".stripMargin)
      .collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 100L,
      "equality must compose as an as-of key (earlier same-day match), " +
        "not as a post-match filter (which would null the row)")
  }

  test("marker join inside an EXISTS subquery is rewritten, not left to runtime") {
    mkViews()
    val df = spark.sql(
      """SELECT tr.trade_id FROM mj_trades tr WHERE EXISTS (
        |  SELECT 1 FROM mj_trades t2 LEFT JOIN mj_quotes q
        |    ON asof_match(t2.sym, q.qsym, t2.t, q.qt)
        |  WHERE t2.trade_id = tr.trade_id AND q.quote_id IS NOT NULL)""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(df.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("misplaced marker inside a subquery gets the placement error, not the runtime one") {
    mkViews()
    // marker under OR, inside an EXISTS: neither rewritable nor allowed
    // — the validation must descend into the subquery plan and name the
    // placement contract instead of the misleading extensions error
    val e = intercept[Exception] {
      spark.sql(
        """SELECT tr.trade_id FROM mj_trades tr WHERE EXISTS (
          |  SELECT 1 FROM mj_trades t2 LEFT JOIN mj_quotes q
          |    ON asof_match(t2.sym, q.qsym, t2.t, q.qt) OR t2.t > 100
          |  WHERE t2.trade_id = tr.trade_id)""".stripMargin).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("top-level AND conjunct"),
      s"unexpected: ${e.getMessage}")
    assert(!e.getMessage.contains("Install the engine extensions"),
      "must not misleadingly blame missing extensions")
  }

  test("asof_match with a left-only extra conjunct names the real limitation") {
    mkViews()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT t.trade_id, q.quote_id FROM mj_trades t LEFT JOIN mj_quotes q
          |  ON asof_match(t.sym, q.qsym, t.t, q.qt) AND t.t > 6""".stripMargin)
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("cannot compose"),
      s"unexpected: ${e.getMessage}")
    assert(!e.getMessage.contains("Install the engine extensions"),
      "must not misleadingly blame missing extensions")
  }

  test("range_bin_match bins integral epoch-second columns numerically") {
    // bigint epoch seconds: unix_timestamp() would string-parse these to
    // NULL and silently match nothing — the typed bin must keep them
    Seq((1L, 0L, 7200L), (2L, 90000L, 100000L))
      .toDF("iv_id", "lo", "hi").createOrReplaceTempView("mj_iv_epoch")
    Seq((10L, 3600L), (11L, 86400L), (12L, 95000L))
      .toDF("pt_id", "ts").createOrReplaceTempView("mj_pts_epoch")
    val got = spark.sql(
      """SELECT i.iv_id, p.pt_id FROM mj_iv_epoch i JOIN mj_pts_epoch p
        |  ON range_bin_match(p.ts, i.lo, i.hi, 3600L)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 12L)))
  }

  test("range_bin_match rejects mixed temporal/integral operands loudly") {
    mkRangePlanViews()
    Seq((10L, 3600L)).toDF("pt_id", "ts_num")
      .createOrReplaceTempView("mj_pts_num")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT i.iv_id, p.pt_id FROM mj_iv2 i JOIN mj_pts_num p
          |  ON range_bin_match(p.ts_num, i.lo, i.hi, 3600L)""".stripMargin)
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("not a mix"),
      s"unexpected: ${e.getMessage}")
  }

  test("markers survive a TEMP VIEW boundary: the rewrite still plans AsOfJoin") {
    mkViews()
    // the marker join sits INSIDE a view; the outer query filters above
    // it — the rule runs post-analysis on the inlined plan and must
    // still rewrite (never leave the marker to a nested-loop condition)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW mj_asof_v AS
        |SELECT t.trade_id, t.sym, q.quote_id, q.px
        |FROM mj_trades t LEFT JOIN mj_quotes q
        |  ON asof_match(t.sym, q.qsym, t.t, q.qt)""".stripMargin)
    val df = spark.sql("SELECT trade_id, quote_id FROM mj_asof_v WHERE sym <> 'zz'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(df.count() === 5L)
  }

  test("markers survive a CTE boundary (referenced twice): both references rewrite") {
    mkRangePlanViews()
    // multi-reference CTE: Spark may keep WithCTE/CTERelationRef rather
    // than inline — the rewrite must reach the join inside the CTE def
    val df = spark.sql(
      """WITH j AS (
        |  SELECT i.iv_id, p.pt_id FROM mj_iv2 i JOIN mj_pts2 p
        |    ON range_bin_match(p.ts, i.lo, i.hi, 3600L))
        |SELECT a.iv_id, a.pt_id, b.pt_id AS pt2
        |FROM j a JOIN j b ON a.iv_id = b.iv_id""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(df.count() === 1L)
  }

  test("range_bin_match SQL: equals the naive range join, extra conjuncts honored") {
    Seq((1L, "2024-01-01 00:00:00", "2024-01-03 00:00:00", "x"),
      (2L, "2024-01-05 00:00:00", "2024-01-09 00:00:00", "y"))
      .toDF("iv_id", "lo_s", "hi_s", "grp")
      .selectExpr("iv_id", "CAST(lo_s AS TIMESTAMP) AS lo",
        "CAST(hi_s AS TIMESTAMP) AS hi", "grp")
      .createOrReplaceTempView("mj_iv")
    Seq((10L, "2024-01-02 12:00:00", "x"), (11L, "2024-01-04 00:00:00", "x"),
      (12L, "2024-01-06 00:00:00", "y"), (13L, "2024-01-06 00:00:00", "z"),
      (14L, "2024-01-09 00:00:00", "y"))
      .toDF("pt_id", "ts_s", "pgrp")
      .selectExpr("pt_id", "CAST(ts_s AS TIMESTAMP) AS ts", "pgrp")
      .createOrReplaceTempView("mj_pts")
    val got = spark.sql(
      """SELECT i.iv_id, p.pt_id FROM mj_iv i JOIN mj_pts p
        |  ON range_bin_match(p.ts, i.lo, i.hi, 86400L) AND i.grp = p.pgrp""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive truth: ts within [lo, hi] and group equal
    // iv1 x: pt10 (in), pt11 (after hi) -> (1,10)
    // iv2 y: pt12 (in), pt14 (at hi, inclusive) -> (2,12),(2,14); pt13 z excluded
    assert(got === Set((1L, 10L), (2L, 12L), (2L, 14L)))
  }

  test("range_bin_match SQL plans an equi join on the bin key with explode") {
    mkRangePlanViews()
    val plan = spark.sql(
      """SELECT i.iv_id, p.pt_id FROM mj_iv2 i JOIN mj_pts2 p
        |  ON range_bin_match(p.ts, i.lo, i.hi, 3600L)""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Generate explode"), plan)
  }

  test("range_bin_match SQL: flipped sides (points left) keeps column order") {
    mkRangePlanViews()
    val df = spark.sql(
      """SELECT * FROM mj_pts2 p JOIN mj_iv2 i
        |  ON range_bin_match(p.ts, i.lo, i.hi, 3600L)""".stripMargin)
    assert(df.columns.toSeq === Seq("pt_id", "ts", "iv_id", "lo", "hi"))
    assert(df.count() === 1L)
  }

  private def mkRangePlanViews(): Unit = {
    Seq((1L, "2024-01-01 00:00:00", "2024-01-01 05:00:00"))
      .toDF("iv_id", "lo_s", "hi_s")
      .selectExpr("iv_id", "CAST(lo_s AS TIMESTAMP) AS lo",
        "CAST(hi_s AS TIMESTAMP) AS hi")
      .createOrReplaceTempView("mj_iv2")
    Seq((10L, "2024-01-01 02:00:00"), (11L, "2024-01-02 00:00:00"))
      .toDF("pt_id", "ts_s")
      .selectExpr("pt_id", "CAST(ts_s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("mj_pts2")
  }
}
