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

  test("asof_match SQL rejects non-left-outer joins loudly") {
    mkViews()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT t.trade_id, q.quote_id FROM mj_trades t JOIN mj_quotes q
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
    assert(e.getMessage != null &&
      e.getMessage.contains("join-condition marker"), s"unexpected: ${e.getMessage}")
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
