package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Binned keyless range join: exactness vs the naive theta join (every
  * bin width), inclusive bounds, multi-bin spanning, and the plan
  * contract — an equi join on the bin key, never a nested loop.
  */
class RangeBinJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val intervals = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")), // 2h span
      (2L, ts("2024-01-01 01:30:00"), ts("2024-01-03 01:30:00")), // 2-day span, many bins
      (3L, ts("2024-01-05 10:00:00"), ts("2024-01-05 10:00:00")), // zero-width
      (4L, ts("2024-02-01 00:00:00"), ts("2024-02-01 23:59:59"))
    ).toDF("iv_id", "lo", "hi")
  }

  private lazy val points = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    Seq(
      (10L, ts("2024-01-01 00:00:00")), // == lo of iv 1 (inclusive)
      (11L, ts("2024-01-01 02:00:00")), // == hi of iv 1 (inclusive)
      (12L, ts("2024-01-02 12:00:00")), // mid of iv 2
      (13L, ts("2024-01-05 10:00:00")), // == zero-width iv 3
      (14L, ts("2024-01-04 00:00:00")), // matches nothing
      (15L, ts("2024-02-01 12:34:56"))
    ).toDF("pt_id", "t")
  }

  private def naive = intervals.join(points,
    points("t") >= intervals("lo") && points("t") <= intervals("hi"))
    .select($"iv_id", $"pt_id")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("equals the naive theta join for every bin width (pairs exact, no dupes)") {
    val expected = naive
    assert(expected.contains((1L, 10L)) && expected.contains((1L, 11L)) &&
      expected.contains((3L, 13L)), "fixture must exercise inclusive bounds")
    for (width <- Seq(60L, 3600L, 86400L, 7L * 86400L)) {
      val got = RelationalOps
        .rangeBinJoin(intervals, "lo", "hi", points, "t", width)
        .select($"iv_id", $"pt_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size,
        s"width=$width produced duplicate pairs — a pair must meet in exactly one bin")
      assert(got.toSet === expected, s"width=$width")
    }
  }

  test("plan is an equi join on the bin key — no nested loop, no cartesian") {
    val plan = RelationalOps
      .rangeBinJoin(intervals, "lo", "hi", points, "t", 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"binned range join must not plan a nested loop:\n$plan")
    // ...while the naive theta-join form does — the cliff this operator removes
    val naivePlan = intervals.join(points,
      points("t") >= intervals("lo") && points("t") <= intervals("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoop") || naivePlan.contains("CartesianProduct"),
      s"expected the keyless theta join to plan a nested loop:\n$naivePlan")
  }

  test("j11 query equals its theta-join oracle shape at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val o = graft.Tables.orders(spark, dir)
    val l = graft.Tables.lineitem(spark, dir)
    val expected = o.join(l,
      l("l_shipdate") >= o("o_orderdate") &&
        l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy($"o_orderkey").agg(count(lit(1)).as("n_shipments"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RelationalOps.rangeJoinShipments(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }
}
