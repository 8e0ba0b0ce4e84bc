package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Planted-value checks for the round-7 decision-support additions
  * (q9/q11/q20 adaptations, NTILE, exact-moment correlation). The
  * DuckDB gate proves cross-engine agreement; these prove the intended
  * SEMANTICS on inputs where the right answer is hand-computable.
  */
class AnalyticsExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  /** Write a minimal star schema into a temp dir: two parts (a "bolt"
    * and a "gear"), two suppliers (ASIA / AMERICA), one order, and the
    * given lineitem rows.
    */
  private def miniStar(lines: Seq[(Long, Long, Long, Double, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ana").toString
    import spark.implicits._
    Seq((0L, "AFRICA"), (1L, "AMERICA"), (2L, "ASIA"), (3L, "EUROPE"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((10L, "CHINA", 2L), (11L, "BRAZIL", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "Supplier#1", 10L, 100.0), (2L, "Supplier#2", 10L, 100.0),
      (3L, "Supplier#3", 11L, 100.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((100L, "red bolt", "Brand#1", "ECONOMY", 5, 3.00),
      (200L, "blue gear", "Brand#2", "SMALL", 7, 3.00))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, "Customer#1", 10L, 50.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1000L, 1L, "F", 100.0, ts("1996-03-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    lines.zipWithIndex.map { case ((ok, pk, sk, qty, price, ship), i) =>
      (ok, pk, sk, i + 1, qty, price, 0.05, 0.01, "N", "O", ts(ship))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q20: majority share within the part family and ship-year only") {
    // bolt part 100: s1 ships 60, s2 ships 40 -> only s1 dominant
    // (2*60 > 100; 2*40 < 100). s2's 1995 row and the gear part's sole
    // (trivially dominant) supplier s3 must not leak in.
    val dir = miniStar(Seq(
      (1000L, 100L, 1L, 60.0, 10.0, "1996-05-01"),
      (1000L, 100L, 2L, 40.0, 10.0, "1996-06-01"),
      (1000L, 100L, 2L, 500.0, 10.0, "1995-06-01"), // outside window
      (1000L, 200L, 3L, 9.0, 10.0, "1996-07-01"))) // not a bolt
    val got = AnalyticsOps.dominantPartSuppliers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "Supplier#1")))
  }

  test("q11: region filter and above-mean share threshold") {
    // ASIA suppliers are s1/s2; s3 (AMERICA) contributes nothing.
    // part 100 value: (10+10)*300c = 6000c; part 200: 1*300c = 300c.
    // total 6300c over 2 parts -> part100: 6000*2 > 6300 keep;
    // part200: 600 < 6300 drop. s3's huge line on part 200 must not
    // raise its value above the mean (region exclusion).
    val dir = miniStar(Seq(
      (1000L, 100L, 1L, 10.0, 10.0, "1996-05-01"),
      (1000L, 100L, 2L, 10.0, 10.0, "1996-06-01"),
      (1000L, 200L, 1L, 1.0, 10.0, "1996-07-01"),
      (1000L, 200L, 3L, 1000.0, 10.0, "1996-07-01"))) // non-ASIA: excluded
    val got = AnalyticsOps.importantPartValues(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(100L -> 60.0))
  }

  test("q9: profit arithmetic is exact per (nation, year)") {
    // gear part 200 only; price 10.00, disc 5%, qty 2, retail 3.00:
    // 1000c*95 - 300c*100*2 = 95000 - 60000 = 35000 e-4$ = 3.50
    val dir = miniStar(Seq(
      (1000L, 200L, 1L, 2.0, 10.0, "1996-05-01"),
      (1000L, 100L, 1L, 50.0, 10.0, "1996-05-01"))) // bolt: filtered out
    val got = AnalyticsOps.productTypeProfit(spark, dir).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      === Set(("CHINA", 1996L, 3.5)))
  }

  test("ntile: equi-count buckets, monotone in the order key") {
    val out = AnalyticsOps.ntileBuckets(spark, sf).cache()
    try {
      // bucket sizes within each priority differ by at most 1
      val sizes = out.groupBy($"priority", $"tile").count()
        .groupBy($"priority").agg((max($"count") - min($"count")).as("d"))
      assert(sizes.where($"d" > 1).count() === 0)
      // tiles are monotone w.r.t. the price order: joining orders back,
      // a higher-priced order never lands in a lower tile
      val priced = out.join(
        graft.Tables.orders(spark, sf).select($"o_orderkey".as("orderkey"),
          $"o_totalprice".cast("decimal(18,2)").as("price")), Seq("orderkey"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"priority").orderBy($"price", $"orderkey")
      assert(priced.withColumn("prev_tile", lag($"tile", 1).over(w))
        .where($"prev_tile" > $"tile").count() === 0)
    } finally out.unpersist()
  }

  test("corr: exactly linear data gives corr 1 and the hand covariance") {
    // price = 2.00 * qty exactly -> corr 1 (up to one double sqrt
    // rounding), covar_pop = 2 * var_pop(qty) in dollars*qty units
    val dir = miniStar(Seq(
      (1000L, 100L, 1L, 1.0, 2.0, "1996-05-01"),
      (1000L, 100L, 1L, 2.0, 4.0, "1996-05-01"),
      (1000L, 100L, 1L, 3.0, 6.0, "1996-05-01"),
      (1000L, 100L, 1L, 4.0, 8.0, "1996-05-01")))
    val r = AnalyticsOps.corrExact(spark, dir).collect()
    assert(r.length === 1)
    assert(math.abs(r(0).getDouble(2) - 1.0) < 1e-12)
    // qty 1..4: var_pop = 1.25; slope 2 $/qty -> covar_pop = 2.5
    assert(math.abs(r(0).getDouble(3) - 2.5) < 1e-12)
  }

  test("linear attribution: exact ppm split, remainder to first touch, window pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    import spark.implicits._
    val t = (d: Int, h: Int) => Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // user 7: views at d2,d3,d4 then purchase d5 (3 touches, 10^6 div 3
    // = 333333 rem 1 -> earliest gets 333334); a d20 purchase sees ONLY
    // the d15 view (7-day window drops d2-d4); user 8 purchases with no
    // views at all
    Seq(
      (1L, t(2, 0), 7L, "view", 1.0, "{}"),
      (2L, t(3, 0), 7L, "view", 1.0, "{}"),
      (3L, t(4, 0), 7L, "view", 1.0, "{}"),
      (4L, t(5, 0), 7L, "purchase", 9.0, "{}"),
      (5L, t(15, 0), 7L, "view", 1.0, "{}"),
      (6L, t(20, 0), 7L, "purchase", 5.0, "{}"),
      (7L, t(21, 0), 8L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = RelationalOps.linearAttribution(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (4L, 1L, 333334L), (4L, 2L, 333333L), (4L, 3L, 333333L),
      (6L, 5L, 1000000L), (7L, -1L, 1000000L)))
  }

  test("linear attribution weights sum to exactly 1e6 per purchase on real data") {
    val sums = RelationalOps.linearAttribution(spark, sf)
      .groupBy($"purchase_id").agg(sum($"weight_ppm").as("s"))
    assert(sums.where($"s" =!= 1000000L).count() === 0)
  }

  test("u-shape attribution: 40/20/40 split, middle remainder to rank 2, degenerate n") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ushape").toString
    import spark.implicits._
    val t = (d: Int, h: Int) => Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // user 7: 5 touches -> first/last 400000, middles 200000 div 3 =
    // 66666 rem 2 (earliest middle gets 66668); user 8: 2 touches ->
    // 500000 each; user 9: 1 touch -> 1000000; user 10: none -> -1
    Seq(
      (1L, t(2, 0), 7L, "view", 1.0, "{}"),
      (2L, t(2, 1), 7L, "view", 1.0, "{}"),
      (3L, t(2, 2), 7L, "view", 1.0, "{}"),
      (4L, t(2, 3), 7L, "view", 1.0, "{}"),
      (5L, t(2, 4), 7L, "view", 1.0, "{}"),
      (6L, t(3, 0), 7L, "purchase", 9.0, "{}"),
      (7L, t(2, 0), 8L, "view", 1.0, "{}"),
      (8L, t(2, 1), 8L, "view", 1.0, "{}"),
      (9L, t(3, 0), 8L, "purchase", 5.0, "{}"),
      (10L, t(2, 0), 9L, "view", 1.0, "{}"),
      (11L, t(3, 0), 9L, "purchase", 5.0, "{}"),
      (12L, t(3, 0), 10L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = RelationalOps.ushapeAttribution(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (6L, 1L, 400000L), (6L, 2L, 66668L), (6L, 3L, 66666L),
      (6L, 4L, 66666L), (6L, 5L, 400000L),
      (9L, 7L, 500000L), (9L, 8L, 500000L),
      (11L, 10L, 1000000L), (12L, -1L, 1000000L)))
  }

  test("u-shape attribution weights sum to exactly 1e6 per purchase on real data") {
    val sums = RelationalOps.ushapeAttribution(spark, sf)
      .groupBy($"purchase_id").agg(sum($"weight_ppm").as("s"))
    assert(sums.where($"s" =!= 1000000L).count() === 0)
  }

  test("basket lift: planted baskets give the hand-computed support and lift") {
    // o1:{100,200} twice via two lines of 100? no — distinct per order.
    // orders: o1 {100,200}, o2 {100,200}, o3 {100}. pairs: (100,200)
    // n_ab=2; n_100=3, n_200=2, N=3 -> lift = 2*3/(3*2) = 1.0
    val dir = miniStar(Seq(
      (1L, 100L, 1L, 1.0, 10.0, "1996-05-01"),
      (1L, 200L, 1L, 1.0, 10.0, "1996-05-01"),
      (1L, 200L, 2L, 2.0, 10.0, "1996-05-02"), // dup (order, part): distinct'd
      (2L, 100L, 1L, 1.0, 10.0, "1996-05-01"),
      (2L, 200L, 1L, 1.0, 10.0, "1996-05-01"),
      (3L, 100L, 1L, 1.0, 10.0, "1996-05-01")))
    val got = AnalyticsOps.basketLiftPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((100L, 200L, 2L, 1.0)))
  }

  test("recency score: exact power-of-two decay, horizon cap, anchor from data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rfm").toString
    import spark.implicits._
    val t = (s: String) => Timestamp.valueOf(s + " 12:00:00")
    // anchor = 2024-12-31. user 7: 1.00 at anchor (w=1) + 1.00 at 30
    // days (1 half-life, w=1/2) -> 1.5; user 8: 1.00 at 90 days
    // (3 half-lives) -> 0.125; user 9: 1.00 at ~5 years, beyond the
    // 30-half-life horizon -> weight exactly 2^-30
    Seq(
      (1L, t("2024-12-31"), 7L, "view", 1.0, "{}"),
      (2L, t("2024-12-01"), 7L, "view", 1.0, "{}"),
      (3L, t("2024-10-02"), 8L, "view", 1.0, "{}"),
      (4L, t("2019-12-31"), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = TimeSeriesOps.userRecencyScore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got(0) === ((7L, 2L, 0L, 1.5)))
    assert(got(1) === ((8L, 1L, 90L, 0.125)))
    assert(got(2) === ((9L, 1L, 1827L, math.pow(2.0, -30))))
  }

  test("corr on real data matches a driver-side double recompute") {
    val r = AnalyticsOps.corrExact(spark, sf).collect()
    val rows = graft.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity".cast("long"),
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val byFlag = rows.groupBy(_._1)
    r.foreach { row =>
      val g = byFlag(row.getString(0))
      val n = g.length.toDouble
      val xs = g.map(_._2.toDouble); val ys = g.map(_._3.toDouble)
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / n
      val sdx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum / n)
      val sdy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum / n)
      assert(math.abs(row.getDouble(2) - cov / (sdx * sdy)) < 1e-9)
      assert(math.abs(row.getDouble(3) - cov / 100.0) < math.abs(cov) * 1e-9)
    }
  }

  test("percent_rank/cume_dist: exact endpoints and single-row peer groups") {
    val out = AnalyticsOps.percentRanks(spark, sf).cache()
    try {
      assert(out.where($"pct_rank" < 0.0 || $"pct_rank" > 1.0 ||
        $"cum_dist" <= 0.0 || $"cum_dist" > 1.0).count() === 0)
      // unique composite order key -> within each priority exactly one
      // row at pct_rank 0 and exactly one at cume_dist 1
      val ends = out.groupBy($"priority").agg(
        sum(when($"pct_rank" === 0.0, 1L).otherwise(0L)).as("zeros"),
        sum(when($"cum_dist" === 1.0, 1L).otherwise(0L)).as("ones"),
        count(lit(1)).as("n"))
      assert(ends.where($"zeros" =!= 1L || $"ones" =!= 1L).count() === 0)
      // replay one partition driver-side: pct_rank = (rank-1)/(n-1)
      val p = ends.orderBy($"n".desc).first().getString(0)
      val rows = out.where($"priority" === p).orderBy($"pct_rank").collect()
      val n = rows.length
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getDouble(2) === i.toDouble / (n - 1).toDouble)
        assert(r.getDouble(3) === (i + 1).toDouble / n.toDouble)
      }
    } finally out.unpersist()
  }

  test("exact mode: highest count, lexicographically smallest tie-break, full replay") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = rows.groupBy(_._1).map { case (u, xs) =>
      val counts = xs.groupBy(_._2).map { case (m, ys) => m -> ys.length.toLong }
      // deterministic tie-break: max count, then SMALLEST type string
      val (mode, n) = counts.toSeq.sortBy { case (m, c) => (-c, m) }.head
      u -> (mode, n, xs.length.toLong)
    }
    val got = AnalyticsOps.modeExact(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (u, (mode, n, total)) =>
      val (gm, gn, gt, gs) = got(u)
      assert((gm, gn, gt) === ((mode, n, total)), s"user $u")
      assert(gs === n.toDouble / total.toDouble)
    }
  }

  test("topk_with_ties: bounded ranks, equal revenue shares a rank") {
    val out = AnalyticsOps.topRevenueBrandsWithTies(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(2)).max <= AnalyticsOps.TiesK)
    out.groupBy(_.getLong(1)).values.foreach { rows =>
      assert(rows.map(_.getLong(2)).distinct.length === 1,
        "equal revenue must share a rank")
    }
  }

  test("hierarchy_shares: shares sum to 1 per region and overall") {
    val out = AnalyticsOps.hierarchyShares(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    out.groupBy(_._1).foreach { case (reg, rows) =>
      assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9, s"region $reg")
    }
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-9)
  }

  test("latest-row compaction is a hash aggregate (no per-key window) and matches the window form") {
    val df = AnalyticsOps.latestRowCompaction(spark, sf)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "the decimal-packed max must keep the hash-agg shape")
    // equivalence with the rank-window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val viaWindow = graft.Tables.events(spark, sf)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === viaWindow)
  }

  test("session duration histogram accounts for every session") {
    val sessions = AnalyticsOps.sessionize(spark, sf).count()
    val hist = AnalyticsOps.sessionDurationHist(spark, sf).collect()
    assert(hist.map(_.getLong(2)).sum === sessions)
    assert(math.abs(hist.map(_.getDouble(4)).sum - 1000000.0) < 1.0)
  }

  test("incremental MV refresh is indistinguishable from a full recompute") {
    val sf = "/root/testdata/sf0.001"
    val merged = AnalyticsOps.mvIncrementalRefresh(spark, sf)
    val full = graft.Tables.events(spark, sf)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type")
      .agg(sum((RelationalOps.dec($"value") * 100).cast("long")).as("cents"),
        count(lit(1)).as("pv"))
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
    // the cutoff actually splits the domain: both legs non-empty
    val days = merged.select($"day").distinct().collect().map(_.getString(0))
    assert(days.exists(_ < AnalyticsOps.MvCutoff) &&
      days.exists(_ >= AnalyticsOps.MvCutoff),
      "cutoff fell outside the data's day span — the merge would be vacuous")
  }
}
