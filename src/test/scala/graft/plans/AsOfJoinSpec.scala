package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.AsOf
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Native as-of join exec: semantics (backward match, strict vs
  * inclusive, unmatched rows, tie-breaks, partition boundaries) and
  * equivalence with the composed window form on the events table.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def trades = Seq(
    // (trade_id, sym, t)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "b", 5L),
    (5L, "c", 100L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (quote_id, qsym, qt, px)
    (100L, "a", 5L, 1.0), (101L, "a", 20L, 2.0), (102L, "a", 30L, 3.0),
    (103L, "b", 6L, 9.0) // after b's only trade
  ).toDF("quote_id", "qsym", "qt", "px")

  private def run(strict: Boolean): Map[Long, Any] =
    AsOf.join(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("qsym"),
        leftOrder = Seq("t"), rightOrder = Seq("qt"), strict = strict)
      .select($"trade_id", $"quote_id")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap

  test("inclusive backward as-of picks the last quote at-or-before") {
    val m = run(strict = false)
    assert(m(1L) == 100L) // t=10: quote at 5
    assert(m(2L) == 101L) // t=20: quote AT 20 (inclusive)
    assert(m(3L) == 101L)
    assert(m(4L) == null) // b: only quote is after the trade
    assert(m(5L) == null) // c: no quotes at all
  }

  test("strict backward as-of excludes equal order values") {
    val m = run(strict = true)
    assert(m(1L) == 100L)
    assert(m(2L) == 100L) // quote at 20 excluded under strict
    assert(m(4L) == null)
  }

  test("last-of-several: the greatest matching order value wins") {
    val l = Seq((1L, "k", 100L)).toDF("lid", "k", "t")
    val r = Seq((10L, "k", 1L), (11L, "k", 50L), (12L, "k", 99L), (13L, "k", 101L))
      .toDF("rid", "rk", "rt")
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
      strict = false).select($"rid").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(12L))
  }

  test("composite order tuple breaks ties lexicographically") {
    val l = Seq((1L, "k", 10L, 5L)).toDF("lid", "k", "t", "seq")
    val r = Seq((20L, "k", 10L, 4L), (21L, "k", 10L, 5L), (22L, "k", 10L, 6L))
      .toDF("rid", "rk", "rt", "rseq")
    val strictGot = AsOf.join(l, r, Seq("k"), Seq("rk"),
        Seq("t", "seq"), Seq("rt", "rseq"), strict = true)
      .select($"rid").collect().map(_.getLong(0)).toSeq
    assert(strictGot == Seq(20L)) // (10,4) < (10,5); (10,5) excluded
    val inclGot = AsOf.join(l, r, Seq("k"), Seq("rk"),
        Seq("t", "seq"), Seq("rt", "rseq"), strict = false)
      .select($"rid").collect().map(_.getLong(0)).toSeq
    assert(inclGot == Seq(21L)) // (10,5) allowed
  }

  test("randomized parity: exec == brute reference across strict/tolerance/inner") {
    // Seeded random corpora exercise the merge pass (and r11's lookahead
    // iterator) over tie-heavy, unmatched-heavy inputs: keys with no
    // quotes, quotes after every trade, order collisions between the
    // two sides. Quote order values are unique PER KEY (the operator's
    // deterministic-usage contract: equal-order candidates need an id
    // tie-break in the order tuple), while trade times freely collide
    // with quote times so strict vs inclusive genuinely differ.
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 3) {
      val syms = Vector("a", "b", "c", "d", "e", "f", "noquotes", "g")
      val trades = Seq.tabulate(200) { i =>
        (i.toLong, syms(rnd.nextInt(syms.length)), rnd.nextInt(50).toLong)
      }
      val quotes = Seq.tabulate(150) { i =>
        ((1000 + i).toLong, syms(rnd.nextInt(syms.length - 1)),
          rnd.nextInt(50).toLong)
      }.groupBy(q => (q._2, q._3)).map(_._2.head).toSeq // unique (key, qt)
      def brute(strict: Boolean, tol: Option[Long]): Map[Long, Option[Long]] =
        trades.map { case (tid, k, tt) =>
          val cands = quotes.filter { case (_, qk, qt) =>
            qk == k && (if (strict) qt < tt else qt <= tt) &&
              tol.forall(t => tt - qt <= t)
          }
          tid -> (if (cands.isEmpty) None
                  else Some(cands.maxBy(q => (q._3, q._1))._1))
        }.toMap
      val tDf = trades.toDF("trade_id", "sym", "t")
      val qDf = quotes.toDF("quote_id", "qsym", "qt")
      for (strict <- Seq(true, false); tol <- Seq(None, Some(7L))) {
        val got = AsOf.join(tDf, qDf, Seq("sym"), Seq("qsym"),
            Seq("t"), Seq("qt"), strict, tol)
          .select($"trade_id", $"quote_id")
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        assert(got === brute(strict, tol),
          s"round=$round strict=$strict tol=$tol")
      }
      // inner flavor (SQL marker): equals the outer result minus the
      // unmatched rows, with the right side's columns intact
      tDf.createOrReplaceTempView("pt_trades")
      qDf.createOrReplaceTempView("pt_quotes")
      val inner = spark.sql(
        """SELECT t.trade_id, q.quote_id FROM pt_trades t JOIN pt_quotes q
          |  ON asof_match(t.sym, q.qsym, t.t, q.qt, true)""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expectInner = brute(strict = true, tol = None)
        .collect { case (tid, Some(q)) => tid -> q }
      assert(inner === expectInner, s"round=$round inner")
    }
  }

  test("many keys across partitions: equivalent to the window form") {
    val dir = "/root/testdata/sf0.01"
    val native = graft.operators.RelationalOps.asofAttributionNative(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val composed = graft.operators.RelationalOps.asofAttribution(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("tolerance: candidates older than the lookback yield unmatched rows") {
    val m = AsOf.join(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("qsym"),
        leftOrder = Seq("t"), rightOrder = Seq("qt"),
        strict = false, tolerance = Some(3L))
      .select($"trade_id", $"quote_id")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(m(1L) == null) // t=10, last quote at 5: gap 5 > 3
    assert(m(2L) == 101L) // t=20, quote at 20: gap 0
    assert(m(4L) == null)
  }

  test("tolerance expires a candidate as the left side advances") {
    val l = Seq((1L, "k", 10L), (2L, "k", 50L)).toDF("lid", "k", "t")
    val r = Seq((10L, "k", 9L)).toDF("rid", "rk", "rt")
    val m = AsOf.join(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
        strict = false, tolerance = Some(20L))
      .select($"lid", $"rid").collect().map(x => x.getLong(0) -> x.get(1)).toMap
    assert(m(1L) == 10L) // gap 1 <= 20
    assert(m(2L) == null) // same candidate, gap 41 > 20: expired
  }

  test("tolerance=0 with allowExactMatches (strict=false) keeps only exact hits") {
    val m = AsOf.join(trades, quotes,
        leftKeys = Seq("sym"), rightKeys = Seq("qsym"),
        leftOrder = Seq("t"), rightOrder = Seq("qt"),
        strict = false, tolerance = Some(0L))
      .select($"trade_id", $"quote_id")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(m(2L) == 101L) // exactly at 20
    assert(m(1L) == null)
    // and with strict=true (allowExactMatches=false) even that is gone
    val s = AsOf.join(trades, quotes, Seq("sym"), Seq("qsym"),
        Seq("t"), Seq("qt"), strict = true, tolerance = Some(0L))
      .select($"trade_id", $"quote_id")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(s(2L) == null)
  }

  test("tolerance on a non-long primary order column is rejected") {
    val l = Seq((1L, "k", 1.5)).toDF("lid", "k", "t")
    val r = Seq((10L, "k", 1.0)).toDF("rid", "rk", "rt")
    val ex = intercept[Exception] {
      AsOf.join(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
        strict = false, tolerance = Some(1L)).collect()
    }
    assert(ex.getMessage.contains("LongType"), ex.getMessage)
  }

  test("physical plan uses AsOfJoinExec with one shuffle per side") {
    val df = AsOf.join(trades, quotes, Seq("sym"), Seq("qsym"),
      Seq("t"), Seq("qt"), strict = false)
    // SparkPlan.nodeName strips the Exec suffix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }
}
