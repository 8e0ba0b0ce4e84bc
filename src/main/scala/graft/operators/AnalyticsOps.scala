package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** The implied DWS/ADS analytics surface (SURVEY.md §2.8: the reference
  * planned but never built its OLAP layer — ClickHouse sink config,
  * blink-planner deps): multi-dim aggregation (rollup/cube), ranking,
  * set operations, sessionization, global top-k.
  *
  * Scale notes: rollup/cube expand grouping sets before aggregation but
  * keep partial aggregation map-side; rank windows shuffle once on the
  * partition key; top-k compiles to TakeOrderedAndProject (per-partition
  * heap + driver merge of k rows — never a full sort of the input).
  */
object AnalyticsOps {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Rollup over (returnflag, linestatus): subtotals + grand total.
    * Grouping nulls are rewritten to 'ALL' via GROUPING() so the output
    * is total-order-able across engines.
    *
    * Pre-aggregated before the rollup (r17, guide §2.3 "aggregate
    * before you shuffle"): `rollup` plans Expand×(levels) BEFORE the
    * partial aggregate, so the fact scan's agg-hash work is multiplied
    * by the lattice size — at any scale, since Expand runs per input
    * row. Aggregating on the FULL grouping key first (exactly the
    * partial-aggregation identity: count→sum of counts, sum→sum of
    * sums, exact decimal arithmetic reassociated) leaves Expand a
    * handful of pre-aggregated rows. GROUPING() semantics are
    * unchanged — rollup null-extension over the base frame's keys is
    * the same lattice, and data-borne NULL keys stay distinguished
    * from rollup-generated ones by grouping(), as before.
    */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("pn"), sum(dec($"l_quantity")).as("pq"))
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        expr("CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END").as("returnflag"),
        expr("CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END").as("linestatus"),
        sum($"pn").as("n"),
        sum($"pq").cast("double").as("sum_qty"))
      .select($"returnflag", $"linestatus", $"n", $"sum_qty")

  /** Explicit GROUPING SETS (beyond rollup/cube's fixed lattices): the
    * (flag, status), (status), () sets — NOT a rollup of (flag, status)
    * (which would subtotal by flag); the per-status subtotal is the
    * set a rollup cannot express, which is the point of the operator.
    * Pre-aggregated on the full (flag, status) key before the sets
    * expand — see [[rollupSummary]] (guide §2.3).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir).createOrReplaceTempView("li_gsets")
    spark.sql(
      """WITH base AS (
        |  SELECT l_returnflag, l_linestatus,
        |    count(*) AS pn, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS pp
        |  FROM li_gsets GROUP BY l_returnflag, l_linestatus)
        |SELECT
        |  CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
        |  CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
        |  sum(pn) AS n,
        |  CAST(sum(pp) AS DOUBLE) AS sum_price
        |FROM base
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin)
  }

  /** Pivot: order counts per priority × status — conditional-aggregation
    * semantics (one pass, no join), the wide-table report shape.
    */
  def pivotStatusCounts(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy($"o_orderpriority".as("priority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select($"priority",
        coalesce($"O", lit(0L)).as("n_open"),
        coalesce($"F", lit(0L)).as("n_filled"),
        coalesce($"P", lit(0L)).as("n_pending"))

  /** Unpivot (melt): the wide pivot report back to long form — one row
    * per (priority, status bucket). Narrow Expand-based operator, no
    * shuffle beyond the pivot's own aggregation.
    */
  def unpivotStatusCounts(spark: SparkSession, dir: String): DataFrame =
    pivotStatusCounts(spark, dir)
      .unpivot(Array($"priority"),
        Array($"n_open", $"n_filled", $"n_pending"),
        "status_bucket", "n")

  /** Exact per-group median (no approx sketch): the two middle elements
    * by (value, event_id) window rank, averaged. One shuffle on the
    * group key; rank + filter keeps ≤2 rows per group before the final
    * tiny aggregation.
    */
  def medianValueByType(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy($"event_type").orderBy($"value", $"event_id")
    val wc = Window.partitionBy($"event_type")
    events(spark, dir)
      .select($"event_type", $"value", $"event_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wc))
      // `div`, not `/`: Spark's / on longs is double division, which
      // would silently select only the upper-middle row for even groups
      .filter(expr("rn = (cnt + 1) div 2 OR rn = (cnt + 2) div 2"))
      .groupBy($"event_type")
      .agg(avg($"value").as("median_value"), first($"cnt").as("n"))
      .select($"event_type", $"median_value", $"n")
  }

  /** Percentile targets / rank tolerance for [[percentileApprox]]. ε is
    * deliberately loose (the δ=100 digest's real error is well under 1%)
    * so the check never flakes on merge order.
    */
  val PercentileTargets: Seq[Double] = Seq(0.5, 0.9, 0.99)
  val PercentileEps = 0.05

  /** Approximate per-group percentiles via the engine's t-digest
    * aggregate ([[org.apache.spark.sql.graftexpr.TDigestAgg]]) — the
    * scale-out companion to the exact [[medianValueByType]]: one
    * partial-agg pass, constant-size mergeable state per group, no
    * per-group sort. The estimate itself is merge-order dependent, so
    * the oracle-checked output is the rank-bound GUARANTEE: for each
    * (group, p), count(value < q̂) ≤ (p+ε)·n and count(value ≤ q̂) ≥
    * (p−ε)·n — a real assertion of sketch correctness that holds for
    * any merge order. The validating join is test harness, not the
    * operator: production consumers read the digest output directly,
    * and the Bench number for this entry includes the validation scan
    * (the digest aggregation alone is timed by TDigestSpec and the
    * streaming windowed-quantiles path).
    */
  def percentileApprox(spark: SparkSession, dir: String): DataFrame = {
    // null values are outside the distribution: excluded from the
    // digest, from n, and from the rank counts below — otherwise a
    // mostly-null group would fail the bound by construction, and an
    // all-null group would emit no digest while the oracle still
    // counted it. (The oracle counts value, not *, to match.)
    val e = events(spark, dir).select($"event_type", $"value")
      .filter($"value".isNotNull)
    val sk = e.groupBy($"event_type")
      .agg(org.apache.spark.sql.graftexpr.TDigestAgg
          .quantiles($"value", PercentileTargets).as("qs"),
        count(lit(1)).as("n"))
    val q = sk.select($"event_type", $"n", posexplode($"qs"))
      .select($"event_type", $"n",
        element_at(typedlit(PercentileTargets), $"pos" + 1).as("p"),
        $"col".as("qv"))
    q.join(e.select($"event_type".as("et2"), $"value"), $"event_type" === $"et2")
      .groupBy($"event_type", $"p", $"n", $"qv")
      .agg(
        sum(when($"value" < $"qv", 1L).otherwise(0L)).as("cnt_lt"),
        sum(when($"value" <= $"qv", 1L).otherwise(0L)).as("cnt_le"))
      .select($"event_type", $"p",
        ($"cnt_lt" <= ($"p" + PercentileEps) * $"n" &&
          $"cnt_le" >= ($"p" - PercentileEps) * $"n").as("within_bounds"),
        $"n")
  }

  /** lag/lead navigation: previous/next event id and the gap to the
    * previous event per user — the session-stitching primitives.
    * Deterministic: the window orders by (ts, event_id) and event_id is
    * unique.
    */
  def lagLeadGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .select($"user_id", $"event_id", $"ts")
      .select($"user_id", $"event_id",
        lag($"event_id", 1).over(w).as("prev_event"),
        lead($"event_id", 1).over(w).as("next_event"),
        (unix_millis($"ts") - lag(unix_millis($"ts"), 1).over(w)).as("gap_ms"))
  }

  /** RANGE-frame windowed sum: per user, the exact value total over the
    * trailing 60 s (range frame on the epoch-ms ordering column — peers
    * at the same timestamp all join the frame, unlike a ROWS frame, so
    * the result is insensitive to intra-timestamp ordering). DECIMAL
    * accumulation keeps the double output engine-exact.
    */
  def rangeFrameSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy($"user_id").orderBy(unix_millis($"ts"))
      .rangeBetween(-60000L, 0L)
    events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .select($"user_id", $"event_id",
        sum(dec($"value")).over(w).cast("double").as("trailing_minute_value"))
  }

  /** Cube over (event_type, day): every dim combination. Pre-aggregated
    * on the full (event_type, day) key before the cube lattice expands
    * — see [[rollupSummary]] (guide §2.3): Expand×4 now runs over the
    * few-hundred-row daily aggregate, not the fact scan.
    */
  def cubeEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("dt", date_format($"ts", "yyyy-MM-dd"))
      .groupBy($"event_type", $"dt")
      .agg(count(lit(1)).as("pn"),
        sum($"value".cast("decimal(18,2)")).as("pv"))
      .cube($"event_type", $"dt")
      .agg(
        expr("CASE WHEN grouping(event_type) = 1 THEN 'ALL' ELSE event_type END").as("etype"),
        expr("CASE WHEN grouping(dt) = 1 THEN 'ALL' ELSE dt END").as("day"),
        sum($"pn").as("n"),
        sum($"pv").cast("double").as("sum_value"))
      .select($"etype", $"day", $"n", $"sum_value")

  /** Top-3 parts per brand by revenue, via the engine's bounded-heap
    * aggregate ([[org.apache.spark.sql.graftexpr.TopKAgg]]) rather than
    * a rank window: the window form sorts EVERY (brand, part) row
    * inside its partition to keep 3, while the heap aggregate partial-
    * aggregates map-side — each task holds one 3-row heap per brand and
    * the shuffle carries heaps, not parts. Ranks are recovered from the
    * heap's (score desc, id asc) output order, the same deterministic
    * tie-break as the window form. (The rank-window surface itself is
    * exercised by window_running_total / window_lag_lead /
    * window_range_frame.)
    */
  def topPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val p = part(spark, dir)
    // part is un-hinted (grows with SF — see RelationalOps.orderWide);
    // stats broadcast it at test scale, shuffle when genuinely large
    val rev = l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy($"p_brand", $"p_partkey")
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
        .cast("double").as("revenue"))
    rev.groupBy($"p_brand")
      .agg(org.apache.spark.sql.graftexpr.TopKAgg
        .topKIds($"p_partkey", $"revenue", 3).as("top"))
      .select($"p_brand".as("brand"), posexplode($"top"))
      .select($"brand", ($"pos" + 1).cast("bigint").as("rank"),
        $"col.id".as("partkey"), $"col.score".as("revenue"))
  }

  /** Running total per customer over order dates — frame-bounded window
    * aggregate. Exact decimal accumulation, double at the edge.
    */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, dir)
      .select($"o_custkey".as("custkey"), $"o_orderkey".as("orderkey"),
        sum(dec($"o_totalprice")).over(w).cast("double").as("running_total"))
  }

  /** Distribution window functions (ntile / percent_rank / cume_dist)
    * per customer — the feature-bucketing shape (equi-depth quartile
    * assignment within a key). Partitioned by custkey, so partition
    * sizes are bounded by per-customer order counts — never the global
    * single-partition ntile anti-pattern.
    */
  def orderQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy(dec($"o_totalprice"), $"o_orderkey")
    orders(spark, dir)
      .select($"o_custkey".as("custkey"), $"o_orderkey".as("orderkey"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  /** Regional market share (TPC-H Q8 shape): one supplier-nation's share
    * of a region's customer revenue per order year — two-level dim
    * chains on BOTH join branches (customer→nation→region gating the
    * facts; supplier→nation providing the share dimension) and a
    * conditional-sum share in exact unscaled-long money.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    val s = supplier(spark, dir)
    val cn = nation(spark, dir)
    val sn = nation(spark, dir).select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val r = region(spark, dir)
    val discU = (dec($"l_extendedprice") * 100).cast("long") *
      (lit(100L) - (dec($"l_discount") * 100).cast("long"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(cn), c("c_nationkey") === cn("n_nationkey"))
      .join(broadcast(r),
        cn("n_regionkey") === r("r_regionkey") && r("r_name") === "AMERICA")
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(sn), s("s_nationkey") === $"sn_key")
      .groupBy(year(o("o_orderdate")).cast("bigint").as("order_year"))
      .agg(
        sum(when($"supp_nation" === "NATION_1", discU).otherwise(0L)).as("nation_u"),
        sum(discU).as("all_u"))
      .select($"order_year",
        ($"nation_u" / 10000.0).as("nation_revenue"),
        ($"all_u" / 10000.0).as("total_revenue"),
        ($"nation_u".cast("double") / $"all_u".cast("double")).as("mkt_share"))
  }

  /** (user, day) pairs with a given activity — the set-op operand.
    * Day grain because the tiny test corpus has every user doing every
    * event type overall (user-level sets would be degenerate).
    */
  /** Segment-overlap cardinalities via KMV/theta sketches
    * ([[org.apache.spark.sql.graftexpr.GraftKmv]]): per event-type
    * distinct-user sketches, then |A|, |B|, |A∪B|, |A∩B| for every
    * segment pair from SKETCH ALGEBRA alone. One aggregation pass over
    * events builds the sketches (partial map-side, one ≤32 KB blob per
    * segment on the wire); the pairwise join then touches only the
    * segment-count-sized sketch table — at 100 TB the events scan
    * happens once, not once per pair, and new pairs/date-ranges are
    * answered from stored blobs without rescanning (the set-algebra HLL
    * registers cannot express). k=8192 is exact below 8192 distinct
    * users and ~1.1% RSE above; the oracle replays BOTH regimes
    * bit-exactly (hash + estimator recomputed in DuckDB — verified at
    * sf0.01 exact and sf1 estimating), so the gate stays value-strong
    * at every scale. Estimator error bounds are in KmvSpec.
    */
  def segmentOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftexpr.GraftKmv
    val sk = events(spark, dir)
      .groupBy($"event_type")
      .agg(GraftKmv.build($"user_id", 8192).as("sk"))
    val a = sk.select($"event_type".as("type_a"), $"sk".as("sk_a"))
    val b = sk.select($"event_type".as("type_b"), $"sk".as("sk_b"))
    a.join(b, $"type_a" < $"type_b")
      .select($"type_a", $"type_b",
        GraftKmv.cardinality($"sk_a").as("card_a"),
        GraftKmv.cardinality($"sk_b").as("card_b"),
        GraftKmv.unionCardCol($"sk_a", $"sk_b").as("card_union"),
        GraftKmv.intersectCardCol($"sk_a", $"sk_b").as("card_inter"))
  }

  /** `bitmap_segment_overlap`: EXACT audience-overlap matrix between
    * event-type segments — the audit-grade twin of the KMV-sketched
    * [[segmentOverlap]], built on the
    * [[org.apache.spark.sql.graftexpr.GraftBitmap]] exact bitmap
    * columns (dense user_id domain ⇒ ~1 bit per user per segment).
    * Every figure is oracle-exact: |A|, |B|, |A∩B| via blob
    * intersection, |A∪B| by inclusion–exclusion, Jaccard as one
    * double division.
    *
    * Scale shape: ONE corpus pass builds a bitmap per event type
    * (partial agg, blob-sized shuffle); the pairwise stage joins the
    * |types|-row bitmap table against itself — dimension-sized, every
    * intersection a merge-walk of two blobs with no state
    * materialized.
    */
  def bitmapSegmentOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftexpr.GraftBitmap
    val bm = events(spark, dir)
      .groupBy($"event_type")
      .agg(GraftBitmap.build($"user_id").as("bm"))
    val a = bm.select($"event_type".as("type_a"), $"bm".as("bm_a"))
    val b = bm.select($"event_type".as("type_b"), $"bm".as("bm_b"))
    a.join(b, $"type_a" < $"type_b")
      .select($"type_a", $"type_b",
        GraftBitmap.card($"bm_a").as("card_a"),
        GraftBitmap.card($"bm_b").as("card_b"),
        GraftBitmap.andCard($"bm_a", $"bm_b").as("card_inter"))
      .withColumn("card_union", $"card_a" + $"card_b" - $"card_inter")
      .withColumn("jaccard",
        $"card_inter".cast("double") / $"card_union".cast("double"))
  }

  private def userDays(spark: SparkSession, dir: String, etype: String): DataFrame =
    events(spark, dir).filter($"event_type" === etype)
      .select($"user_id", date_format($"ts", "yyyy-MM-dd").as("dt"))

  /** INTERSECT: user-days with both a click and a purchase. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    userDays(spark, dir, "click")
      .intersect(userDays(spark, dir, "purchase"))

  /** EXCEPT: user-days with a click but no purchase. */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    userDays(spark, dir, "click")
      .except(userDays(spark, dir, "purchase"))

  /** INTERSECT ALL: multiplicity-aware — a user-day with 3 clicks and
    * 2 purchases contributes min(3,2)=2 rows, the bag semantics ANSI
    * gives `INTERSECT ALL` and the one the DISTINCT form above throws
    * away (event-count-weighted audience math needs it). Plans as one
    * count-compare aggregate per key — no row explosion beyond the
    * emitted multiplicity.
    */
  def setIntersectAll(spark: SparkSession, dir: String): DataFrame =
    userDays(spark, dir, "click")
      .intersectAll(userDays(spark, dir, "purchase"))

  /** EXCEPT ALL: bag difference — max(clicks − purchases, 0) rows per
    * user-day.
    */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame =
    userDays(spark, dir, "click")
      .exceptAll(userDays(spark, dir, "purchase"))

  /** Session gap: a new session starts after 30 min of inactivity. */
  val SessionGapSec = 1800L

  /** Sessionization, batch gaps-and-islands form: per (user, session) —
    * start, events, duration. Streaming twin:
    * [[graft.streaming.WindowedAggs.sessionized]] (session_window with
    * watermark) — same gap semantics.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .withColumn("sec", unix_timestamp($"ts"))
      .withColumn("prev_sec", lag($"sec", 1).over(byUser))
      .withColumn("is_start",
        when($"prev_sec".isNull || $"sec" - $"prev_sec" > SessionGapSec, 1L).otherwise(0L))
      .withColumn("session_no", sum($"is_start").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_no")
      .agg(min($"sec").as("session_start"), count(lit(1)).as("n_events"),
        (max($"sec") - min($"sec")).as("duration_sec"))
      .select($"user_id", $"session_no", $"session_start", $"n_events", $"duration_sec")
  }

  /** Session-duration bin width (seconds) for [[sessionDurationHist]]. */
  val SessDurBinSec = 300L

  /** `sessionize_duration_hist`: the session-length distribution —
    * [[sessionize]]'s sessions binned into [[SessDurBinSec]]-second
    * buckets with exact counts, event sums and share ppm; the
    * engagement chart every product dashboard draws over the
    * sessionized stream. Composes the shared sessionization (same
    * one-user-exchange shape) with the bounded-bin histogram
    * decomposition of [[StatsOps.valueHistogram]].
    */
  def sessionDurationHist(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionize(spark, dir)
    val total = s.agg(count(lit(1)).as("n_total"))
    s.groupBy(expr(s"duration_sec div $SessDurBinSec").as("bin"))
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
      .join(broadcast(total))
      .select(($"bin" * SessDurBinSec).as("bin_lo_sec"),
        (($"bin" + 1L) * SessDurBinSec).as("bin_hi_sec"),
        $"n_sessions", $"n_events",
        ($"n_sessions".cast("double") / $"n_total".cast("double") * 1000000.0)
          .as("share_ppm"))
  }

  /** Brands reported by [[topRevenueBrandsWithTies]]. */
  val TiesK = 5

  /** `topk_with_ties`: the ANSI `FETCH FIRST k ROWS WITH TIES`
    * semantics — top-[[TiesK]] part brands by exact revenue cents,
    * INCLUDING every brand tied with the k-th (a `rank() <= k`
    * predicate, where `row_number() <= k` would cut ties
    * arbitrarily). The distinction matters exactly when the metric is
    * coarse enough to tie — leaderboards, quota cuts, dedup-rank
    * keeps.
    *
    * Scale shape: revenue reduces brand-keyed first (partial agg onto
    * the bounded brand domain); the rank window runs over that
    * dimension-sized rollup, never over facts.
    */
  def topRevenueBrandsWithTies(spark: SparkSession, dir: String): DataFrame = {
    val rev = lineitem(spark, dir)
      .join(part(spark, dir).select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(sum((dec($"l_extendedprice") * 100).cast("long")).as("revenue_cents"))
    rev.withColumn("rnk",
        rank().over(Window.orderBy($"revenue_cents".desc, $"p_brand"))
          .cast("bigint"))
      .filter($"rnk" <= TiesK)
      .select($"p_brand", $"revenue_cents", $"rnk")
  }

  /** `hierarchy_shares`: ratio-to-parent and ratio-to-report over the
    * region ⊃ nation hierarchy — each nation's revenue with its share
    * of the parent region and of the grand total, the classic
    * percent-of-parent OLAP report (MDX's ratio-to-parent, SQL's
    * window-sum-over-partition). One fact pass; both denominators are
    * window sums over the nation-domain rollup, so the report adds no
    * second fact scan.
    */
  def hierarchyShares(spark: SparkSession, dir: String): DataFrame = {
    val rev = orders(spark, dir)
      .join(customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name".as("region"), $"n_name".as("nation"))
      .agg(sum((dec($"o_totalprice") * 100).cast("long")).as("revenue_cents"))
    rev
      .withColumn("region_cents",
        sum($"revenue_cents").over(Window.partitionBy($"region")))
      .withColumn("total_cents",
        sum($"revenue_cents").over(Window.partitionBy()))
      .select($"region", $"nation", $"revenue_cents",
        ($"revenue_cents".cast("double") / $"region_cents".cast("double"))
          .as("share_of_region"),
        ($"revenue_cents".cast("double") / $"total_cents".cast("double"))
          .as("share_of_total"))
  }

  /** `agg_rollup_time`: revenue rolled up the TIME hierarchy
    * (year ⊃ month ⊃ grand total) with GROUPING-derived level tags —
    * the calendar-drilldown twin of the dimension-keyed `agg_rollup`.
    * One fact pass; the rollup expands over the bounded (year, month)
    * domain.
    */
  def rollupTime(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(year($"o_orderdate").cast("bigint").as("y"),
        month($"o_orderdate").cast("bigint").as("m"),
        (dec($"o_totalprice") * 100).cast("long").as("cents"))
      // pre-aggregate on the full (y, m) key before the rollup lattice
      // expands — see rollupSummary (guide §2.3)
      .groupBy($"y", $"m")
      .agg(count(lit(1)).as("pn"), sum($"cents").as("pc"))
      .rollup($"y", $"m")
      .agg(sum($"pn").as("n_orders"), sum($"pc").as("revenue_cents"),
        grouping($"y").cast("bigint").as("g_y"),
        grouping($"m").cast("bigint").as("g_m"))
      .select(coalesce($"y", lit(-1L)).as("y"),
        coalesce($"m", lit(-1L)).as("m"),
        $"n_orders", $"revenue_cents",
        when($"g_y" === 1L, "total").when($"g_m" === 1L, "year")
          .otherwise("month").as("level"))

  /** `agg_listagg`: ordered string aggregation (LISTAGG / string_agg)
    * — per region, its nations joined ',' in alphabetical order. The
    * one classic SQL aggregate the engine had not yet surfaced;
    * determinism comes from sorting the collected array BEFORE the
    * join (collect_list order is partition-dependent — the same
    * discipline as the path-signature build).
    */
  def regionNationList(spark: SparkSession, dir: String): DataFrame =
    nation(spark, dir)
      .join(broadcast(region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name".as("region"))
      .agg(count(lit(1)).as("n_nations"),
        concat_ws(",", sort_array(collect_list($"n_name"))).as("nations"))

  /** `cdc_latest_compaction`: latest-row-per-key snapshot compaction —
    * the batch twin of the dim store's streaming MERGE
    * ([[graft.streaming.CdcRouter]]): from the event changelog, each
    * user's most recent row wins, ties broken by highest event_id
    * (the CDC sequence-number rule). Planned as ONE max_by-shaped
    * aggregate over a decimal-packed total order — never a per-key
    * ranking window, which would sort the whole changelog inside each
    * partition (the OHLC lesson applied to compaction).
    */
  def latestRowCompaction(spark: SparkSession, dir: String): DataFrame = {
    // pack (epoch-micros, event_id) into one DECIMAL(38,0) so max()
    // carries the row's total order in a mutable (hash-agg) buffer
    val ord = (unix_timestamp($"ts").cast("decimal(38,0)") * lit(1000000000L)
      + $"event_id")
    events(spark, dir)
      .select($"user_id",
        struct(ord.as("o"), $"event_id", $"event_type",
          (dec($"value") * 100).cast("long").as("cents")).as("r"))
      .groupBy($"user_id")
      .agg(max($"r").as("m"), count(lit(1)).as("n_versions"))
      .select($"user_id", $"m.event_id".as("last_event_id"),
        $"m.event_type".as("last_type"), $"m.cents".as("last_cents"),
        $"n_versions")
  }

  /** `ts_wow_change`: week-over-week revenue change per event type —
    * weekly exact-cent rollup, previous week via `lag` over the
    * (type × week)-bounded series, change as one double division
    * (null on the first week, a 0-denominator week reports null).
    */
  def weekOverWeek(spark: SparkSession, dir: String): DataFrame = {
    val weekly = events(spark, dir)
      .groupBy($"event_type",
        date_format(date_trunc("week", $"ts"), "yyyy-MM-dd").as("week"))
      .agg(sum((dec($"value") * 100).cast("long")).as("cents"))
    weekly
      .withColumn("prev_cents",
        lag($"cents", 1).over(
          Window.partitionBy($"event_type").orderBy($"week")))
      .select($"event_type", $"week", $"cents", $"prev_cents",
        when($"prev_cents".isNotNull && $"prev_cents" =!= 0L,
          ($"cents" - $"prev_cents").cast("double") /
            $"prev_cents".cast("double")).as("wow_change"))
  }

  /** Global top-k: largest orders. Compiles to TakeOrderedAndProject —
    * per-partition heaps, k rows to the driver, no full sort.
    */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select($"o_orderkey".as("orderkey"),
        dec($"o_totalprice").cast("double").as("totalprice"))
      .orderBy($"totalprice".desc, $"orderkey")
      .limit(100)

  /** Same top-100, via the engine's bounded-heap TypedImperativeAggregate
    * ([[org.apache.spark.sql.graftexpr.TopKAgg]]): one partial-agg pass —
    * each task keeps a 100-row heap, the shuffle carries one heap per
    * partition. The sort+limit form above leans on Spark's TakeOrdered;
    * the aggregate form composes (usable per-group, in rollups, in
    * streaming) and never materializes a global order.
    */
  def topKOrdersAgg(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .agg(org.apache.spark.sql.graftexpr.TopKAgg.topKIds(
        $"o_orderkey", dec($"o_totalprice").cast("double"), 100).as("top"))
      .select(explode($"top").as("e"))
      .select($"e.id".as("orderkey"), $"e.score".as("totalprice"))

  /** Shipping-priority style analytic join (classic TPC-H Q3 shape):
    * segment-filtered customers ⋈ orders ⋈ lineitem, revenue per order,
    * top 10. Filters push to the parquet scans.
    */
  /** Promotion-revenue share per ship month (TPC-H Q14 shape):
    * conditional aggregation over a fact⋈dim join — the numerator is a
    * CASE-filtered sum over the SAME pass as the denominator, one scan
    * and one join, never two queries. Money math on unscaled longs (see
    * [[RelationalOps.pricingSummary]]); each share is one double
    * division of two exact longs.
    *
    * part is un-hinted (scales with SF — stats/AQE broadcast it while
    * small, shuffle when not); the join shuffles on partkey, then the
    * month aggregation re-shuffles the few-hundred-row partials.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val p = part(spark, dir)
    val discU = (dec($"l_extendedprice") * 100).cast("long") *
      (lit(100L) - (dec($"l_discount") * 100).cast("long"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
      .agg(
        sum(when($"p_type" === "PROMO", discU).otherwise(0L)).as("promo_u"),
        sum(discU).as("all_u"),
        count(lit(1)).as("line_count"))
      .select($"ship_month",
        ($"promo_u" / 10000.0).as("promo_revenue"),
        ($"all_u" / 10000.0).as("total_revenue"),
        ($"promo_u".cast("double") / $"all_u".cast("double")).as("promo_share"),
        $"line_count")
  }

  /** Disjunctive-predicate join (TPC-H Q19 shape): OR-of-ANDs across
    * BOTH sides of a fact⋈dim join. The plan contract is the point:
    * Catalyst factors out the common `l_partkey = p_partkey` equi-key,
    * so this is a hash/sort-merge join with the disjunction as a
    * post-join residual — NOT a nested-loop over the cross product,
    * which is what a naive engine does with OR join predicates
    * (PlanShapeSpec asserts no BroadcastNestedLoopJoin/CartesianProduct).
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val p = part(spark, dir)
    val clauses =
      (p("p_brand") === "Brand#12" && p("p_size").between(1, 5) &&
        l("l_quantity").between(1, 11)) ||
      (p("p_brand") === "Brand#23" && p("p_size").between(1, 10) &&
        l("l_quantity").between(10, 20)) ||
      (p("p_brand") === "Brand#34" && p("p_size").between(1, 15) &&
        l("l_quantity").between(20, 30))
    val discU = (dec($"l_extendedprice") * 100).cast("long") *
      (lit(100L) - (dec($"l_discount") * 100).cast("long"))
    l.join(p, l("l_partkey") === p("p_partkey") && clauses)
      .agg(sum(discU).as("revenue_u"), count(lit(1)).as("line_count"))
      .select(($"revenue_u" / 10000.0).as("revenue"), $"line_count")
  }

  /** ANALYZE-style column profile — the stats collection every pipeline
    * runs before trusting a new data drop (and what a cost-based
    * optimizer feeds on): per column, row/null/distinct counts and
    * lexicographic min/max, in ONE pass over the table (a single
    * aggregate computing all columns' stats simultaneously, then
    * unpivoted — never one scan per column).
    */
  def profileDocuments(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"))
    }
    val wide = documents(spark, dir).agg(aggs.head, aggs.tail: _*)
    // unpivot by exploding a struct array over the ONE aggregate row —
    // a union of per-column selects would re-run the aggregate (and its
    // scan) once per column, which is exactly what profiling must not do
    wide.select(explode(array(cols.map { c =>
        struct(lit(c).as("column"), col(s"${c}__n").as("n_values"),
          col(s"${c}__nulls").as("n_nulls"), col(s"${c}__ndv").as("n_distinct"),
          col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))
      }: _*)).as("s"))
      .select($"s.*")
  }

  /** Count-Min point-frequency estimates over the skewed key stream (the
    * [[graft.operators.EventOps.heavyHitterScan]] key derivation): build
    * ONE mergeable d×w sketch in a single map-side pass, then probe
    * every distinct key against it — sketch bound as a scalar-subquery
    * constant, so probing is a narrow projection over the (small)
    * distinct-key frame, never a join carrying the matrix per row.
    *
    * The oracle REPLAYS the sketch in SQL (portable md5-ring hashes →
    * DuckDB recomputes all d·w counters and takes the same min), so
    * estimates are hash-matched exactly; `overestimates` additionally
    * documents the CM one-sided-error guarantee in the output itself.
    */
  def cmFrequencies(spark: SparkSession, dir: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    import org.apache.spark.sql.graftexpr.GraftCountMin
    val keyed = events(spark, dir)
      .select(expr("10000 div ((event_id % 10000) + 1)").as("hh_key"))
    val sketch = keyed.agg(GraftCountMin.build($"hh_key", depth, width).as("cm"))
    keyed.groupBy($"hh_key").agg(count(lit(1)).as("exact"))
      .select($"hh_key",
        GraftCountMin.estimateScalar(sketch, $"hh_key").as("est"),
        $"exact")
      .withColumn("overestimates", $"est" >= $"exact")
  }

  /** Existence-census (TPC-H Q4 shape): orders having at least one line
    * shipped >30 days after the order date, counted per priority.
    *
    * The EXISTS is rewritten AGGREGATE-BELOW-JOIN instead of the
    * literal left-semi join: `∃ line. shipdate > orderdate+30` ⟺
    * `max(shipdate) > orderdate+30`, because the threshold depends only
    * on the probe row. The semi-join form made Catalyst pick lineitem —
    * the FACT table, 4× orders' rows and unboundable at 100 TB — as a
    * BroadcastHashJoin build side at every tested SF (the 2-column
    * pruned scan estimate sits under the 10 MB threshold even at sf1,
    * where the actual build was 6M rows / 4.1 s). Pre-aggregating
    * collapses lines to one row per order BEFORE any join: partial
    * (map-side) aggregation cuts the shuffle 4×, and the join side now
    * scales with orders, not lines. sf1 plan-diff verdict (VERDICT r6
    * #7): same plan shape at sf0.1 and sf1, no fact-table broadcast.
    */
  def orderPriorityCensus(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val maxShip = lineitem(spark, dir)
      .groupBy($"l_orderkey").agg(max($"l_shipdate").as("max_shipdate"))
    o.join(maxShip, o("o_orderkey") === maxShip("l_orderkey"))
      .filter($"max_shipdate" > o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy($"o_orderpriority".as("priority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Two-level aggregation over an outer join (TPC-H Q13 shape): orders
    * per customer (keeping zero-order customers via LEFT OUTER with the
    * priority predicate in the join condition), then the histogram of
    * those counts. The second aggregate runs over one row per customer —
    * the expensive shuffle is only the first one, on custkey.
    */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    val perCust = c.join(o,
        c("c_custkey") === o("o_custkey") && o("o_orderpriority") =!= "1-URGENT",
        "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
    perCust.groupBy($"c_count").agg(count(lit(1)).as("custdist"))
  }

  /** Correlated below-average filter (TPC-H Q17 shape): revenue from
    * brand lines whose quantity is under 20% of that part's average.
    * Decorrelated into a per-part (sum, count) aggregate joined back on
    * partkey; the comparison cross-multiplies (qty·5·cnt < sum) so it
    * stays in exact DECIMAL — avg would round and make the boundary
    * engine-dependent. The brand filter narrows the probe side BEFORE
    * the aggregate join, but the per-part average is over ALL lines
    * (correlation is on partkey alone, as in Q17).
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    val p = part(spark, dir).filter($"p_brand" === "Brand#23").select($"p_partkey")
    val perPart = l.groupBy($"l_partkey".as("ap"))
      .agg(sum(dec($"l_quantity")).as("qty_sum"), count(lit(1)).as("qty_cnt"))
    l.join(p, $"l_partkey" === $"p_partkey")
      .join(perPart, $"l_partkey" === $"ap")
      .filter(dec($"l_quantity") * $"qty_cnt" * 5 < $"qty_sum")
      .agg(sum(dec($"l_extendedprice")).cast("double").as("lost_revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Group-HAVING as a derived semi-join (TPC-H Q18 shape): orders whose
    * total line quantity exceeds the threshold, rejoined to orders and
    * customer for the report columns. The HAVING aggregate reduces
    * lineitem to one row per qualifying order before any wide join —
    * the big⋈big join is orders⋈(tiny filtered aggregate), not
    * orders⋈lineitem.
    */
  def largeVolumeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = lineitem(spark, dir)
      .groupBy($"l_orderkey".as("bk"))
      .agg(sum(dec($"l_quantity")).as("total_qty"))
      .filter($"total_qty" > 200)
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    o.join(big, o("o_orderkey") === $"bk")
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(c("c_name").as("cust_name"),
        o("o_custkey").as("custkey"),
        o("o_orderkey").as("orderkey"),
        date_format(o("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        dec(o("o_totalprice")).cast("double").as("totalprice"),
        $"total_qty".cast("double").as("total_qty"))
  }

  /** Anti-join + global scalar aggregate (TPC-H Q22 shape): customers
    * with above-average positive balance and no urgent order, summarized
    * per market segment. The global (sum, count) collapses to ONE row
    * cross-joined back (the scalar-subquery plan — broadcast of a single
    * row, never a shuffle), and the comparison cross-multiplies to stay
    * exact; NOT EXISTS compiles to a left-anti join on custkey.
    */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val bal = c.filter(dec($"c_acctbal") > 0)
      .agg(sum(dec($"c_acctbal")).as("bal_sum"), count(lit(1)).as("bal_cnt"))
    val urgent = orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    c.crossJoin(broadcast(bal))
      .filter(dec($"c_acctbal") * $"bal_cnt" > $"bal_sum")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec($"c_acctbal")).cast("double").as("total_balance"))
  }

  /** Returned-item revenue report (TPC-H Q10 shape): top customers by
    * revenue lost to returns, with their dim context. TakeOrdered caps
    * the output (per-partition heaps of 20, never a full sort); nation
    * broadcasts; customer — the scale-growing dim — is un-hinted.
    */
  def returnedItemRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    val l = lineitem(spark, dir).filter($"l_returnflag" === "R")
    val n = nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(c("c_custkey"), c("c_name"), c("c_mktsegment"), n("n_name"))
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
        .cast("double").as("revenue"))
      .select($"c_custkey".as("custkey"), $"c_name".as("cust_name"),
        $"c_mktsegment".as("mktsegment"), $"n_name".as("nation_name"), $"revenue")
      .orderBy($"revenue".desc, $"custkey")
      .limit(20)
  }

  /** Conditional aggregation over a join (TPC-H Q12 shape): per on-time
    * class, how many high- vs low-priority orders — the CASE-inside-SUM
    * pattern that folds what would be two queries into one pass.
    */
  def shipmodePriority(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    val highPrio = o("o_orderpriority") === "1-URGENT" ||
      o("o_orderpriority") === "2-HIGH"
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy((l("l_shipdate") >= o("o_orderdate")).as("shipped_after_order"))
      .agg(
        sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(highPrio, 0L).otherwise(1L)).as("low_line_count"),
        count(lit(1)).as("n_lines"))
  }

  /** Max-over-aggregate (TPC-H Q15 shape): per-supplier revenue in a
    * 3-month ship window, keeping the supplier(s) that hit the global
    * max. The revenue aggregate is supplier-sized (SF·10k rows); its max
    * is a 1-row global aggregate equi-joined back — NOT a window over an
    * empty partition, which would funnel every supplier partial through
    * one task at scale. The revenue subtree is evaluated in both
    * branches (per-branch column pruning makes the canonical plans
    * differ, so ReuseExchange does not fire — verified with
    * explain("formatted")); both passes push the 3-month window to the
    * lineitem scan and aggregate to supplier-sized partials, so the
    * second pass costs one more filtered scan, the classic distributed
    * Q15 trade. The winner set (max ties only, ≈1 row) is broadcast
    * into the supplier dim join. Money on unscaled longs (see
    * [[RelationalOps.pricingSummary]]).
    */
  def topSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val s = supplier(spark, dir)
    val discU = (dec($"l_extendedprice") * 100).cast("long") *
      (lit(100L) - (dec($"l_discount") * 100).cast("long"))
    val revenue = l
      .filter($"l_shipdate" >= lit("1996-01-01") &&
        $"l_shipdate" < lit("1996-04-01"))
      .groupBy($"l_suppkey")
      .agg(sum(discU).as("rev_u"))
    val maxRev = revenue.agg(max($"rev_u").as("max_u"))
    val winners = revenue.join(broadcast(maxRev), $"rev_u" === $"max_u")
    s.join(broadcast(winners), s("s_suppkey") === $"l_suppkey")
      .select(s("s_suppkey"), s("s_name"),
        ($"rev_u" / 10000.0).as("total_revenue"))
  }

  /** Classic TPC-H Q6 (forecast revenue change): one filtered scan, one
    * scalar aggregate — the canonical predicate-pushdown probe. All
    * three predicates (ship-year, discount band, quantity cap) reach
    * the parquet reader as PushedFilters, the projection prunes to the
    * two money columns, and the partial aggregation ships 1 row per
    * split — at 100 TB this query is pure scan bandwidth, which is
    * exactly what it is meant to measure. Money on unscaled longs (see
    * [[RelationalOps.pricingSummary]]).
    */
  def revenueChange(spark: SparkSession, dir: String): DataFrame = {
    val priceC = (dec($"l_extendedprice") * 100).cast("long")
    val discC = (dec($"l_discount") * 100).cast("long")
    lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01") &&
        $"l_shipdate" < lit("1997-01-01") &&
        $"l_discount".between(0.04, 0.06) && $"l_quantity" < 24)
      .agg((sum(priceC * discC) / 10000.0).as("revenue"))
  }

  /** NOT IN over a nullable-free subquery (TPC-H Q16 shape): supplier
    * variety per part attribute, excluding blacklisted suppliers. The
    * exclusion list is tiny and bounded → broadcast left-anti join
    * (NOT IN's null trap doesn't arise: s_suppkey is a key); the
    * count(DISTINCT) re-shuffles once on the grouping attrs.
    */
  def partSupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir).filter($"p_brand" =!= "Brand#4")
    val l = lineitem(spark, dir).select($"l_partkey", $"l_suppkey")
    val blacklist = supplier(spark, dir)
      .filter(dec($"s_acctbal") < 0).select($"s_suppkey")
    l.join(broadcast(blacklist), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(p, $"l_partkey" === p("p_partkey"))
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .select($"p_brand".as("brand"), $"p_type".as("type"),
        $"p_size".cast("bigint").as("size"), $"supplier_cnt")
  }

  /** Double-correlated EXISTS / NOT EXISTS (TPC-H Q21 shape): suppliers
    * who were the ONLY late supplier on a multi-supplier finished order.
    * Decorrelated into ONE per-order aggregate — (distinct suppliers,
    * distinct LATE suppliers) — joined back: a late line qualifies iff
    * n_supp > 1 ∧ n_late_supp = 1. The two correlated subqueries become
    * a single groupBy on the already-shuffled join key instead of two
    * more passes over lineitem; the DuckDB oracle keeps the CORRELATED
    * formulation, so the correctness check is a cross-form equivalence
    * proof, not a same-shape replay.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val l = lineitem(spark, dir).select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val j = l.join(o, $"l_orderkey" === $"o_orderkey")
      .withColumn("late", $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
    val per = j.groupBy($"l_orderkey".as("gk"))
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct(when($"late", $"l_suppkey")).as("n_late_supp"))
    val s = supplier(spark, dir)
    j.filter($"late")
      .join(per, $"l_orderkey" === $"gk")
      .filter($"n_supp" > 1 && $"n_late_supp" === 1)
      .join(broadcast(s), $"l_suppkey" === s("s_suppkey"))
      .groupBy(s("s_name").as("supp_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    // customer is un-hinted even segment-filtered: it scales with SF
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(l("l_orderkey"))
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
        .cast("double").as("revenue"))
      .select($"l_orderkey".as("orderkey"), $"revenue")
      .orderBy($"revenue".desc, $"orderkey")
      .limit(10)
  }

  /** Product-family profit by supplier nation and order year (TPC-H Q9
    * shape, adapted: this schema has no partsupp, so unit cost is the
    * part's retail price — the join tree, the name-substring part
    * filter driving it, and the profit expression are the Q9 load).
    * The part filter prunes BEFORE the fact join (predicate reaches the
    * part scan); lineitem shuffles once per fact key; nation broadcasts.
    * Money stays on unscaled longs in 10^-4-dollar units (price cents ×
    * discount percent, cost cents × 100·qty) so partial sums are exact;
    * the single double division happens after aggregation.
    */
  def productTypeProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir).filter($"p_name".contains("gear"))
      .select($"p_partkey", (dec($"p_retailprice") * 100).cast("long").as("cost_c"))
    val s = supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val n = nation(spark, dir).select($"n_nationkey", $"n_name")
    val o = orders(spark, dir).select($"o_orderkey", year($"o_orderdate").as("o_year"))
    val l = lineitem(spark, dir).select($"l_orderkey", $"l_partkey", $"l_suppkey",
      (dec($"l_extendedprice") * 100).cast("long").as("price_c"),
      (dec($"l_discount") * 100).cast("long").as("disc_pct"),
      $"l_quantity".cast("long").as("qty"))
    // part is filtered to one name family — bounded like a dim at any SF
    val profitU = $"price_c" * (lit(100L) - $"disc_pct") - $"cost_c" * 100L * $"qty"
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(s), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), $"o_year".cast("long").as("o_year"))
      .agg((sum(profitU) / 10000.0).as("profit"))
  }

  /** Important-part census (TPC-H Q11 shape, adapted to shipped volume:
    * no partsupp ⇒ "stock value" is qty × retail price over lines
    * shipped by one region's suppliers). The defining plan feature is
    * the SELF-REFERENTIAL threshold: the global total is an aggregate
    * OF the per-part aggregate, so the per-part relation is computed
    * once, its 1-row total broadcasts back, and the comparison is
    * cross-multiplied in exact longs — never a float fraction, never a
    * second pass over lineitem. The bar is the MEAN share
    * (value·n_parts > total): canonical Q11's fixed fraction must be
    * rescaled by hand per SF or the result set collapses to empty as
    * the part catalog grows (measured: 426 rows at sf0.01, 0 at sf1
    * under a fixed 1/1500); above-mean is the same aggregate shape and
    * stays meaningful at any scale.
    */
  def importantPartValues(spark: SparkSession, dir: String): DataFrame = {
    val regionSupp = supplier(spark, dir)
      .join(broadcast(nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region(spark, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val p = part(spark, dir)
      .select($"p_partkey", (dec($"p_retailprice") * 100).cast("long").as("retail_c"))
    // materialized once (part-bounded, dim-sized): the total is an
    // aggregate OF this relation, and without the checkpoint the
    // broadcast branch re-plans the whole lineitem scan+joins a second
    // time (ReuseExchange does not fire across the extra aggregate)
    val perPart = lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey", $"l_quantity".cast("long").as("qty"))
      .join(broadcast(regionSupp), $"l_suppkey" === $"s_suppkey", "left_semi")
      .join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey")
      .agg(sum($"qty" * $"retail_c").as("value_c"))
      .localCheckpoint(true)
    val total = perPart.agg(sum($"value_c").as("total_c"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(total), $"value_c" * $"n_parts" > $"total_c")
      .select($"l_partkey".as("partkey"), ($"value_c" / 100.0).as("value"))
  }

  /** Dominant suppliers of a part family (TPC-H Q20 shape, adapted: no
    * ps_availqty ⇒ "excess stock" becomes majority share of the 1996
    * shipped volume). Nested-aggregate threshold: per-(part, supplier)
    * quantity vs the per-part total. The total is a WINDOW sum over the
    * (part × supplier)-bounded aggregate, partitioned by part — never a
    * second fact scan, never a single-task global window — so the fact
    * table is read once and the whole query stays one Catalyst plan.
    * The comparison is exact-integer (2·qty > total); surviving pairs
    * semi-join into the supplier dim. The name filter and ship-year
    * window prune at both scans.
    */
  def dominantPartSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir).filter($"p_name".endsWith("bolt"))
      .select($"p_partkey")
    val perPair = lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1997-01-01"))
      .select($"l_partkey", $"l_suppkey", $"l_quantity".cast("long").as("qty"))
      .join(broadcast(p), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"qty").as("pair_qty"))
    val dominant = perPair
      .withColumn("part_qty",
        sum($"pair_qty").over(Window.partitionBy($"l_partkey")))
      .filter($"pair_qty" * 2L > $"part_qty")
      .select($"l_suppkey")
    supplier(spark, dir)
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey".as("suppkey"), $"s_name".as("supp_name"))
  }

  /** NTILE bucketing: equi-count decile assignment of orders by price
    * within each priority class — the rank-family analytic the suite
    * lacked (rank/dense_rank/row_number/lag/lead/cume windows exist).
    * One shuffle on the partition key, per-partition sort; the order key
    * carries a deterministic tiebreak (orderkey) so bucket boundaries
    * are engine-independent. NTILE's floor/ceil bucket-size split is
    * SQL-standard, so the oracle replays the same function.
    */
  def ntileBuckets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy(dec($"o_totalprice"), $"o_orderkey")
    orders(spark, dir)
      .select($"o_orderkey".as("orderkey"),
        $"o_orderpriority".as("priority"),
        ntile(10).over(w).cast("long").as("tile"))
  }

  /** Relative-standing windows: percent_rank and cume_dist of each
    * order's price within its priority class — the rank family's two
    * normalized members ([[ntileBuckets]] covers the bucketed one).
    * The order key carries the orderkey tiebreak, so every row is its
    * own peer group and both values are exact BIGINT ratios
    * ((rank−1)/(n−1), row/n) — engine-identical doubles. Same single
    * shuffle + per-partition sort shape as every ranking window here.
    */
  def percentRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy(dec($"o_totalprice"), $"o_orderkey")
    orders(spark, dir)
      .select($"o_orderkey".as("orderkey"),
        $"o_orderpriority".as("priority"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
  }

  /** Market-basket co-occurrence with exact lift: the top part pairs
    * bought together in one order, ranked by support — the
    * related-products / covisitation signal an e-commerce DW serves.
    * No self-join: each order's basket aggregates to one sorted
    * distinct-part array (fan-in bounded by basket size), the a<b
    * pairs expand NARROWLY from the array with transform/slice, and
    * one pair-keyed aggregate counts support — where the naive
    * (order, part) self-join costs three exchanges plus a join
    * (measured: sf1 7.3→3.7 s, sf1/sf0.1 ratio 4.1×→2.1×).
    *
    * ONE basket pass for all three statistics: the explode emits,
    * per basket, the a<b pair rows PLUS one (part, NULL) row per part
    * and one (NULL, NULL) basket marker, so a single pair-keyed
    * aggregate yields pair supports, per-part basket counts, and the
    * basket total together — a v1 that derived each from its own
    * branch planned the scan + collect_set subtree FOUR times (no
    * exchange reuse across the differently-projected branches;
    * measured 6.9 s of the 6.9 s sf1 cost). Selection (top-K by
    * support) happens BEFORE the lift joins — lift is computed for
    * 100 rows, per-part counts broadcast onto them — and the final
    * sort re-establishes the semantic order on the joined 100 rows.
    * lift = N·n_ab / (n_a·n_b) is one double division of exact longs.
    */
  def basketLiftPairs(spark: SparkSession, dir: String): DataFrame = {
    val (plan, stats) = basketLiftPairsPlan(spark, dir)
    // pin the 100-row result eagerly so the support table can be
    // RELEASED here instead of leaking one cached relation per call in
    // a long-lived session (before, `stats` stayed persisted until an
    // external clearCache). Same total work — the one execution that
    // consumed the cache just happens at build time, the house pattern
    // for driver-orchestrated artifacts (see [[Materialize]]); the
    // checkpoint is 100 rows x 4 numeric cols, reclaimed by the
    // ContextCleaner when the caller drops the frame.
    val out = plan.localCheckpoint(eager = true)
    stats.unpersist(blocking = false)
    out
  }

  /** The LAZY lift plan plus the persisted support table it reads —
    * split out so plan contracts (PlanShapeSpec) can pin the
    * pre-checkpoint shape; callers own the unpersist.
    */
  private[graft] def basketLiftPairsPlan(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val stats = lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("parts"))
      // codegen'd emit (VecKernel.pairsAndMarkers): the HOF form of this
      // tagged explode allocated O(k²) slice arrays per basket and
      // dispatched an interpreted lambda per emitted struct
      .select(explode(
        graft.plans.ArrayOps.basketPairsMarkers($"parts")).as("pr"))
      .groupBy($"pr.a".as("ka"), $"pr.b".as("kb"))
      .agg(count(lit(1)).as("n"))
      // persist: the three readers below filter on the GROUPING keys,
      // and Catalyst pushes those filters through the aggregate into
      // the exchange — canonically DIFFERENT subtrees, so neither
      // static exchange reuse nor AQE stage reuse fires and the
      // scan + collect_set + explode pipeline executes once per
      // branch (measured 4 scans, 6.9 s sf1). Persisting the support
      // table is the inter-stage-artifact move a production pipeline
      // makes anyway; it is pair-cardinality-bounded (3 numeric cols)
      // and the bench/verify teardown's clearCache reclaims it.
      .persist()
    val pairsTop = stats.filter($"ka".isNotNull && $"kb".isNotNull)
      .select($"ka".as("part_a"), $"kb".as("part_b"), $"n".as("n_ab"))
      .orderBy($"n_ab".desc, $"part_a", $"part_b")
      .limit(100)
    val perPart = stats.filter($"ka".isNotNull && $"kb".isNull)
      .select($"ka".as("pk"), $"n".as("n_part"))
    val total = stats.filter($"ka".isNull)
      .select($"n".as("n_orders"))
    val out = pairsTop
      .join(broadcast(perPart.select($"pk".as("pa"), $"n_part".as("n_a"))),
        $"part_a" === $"pa")
      .join(broadcast(perPart.select($"pk".as("pb"), $"n_part".as("n_b"))),
        $"part_b" === $"pb")
      .join(broadcast(total))
      .select($"part_a", $"part_b", $"n_ab",
        (($"n_ab" * $"n_orders").cast("double") /
          ($"n_a" * $"n_b").cast("double")).as("lift"))
      .orderBy($"n_ab".desc, $"part_a", $"part_b")
    (out, stats)
  }

  /** Exact-arithmetic Pearson correlation and covariance of quantity vs
    * price per return flag. Built-in `corr`/`covar_pop` stream Welford
    * updates whose float rounding depends on partition order — useless
    * under a cross-engine hash gate and nondeterministic across runs.
    * Instead the five moment sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    * exact integers (qty, price cents) in DECIMAL(38,0) — associative,
    * order-free, map-side combined — and the textbook closed forms
    * divide once in double at the end: bit-identical on any engine.
    * DECIMAL(38) headroom: Σy² ≈ n·10^14, safe to n ≈ 10^24 rows.
    */
  def corrExact(spark: SparkSession, dir: String): DataFrame = {
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val l = lineitem(spark, dir).select($"l_returnflag",
      $"l_quantity".cast("long").as("x"),
      (dec($"l_extendedprice") * 100).cast("long").as("y"))
    l.groupBy($"l_returnflag".as("returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(big($"x")).as("sx"), sum(big($"y")).as("sy"),
        // r16: per-ROW products in long, cast to decimal only for the
        // SUM — the decimal×long form ran a BigDecimal multiply per
        // row. Exactness unchanged: per-row values are scale-INDEPENDENT
        // (x = quantity ≤ ~10², y = price cents ≤ ~10⁷ by the price
        // formula), so x·y ≤ 10⁹ and y² ≤ 10¹⁴ never overflow long at
        // ANY corpus size; only the SUMS grow with scale, and those
        // stay DECIMAL(38,0).
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"y" * $"y").cast("decimal(38,0)")).as("syy"))
      .select($"returnflag", $"n",
        (((big($"n") * $"sxy" - $"sx" * $"sy").cast("double")) /
          (sqrt((big($"n") * $"sxx" - $"sx" * $"sx").cast("double")) *
            sqrt((big($"n") * $"syy" - $"sy" * $"sy").cast("double")))).as("corr_xy"),
        ((big($"n") * $"sxy" - $"sx" * $"sy").cast("double") /
          (big($"n") * $"n").cast("double") / 100.0).as("covar_pop"))
  }

  /** Deterministic exact mode: each user's most frequent event type,
    * highest count wins, lexicographically smallest type on ties — the
    * dominant-behavior profile feature. Built-in `mode()` documents ties
    * as non-deterministic on both engines, so the op states the
    * tie-break explicitly and keeps it aggregation-shaped: a struct-max
    * over (count, reversed type rank), NO per-user ranking window.
    * "Smallest string wins" becomes "largest negated index" by ranking
    * the BOUNDED event-type domain once (a handful of rows) and
    * broadcasting it back — the only window in the plan runs over that
    * dimension, never over users.
    *
    * Scale shape: one map-side-combined corpus count keyed
    * (user, type); the argmax is a second combine over ≤|types| rows
    * per user. Both aggregations partial — nothing user-keyed ever
    * sorts.
    */
  def modeExact(spark: SparkSession, dir: String): DataFrame = {
    val counts = events(spark, dir)
      .select($"user_id", $"event_type")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"event_type")
    val domain = events(spark, dir).select($"event_type").distinct()
      .withColumn("trank", row_number().over(w).cast("long"))
    counts.join(broadcast(domain), "event_type")
      .groupBy($"user_id")
      .agg(max(struct($"n", (-$"trank").as("nr"), $"event_type")).as("m"),
        sum($"n").as("n_events"))
      .select($"user_id", $"m.event_type".as("mode_type"),
        $"m.n".as("mode_n"), $"n_events",
        ($"m.n".cast("double") / $"n_events".cast("double")).as("mode_share"))
  }

  /** Refresh cutoff for [[mvIncrementalRefresh]]: rows on/after this
    * day are the "new arrivals" delta; rows before it are the stored
    * snapshot.
    */
  val MvCutoff = "2024-01-24"

  /** `mv_incremental_refresh`: incremental materialized-view
    * maintenance for a per-(day × type) revenue/traffic rollup —
    * the batch twin of the streaming DWS sink
    * ([[graft.streaming.DwsSink]]): a stored snapshot aggregated from
    * history plus a delta aggregated from new arrivals, merged by
    * summing PARTIAL aggregates (sum and count are self-mergeable, so
    * snapshot ⊎ delta ≡ full recompute — which is exactly what the
    * oracle recomputes and the gate asserts).
    *
    * Scale shape: this is THE pattern that makes daily 100 TB rollups
    * affordable — the snapshot is itself an aggregate (bounded by the
    * day × type domain, read back dimension-sized from the MV store),
    * so refresh cost is proportional to the DELTA, never to history.
    * Both sides partial-aggregate before the merge and hash on the
    * same (day, type) key, and the merge is a full-outer coalesce so
    * brand-new days and late-arriving history both land correctly.
    */
  def mvIncrementalRefresh(spark: SparkSession, dir: String): DataFrame = {
    val keyed = events(spark, dir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type",
        (dec($"value") * 100).cast("long").as("c"))
    def rollup(df: DataFrame): DataFrame =
      df.groupBy($"day", $"event_type")
        .agg(sum($"c").as("cents"), count(lit(1)).as("pv"))
    val snapshot = rollup(keyed.filter($"day" < MvCutoff))
    val delta = rollup(keyed.filter($"day" >= MvCutoff))
    snapshot.as("s").join(delta.as("d"), Seq("day", "event_type"), "full_outer")
      .select($"day", $"event_type",
        (coalesce($"s.cents", lit(0L)) + coalesce($"d.cents", lit(0L))).as("cents"),
        (coalesce($"s.pv", lit(0L)) + coalesce($"d.pv", lit(0L))).as("pv"))
  }
}
