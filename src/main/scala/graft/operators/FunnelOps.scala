package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Product-analytics layer over the event stream: sequential funnel
  * conversion and cohort retention — the ADS-layer dashboard queries
  * the reference's DWS tables exist to feed (SURVEY.md §2.8: the
  * reference aggregates visitor/keyword stats toward exactly this kind
  * of consumer; reference gmall-realtime/.../app/dws/
  * VisitorStatsApp.java builds the per-window visitor rollup).
  *
  * Scale notes:
  *  - Every stage is user-keyed: the funnel's step joins and the
  *    cohort join all hash on `user_id`, so one co-partitioning serves
  *    the whole lineage; step filters prune event types AT THE SCAN
  *    (PushedFilters), so each pass reads a step-sized slice, not the
  *    firehose.
  *  - Counts dedup FIRST (distinct (user, day) / per-user min-ts
  *    aggregates) and count the deduped rows after — never a distinct
  *    aggregate mixed into a wide aggregation (the Expand trap).
  *  - Ratios are exact IEEE divisions of exact BIGINTs, reproducible
  *    across engines.
  */
object FunnelOps {

  /** Sequential funnel view → click → purchase: a user converts at a
    * step only with an event STRICTLY AFTER their entry to the
    * previous step (min-ts semantics, the standard ordered funnel).
    * Output: one row per step with reached-user counts and the
    * conversion share of step 1.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select($"user_id", $"event_type", $"ts")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = e.filter($"event_type" === "click")
      .join(v, "user_id").filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    def step(name: String, ord: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("users"))
        .select(lit(ord).cast("bigint").as("step"), lit(name).as("step_name"), $"users")
    val steps = step("view", 1, v).union(step("click", 2, c)).union(step("purchase", 3, p))
    val base = v.agg(count(lit(1)).as("base"))
    steps.crossJoin(broadcast(base)) // 3 rows × 1 row
      .select($"step", $"step_name", $"users",
        ($"users".cast("double") / $"base".cast("double")).as("share_of_entry"))
  }

  /** Step budget for the windowed funnel. */
  val StepBudgetHours = 24

  /** [[funnel]] with a conversion window: each step counts only within
    * [[StepBudgetHours]] of the user's entry to the PREVIOUS step —
    * the form real conversion reporting uses (a purchase a month after
    * the click is a different journey). Same user-keyed plan shape;
    * the budget is one more residual predicate on each step join.
    */
  def funnelWindowed(spark: SparkSession, dir: String): DataFrame = {
    val budget = expr(s"INTERVAL $StepBudgetHours HOURS")
    val e = events(spark, dir).select($"user_id", $"event_type", $"ts")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = e.filter($"event_type" === "click")
      .join(v, "user_id")
      .filter($"ts" > $"t_view" && $"ts" <= $"t_view" + budget)
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, "user_id")
      .filter($"ts" > $"t_click" && $"ts" <= $"t_click" + budget)
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    def step(name: String, ord: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("users"))
        .select(lit(ord).cast("bigint").as("step"), lit(name).as("step_name"), $"users")
    val steps = step("view", 1, v).union(step("click", 2, c)).union(step("purchase", 3, p))
    val base = v.agg(count(lit(1)).as("base"))
    steps.crossJoin(broadcast(base))
      .select($"step", $"step_name", $"users",
        ($"users".cast("double") / $"base".cast("double")).as("share_of_entry"))
  }

  /** Daily cohort retention: users grouped by their first active day,
    * counted on each later active day as (cohort, day_offset) cells
    * with the exact retained share. The classic triangle matrix.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val byDay = events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val cohort = byDay.groupBy($"user_id").agg(min($"d").as("c0"))
    val sizes = cohort.groupBy($"c0").agg(count(lit(1)).as("cohort_users"))
    byDay.join(cohort, "user_id")
      .groupBy($"c0", datediff($"d", $"c0").cast("bigint").as("day_offset"))
      .agg(count(lit(1)).as("users"))
      .join(sizes, "c0")
      .select(date_format($"c0", "yyyy-MM-dd").as("cohort"), $"day_offset",
        $"users", ($"users".cast("double") / $"cohort_users".cast("double")).as("retained_share"))
  }

  /** `retention_bitmap`: the day-N retention matrix computed as bitmap
    * algebra — cohort bitmaps (users by FIRST-seen day) intersected
    * with daily-activity bitmaps from the
    * [[graft.operators.WindowOps.uvBitmapRollup]] store. Same numbers
    * as [[retentionCohorts]] (the spec pins equality), but the join
    * that produces them is DAY-DOMAIN-sized: after two corpus passes
    * (first-seen fold, daily bitmaps) every (cohort, day) cell is one
    * `bitmap_and_card` merge-walk of two blobs — recomputing the whole
    * matrix after a new day lands touches no fact rows at all, which
    * is why serving layers store the blobs.
    */
  def retentionBitmap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftexpr.GraftBitmap
    val byDay = events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val cohorts = byDay.groupBy($"user_id").agg(min($"d").as("c0"))
      .groupBy($"c0").agg(GraftBitmap.build($"user_id").as("cbm"),
        count(lit(1)).as("cohort_users"))
    val daily = byDay.groupBy($"d")
      .agg(GraftBitmap.build($"user_id").as("dbm"))
    cohorts.join(daily, datediff($"d", $"c0") >= 0)
      .select(date_format($"c0", "yyyy-MM-dd").as("cohort"),
        datediff($"d", $"c0").cast("bigint").as("day_offset"),
        GraftBitmap.andCard($"cbm", $"dbm").as("users"),
        $"cohort_users")
      .filter($"users" > 0)
      .select($"cohort", $"day_offset", $"users",
        ($"users".cast("double") / $"cohort_users".cast("double"))
          .as("retained_share"))
  }

  /** Events kept per session for the path signature — production path
    * reporting always caps the prefix, both to bound the string and
    * because navigation interest is in how journeys START.
    */
  val PathCap = 8

  /** Distinct paths reported. */
  val PathTopN = 50

  /** Top navigation paths: each session's first-[[PathCap]] event-type
    * sequence (gap rule shared with [[AnalyticsOps.sessionize]]),
    * ranked by session count — the "how do users actually move"
    * ADS-layer view next to the step-defined [[funnel]].
    *
    * Scale shape: session assignment and the in-session prefix rank
    * share ONE user-keyed exchange (both windows partition by
    * user_id); the path signature is built per session from ≤
    * [[PathCap]] rows via array_sort over the unique in-session rank
    * (collect_list order is partition-dependent, the sort makes it
    * deterministic); user distincting happens as a (path, user)
    * pre-aggregation feeding the path rollup — two bounded aggregates,
    * never a distinct mixed into a wide agg (the Expand trap). The
    * final top-[[PathTopN]] is a sort+limit heap
    * (TakeOrderedAndProject), total-ordered by (count, path) so the
    * cut is deterministic.
    */
  def pathAnalysis(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val sessions = events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp($"ts").as("sec"))
      .withColumn("prev_sec", lag($"sec", 1).over(byUser))
      .withColumn("is_start", when($"prev_sec".isNull ||
        $"sec" - $"prev_sec" > AnalyticsOps.SessionGapSec, 1L).otherwise(0L))
      .withColumn("session_no", sum($"is_start").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySession = Window.partitionBy($"user_id", $"session_no")
      .orderBy($"sec", $"event_id")
    val paths = sessions
      .withColumn("rn", row_number().over(bySession))
      .filter($"rn" <= PathCap)
      .groupBy($"user_id", $"session_no")
      // rank-sorted projection via the codegen'd kernel — the
      // transform(array_sort(...)) tower it replaces was
      // CodegenFallback in the aggregate's result projection
      .agg(concat_ws(">", graft.plans.ArrayOps.structSortProject(
        expr("collect_list(struct(rn, event_type))"))).as("path"))
    paths.groupBy($"path", $"user_id").agg(count(lit(1)).as("s"))
      .groupBy($"path")
      .agg(sum($"s").as("n_sessions"), count(lit(1)).as("n_users"))
      .orderBy($"n_sessions".desc, $"path")
      .limit(PathTopN)
  }

  /** First-order Markov transition matrix over the per-user event-type
    * stream: P(next type | type) — the probabilistic twin of
    * [[pathAnalysis]] (paths answer "which exact journeys", the matrix
    * answers "where does each step lead", and it is what behavioral
    * models and next-step recommenders actually consume).
    *
    * Scale shape: ONE corpus window (lead over the user key — millions
    * of small partitions, never a global sort) feeding one map-side-
    * combined count keyed by (src, dst); the probability normalization
    * runs on the aggregated matrix, which is |types|² — dimension-sized
    * by construction — so its per-src window never touches the corpus.
    * Counts are exact BIGINTs; each probability is one IEEE division.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val t = events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp($"ts").as("sec"))
      .withColumn("dst", lead($"event_type", 1).over(byUser))
      .filter($"dst".isNotNull)
      .groupBy($"event_type".as("src"), $"dst")
      .agg(count(lit(1)).as("n"))
    t.withColumn("row_total",
        sum($"n").over(Window.partitionBy($"src")))
      .select($"src", $"dst", $"n",
        ($"n".cast("double") / $"row_total".cast("double")).as("p"))
  }

  /** Monetary band width (cents) for [[rfmSegments]]' quartile domain. */
  val RfmMonBand = 5000L

  /** `events_rfm_segments`: Recency/Frequency/Monetary segmentation of
    * the user base — every user scored 1–4 on each dimension against
    * the population's quartiles, concatenated into the classic 111–444
    * segment code marketing and retention models consume.
    *
    * NO GLOBAL SORT OF USERS: quartile thresholds are read off
    * bounded-domain histograms with cumulative windows — recency in
    * days (time-domain-bounded), frequency in per-user event counts
    * (activity-bounded), monetary in [[RfmMonBand]]-cent bands (the
    * [[StatsOps.valueHistogram]] binning) — then broadcast back and
    * every user scores in a narrow pass. The ntile() formulation would
    * range-sort the full user table three times; this is three
    * dimension-sized windows plus one corpus aggregation. Thresholds
    * use the integer-exact rank rule t_q = min v with cum·q⁻¹ ≥ n
    * (cross-multiplied, so no division): score = 1 + #{thresholds
    * strictly below} for F/M, inverted for R (recent = high).
    *
    * Scale shape: ONE corpus pass (map-side-combined per-user
    * aggregate); histograms aggregate the USER table onto bounded
    * domains; the three 1-row threshold frames broadcast-join back.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val users = events(spark, dir)
      .groupBy($"user_id")
      .agg(max(to_date($"ts")).as("last_day"),
        count(lit(1)).as("freq"), sum(cents).as("mon"))
    val anchor = users.agg(max($"last_day").as("anchor"))
    // materialize the per-user rollup ONCE: three histogram branches
    // and the final scoring all consume it — lazily it re-planned the
    // corpus aggregation per branch (4 full scans on .explain)
    val u = users.join(broadcast(anchor))
      .select($"user_id",
        datediff($"anchor", $"last_day").cast("long").as("r_days"),
        $"freq", RelationalOps.floorDiv($"mon", RfmMonBand).as("m_band"), $"mon")
      .localCheckpoint()

    // 1-row (t1, t2, t3) quartile cutoffs of `v` over its bounded domain
    def cuts(dim: DataFrame, pfx: String): DataFrame = {
      val hist = dim.groupBy($"v").agg(count(lit(1)).as("c"))
      val total = hist.agg(sum($"c").as("n"))
      val w = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("cum", sum($"c").over(w))
        .join(broadcast(total))
        .agg(min(when($"cum" * 4 >= $"n", $"v")).as(pfx + "1"),
          min(when($"cum" * 2 >= $"n", $"v")).as(pfx + "2"),
          min(when($"cum" * 4 >= $"n" * 3, $"v")).as(pfx + "3"))
    }
    val rc = cuts(u.select($"r_days".as("v")), "rt")
    val fc = cuts(u.select($"freq".as("v")), "ft")
    val mc = cuts(u.select($"m_band".as("v")), "mt")

    def above(v: org.apache.spark.sql.Column, t: String): org.apache.spark.sql.Column =
      when(v > col(t), 1L).otherwise(0L)
    u.join(broadcast(rc)).join(broadcast(fc)).join(broadcast(mc))
      .withColumn("r_score",
        lit(4L) - above($"r_days", "rt1") - above($"r_days", "rt2") - above($"r_days", "rt3"))
      .withColumn("f_score",
        lit(1L) + above($"freq", "ft1") + above($"freq", "ft2") + above($"freq", "ft3"))
      .withColumn("m_score",
        lit(1L) + above($"m_band", "mt1") + above($"m_band", "mt2") + above($"m_band", "mt3"))
      .select($"user_id", $"r_days", $"freq", $"mon".as("mon_cents"),
        $"r_score", $"f_score", $"m_score",
        ($"r_score" * 100L + $"f_score" * 10L + $"m_score").as("segment"))
  }

  /** `retention_ltv`: cumulative revenue per cohort over cohort age —
    * the LTV curve next to [[retentionCohorts]]' count matrix: for
    * each (first-seen day, day offset), the cohort's exact cumulative
    * cents and per-user average. The number a growth model fits.
    *
    * Exact cents throughout; the cumulative window runs over the
    * (cohort × offset) matrix — day-domain² bounded, never raw
    * events. Two corpus passes (first-seen, daily revenue), both
    * map-side-combined and both keyed by user_id (one co-partitioning).
    */
  def retentionLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val daily = events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"), cents.as("c"))
      .groupBy($"user_id", $"d").agg(sum($"c").as("day_cents"))
    val cohort = daily.groupBy($"user_id").agg(min($"d").as("c0"))
    val sizes = cohort.groupBy($"c0").agg(count(lit(1)).as("cohort_users"))
    val cells = daily.join(cohort, "user_id")
      .groupBy($"c0", datediff($"d", $"c0").cast("bigint").as("day_offset"))
      .agg(sum($"day_cents").as("cents"))
    val w = Window.partitionBy($"c0").orderBy($"day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum($"cents").over(w))
      .join(sizes, "c0")
      .select(date_format($"c0", "yyyy-MM-dd").as("cohort"), $"day_offset",
        $"cents", $"cum_cents", $"cohort_users",
        ($"cum_cents".cast("double") / $"cohort_users".cast("double") / 100.0)
          .as("ltv_per_user"))
  }

  /** `events_activity_streaks`: gaps-and-islands over each user's
    * active days — every maximal run of CONSECUTIVE calendar days,
    * with start/end/length — the engagement-streak feature (and the
    * classic SQL islands problem, solved with the day−row_number
    * anchor: consecutive days share `d − rn`, so one per-user window
    * plus a group-by finds every island with no self-join).
    *
    * Scale shape: one distinct pass to (user, day) — the only
    * corpus-scale work — then a per-user window over that user's
    * day-bounded rows and an island-keyed aggregate on the same
    * partitioning.
    */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val byDay = events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    byDay
      .withColumn("anchor", expr("date_sub(d, CAST(row_number() OVER " +
        "(PARTITION BY user_id ORDER BY d) AS INT))"))
      .groupBy($"user_id", $"anchor")
      .agg(min($"d").as("s"), max($"d").as("e"), count(lit(1)).as("len"))
      .select($"user_id", date_format($"s", "yyyy-MM-dd").as("streak_start"),
        date_format($"e", "yyyy-MM-dd").as("streak_end"),
        $"len".as("streak_days"))
  }
}
