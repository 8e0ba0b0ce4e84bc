package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Time-series maintenance operators over the `events` stream table:
  * calendar densification with forward fill, and OHLC downsampling.
  * The reference's DWS layer materializes per-window aggregates but
  * leaves empty windows implicit (reference
  * gmall-realtime/.../app/dws/VisitorStatsApp.java windowing keeps only
  * windows that received events); downstream consumers (charting,
  * training-curriculum time features) need the dense form, so these
  * close that gap Spark-first.
  *
  * Scale notes (100 TB posture):
  *  - Gap generation is PER-KEY (`sequence(min_day, max_day)` on the
  *    aggregated span row), so the exploded calendar is bounded by
  *    keys × span-days — never a cross join against a global calendar
  *    table. At 100 TB the daily rollup is ~6 orders of magnitude
  *    smaller than the fact table; everything after the first
  *    aggregation is dimension-sized.
  *  - The rollup, the span aggregate, the densify join and the
  *    forward-fill window all hash/partition by `user_id`, so AQE
  *    coalesces and the exchanges reuse one co-partitioning; the only
  *    full-data shuffle is the initial map-side-combined rollup.
  *  - Money math uses the [[RelationalOps.dec]] cents contract: sums
  *    accumulate on unscaled longs, exact and partition-order
  *    independent (oracle parity; ANSI mode faults overflow loudly).
  */
object TimeSeriesOps {

  /** Densify each user's daily revenue series to its full [min,max] day
    * span and forward-fill gaps with the last observed value.
    *
    * Emits one row per user per calendar day in the user's active span:
    * the raw daily total (`day_cents`, null on gap days) and the
    * forward-filled total (`filled_cents`). `last(_, ignoreNulls)` over
    * an unbounded-preceding row frame is the distributed forward fill —
    * a running scan within each user partition, no self-join.
    */
  def gapfillForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val daily = events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"), cents.as("c"))
      .groupBy($"user_id", $"d")
      .agg(sum($"c").as("day_cents"))
    val spans = daily.groupBy($"user_id")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
    val calendar = spans.select(
      $"user_id",
      explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("d"))
    val fill = Window.partitionBy($"user_id").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(daily, Seq("user_id", "d"), "left")
      .withColumn("filled_cents", last($"day_cents", ignoreNulls = true).over(fill))
      // string day: the one temporal form whose physical type cannot
      // drift between Spark parquet and the DuckDB oracle dump
      .select($"user_id", date_format($"d", "yyyy-MM-dd").as("day"),
        $"day_cents", $"filled_cents")
  }

  /** Median / MAD anomaly threshold multiplier (classic 5σ-ish). */
  val MadK = 5L

  /** Robust per-type daily-revenue anomaly flags: a day is anomalous
    * when its deviation from the type's median day exceeds
    * [[MadK]] × MAD (median absolute deviation) — the
    * outlier-resistant twin of the z-score, immune to the outliers it
    * is hunting.
    *
    * EXACT INTEGER arithmetic end to end, so the flag is reproducible
    * bit-for-bit on any engine: day totals in cents, medians carried
    * as 2×median (`med2`, the middle pair's sum — integer whether the
    * count is odd or even), deviations as `dev2 = |2x − med2|`, MAD as
    * `mad4 = 2×median(dev2)`, and the flag compares `2·dev2 > MadK·mad4`
    * — every quantity a long, no halves ever materialized.
    *
    * Scale shape: the only full-data pass is the map-side-combined
    * daily rollup; every later stage (two median window passes, the
    * broadcast joins back) runs on the (type × day) table, which is
    * bounded by the TIME DOMAIN — ~30 rows per type here, ~10⁴ at a
    * decade of daily partitions — so the window sorts are
    * dimension-sized at any corpus scale.
    */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val daily = events(spark, dir)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"), cents.as("c"))
      .groupBy($"event_type", $"day")
      .agg(sum($"c").as("day_cents"))

    // 2×median of `v` per event_type: sum of the middle pair (doubled
    // when the middle collapses to one row), deterministic tiebreak on
    // the day column
    def med2(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy($"event_type").orderBy(col(v), $"day")
      val wc = Window.partitionBy($"event_type")
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(expr("rn = (cnt + 1) div 2 OR rn = (cnt + 2) div 2"))
        .groupBy($"event_type")
        .agg(when(count(lit(1)) === 1, sum(col(v)) * 2)
          .otherwise(sum(col(v))).as(out))
    }

    val med = med2(daily, "day_cents", "med2")
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev2", abs($"day_cents" * 2 - $"med2"))
    val mad = med2(dev, "dev2", "mad4")
    dev.join(broadcast(mad), "event_type")
      .select($"event_type", $"day", $"day_cents",
        ($"dev2" * 2 > lit(MadK) * $"mad4").as("is_anomaly"))
  }

  /** Downsample per-type event values to hourly OHLC bars (open, high,
    * low, close, volume, count) — the classic resampling shape.
    *
    * One map-side-combined hash aggregate over the scan: open/close are
    * `min_by`/`max_by` on a total order where event_id breaks timestamp
    * ties deterministically (scaled data replicates rows with identical
    * timestamps), so results are stable under re-partitioning without a
    * window sort over the full table. The tie-broken order is PACKED
    * into one decimal(38,0) — `µs · 10¹² + event_id` — instead of a
    * (µs, event_id) struct: a struct-ordered min_by has no mutable
    * aggregation-buffer representation and silently demotes the whole
    * query to SortAggregate (per-partition sort of the fact table,
    * measured on .explain), while decimal128 is a fixed-width buffer
    * type that keeps the plan a HashAggregate. Exact while
    * event_id < 10¹² and epoch-µs < 10²⁶⁻¹² (both hold for any real
    * timestamp domain; ANSI mode faults the arithmetic loudly if not).
    */
  def ohlcDownsample(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val ord = unix_micros($"ts").cast("decimal(38,0)") * lit(1000000000000L) + $"event_id"
    events(spark, dir)
      .select($"event_type", date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00").as("bucket"),
        ord.as("ord"), $"value", cents.as("c"))
      .groupBy($"event_type", $"bucket")
      .agg(
        min_by($"value", $"ord").as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", $"ord").as("close"),
        sum($"c").as("vol_cents"),
        count(lit(1)).as("n_events"))
  }

  /** Trailing observations in the [[ewmaSmooth]] horizon. */
  val EwmaWindow = 8

  /** Integer weight of the k-th most recent observation over the
    * common denominator 4^[[EwmaWindow]]: 3^k · 4^(W−1−k). Shared with
    * the generated oracle SQL so the two engines cannot drift.
    */
  def ewmaWeight(k: Int): Long =
    (0 until k).foldLeft(1L)((a, _) => a * 3) *
      (0 until (EwmaWindow - 1 - k)).foldLeft(1L)((a, _) => a * 4)

  /** Exponential smoothing of the per-type daily revenue series with
    * α = 1/4 over a trailing [[EwmaWindow]]-observation horizon — the
    * classic EWMA chart line, in EXACT integer arithmetic.
    *
    * The recurrence s_t = α·x_t + (1−α)·s_{t−1} unrolls to weights
    * α·(1−α)^k = 3^k / 4^(k+1) for the k-th most recent observation;
    * over the common denominator 4^W each weight is the integer
    * 3^k · 4^(W−1−k), so the smoothed value is a ratio of two BIGINTs
    * (`ewma_num` / `ewma_den`) — partition-order-free and bit-identical
    * across engines where a float pow() recurrence is neither. Rows
    * within the warm-up (fewer than W trailing observations) normalize
    * by the sum of the weights actually present, so the output is an
    * average of what exists rather than a value biased toward zero.
    *
    * Scale shape: the only corpus shuffle is the map-side-combined
    * daily rollup; the event_type lag window re-keys only the
    * aggregated day rows (days × types, dimension-sized — keying the
    * FACT by the ~5-value type column instead would collapse
    * parallelism), and every per-row term is a codegen'd lag/coalesce
    * chain — the W-term dot product never materializes an array.
    */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val daily = events(spark, dir)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"), cents.as("c"))
      .groupBy($"event_type", $"day")
      .agg(sum($"c").as("day_cents"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    val terms = (0 until EwmaWindow).map { k =>
      val x = if (k == 0) $"day_cents" else lag($"day_cents", k).over(w)
      (coalesce(x * ewmaWeight(k), lit(0L)),
        when(x.isNotNull, lit(ewmaWeight(k))).otherwise(lit(0L)))
    }
    daily
      .withColumn("ewma_num", terms.map(_._1).reduce(_ + _))
      .withColumn("ewma_den", terms.map(_._2).reduce(_ + _))
      .select($"event_type", $"day", $"day_cents", $"ewma_num", $"ewma_den",
        ($"ewma_num".cast("double") / $"ewma_den".cast("double")).as("ewma"))
  }

  /** Exact least-squares linear trend of each event type's daily
    * revenue series — the forecasting primitive next to [[ewmaSmooth]]
    * (EWMA answers "where is the level", the trend answers "which way
    * and how fast"). With x = 1..n (the day's rank in its series) and
    * y = day_cents, the slope is
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²): every sum is an exact BIGINT,
    * so `slope_num`/`slope_den` are engine-independent integers and
    * `slope` is one IEEE division. The intercept is evaluated in
    * doubles from those exact sums ((Σy − slope·Σx)/n, same literal
    * expression both engines) because its integer numerator
    * Σy·den − num·Σx can overflow BIGINT at large SF where the sums
    * themselves cannot.
    *
    * Scale shape, same stance as [[ewmaSmooth]]: one map-side-combined
    * corpus rollup to days × types, the rank window and the trend
    * aggregate both over that dimension-sized frame.
    */
  def linearTrend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val daily = events(spark, dir)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"), cents.as("c"))
      .groupBy($"event_type", $"day")
      .agg(sum($"c").as("y"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    daily
      .withColumn("x", row_number().over(w).cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .withColumn("slope_num", $"n" * $"sxy" - $"sx" * $"sy")
      .withColumn("slope_den", $"n" * $"sxx" - $"sx" * $"sx")
      // a 1-day series has den = 0: NULL, not an engine-specific ±Inf
      .withColumn("slope", when($"slope_den" === 0L, lit(null))
        .otherwise($"slope_num".cast("double") / $"slope_den".cast("double")))
      .withColumn("intercept",
        ($"sy".cast("double") - $"slope" * $"sx".cast("double")) /
          $"n".cast("double"))
      .select($"event_type", $"n", $"slope_num", $"slope_den",
        $"slope", $"intercept")
  }

  /** Half-life units for [[userRecencyScore]] (days per halving). */
  val HalfLifeDays = 30

  /** Decay horizon in half-life units: activity older than this
    * contributes zero (its exact weight would need fractional bits).
    */
  val MaxHalfLives = 30

  /** Recency-frequency user features: per user, event count, days
    * since last activity, and an exponentially-decayed engagement mass
    * (half-life [[HalfLifeDays]]) — the RFM feature-store triple.
    *
    * The decay is EXACT: with a power-of-two base, the weight of a row
    * d half-lives old is the integer 2^(30−d), so the decayed mass is
    * a sum of exact integers (DECIMAL(38,0) against a corpus-scale
    * row count) normalized by 2³⁰ in one double division at the end —
    * partition-order-free where a float `pow(0.5, age)` sum is not,
    * and cross-engine identical where libm `pow` is not guaranteed to
    * be. The anchor (newest event date) is a 1-row broadcast; the only
    * corpus shuffle is the user-keyed aggregate.
    */
  def userRecencyScore(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select($"user_id", to_date($"ts").as("day"),
        (RelationalOps.dec($"value") * 100).cast("long").as("cents"))
    val anchor = e.agg(max($"day").as("anchor_day"))
    e.join(broadcast(anchor))
      .withColumn("d_units",
        least(lit(MaxHalfLives),
          (datediff($"anchor_day", $"day") / HalfLifeDays).cast("int")))
      .withColumn("w",
        expr(s"shiftleft(CAST(1 AS BIGINT), $MaxHalfLives - d_units)"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        min(datediff($"anchor_day", $"day")).cast("bigint").as("recency_days"),
        (sum(($"cents" * $"w").cast("decimal(38,0)")).cast("double") /
          (1L << MaxHalfLives).toDouble / 100.0).as("decayed_value"))
  }

  /** Trailing window width for [[rollingUv]]. */
  val RollingDays = 7

  /** Trailing-7-day unique visitors per calendar day — the rolling UV
    * the serving layer charts next to the per-day UV of
    * [[graft.operators.EventOps.dailyUniqueVisitors]]. Exact distinct
    * over a sliding frame is NOT window-expressible (no
    * `count(DISTINCT) OVER RANGE` in either engine), and re-scanning 7
    * days of facts per output day is 7 full passes; instead each
    * distinct (user, active-day) pair is exploded to the ≤
    * [[RollingDays]] window-anchor days it contributes to, re-distinct
    * (one user active on several days inside a window must count
    * once), and counted — the standard shift-and-count decomposition.
    *
    * Scale shape: the corpus pass is the (user, day) distinct (partial
    * agg); everything after runs on per-user-day rows × 7 — a bounded
    * fan-out of an already-reduced table, partitioned by the window
    * day for the final count. Anchor days with no in-range history
    * earlier than the corpus minimum still report (partial windows),
    * matching the chart semantics; days after the corpus max do not
    * exist by construction.
    */
  def rollingUv(spark: SparkSession, dir: String): DataFrame = {
    val byDay = events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val span = byDay.agg(max($"d").as("dmax"))
    byDay.join(broadcast(span))
      .select($"user_id", explode(
        sequence($"d", least(date_add($"d", RollingDays - 1), $"dmax")))
        .as("wday"))
      .distinct()
      .groupBy(date_format($"wday", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("uv_7d"))
  }

  /** `ts_rolling_uv_bitmap`: trailing-[[RollingDays]] UV from the
    * per-day EXACT bitmap store — the 100 TB path for rolling
    * distincts. [[rollingUv]]'s shift-and-count pays
    * [[RollingDays]]× the distinct (user, day) table per recompute;
    * here the corpus is touched ONCE to build one bitmap blob per day
    * (the same artifact
    * [[graft.operators.WindowOps.uvBitmapRollup]] serves), and each
    * anchor day unions ≤[[RollingDays]] blobs — day-domain-sized work,
    * so refreshing the window after a new day lands costs 7 blob
    * merges, not a corpus pass.
    *
    * Semantics note: anchors are days WITH events (the serving-store
    * rows), whereas [[rollingUv]] also emits event-less days inside a
    * contributor's reach; on gap-free calendars the two agree row for
    * row (RollingUvSpec pins both).
    */
  def rollingUvBitmap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftexpr.GraftBitmap
    val daily = events(spark, dir)
      .select(to_date($"ts").as("d"), $"user_id")
      .groupBy($"d").agg(GraftBitmap.build($"user_id").as("bm"))
    val anchors = daily.select($"d".as("ad"))
    anchors.join(daily,
        datediff($"ad", $"d").between(0, RollingDays - 1))
      .groupBy(date_format($"ad", "yyyy-MM-dd").as("day"))
      .agg(GraftBitmap.card(GraftBitmap.union($"bm")).as("uv_7d"))
  }

  /** `ts_cusum_daily`: one-sided CUSUM change detectors over the daily
    * event count — S⁺_d = max(0, S⁺_{d−1} + dev_d), S⁻_d = min(0,
    * S⁻_{d−1} + dev_d) against the integer mean — the classic
    * "did the level shift" monitor a plain cumulative sum cannot
    * express (the clamp makes it a RECURSION, not a window frame).
    *
    * The recursion is legal at scale because it runs over the BOUNDED
    * day domain: the corpus reduces to one count per day (partial
    * agg), the day rows collect into a single sorted array, and one
    * `aggregate` fold threads the clamped state through it — the same
    * bounded-domain-fold stance as the χ² cell fold, extended to
    * sequential state. The oracle replays it as a recursive CTE.
    * Deviations are exact longs (mean is the truncating integer mean).
    */
  def cusumDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
    val mean = daily.agg((sum($"n").cast("long")).as("tot"),
      count(lit(1)).as("nd"))
      .select(expr("tot div nd").as("mean_n"))
    daily.join(broadcast(mean))
      .select(struct($"d", $"n", ($"n" - $"mean_n").as("dev")).as("r"))
      .agg(sort_array(collect_list($"r")).as("ds"))
      // slice length = size(fold): over-long is clamped, and an
      // Int.MaxValue literal would overflow start+length inside Slice
      .select(explode(expr(
        """slice(
          |  aggregate(ds,
          |    array(named_struct(
          |      'd', CAST('1970-01-01' AS DATE), 'n', CAST(0 AS BIGINT),
          |      'dev', CAST(0 AS BIGINT), 'sp', CAST(0 AS BIGINT),
          |      'sn', CAST(0 AS BIGINT))),
          |    (acc, x) -> concat(acc, array(named_struct(
          |      'd', x.d, 'n', x.n, 'dev', x.dev,
          |      'sp', greatest(CAST(0 AS BIGINT), element_at(acc, -1).sp + x.dev),
          |      'sn', least(CAST(0 AS BIGINT), element_at(acc, -1).sn + x.dev))))),
          |  2, size(ds))""".stripMargin)).as("c"))
      .select(date_format($"c.d", "yyyy-MM-dd").as("day"),
        $"c.n".as("n_events"), $"c.dev".as("dev"),
        $"c.sp".as("cusum_pos"), $"c.sn".as("cusum_neg"))
  }

  /** `ts_seasonal_decompose`: classical additive decomposition of the
    * daily revenue series — trend = centered 7-day moving average
    * (complete windows only), seasonal = per-day-of-week mean of the
    * detrended series, residual = value − trend − seasonal. The
    * STL-lite any weekly-cycled business series gets before anomaly
    * thresholds are set on it.
    *
    * Exactness protocol: every intermediate stays an exact long —
    * trend7 is the SUM of 7 days' cents (not the mean), the detrended
    * value is `7·cents − trend7`, the per-DOW seasonal numerator and
    * denominator are exact (sum of longs / row count) — and each
    * output double is a SINGLE division of exact integers, so Spark
    * and the oracle agree bit-for-bit (the shared-division rule used
    * across the stats family). Day-of-week is computed as
    * `(d − 1970-01-05) mod 7` (0 = Monday) — pure integer date
    * arithmetic, immune to the engines' differing dayofweek origins.
    *
    * Scale shape: the corpus collapses to one exact-cent row per day
    * FIRST (partial agg); the MA window, the DOW aggregate, and the
    * 7-row seasonal broadcast-join all run over the bounded day
    * domain. The trend window checks `max(d)−min(d) = 6` over its
    * ROWS frame, so calendar gaps yield null trend instead of a
    * silently short mean.
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum((RelationalOps.dec($"value") * 100).cast("long")).as("cents"))
      .withColumn("dow", pmod(datediff($"d", lit("1970-01-05")), lit(7)))
    val w = Window.orderBy($"d").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("t7",
        when(count(lit(1)).over(w) === 7 &&
          datediff(max($"d").over(w), min($"d").over(w)) === 6,
          sum($"cents").over(w)))
      .withColumn("det7", $"cents" * 7 - $"t7")
    val seasonal = trended.filter($"det7".isNotNull)
      .groupBy($"dow")
      .agg(sum($"det7").as("s_num"), count(lit(1)).as("s_den"))
    trended.join(broadcast(seasonal), Seq("dow"), "left")
      .select(date_format($"d", "yyyy-MM-dd").as("day"),
        ($"cents".cast("double") / 100.0).as("revenue"),
        ($"t7".cast("double") / 700.0).as("trend"),
        ($"s_num".cast("double") / $"s_den".cast("double") / 700.0).as("seasonal"),
        when($"t7".isNotNull,
          ($"cents" * 7 - $"t7").cast("double") / 700.0 -
            $"s_num".cast("double") / $"s_den".cast("double") / 700.0).as("residual"))
  }

  /** `ts_holt_smooth`: Holt’s linear (double-exponential) smoothing of
    * the daily revenue series — level l_t = α·y_t + (1−α)(l_{t−1} +
    * b_{t−1}), trend b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1} — the
    * one-step-ahead forecaster (fitted_t = l_{t−1} + b_{t−1}) that
    * [[ewmaSmooth]] cannot express because EWMA has no trend state.
    * α = 0.5 and β = 0.25 are BINARY-EXACT doubles, and both engines
    * evaluate the identical operation sequence over the day-sorted
    * fold, so every smoothed value is bit-identical (the [[cusumDaily]]
    * recursion contract extended to double state).
    *
    * Scale shape: identical to [[cusumDaily]] — the corpus collapses
    * to one exact-cent row per day (partial agg), and the recursion
    * folds once over the BOUNDED day-domain array; the oracle replays
    * it as a recursive CTE.
    */
  def holtSmooth(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum((RelationalOps.dec($"value") * 100).cast("long")).as("c"))
    daily.select(struct($"d", $"c").as("r"))
      .agg(sort_array(collect_list($"r")).as("ds"))
      .select(explode(expr(
        """slice(
          |  aggregate(ds,
          |    array(named_struct(
          |      'd', CAST('1970-01-01' AS DATE), 'c', CAST(0 AS BIGINT),
          |      'l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE),
          |      'f', CAST(0 AS DOUBLE))),
          |    (acc, x) -> concat(acc, array(CASE WHEN size(acc) = 1
          |      THEN named_struct('d', x.d, 'c', x.c,
          |        'l', CAST(x.c AS DOUBLE), 'b', CAST(0 AS DOUBLE),
          |        'f', CAST(x.c AS DOUBLE))
          |      ELSE named_struct('d', x.d, 'c', x.c,
          |        'l', 0.5D * CAST(x.c AS DOUBLE) +
          |          0.5D * (element_at(acc, -1).l + element_at(acc, -1).b),
          |        'b', 0.25D * ((0.5D * CAST(x.c AS DOUBLE) +
          |            0.5D * (element_at(acc, -1).l + element_at(acc, -1).b)) -
          |            element_at(acc, -1).l) +
          |          0.75D * element_at(acc, -1).b,
          |        'f', element_at(acc, -1).l + element_at(acc, -1).b)
          |      END))),
          |  2, size(ds))""".stripMargin)).as("h"))
      .select(date_format($"h.d", "yyyy-MM-dd").as("day"),
        ($"h.c".cast("double") / 100.0).as("revenue"),
        ($"h.l" / 100.0).as("level"),
        ($"h.b" / 100.0).as("trend"),
        ($"h.f" / 100.0).as("fitted"),
        (($"h.c".cast("double") - $"h.f") / 100.0).as("residual"))
  }

  /** Max lag (days) reported by [[autocorrelation]]. */
  val AcfMaxLag = 7

  /** `ts_autocorrelation`: the daily-revenue autocorrelation function
    * at lags 1..[[AcfMaxLag]] — the "is there a weekly cycle" /
    * "how fast does the series forget" diagnostic that decides
    * whether [[seasonalDecompose]]'s period-7 assumption is even
    * right. acf(k) = Σ_t d_t·d_{t+k} / Σ_t d_t², computed on
    * EXACT scaled deviations d_t = n·y_t − Σy (longs; products
    * accumulate in decimal(38,0)), one double division per lag.
    *
    * Scale shape: the corpus collapses to the bounded day domain
    * first; lag pairing is an equi-join of that table against itself
    * on `d + k` over the exploded lag frame (7·days rows) — never a
    * window over raw events; the shared denominator is a 1-row
    * broadcast.
    */
  def autocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(sum((RelationalOps.dec($"value") * 100).cast("long")).as("y"))
    val tot = daily.agg(count(lit(1)).as("n"), sum($"y").as("s"))
    val dev = daily.join(broadcast(tot))
      .select($"d", ($"y" * $"n" - $"s").as("dev"))
    val den = dev
      .agg(sum($"dev".cast("decimal(38,0)") * $"dev").as("den"))
    val lagged = dev.crossJoin(
        spark.range(1, AcfMaxLag + 1).select($"id".as("k")))
      .select($"k", expr("date_add(d, CAST(k AS INT))").as("dk"),
        $"dev".as("dev_a"))
    lagged.join(dev.select($"d".as("dk"), $"dev".as("dev_b")), "dk")
      .groupBy($"k")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"dev_a".cast("decimal(38,0)") * $"dev_b").as("num"))
      .join(broadcast(den))
      .select($"k", $"n_pairs",
        ($"num".cast("double") / $"den".cast("double")).as("acf"))
  }
}
