package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft._

/** Streaming twins of the DWS windowed aggregations
  * ([[graft.operators.WindowOps]] /
  * [[graft.operators.AnalyticsOps.sessionize]]): watermarked event-time
  * windows in append mode — the windowed-visitor-stats layer the
  * reference intended (SURVEY.md §2.8). Input: a frame with `ts`
  * (epoch ms) and the dimension columns.
  */
object WindowedAggs {

  /** Tumbling per-hour counts/sums; watermark bounds state and emits
    * finalized windows only (append mode).
    */
  def tumblingCounts(events: DataFrame, dims: Seq[String]): DataFrame = {
    val dimCols = dims.map(col)
    events
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window($"event_time", "1 hour").as("w") +: dimCols: _*)
      .agg(count(lit(1)).as("n"))
      .select(($"w.start".as("window_start") +: dimCols) :+ $"n": _*)
  }

  /** Streaming keyword job (the tokenize → explode → windowed count the
    * reference planned: ikanalyzer dep + SEARCH/CLICK/CART/ORDER
    * constants, reference gmall-realtime/pom.xml:179-183,
    * common/GmallConstant.java:64-67): search terms from page events
    * tokenize through the engine's canonical tokenizer, then tumbling
    * hourly counts per keyword. Input: a frame with `ts` (epoch ms) and
    * a `item` search-term column (nullable).
    */
  def keywordCounts(pages: DataFrame): DataFrame =
    pages
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      // no `item IS NOT NULL` filter: the optimizer would push it BELOW
      // the watermark node and non-search pages would stop advancing the
      // event clock (a search lull would hold every window open). The
      // explode of tokens(null) emits nothing, and a Generate cannot be
      // pushed under the watermark.
      .select($"event_time",
        explode(graft.functions.TextAnalysis.tokens($"item")).as("keyword"))
      .groupBy(window($"event_time", "1 hour").as("w"), $"keyword")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("window_start"), $"keyword", $"n")

  /** Streaming twin of
    * [[graft.operators.TimeSeriesOps.ohlcDownsample]]: per-type hourly
    * OHLC bars as a watermarked window aggregate. The decimal-packed
    * (µs, event_id) order key makes open/close DECLARATIVE min_by /
    * max_by aggregates, so micro-batch merge is just buffer comparison
    * — a late row with an earlier timestamp correctly steals `open`
    * when it arrives within the watermark, with no per-window row
    * retention (the state per open window is one fixed-width buffer).
    * Input: a frame with `event_id`, `event_type`, `value`, `ts`
    * (epoch ms).
    */
  def ohlcPerWindow(events: DataFrame): DataFrame = {
    val cents = (graft.operators.RelationalOps.dec($"value") * 100).cast("long")
    val ord = unix_micros(timestamp_millis($"ts")).cast("decimal(38,0)") *
      lit(1000000000000L) + $"event_id"
    events
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .select($"event_time", $"event_type", ord.as("ord"), $"value", cents.as("c"))
      .groupBy(window($"event_time", "1 hour").as("w"), $"event_type")
      .agg(min_by($"value", $"ord").as("open"), max($"value").as("high"),
        min($"value").as("low"), max_by($"value", $"ord").as("close"),
        sum($"c").as("vol_cents"), count(lit(1)).as("n_events"))
      .select($"w.start".as("window_start"), $"event_type",
        $"open", $"high", $"low", $"close", $"vol_cents", $"n_events")
  }

  /** Streaming windowed quantiles via the engine's t-digest aggregate
    * ([[org.apache.spark.sql.graftexpr.TDigestAgg]]): per-window value
    * percentiles (latency/size/score distributions) with constant state
    * per open window — the sketch is the aggregation buffer, merged
    * across micro-batches by the ObjectHashAggregate path, finalized
    * when the watermark closes the window. The streaming shape exact
    * quantiles cannot take (they would need every value retained per
    * window).
    */
  def valueQuantilesPerWindow(events: DataFrame,
      percentiles: Seq[Double]): DataFrame =
    events
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window($"event_time", "1 hour").as("w"))
      .agg(org.apache.spark.sql.graftexpr.TDigestAgg
        .quantiles($"value", percentiles).as("qs"))
      .select($"w.start".as("window_start"), $"qs")

  /** Streaming per-window UV sketches via the engine's HLL aggregate
    * ([[org.apache.spark.sql.graftexpr.GraftHll]]): each finalized
    * window emits its SKETCH (binary) alongside the estimate, so a
    * serving store can keep rolling windows up (day/week/ad-hoc unions
    * via `hll_union`) without the raw stream — the streaming end of the
    * [[graft.operators.WindowOps.uvSketchRollup]] contract. Constant
    * state per open window (2^p registers); partial buffers merge
    * across micro-batches through the ObjectHashAggregate path exactly
    * like the t-digest sketch above.
    */
  def uvSketchPerWindow(events: DataFrame, p: Int = 12): DataFrame =
    events
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window($"event_time", "1 hour").as("w"))
      .agg(org.apache.spark.sql.graftexpr.GraftHll
        .build($"user_id", p).as("sketch"))
      .select($"w.start".as("window_start"), $"sketch",
        org.apache.spark.sql.graftexpr.GraftHll.cardinality($"sketch").as("uv_est"))

  /** Streaming per-window EXACT UV bitmaps — the audit-grade twin of
    * [[uvSketchPerWindow]] on the
    * [[org.apache.spark.sql.graftexpr.GraftBitmap]] exact bitmap
    * columns: each finalized window emits its blob plus the exact
    * count, and a serving store rolls windows up via `bitmap_union`
    * with zero error. State per open window is the bitmap itself
    * (~1 bit per distinct user on dense id domains); partial buffers
    * merge word-wise across micro-batches through the same
    * ObjectHashAggregate path as the sketches.
    */
  def uvBitmapPerWindow(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window($"event_time", "1 hour").as("w"))
      .agg(org.apache.spark.sql.graftexpr.GraftBitmap
        .build($"user_id").as("bm"))
      .select($"w.start".as("window_start"), $"bm",
        org.apache.spark.sql.graftexpr.GraftBitmap.card($"bm").as("uv"))

  /** Per-window Count-Min sketch — the frequency companion of
    * [[uvSketchPerWindow]]: each closed window emits its mergeable d×w
    * counter blob, so a serving store can answer "how often was key k in
    * window/day/week?" by elementwise-adding blobs, without the raw
    * stream. Same ObjectHashAggregate partial-merge path, constant state
    * per open window.
    */
  def cmSketchPerWindow(events: DataFrame, depth: Int = 4,
      width: Int = 256): DataFrame =
    events
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window($"event_time", "1 hour").as("w"))
      .agg(org.apache.spark.sql.graftexpr.GraftCountMin
        .build($"user_id", depth, width).as("sketch"))
      .select($"w.start".as("window_start"), $"sketch")

  /** Session windows with a 30-min gap — Spark's native session_window
    * generalizes the batch gaps-and-islands form; state per open session,
    * closed by the watermark.
    */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_millis($"ts"))
      .withWatermark("event_time", "1 hour")
      .groupBy(session_window($"event_time", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events")
}
