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
