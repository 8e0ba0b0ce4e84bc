package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft._
import graft.sources.GmallSchemas

/** The BaseLogApp pipeline (reference gmall-realtime/.../app/dwd/
  * BaseLogApp.java:32-156), rebuilt as mode-agnostic column transforms:
  * every stage is DataFrame → DataFrame and works identically on a batch
  * frame and a streaming frame (readStream/MemoryStream) — the batch
  * path is what the DuckDB oracle checks, the streaming path is what
  * production runs.
  */
object LogPipeline {

  /** P1: parse raw JSON lines, keeping the original for the dirty branch
    * (reference side-output "Dirty", BaseLogApp.java:55-71).
    * `from_json` yields null on corrupt input — no exceptions at scale.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select($"value".as("raw"),
      from_json($"value", GmallSchemas.logSchema).as("log"))

  def clean(parsed: DataFrame): DataFrame =
    parsed.filter($"log".isNotNull && $"log.common.mid".isNotNull)
      .select($"log.*")

  def dirty(parsed: DataFrame): DataFrame =
    parsed.filter($"log".isNull || $"log.common.mid".isNull).select($"raw")

  /** Typed view for the stateful stage. */
  case class LogEvent(mid: String, is_new: String, page_id: String,
      last_page_id: String, ts: Long)

  /** ST1 batch twin: first event per mid keeps its is_new, later ones
    * flip "1"→"0" (reference keyed ValueState, BaseLogApp.java:73-101).
    */
  def fixIsNewBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"common.mid").orderBy($"ts")
    events.withColumn("rn", row_number().over(w))
      .withColumn("common", $"common".withField("is_new",
        when($"rn" > 1 && $"common.is_new" === "1", lit("0"))
          .otherwise($"common.is_new")))
      .drop("rn")
  }

  /** ST1 streaming twin: keyed state = "has this mid been seen". State
    * never expires (mirrors the reference's unexpiring ValueState); on a
    * real cluster the state store is RocksDB-backed and partitioned by
    * the groupBy key, so memory is bounded per executor.
    */
  def fixIsNewStreaming(events: Dataset[LogEvent]): Dataset[LogEvent] = {
    val enc = Encoders.product[LogEvent]
    events.groupByKey(_.mid)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, LogEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[LogEvent], state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = it.toSeq.sortBy(e => (e.ts)).map { e =>
            val fixed = if (seen && e.is_new == "1") e.copy(is_new = "0") else e
            seen = true
            fixed
          }
          state.update(seen)
          out.iterator
      }(Encoders.scalaBoolean, enc)
  }

  /** X1/X4: three-way split — start events; page events; exploded
    * displays tagged with parent page_id (BaseLogApp.java:103-142).
    * One parsed frame in, three frames out; in streaming each goes to
    * its own sink (or one foreachBatch persists the batch and writes
    * all three, saving a re-read).
    */
  def split(events: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val start = events.filter($"start".isNotNull)
      .select($"common", $"start", $"ts")
    val page = events.filter($"start".isNull)
      .select($"common", $"page", $"ts")
    val display = events.filter($"start".isNull && $"displays".isNotNull)
      .select($"common", $"ts", $"page.page_id".as("page_id"),
        explode($"displays").as("display"))
      .select($"common", $"ts", $"display".withField("page_id", $"page_id").as("display"))
    (start, page, display)
  }

  /** P9: serialize a branch back to JSON lines for a Kafka-shaped sink. */
  def toJsonLines(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
