package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest quality gate: one data-quality census row set per
  * micro-batch, appended to a queryable parquet report — the
  * corpus-level twin of the reference's row-level dirty side-out
  * (reference gmall-realtime/.../app/ods/BaseLogApp.java routes
  * malformed records to a dirty stream one at a time; this reports the
  * BATCH's health so an operator can halt ingest on a bad deploy
  * before it pollutes a day of data).
  *
  * `foreachBatch` + the shared batch census
  * ([[graft.operators.QualityOps.eventsCensus]]): the same conditional
  * aggregates, so streaming and batch reports agree check-for-check.
  * Per batch the census is one aggregation of that batch only — state
  * never accumulates in the stream; history lives in the appended
  * report, which is itself queryable (trend alerts are a batch query
  * over it).
  */
object QualityGate {

  /** Start the gate: every micro-batch of `events` appends its census
    * (batch_id, check_name, violations, checked) to `outDir`.
    */
  def censusStream(events: DataFrame, outDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.QualityOps.eventsCensus(batch.toDF())
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(s"$outDir/report")
      }
      .start()
}
