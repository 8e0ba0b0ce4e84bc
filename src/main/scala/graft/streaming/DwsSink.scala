package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft._

/** The DWS → serving-store path: maintain a streaming windowed aggregate
  * as a queryable keyed table — the role the reference reserved for its
  * ClickHouse sink (SURVEY.md §2.8: clickhouse-jdbc dep + sink config,
  * never built). Here the serving store is the engine's own pk-bucketed
  * parquet table ([[CdcRouter.mergeDim]]), so the whole DWS layer is
  * self-contained: update-mode window rows flow in per micro-batch, the
  * store always holds the LATEST value per (window × dims) key, and a
  * reader sees a consistent snapshot (backups stage outside the table
  * path).
  *
  * Latest-wins ordering uses the micro-batch id as the sequence column:
  * update-mode re-emissions of a window strictly supersede earlier
  * partials, and replays of batch N (crash before checkpoint commit)
  * re-apply the same rows with the same seq — idempotent.
  */
object DwsSink {

  /** Start maintaining `agg` (an update-mode streaming aggregation whose
    * key is `keyCols`) in the bucketed store at `storeDir/table`. All
    * columns are stored as strings in the row map (schema-on-read at
    * the serving edge, like the reference's Phoenix/ClickHouse rows).
    */
  def maintain(agg: DataFrame, storeDir: String, table: String,
      keyCols: Seq[String], checkpoint: String): StreamingQuery = {
    val cols = agg.columns.toSeq
    agg.writeStream.outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: this foreachBatch runs THREE actions over the stateful
        // aggregation output (emptiness check, mergeDim's touched-bucket
        // collect, the merge write) — without it each re-executes the plan
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            // __key = JSON of the key tuple: injective under nulls and
            // separator characters in values (concat_ws would drop nulls
            // and let embedded separators collide distinct keys)
            val rows = b.select(
              map((cols.flatMap(c => Seq(lit(c), col(c).cast("string"))) ++
                Seq(lit("__key"),
                  to_json(struct(keyCols.map(c => col(c).cast("string").as(c)): _*))))
                : _*).as("row"))
            CdcRouter.mergeDim(b.sparkSession, storeDir, table,
              pk = "__key", batch = rows, seq = lit(batchId))
          }
        } finally { b.unpersist(); () }
      }.start()
  }

  /** Relax Spark's static stateful-operator correctness gate around ONE
    * query start — the shared discipline of [[FunnelStream.serveCounts]],
    * [[RetentionStream.serveCells]] and [[NearDupStream.serveCensus]]:
    * each runs an unwatermarked, window-free aggregate downstream of a
    * stateful operator, where no drained row can be dropped as late, but
    * the static gate flags ANY stateful chain. NOT atomic: the setting
    * is session-global, so a concurrently STARTING streaming query in
    * the same session can observe the relaxed value (running queries are
    * unaffected — the gate is start-time-only). Callers who start
    * queries concurrently should scope via `spark.newSession()`.
    */
  private[streaming] def withRelaxedCorrectnessGate[T](
      spark: org.apache.spark.sql.SparkSession)(start: => T): T = {
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try start
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Read the maintained store back as typed columns. */
  def read(spark: org.apache.spark.sql.SparkSession, storeDir: String,
      table: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(s"$storeDir/$table")
      .select(cols.map(c => $"row".getItem(c).as(c)): _*)
}
