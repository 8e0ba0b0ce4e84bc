package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.sources.GmallSchemas
import graft.sources.GmallSchemas.TableProcess

/** The BaseDBLog CDC router (reference gmall-realtime/.../app/dwd/
  * BaseDBLog.java:37-110 + TableProcessFunction): a changelog stream is
  * routed per-record by a config table — kafka-bound facts get a dynamic
  * topic column, hbase-bound dims are MERGEd into a keyed dim store with
  * config-driven column pruning and auto-DDL.
  *
  * Spark shape: the config is a small DataFrame joined broadcast (the
  * reference's broadcast MapState, J2); re-reading it each micro-batch
  * reproduces "config follows the stream". The dim store is a parquet
  * directory per table, upserted in foreachBatch — at cluster scale this
  * would be a transactional table format; the MERGE contract
  * (latest-by-pk wins) is identical.
  */
object CdcRouter {

  /** S4: parse the changelog envelope; P3: drop deletes (reference
    * BaseDBLog.java:59-66). "create" was already normalized to "insert"
    * by the envelope producer; we normalize again defensively.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json($"value", GmallSchemas.cdcSchema).as("cdc"))
      .filter($"cdc".isNotNull)
      .select($"cdc.*")
      .withColumn("type", when($"type" === "create", lit("insert")).otherwise($"type"))
      .filter($"type" =!= "delete")

  /** J2/X2: route by (tableName, type) against the config (inner join
    * drops unmatched combos like the reference's "no such key" branch);
    * P4: data-driven column pruning of the `after` map to sinkColumns.
    */
  def route(cdc: DataFrame, config: Seq[TableProcess]): (DataFrame, DataFrame) = {
    val spark = cdc.sparkSession
    val cfg = broadcast(spark.createDataFrame(config))
    val routed = cdc.join(cfg,
      $"tableName" === cfg("sourceTable") && $"type" === cfg("operateType"))
      .withColumn("pruned_after",
        map_filter($"after", (k, _) =>
          array_contains(split($"sinkColumns", ","), k)))
    val toKafka = routed.filter($"sinkType" === "kafka")
      .select($"sinkTable".as("topic"),
        to_json($"pruned_after").as("value"))
    val toDim = routed.filter($"sinkType" === "hbase")
      .select($"sinkTable", $"sinkPk", $"pruned_after".as("row"))
    (toKafka, toDim)
  }

  /** K3/K4: dim-store MERGE — upsert rows into a parquet table keyed by
    * the configured pk; creates the table on first write (the auto-DDL,
    * TableProcessFunction.java:116-153). Latest write wins per key, the
    * same contract as the reference's Phoenix `upsert into`.
    *
    * Within-batch ordering: `seq` must be a deterministic change-order
    * column (binlog offset / source timestamp) when same-pk changes can
    * share a micro-batch. The default `monotonically_increasing_id`
    * follows partition layout, not arrival order — adequate only for
    * single-partition batches (tests/fixtures); real CDC feeds should
    * pass their offset column.
    *
    * Crash safety: the new table is written to `.tmp`, the live table
    * moved aside to `.old`, tmp renamed in, then `.old` dropped — at any
    * crash point a complete table copy exists on disk (`.old` is the
    * recovery source if the swap was interrupted); rename failures throw
    * instead of silently losing the table.
    */
  def mergeDim(spark: SparkSession, storeDir: String, sinkTable: String,
      pk: String, batch: DataFrame,
      seq: org.apache.spark.sql.Column = monotonically_increasing_id()): Unit = {
    val path = s"$storeDir/$sinkTable"
    // recover an interrupted swap: if the live table vanished mid-swap,
    // the .old copy is the last complete table — restore it FIRST
    val liveF = new java.io.File(path)
    val oldF = new java.io.File(s"$path.old")
    if (!liveF.exists() && oldF.exists() && !oldF.renameTo(liveF))
      throw new java.io.IOException(s"dim-store recovery: cannot restore $oldF")
    val incoming = batch.select(
      $"row".getItem(pk).as("__pk"), $"row", seq.as("__seq"))
    val merged =
      if (new java.io.File(path).exists()) {
        val existing = spark.read.parquet(path)
          .select($"__pk", $"row", lit(Long.MinValue).as("__seq"))
        existing.unionByName(incoming)
      } else incoming
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"__pk").orderBy($"__seq".desc)
    val latest = merged.withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1).select($"__pk", $"row")
    val tmp = new java.io.File(s"$path.tmp")
    val old = new java.io.File(s"$path.old")
    val live = new java.io.File(path)
    latest.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    if (live.exists() && !live.renameTo(old))
      throw new java.io.IOException(s"dim-store swap: cannot move $live aside")
    if (!tmp.renameTo(live)) {
      // restore the previous table before failing
      if (old.exists()) old.renameTo(live)
      throw new java.io.IOException(s"dim-store swap: cannot activate $tmp")
    }
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
    ()
  }

  /** Wire the dim branch of [[route]] into per-table MERGEs — the
    * foreachBatch body for the streaming job, callable on a batch frame
    * too.
    */
  def sinkDims(storeDir: String, toDim: DataFrame, config: Seq[TableProcess],
      seq: org.apache.spark.sql.Column = monotonically_increasing_id()): Unit = {
    val spark = toDim.sparkSession
    config.filter(_.sinkType == "hbase").foreach { tp =>
      val rows = toDim.filter($"sinkTable" === tp.sinkTable)
      if (!rows.isEmpty) {
        mergeDim(spark, storeDir, tp.sinkTable,
          Option(tp.sinkPk).getOrElse("id"), rows, seq)
      }
    }
  }
}
