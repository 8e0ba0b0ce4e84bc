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
  * reproduces "config follows the stream". The dim store is a pk-hash-
  * bucketed parquet directory per table, upserted in foreachBatch with
  * per-batch cost proportional to the touched buckets only — the file-
  * layout form of a transactional table format's MERGE; the contract
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

  /** Bucket count for the pk-hashed dim store. 16 keeps test stores
    * inspectable; a warehouse deployment sizes this so one bucket's
    * parquet fits a single task comfortably (thousands for multi-TB
    * dims). Changing it requires rebuilding the store — the count is
    * baked into the directory layout.
    */
  val DimStoreBuckets = 16

  /** Marker file persisting the bucket count a store was created with.
    * Underscore-prefixed so parquet readers skip it. Validated on every
    * merge: a store written under a different `DimStoreBuckets` would
    * otherwise be silently read with the wrong `pmod(hash, N)` routing —
    * the same pk's old row in one bucket and its update in another.
    */
  // filename is a contract with graftexpr.DimStoreBucketPrune, which
  // reads it to derive __bucket pruning from __pk lookups
  private val BucketMarker = "_bucket_count"

  private def writeBucketMarker(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, BucketMarker), true)
    try out.write(DimStoreBuckets.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readBucketMarker(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir, BucketMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      // A corrupt/truncated marker is the same operational state as a
      // missing one: the persisted bucket count is unknowable → rebuild.
      Some(raw.toIntOption.getOrElse(throw new IllegalStateException(
        s"dim store marker $p is unreadable (contents: '$raw'); rebuild " +
          "the store (stores without a valid persisted bucket count " +
          "cannot be safely merged into)")))
    }
  }

  /** K3/K4: dim-store MERGE — upsert rows into a pk-hash-BUCKETED parquet
    * table (`<table>/__bucket=N/`); creates the table on first write (the
    * auto-DDL, TableProcessFunction.java:116-153; `sinkExtend` DDL
    * suffixes are moot for parquet schema-on-write and ignored). Latest
    * write wins per key, the same contract as the reference's Phoenix
    * `upsert into`.
    *
    * Scale shape: a micro-batch reads and rewrites ONLY the buckets its
    * keys hash into — per-batch cost is O(touched · store/buckets), not
    * O(store) — and all moves go through the Hadoop `FileSystem` API, so
    * the store lives on HDFS/S3A as readily as on local disk. (The
    * reference's hottest sink: DimSinkFunction.java:26-81 upserts on
    * every BaseDBLog record.)
    *
    * Within-batch ordering: `seq` must be a deterministic change-order
    * column (binlog offset / source timestamp) when same-pk changes can
    * share a micro-batch. The default `monotonically_increasing_id`
    * follows partition layout, not arrival order — adequate only for
    * single-partition batches (tests/fixtures); real CDC feeds should
    * pass their offset column.
    *
    * Crash safety: new bucket contents are staged under `<table>.tmp`,
    * then each touched bucket is swapped live→`<table>.bak/__bucket=N`,
    * tmp→live, drop the backup — per-bucket atomicity via FS rename.
    * Both staging dirs are SIBLINGS of the table, never inside it, so a
    * reader of the table path cannot observe duplicate rows or a
    * polluted partition column mid-swap or after a crash. A crash can
    * leave SOME buckets on the new batch and others on the old, which
    * is safe because the merge is idempotent: re-applying the same
    * batch converges every bucket. An interrupted single-bucket swap is
    * healed by the backup recovery scan on the next merge; rename
    * failures throw instead of silently losing data.
    *
    * Layout: bucketed (`__bucket=N` partition dirs) — a store written
    * by the pre-bucketing layout (flat parquet) is detected and
    * rejected with a rebuild message rather than failing obscurely, and
    * the bucket count is persisted in a `_bucket_count` marker on create
    * and validated on every merge, so a store built under a different
    * [[DimStoreBuckets]] fails loudly instead of mis-routing pks.
    *
    * Concurrency: SINGLE WRITER per table. The fixed `.tmp`/`.bak`
    * staging paths and the backup recovery scan assume exactly one
    * merger per table directory — the standard streaming-sink contract
    * (one query owns one sink path). Two concurrent merges would delete
    * each other's staging dirs mid-swap; callers fanning out per-table
    * merges (e.g. [[sinkDims]]) must serialize per table, as a
    * foreachBatch body naturally does.
    */
  def mergeDim(spark: SparkSession, storeDir: String, sinkTable: String,
      pk: String, batch: DataFrame,
      seq: org.apache.spark.sql.Column = monotonically_increasing_id()): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(s"$storeDir/$sinkTable")
    val tmp = new Path(s"$storeDir/$sinkTable.tmp")
    // backups live in a SIBLING dir, never inside the table: readers of
    // the table path must not see a half-swapped bucket twice (stale +
    // new rows) or partition inference unioning "N" with "N.bak"
    val bakRoot = new Path(s"$storeDir/$sinkTable.bak")
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())

    // recovery scan: an interrupted swap leaves <table>.bak/__bucket=N —
    // if the live bucket vanished mid-swap the backup is its last
    // complete copy; otherwise the swap completed and the backup drops
    if (fs.exists(bakRoot)) fs.listStatus(bakRoot).foreach { st =>
      val liveB = new Path(live, st.getPath.getName)
      if (!fs.exists(liveB)) {
        if (!fs.rename(st.getPath, liveB))
          throw new java.io.IOException(s"dim-store recovery: cannot restore ${st.getPath}")
      } else fs.delete(st.getPath, true)
    }

    if (fs.exists(live)) {
      if (!fs.listStatus(live).exists(_.getPath.getName.startsWith("__bucket=")))
        throw new IllegalStateException(
          s"dim store $live uses the pre-bucketed flat layout; rebuild the " +
            "store (bucket layout is baked into the directory structure)")
      readBucketMarker(fs, live) match {
        case Some(n) if n != DimStoreBuckets =>
          throw new IllegalStateException(
            s"dim store $live was created with $n buckets but this build " +
              s"routes with $DimStoreBuckets; rebuild the store (bucket " +
              "count is baked into the directory layout)")
        case None =>
          throw new IllegalStateException(
            s"dim store $live has no $BucketMarker marker; rebuild the " +
              "store (stores without a persisted bucket count cannot be " +
              "safely merged into)")
        case _ => ()
      }
    }

    val incoming = batch.select(
        $"row".getItem(pk).as("__pk"), $"row", seq.as("__seq"))
      .withColumn("__bucket", pmod(hash($"__pk"), lit(DimStoreBuckets)))
    // the touched-bucket list is bounded by DimStoreBuckets — a constant-
    // size driver collect, independent of batch or store size
    val touched = incoming.select($"__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    val merged =
      if (fs.exists(live)) {
        // partition pruning on __bucket: untouched buckets are never read
        val existing = spark.read.parquet(live.toString)
          .filter($"__bucket".isin(touched.map(Int.box): _*))
          .select($"__pk", $"row", lit(Long.MinValue).as("__seq"), $"__bucket")
        existing.unionByName(incoming)
      } else incoming
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"__pk").orderBy($"__seq".desc)
    val latest = merged.withColumn("__rn", row_number().over(w))
      .filter($"__rn" === 1).select($"__pk", $"row", $"__bucket")

    if (fs.exists(tmp)) fs.delete(tmp, true)
    // one task — and so one parquet file — per bucket: without this,
    // every task holding rows for a bucket writes its own fragment and
    // the store accumulates small files; buckets are sized to a task
    latest.repartition($"__bucket")
      .write.mode(SaveMode.Overwrite).partitionBy("__bucket")
      .parquet(tmp.toString)

    if (!fs.exists(live)) {
      // auto-DDL: first write activates the whole staged table at once,
      // marker included — readers never see a store without its count
      writeBucketMarker(fs, tmp)
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(s"dim-store create: cannot activate $tmp")
      return
    }
    fs.mkdirs(bakRoot)
    touched.foreach { b =>
      val tmpB = new Path(tmp, s"__bucket=$b")
      val liveB = new Path(live, s"__bucket=$b")
      if (fs.exists(tmpB)) {
        val bakB = new Path(bakRoot, s"__bucket=$b")
        if (fs.exists(bakB)) fs.delete(bakB, true)
        if (fs.exists(liveB) && !fs.rename(liveB, bakB))
          throw new java.io.IOException(s"dim-store swap: cannot move $liveB aside")
        if (!fs.rename(tmpB, liveB)) {
          if (fs.exists(bakB)) fs.rename(bakB, liveB) // restore before failing
          throw new java.io.IOException(s"dim-store swap: cannot activate $tmpB")
        }
        if (fs.exists(bakB)) fs.delete(bakB, true)
      }
    }
    fs.delete(tmp, true)
    fs.delete(bakRoot, true)
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
