package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._

/** Bucketed-table layout for repeated co-located joins.
  *
  * The 100 TB pattern the sfDir parquet files cannot show: when two fact
  * tables are joined on the same key by many queries (orders ⋈ lineitem
  * here; the reference's OrderInfo ⋈ OrderDetail stream pair in batch
  * form), write both bucketed AND sorted by that key. Every subsequent
  * join then skips the exchange (bucket pruning proves co-partitioning)
  * and the sort (bucket files are pre-sorted) — the dominant cost of a
  * fact-fact sort-merge join disappears from every downstream query,
  * paid once at write time.
  *
  * Bucket count is a layout decision: at 100 TB pick
  * `table size / target partition size` (e.g. 2048) and use the SAME
  * count on both tables — mismatched counts fall back to a shuffle on
  * one side.
  */
object Bucketing {

  /** Write `df` into the session catalog bucketed+sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key — plans as a
    * sort-merge join with NO exchange and NO sort when both tables are
    * bucketed by `lKey`/`rKey` with equal bucket counts.
    */
  def colocatedJoin(spark: SparkSession, lTable: String, rTable: String,
      lKey: String, rKey: String): DataFrame = {
    val l = spark.table(lTable)
    val r = spark.table(rTable)
    l.join(r, l(lKey) === r(rKey))
  }

  /** Fact ⋈ filtered-dim join over a [[writeDatePartitioned]] layout,
    * shaped so Catalyst inserts DYNAMIC partition pruning: the dim
    * filter's surviving partition keys are computed at runtime (from
    * the reused broadcast) and pushed into the fact scan as a
    * `dynamicpruning` partition filter, so the fact table lists and
    * reads ONLY the matching partition directories — the difference
    * between scanning 3 days and 3 years when a dashboard asks for a
    * week, and a prune static predicates cannot express because the
    * day set lives in the dim. BucketingSpec asserts the
    * `dynamicpruning` expression reaches the scan's PartitionFilters,
    * that fewer files are read than the full layout holds, and that
    * rows match the statically-filtered equivalent.
    */
  def dppJoin(spark: SparkSession, factPath: String, dim: DataFrame,
      partCol: String, dimPartCol: String): DataFrame = {
    val fact = spark.read.parquet(factPath)
    fact.join(dim, fact(partCol) === dim(dimPartCol))
  }

  /** Hive-style date partitioning — the OTHER half of the 100 TB table
    * layout (bucketing co-locates joins; date partitions prune scans).
    * An event table written `.partitionBy(dateCol)` turns every
    * time-bounded query into a directory-listing prune: a one-day query
    * against a 3-year store opens 1/1000th of the files, BEFORE any row
    * is read — visible in the scan's `PartitionFilters` (asserted in
    * BucketingSpec, with a read-file count to keep the assertion
    * falsifiable). Partition count is a layout decision: date (not
    * date+hour) keeps directories ≈ O(days), far under the small-files
    * cliff; sub-partitioning belongs in bucket counts, not more
    * directories.
    */
  def writeDatePartitioned(df: DataFrame, path: String, dateCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .partitionBy(dateCol)
      .save(path)

  /** Read one day back from a date-partitioned store. The filter is on
    * the PARTITION column, so it resolves at file-listing time.
    */
  def readDay(spark: SparkSession, path: String, dateCol: String,
      day: String): DataFrame =
    spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col(dateCol) === day)

  /** Z-ordered layout: range-partition and sort by the Morton interleave
    * of two keys, so parquet row-group min/max stats prune scans for
    * range predicates on EITHER key (a linear sort clusters only one).
    * `files` is a layout decision exactly like bucket count: table size
    * over target file size. The z_value column is dropped after the
    * sort — it is a layout device, not data.
    *
    * Each key is first scaled to a fixed 16-bit budget from its actual
    * [min, max] (one tiny pre-aggregation): interleaving RAW keys of
    * different magnitudes degenerates to a linear sort on the wider key,
    * because its high bits outrank every bit of the narrower one — the
    * same reason production ZORDER implementations interleave
    * range-normalized ranks, not raw values.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int): Unit = {
    import org.apache.spark.sql.functions.{col, max, min}
    val Bits = 16
    val Cap = (1L << Bits) - 1
    val (xMin, xMax, yMin, yMax) = {
      val r = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
        min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      if (hi == lo) org.apache.spark.sql.functions.lit(0L)
      else org.apache.spark.sql.functions
        .floor((c.cast("long") - lo) * Cap / (hi - lo)).cast("long")
    val z = graft.plans.ArrayOps.zValue2(
      norm(col(xCol), xMin, xMax), norm(col(yCol), yMin, yMax))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Registry view of the Z-value computation (oracle-checked: the
    * DuckDB twin recomputes the same magic-mask arithmetic per row —
    * see [[org.apache.spark.sql.graftexpr.ZOrder.sqlZValue2]]).
    */
  def zValueIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      $"l_orderkey".as("orderkey"),
      $"l_linenumber".cast("bigint").as("linenumber"),
      $"l_partkey".as("partkey"),
      $"l_suppkey".as("suppkey"),
      graft.plans.ArrayOps.zValue2($"l_partkey", $"l_suppkey").as("z"))

  /** Zone-map shard count for [[zoneMapPrune]] — a stand-in for the
    * file/row-group count of a range-partitioned table.
    */
  val ZmShards = 64L

  /** Predicate box bounds for [[zoneMapPrune]], as percent of each
    * key's domain: the middle [ZmPctLo, ZmPctHi] band on BOTH keys.
    */
  val ZmPctLo = 45L
  val ZmPctHi = 55L

  /** Zone-map (data-skipping) effectiveness of two physical layouts —
    * the measurement behind every ZORDER-vs-linear layout decision: how
    * many range-partitioned shards must a 2-D box predicate actually
    * read?
    *
    * For each layout (linear on l_partkey; Morton z on
    * (l_partkey, l_suppkey) — raw interleave, the [[zValueIndex]]
    * expression), rows are range-sharded into [[ZmShards]] equal-width
    * key ranges, per-shard (min, max) zone maps are aggregated for both
    * predicate columns, and a shard survives pruning iff its zone
    * intersects the box (the exact file-skipping test parquet
    * row-group stats / Delta file stats drive). Output: one row per
    * layout with shard and row scan counts — the z-order row should
    * scan a small multiple of the box's area fraction while the linear
    * layout is bounded below by the box's partkey WIDTH (it cannot
    * prune the suppkey dimension at all); the spec asserts exactly
    * that dominance, the oracle checks every number.
    *
    * Scale shape: per layout one map-side-combined aggregate onto
    * [[ZmShards]] keys (zone maps are metadata-sized by construction);
    * domain bounds and the predicate box are 1-row broadcasts; nothing
    * driver-side. All arithmetic is integer (`div` ≡ DuckDB `//`), so
    * shard ids and box bounds are engine-exact.
    */
  /** 16-bit normalization cap shared by both engines (see
    * [[writeZOrdered]]'s rationale: raw interleave of keys with
    * different magnitudes degenerates to a linear sort on the wider
    * key, so the z layout normalizes each key's [min,max] to this
    * budget first).
    */
  val ZmNormCap = 65535L

  def zoneMapPrune(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = Tables.lineitem(spark, dir)
      .select($"l_partkey".as("pk"), $"l_suppkey".as("sk"))
    val bounds = raw.agg(
      min($"pk").as("pk_min"), max($"pk").as("pk_max"),
      min($"sk").as("sk_min"), max($"sk").as("sk_max"))
    def norm(c: String, lo: String, hi: String) =
      s"CASE WHEN $hi = $lo THEN CAST(0 AS BIGINT) ELSE (($c - $lo) * $ZmNormCap) div ($hi - $lo) END"
    val base = raw.join(broadcast(bounds))
      .withColumn("nx", expr(norm("pk", "pk_min", "pk_max")))
      .withColumn("ny", expr(norm("sk", "sk_min", "sk_max")))
      .withColumn("z", graft.plans.ArrayOps.zValue2($"nx", $"ny"))
    // linear shards: equal-width pk ranges; z shards: equal-width over
    // the fixed normalized Morton domain [0, (Cap+1)²)
    def layout(name: String, shardExpr: String): DataFrame =
      base
        .withColumn("shard", expr(shardExpr))
        .groupBy($"shard")
        .agg(min($"pk").as("zpk_min"), max($"pk").as("zpk_max"),
          min($"sk").as("zsk_min"), max($"sk").as("zsk_max"),
          count(lit(1)).as("n_rows"))
        .join(broadcast(bounds))
        .withColumn("p_lo", expr(s"pk_min + ((pk_max - pk_min) * $ZmPctLo) div 100"))
        // (box bounds are derived from the SAME broadcast bounds row)
        .withColumn("p_hi", expr(s"pk_min + ((pk_max - pk_min) * $ZmPctHi) div 100"))
        .withColumn("s_lo", expr(s"sk_min + ((sk_max - sk_min) * $ZmPctLo) div 100"))
        .withColumn("s_hi", expr(s"sk_min + ((sk_max - sk_min) * $ZmPctHi) div 100"))
        .withColumn("scanned",
          $"zpk_min" <= $"p_hi" && $"zpk_max" >= $"p_lo" &&
            $"zsk_min" <= $"s_hi" && $"zsk_max" >= $"s_lo")
        .agg(count(lit(1)).as("n_shards"),
          sum(when($"scanned", 1L).otherwise(0L)).as("shards_scanned"),
          sum($"n_rows").as("rows_total"),
          sum(when($"scanned", $"n_rows").otherwise(0L)).as("rows_scanned"))
        .select(lit(name).as("layout"), $"n_shards", $"shards_scanned",
          $"rows_total", $"rows_scanned",
          ($"rows_scanned".cast("double") / $"rows_total".cast("double"))
            .as("scan_fraction"))
    layout("linear_partkey",
      s"CASE WHEN pk_max = pk_min THEN CAST(0 AS BIGINT) ELSE ((pk - pk_min) * $ZmShards) div (pk_max - pk_min + 1) END")
      .union(layout("zorder_pk_sk",
        s"(z * $ZmShards) div ${(ZmNormCap + 1) * (ZmNormCap + 1)}"))
  }

  /** Small-file compaction — the maintenance operator every streaming
    * store eventually needs. Micro-batch sinks (DwsSink, the dim store,
    * any per-trigger parquet append) accrete one file per trigger per
    * partition; a year of 10-second triggers is millions of kilobyte
    * files, and at 100 TB the NameNode/listing cost and per-file open
    * overhead dominate scans long before row count does.
    *
    * Sizing comes from the actual on-disk byte size via the Hadoop
    * FileSystem API (works on HDFS/S3, not just local), NOT from row
    * counts: `files = ceil(bytes / targetBytes)`, then one round-robin
    * repartition to exactly that many writers. Round-robin (not keyed)
    * because compaction must never skew — every output file lands within
    * one row-group of targetBytes. The rewrite goes to a fresh directory
    * + atomic-ish swap is the caller's transaction policy; the operator
    * itself is a pure rewrite so a failed run leaves the source intact.
    *
    * Returns the output file count so callers (and the spec) can assert
    * the layout contract.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"compact: targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(conf)
    val it = fs.listFiles(in, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      // count only data files: planners' _SUCCESS/_metadata markers are
      // listing noise, and parquet readers skip them too
      if (!f.getPath.getName.startsWith("_")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Compaction bin target for [[compactionPlan]], in manifest "bytes"
    * (rows here stand in for bytes; the arithmetic is unit-agnostic).
    */
  val CompactTarget = 4000L

  /** Number of synthetic writer tasks per partition in
    * [[compactionPlan]]'s simulated manifest.
    */
  val CompactWriters = 16L

  /** `layout_compaction_plan`: the small-file compaction planner — the
    * table-maintenance job every long-lived 100 TB table needs, because
    * streaming/MERGE writers leave thousands of KB-sized files per
    * partition and scan throughput dies by open-cost (the exact effect
    * the round-6 sf1 audit measured on single-row-group parquet).
    *
    * The manifest is simulated from orders: each (order-month ×
    * writer-task) cell is one "file" whose size is its row count — the
    * shape a real `DESCRIBE DETAIL`/manifest listing gives. The plan
    * assigns files to output bins by LINEAR PACKING within each
    * partition: files in deterministic (file_id) order, running size
    * prefix, `bin = floor(cum_before / target)` — the scheme real
    * compactors (Iceberg binpack, Delta OPTIMIZE) apply to a sorted
    * manifest, deterministic on both engines with no sequential state.
    *
    * Scale shape: the ONLY corpus-scale pass is the rows→files
    * aggregation (map-side combined, bounded by partitions × writers);
    * the packing window runs per partition over a writer-bounded file
    * list — metadata-sized at any data scale. The output is the work
    * order a rewrite job executes partition-by-partition.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val files = Tables.orders(spark, dir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("part"),
        pmod($"o_orderkey", lit(CompactWriters)).as("file_id"))
      .agg(count(lit(1)).as("bytes"))
    val w = Window.partitionBy($"part").orderBy($"file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // integer division, matching the oracle's `//` exactly at any
    // cumulative-byte magnitude (a double quotient loses to `//` past
    // 2^53; sizes are non-negative so trunc == floor here)
    files
      .withColumn("bin",
        call_function("div",
          coalesce(sum($"bytes").over(w), lit(0L)), lit(CompactTarget)))
      .select($"part", $"file_id", $"bytes", $"bin")
  }
}
