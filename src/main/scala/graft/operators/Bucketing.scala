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
}
