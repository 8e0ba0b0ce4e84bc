package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.{ColStr, Tables, TestSpark}

/** Bucketed-write co-located join: the plan proof that the layout pays —
  * joining two tables bucketed+sorted on the join key must contain no
  * shuffle exchange and no sort, and return the same rows as the plain
  * join.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders ⋈ lineitem joins without exchange or sort") {
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse dirs persist — clear both for idempotent re-runs
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    Bucketing.writeBucketed(Tables.orders(spark, dir), "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(Tables.lineitem(spark, dir), "b_lineitem", "l_orderkey", 8)

    val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders",
      "l_orderkey", "o_orderkey")
    val n = joined.count()

    // run the full plan (not count, which prunes) and inspect the
    // final adaptive plan
    joined.write.format("noop").mode("overwrite").save()
    val exec = joined.queryExecution.executedPlan
    val finalPlan = exec.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec)
    val shuffles = finalPlan.collect { case s: ShuffleExchangeExec => s }
    val sorts = finalPlan.collect { case s: SortExec => s }
    assert(shuffles.isEmpty, s"expected no exchange, got:\n$finalPlan")
    assert(sorts.isEmpty, s"expected no sort, got:\n$finalPlan")

    // same result as the unbucketed join
    val pl = Tables.lineitem(spark, dir)
    val po = Tables.orders(spark, dir)
    val plain = pl.join(po, pl("l_orderkey") === po("o_orderkey")).count()
    assert(n == plain && n > 0)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("date-partitioned store prunes at file-listing time") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("dt-part").toString
    val events = Tables.events(spark, dir)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    // one task per day → one file per partition dir (the small-files
    // discipline a real writer applies before partitionBy)
    Bucketing.writeDatePartitioned(events.repartition(col("dt")), path, "dt")
    val days = events.select(col("dt")).distinct().count()
    assert(days > 1, "fixture must span multiple days for pruning to mean anything")

    val oneDay = Bucketing.readDay(spark, path, "dt", "2024-01-01")
    // row-correct: same rows as filtering the unpartitioned frame
    val expected = events.filter(col("dt") === "2024-01-01").count()
    assert(oneDay.count() === expected && expected > 0)

    // plan-correct: the dt predicate must surface as a PartitionFilter
    // (listing-time prune), NOT a data filter evaluated per row
    val scanLine = oneDay.queryExecution.executedPlan.toString()
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("PartitionFilters") &&
      scanLine.replaceAll(".*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("dt"),
      s"dt filter did not reach PartitionFilters:\n$scanLine")

    // falsifiability: the pruned scan must TOUCH a strict subset of
    // files — read the scan node's numFiles metric after execution
    // (inputFiles reports the unpruned file index)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val exec = df.queryExecution.executedPlan
      val inner = exec.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }.getOrElse(exec)
      inner.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.getOrElse(sys.error(s"no FileSourceScanExec in:\n$inner"))
    }
    val allFiles = scannedFiles(spark.read.parquet(path))
    val prunedFiles = scannedFiles(
      Bucketing.readDay(spark, path, "dt", "2024-01-01"))
    assert(prunedFiles < allFiles,
      s"pruned scan reads $prunedFiles of $allFiles files — no pruning happened")

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  test("dim-driven join prunes fact partitions at RUNTIME (dynamic partition pruning)") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("dpp-part").toString
    val events = Tables.events(spark, dir)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
    Bucketing.writeDatePartitioned(events.repartition(col("dt")), path, "dt")

    // the interesting day set exists only in the dim (a filter on a
    // dim attribute) — static pruning cannot see it
    val dim = events.select(col("dt")).distinct()
      .withColumn("tag", length(col("dt")) + dayofmonth(col("dt")))
      .filter(col("tag") <= 13) // days 01..03 survive
      .select(col("dt").as("dim_dt"), col("tag"))
    val wanted = dim.collect().map(_.getString(0)).toSet
    assert(wanted.nonEmpty && wanted.size < 30, "dim filter must be selective")

    val joined = Bucketing.dppJoin(spark, path, dim, "dt", "dim_dt")
    joined.write.format("noop").mode("overwrite").save()

    // plan-correct: a dynamicpruning expression in the fact scan's
    // partition filters
    val exec = joined.queryExecution.executedPlan
    val inner = exec.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec)
    val scan = inner.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(sys.error(s"no FileSourceScanExec in:\n$inner"))
    assert(scan.toString.contains("dynamicpruning"),
      s"no dynamicpruning filter in scan:\n$scan")

    // effect-correct: strictly fewer files touched than the layout holds
    val filesRead = scan.metrics("numFiles").value
    val allFiles = {
      val df = spark.read.parquet(path)
      df.collect()
      df.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
    }
    assert(filesRead < allFiles,
      s"DPP read $filesRead of $allFiles files — nothing pruned")

    // row-correct vs the static filter
    val expected = events.filter(col("dt").isin(wanted.toSeq: _*)).count()
    assert(joined.count() === expected)

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  test("zone maps: z-order prunes both box dimensions, linear only one") {
    import org.apache.spark.sql.functions.col
    val rows = Bucketing.zoneMapPrune(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val (linShards, linScanned, linTotal, linRows, linFrac) = rows("linear_partkey")
    val (zShards, zScanned, zTotal, zRows, zFrac) = rows("zorder_pk_sk")
    // both layouts shard the same rows
    assert(linTotal === zTotal && linTotal > 0)
    assert(linShards <= Bucketing.ZmShards && zShards <= Bucketing.ZmShards)
    // each layout prunes SOMETHING (the box is a ~10% band per key)
    assert(linScanned < linShards && zScanned < zShards)
    // the decisive contract: the 2-D layout reads fewer rows than the
    // 1-D sort, because linear cannot prune the suppkey dimension
    assert(zRows < linRows,
      s"z-order must out-prune linear: z=$zRows lin=$linRows")
    assert(zFrac < linFrac && zFrac > 0.0 && linFrac < 1.0)
    // scanned rows can never undercut the true box population (zone
    // pruning is conservative: it may over-read, never under-read)
    val b = Tables.lineitem(spark, dir)
      .agg(org.apache.spark.sql.functions.min(col("l_partkey")),
        org.apache.spark.sql.functions.max(col("l_partkey")),
        org.apache.spark.sql.functions.min(col("l_suppkey")),
        org.apache.spark.sql.functions.max(col("l_suppkey"))).head()
    val (pkMin, pkMax, skMin, skMax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val pLo = pkMin + (pkMax - pkMin) * Bucketing.ZmPctLo / 100
    val pHi = pkMin + (pkMax - pkMin) * Bucketing.ZmPctHi / 100
    val sLo = skMin + (skMax - skMin) * Bucketing.ZmPctLo / 100
    val sHi = skMin + (skMax - skMin) * Bucketing.ZmPctHi / 100
    val inBox = Tables.lineitem(spark, dir)
      .filter(col("l_partkey").between(pLo, pHi) && col("l_suppkey").between(sLo, sHi))
      .count()
    assert(linRows >= inBox && zRows >= inBox)
  }

  test("compaction: many small files → byte-sized file count, content intact") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val inPath = s"$base/in"
    val outPath = s"$base/out"
    // simulate a micro-batch-accreted store: 64 tiny files
    val docs = Tables.documents(spark, dir)
    docs.repartition(64).write.parquet(inPath)
    val smallFiles = new java.io.File(inPath)
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(smallFiles == 64, s"fixture should be 64 small files, got $smallFiles")

    val inBytes = new java.io.File(inPath).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.length()).sum
    // target ≈ quarter of the input → expect ~4 output files
    val target = inBytes / 4 + 1
    val expected = ((inBytes + target - 1) / target).toInt
    val n = Bucketing.compact(spark, inPath, outPath, target)
    assert(n == expected, s"planned $n files, sizing said $expected")
    val outFiles = new java.io.File(outPath)
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(outFiles == n, s"wrote $outFiles files, planned $n")
    assert(outFiles < smallFiles / 8, "compaction must collapse the file count")

    // content identical (multiset): same count and same checksum-sum
    val before = docs.agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id, text))"))
      .collect().head
    val after = spark.read.parquet(outPath)
      .agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id, text))"))
      .collect().head
    assert(before == after, s"content drift: $before vs $after")

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(base))
  }

  test("compaction plan: linear packing fills bins to target in manifest order") {
    val out = Bucketing.compactionPlan(spark, dir)
      .orderBy($"part", $"file_id").collect()
    assert(out.nonEmpty)
    // replay the packing sequentially per partition
    out.groupBy(_.getString(0)).foreach { case (_, files) =>
      var cum = 0L
      files.sortBy(_.getLong(1)).foreach { r =>
        assert(r.getLong(3) === cum / Bucketing.CompactTarget, s"bin: $r")
        cum += r.getLong(2)
      }
    }
    // bins never split a file below target occupancy: bin ids are monotone
    out.groupBy(_.getString(0)).foreach { case (_, files) =>
      val bins = files.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(bins === bins.sorted)
    }
  }
}
