package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftexpr.ZOrder
import graft.{Tables, TestSpark}
import graft.operators.Bucketing

/** The Z-order layout contract: interleave math is correct, and — the
  * point of the layout — a Z-ordered store prunes row-groups for range
  * predicates on EITHER interleaved key, where a linear sort prunes only
  * its leading key.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("zValue2 interleaves bits: x at even positions, y at odd") {
    assert(ZOrder.zValue2(0, 0) == 0L)
    assert(ZOrder.zValue2(1, 0) == 1L)
    assert(ZOrder.zValue2(0, 1) == 2L)
    assert(ZOrder.zValue2(3, 5) == 39L) // 0b100111
    // monotone in each axis within a quadrant; full 31-bit range safe
    assert(ZOrder.zValue2(ZOrder.Low31, ZOrder.Low31) == 0x3FFFFFFFFFFFFFFFL)
    assert(ZOrder.zValue2(ZOrder.Low31, ZOrder.Low31) > 0, "must stay positive")
  }

  test("zValue2 expression matches the kernel and compiles under codegen") {
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.codegen.fallback", "false")
    import fresh.implicits._
    val rows = Seq((3L, 5L), (0L, 0L), (12345L, 67890L)).toDF("x", "y")
      .select(ArrayOps.zValue2($"x", $"y").as("z"))
      .as[Long].collect()
    assert(rows.toSeq == Seq(39L, 0L, ZOrder.zValue2(12345L, 67890L)))
  }

  test("z-ordered layout bounds file min/max spans on BOTH dimensions; linear sort on one") {
    // stats-aware readers (parquet row-group skipping, file-level
    // min/max pruning in table formats) eliminate a file iff the
    // predicate misses its [min, max] — so the measurable layout
    // contract is the per-file SPAN of each key, not a scan metric
    // (Spark's numFiles is listing-level; footer skipping happens
    // inside the reader and is invisible there)
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val files = 16

    Bucketing.writeZOrdered(li, s"$base/z", "l_partkey", "l_suppkey", files)
    // the comparison layout: same file count, linearly sorted by partkey
    li.withColumn("__s", $"l_partkey")
      .repartitionByRange(files, $"__s").sortWithinPartitions("__s").drop("__s")
      .write.mode("overwrite").parquet(s"$base/linear")

    // average fraction of the key's global range a single file covers:
    // the expected fraction of files a uniform point/range predicate on
    // that key must read
    def avgSpanFraction(path: String, key: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(key)) - min(col(key))).cast("double").as("span"))
        .agg(avg($"span")).as[Double].head()
      val global = spark.read.parquet(path)
        .agg((max(col(key)) - min(col(key))).cast("double")).as[Double].head()
      spans / global
    }

    // content identical across layouts
    assert(spark.read.parquet(s"$base/z").count() ==
      spark.read.parquet(s"$base/linear").count())

    val zPart = avgSpanFraction(s"$base/z", "l_partkey")
    val zSupp = avgSpanFraction(s"$base/z", "l_suppkey")
    val linPart = avgSpanFraction(s"$base/linear", "l_partkey")
    val linSupp = avgSpanFraction(s"$base/linear", "l_suppkey")

    // linear: near-perfect on the sort key, useless (≈ full range) on
    // the other
    assert(linPart < 0.25, s"linear layout should cluster partkey, span=$linPart")
    assert(linSupp > 0.9, s"linear layout should NOT cluster suppkey, span=$linSupp")
    // z: BOTH keys bounded strictly better than the linear layout's
    // non-sort key — each 2-D quadrant lands in few files
    assert(zPart < 0.6, s"z layout partkey span=$zPart")
    assert(zSupp < 0.6, s"z layout suppkey span=$zSupp")
    assert(zSupp < linSupp / 1.5,
      s"z layout must beat linear on the non-sort key: $zSupp vs $linSupp")

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(base))
  }
}
