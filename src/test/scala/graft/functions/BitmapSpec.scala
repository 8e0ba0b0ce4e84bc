package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graftexpr.GraftBitmap

/** Exact bitmap columns: canonical serialization (union-of-parts ≡
  * bitmap-of-whole byte-for-byte, partitioning invariance), exact
  * cardinality/intersection against in-JVM sets — including negative
  * and chunk-boundary ids — SQL surface under codegen, and
  * malformed-blob rejection.
  */
class BitmapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def df(keys: Seq[Long], parts: Int) = {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    keys.toDF("k").repartition(parts)
  }

  // ids straddling chunk boundaries, negatives, and duplicates
  private val keys: Seq[Long] =
    Seq(-65537L, -65536L, -1L, 0L, 1L, 65535L, 65536L, 65537L, 1L << 40,
      (1L << 40) + 65536L) ++ (1L to 3000L).map(i => i * 37L % 2000L)

  test("union of per-group bitmaps equals the bitmap of the whole, byte-for-byte") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder, newProductEncoder}
    val rows = keys.zipWithIndex.map { case (k, i) => (i % 24, k) }
    val whole = keys.toDF("k")
      .agg(GraftBitmap.build($"k")).head().getAs[Array[Byte]](0)
    val unioned = rows.toDF("g", "k")
      .groupBy($"g").agg(GraftBitmap.build($"k").as("bm"))
      .agg(GraftBitmap.union($"bm")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, unioned))
  }

  test("bitmap is partitioning-invariant and cardinality is exact") {
    val a = df(keys, 1).agg(GraftBitmap.build($"k")).head().getAs[Array[Byte]](0)
    val b = df(keys, 16).agg(GraftBitmap.build($"k")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
    assert(GraftBitmap.cardinality(a) === keys.distinct.length.toLong)
  }

  test("and_card matches the in-JVM set intersection, including empty overlap") {
    val l = Seq(-70000L, 1L, 2L, 65536L, 1L << 40)
    val r = Seq(-70000L, 2L, 3L, 65536L, (1L << 40) + 1L)
    val bl = df(l, 2).agg(GraftBitmap.build($"k")).head().getAs[Array[Byte]](0)
    val br = df(r, 2).agg(GraftBitmap.build($"k")).head().getAs[Array[Byte]](0)
    assert(GraftBitmap.andCardinality(bl, br) === l.toSet.intersect(r.toSet).size.toLong)
    val disjoint = df(Seq(9999999L), 1)
      .agg(GraftBitmap.build($"k")).head().getAs[Array[Byte]](0)
    assert(GraftBitmap.andCardinality(bl, disjoint) === 0L)
  }

  test("SQL surface + codegen'd bitmap_card/and_card (no fallback)") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    (1L to 1000L).toDF("k").createOrReplaceTempView("bm_keys")
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val uv = spark.sql(
        """WITH hourly AS (
          |  SELECT k % 4 AS g, bitmap_build(k) AS bm
          |  FROM bm_keys GROUP BY 1)
          |SELECT bitmap_card(bitmap_union(bm)) AS uv FROM hourly""".stripMargin)
        .as[Long](Encoders.scalaLong).head()
      assert(uv === 1000L)
      val inter = spark.sql(
        """SELECT bitmap_and_card(
          |  (SELECT bitmap_build(k) FROM bm_keys WHERE k <= 600),
          |  (SELECT bitmap_build(k) FROM bm_keys WHERE k > 400)) AS n"""
          .stripMargin).as[Long](Encoders.scalaLong).head()
      assert(inter === 200L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("malformed blobs raise named errors") {
    intercept[IllegalArgumentException](GraftBitmap.cardinality(Array[Byte](1)))
    intercept[IllegalArgumentException](
      GraftBitmap.andCardinality(Array.empty[Byte], Array.empty[Byte]))
  }

  test("dws_uv_bitmap_rollup equals the exact per-day distinct count at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.operators.WindowOps.uvBitmapRollup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, sf)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(countDistinct($"user_id").as("uv")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }
}
