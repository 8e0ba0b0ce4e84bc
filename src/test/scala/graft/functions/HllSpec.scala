package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graftexpr.GraftHll

/** HLL sketch columns: mergeability (union-of-parts ≡ sketch-of-whole,
  * byte-for-byte), partitioning invariance, accuracy at the advertised
  * error bound, SQL surface, codegen of the estimator, and malformed-
  * blob rejection.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def df(keys: Seq[Long], parts: Int) = {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    keys.toDF("k").repartition(parts)
  }

  test("union of per-group sketches equals the sketch of the whole, byte-for-byte") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder, newProductEncoder}
    val rows = (1L to 20000L).map(i => (i % 24, i * 2654435761L))
    val whole = rows.map(_._2).toDF("k")
      .agg(GraftHll.build($"k", 12)).head().getAs[Array[Byte]](0)
    val unioned = rows.toDF("g", "k")
      .groupBy($"g").agg(GraftHll.build($"k", 12).as("sketch"))
      .agg(GraftHll.union($"sketch")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, unioned),
      "hll_union of hourly parts must reproduce the whole-input sketch exactly")
  }

  test("sketch is partitioning-invariant (merge is register-wise max)") {
    val keys = (1L to 5000L).map(graft.functions.Hashing.lcg)
    val a = df(keys, 1).agg(GraftHll.build($"k", 12)).head().getAs[Array[Byte]](0)
    val b = df(keys, 16).agg(GraftHll.build($"k", 12)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("estimate lands within 5 rse of exact across cardinality decades") {
    for (n <- Seq(100L, 5000L, 200000L)) {
      val est = GraftHll.estimate(
        df((1L to n).map(_ * 0x9e3779b97f4a7c15L), 8)
          .agg(GraftHll.build($"k", 14)).head().getAs[Array[Byte]](0))
      val rse = 1.04 / math.sqrt(1 << 14)
      assert(math.abs(est - n).toDouble / n <= 5 * rse,
        s"n=$n est=$est (err ${math.abs(est - n).toDouble / n})")
    }
  }

  test("duplicates do not move the estimate (distinct, not count)") {
    val once = df((1L to 3000L), 4).agg(GraftHll.build($"k", 12)).head().getAs[Array[Byte]](0)
    val thrice = df((1L to 3000L) ++ (1L to 3000L) ++ (1L to 3000L), 4)
      .agg(GraftHll.build($"k", 12)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(once, thrice))
  }

  test("SQL surface + codegen'd hll_card (no fallback)") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    (1L to 1000L).toDF("k").createOrReplaceTempView("hll_keys")
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val est = spark.sql(
        """WITH hourly AS (
          |  SELECT k % 4 AS g, hll_build(k, 12) AS sketch
          |  FROM hll_keys GROUP BY 1)
          |SELECT hll_card(hll_union(sketch)) AS uv FROM hourly""".stripMargin)
        .as[Long](Encoders.scalaLong).head()
      assert(math.abs(est - 1000L) <= 100L, s"est=$est")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("malformed blobs and precision mismatches raise named errors") {
    intercept[IllegalArgumentException](GraftHll.estimate(Array.empty[Byte]))
    intercept[IllegalArgumentException](GraftHll.estimate(Array[Byte](14, 0, 0)))
    val e = intercept[IllegalArgumentException](
      GraftHll.merge(GraftHll.emptySketch(12), GraftHll.emptySketch(14)))
    assert(e.getMessage.contains("precision"))
    intercept[IllegalArgumentException](GraftHll.emptySketch(3))
  }

  test("dws_uv_sketch_rollup: every day within bounds at sf0.001") {
    val rows = graft.operators.WindowOps
      .uvSketchRollup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"day ${r.getString(0)} exact=${r.getLong(1)} outside the 4% bound"))
  }
}
