package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.GraftCountMin
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Count-Min contracts: the one-sided error guarantee (never an
  * underestimate), merge invariance across partitionings (the property
  * the distributed build rests on), exactness when width ≫ keys, SQL
  * registration, and loud rejection of malformed blobs.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits.{StringToColumn => _, _}

  private def keys(n: Int, reps: Int): Seq[Long] =
    (0 until n).flatMap(k => Seq.fill(reps * (k % 3 + 1))(k.toLong))

  test("estimates never underestimate, and are exact when width >> distinct keys") {
    val data = keys(50, 4)
    val df = data.toDF("k").repartition(8)
    val sketch = df.agg(GraftCountMin.build(col("k"), 4, 4096).as("cm"))
    val exact = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val blob = sketch.collect()(0).getAs[Array[Byte]](0)
    exact.foreach { case (k, c) =>
      val est = GraftCountMin.estimate(blob, k)
      assert(est >= c, s"underestimate for $k: $est < $c")
      assert(est == c, s"width 4096 over 50 keys should be collision-free: $k -> $est vs $c")
    }
  }

  test("partitioned build equals single-partition build (merge is elementwise add)") {
    val data = keys(200, 7)
    val one = data.toDF("k").coalesce(1)
      .agg(GraftCountMin.build(col("k"), 4, 256)).collect()(0).getAs[Array[Byte]](0)
    val many = data.toDF("k").repartition(16)
      .agg(GraftCountMin.build(col("k"), 4, 256)).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many),
      "sketch must be byte-identical under any partitioning")
  }

  test("SQL surface: cm_build and cm_estimate registered") {
    val out = spark.sql(
      """SELECT cm_estimate(cm, 7L) AS est FROM
        |  (SELECT cm_build(k, 4, 256) AS cm FROM
        |    (SELECT explode(array(7L, 7L, 7L, 8L)) AS k))""".stripMargin)
      .as[Long].head()
    assert(out == 3L)
  }

  test("probe codegen actually compiles (no silent interpreted fallback)") {
    // the regression test for the MODULE$-vs-static-forwarder codegen bug
    val blob = Seq(5L, 5L, 6L).toDF("k")
      .agg(GraftCountMin.build(col("k"), 4, 256)).collect()(0).getAs[Array[Byte]](0)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq(5L).toDF("k")
        .select(GraftCountMin.estimateCol(lit(blob), col("k")).as("est"))
        .as[Long].head()
      assert(out == 2L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("malformed blobs raise a named error, not an index crash") {
    val bad = intercept[Exception] {
      GraftCountMin.estimate(Array[Byte](1, 2, 3), 1L)
    }
    assert(bad.getMessage.contains("cm_estimate"), bad.getMessage)
    val badHeader = intercept[Exception] {
      GraftCountMin.estimate(
        java.nio.ByteBuffer.allocate(16).putInt(99).putInt(-5).array(), 1L)
    }
    assert(badHeader.getMessage.contains("malformed"), badHeader.getMessage)
  }
}
