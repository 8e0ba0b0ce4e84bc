package graft.plans

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** LongArrayDot: codegen path vs interpreted vs built-in higher-order
  * reference, null handling, length mismatch.
  */
class ArrayOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  lazy val df = spark.createDataFrame(Seq(
    (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    (2L, Seq(-2L, 7L), Seq(3L, 3L)),
    (3L, Seq(1000000L, 1000000L), Seq(1000000L, 1000000L))))
    .toDF("id", "a", "b")

  test("matches aggregate(zip_with(...)) reference") {
    val got = df.select($"id",
      ArrayOps.longArrayDot($"a", $"b").as("dot"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("ref"))
    got.collect().foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }

  test("null array yields null") {
    val withNull = df.withColumn("a",
      when($"id" === 2L, lit(null)).otherwise($"a"))
    val rows = withNull.select(ArrayOps.longArrayDot($"a", $"b")).collect()
    assert(rows.count(_.isNullAt(0)) === 1)
  }

  test("length mismatch truncates to the shorter side") {
    val d = spark.createDataFrame(Seq((Seq(1L, 2L, 10L), Seq(3L, 3L))))
      .toDF("a", "b")
    assert(d.select(ArrayOps.longArrayDot($"a", $"b"))
      .as[Long](Encoders.scalaLong).head() === 9L)
  }

  test("norm is dot with itself") {
    assert(df.filter($"id" === 3L)
      .select(ArrayOps.longArrayNormSq($"a"))
      .as[Long](Encoders.scalaLong).head() === 2000000000000L)
  }
}
