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

  test("lsh_bucket_pack matches the composed per-plane dot-vs-literal form") {
    // 64-dim quantized vectors with varied signs/magnitudes
    val vecs = spark.createDataFrame(
      (0 until 20).map(v => Tuple2(v.toLong,
        (0 until 64).map(i => ((v * 31 + i * 17) % 13 - 6).toLong))))
      .toDF("vec_id", "q")
    val numTables = 4; val np = 9
    val composed = array((0 until numTables).map { t =>
      (0 until np).map { p =>
        val plane = typedlit((0 until 64).map(i =>
          graft.functions.Hashing.planeWeight(t * np + p, i)))
        when(ArrayOps.longArrayDot($"q", plane) > 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val rows = vecs.select(
      ArrayOps.lshBucketPack($"q", numTables, np).as("kernel"),
      composed.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("lsh_bucket_pack: null vector yields null; short vector pads like truncation") {
    val d = spark.createDataFrame(Seq(
      (1L, Option(Seq(1L, -2L, 3L))),  // dim < 64: only first 3 weights used
      (2L, Option.empty[Seq[Long]])))
      .toDF("vec_id", "q")
    val rows = d.select(ArrayOps.lshBucketPack($"q", 2, 5)).orderBy($"vec_id").collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(0).getSeq[Long](0).length === 2)
    assert(rows(1).isNullAt(0))
    // parity with the truncating dot on the same short vector
    val composed = (0 until 5).map { p =>
      val plane = typedlit((0 until 3).map(i =>
        graft.functions.Hashing.planeWeight(p, i)))
      when(ArrayOps.longArrayDot($"q", plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val ref = d.filter($"vec_id" === 1L).select(composed)
      .as[Long](Encoders.scalaLong).head()
    assert(rows(0).getSeq[Long](0).head === ref)
  }

  test("lsh_bucket_pack rejects out-of-range shape parameters") {
    val child = org.apache.spark.sql.catalyst.expressions.Literal
      .create(Seq(1L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graftexpr.LshBucketPack(child, 0, 5)
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graftexpr.LshBucketPack(child, 1, 64)
    }
  }
}
