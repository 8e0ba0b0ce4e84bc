package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Equivalence contract for the vector kernels
  * ([[org.apache.spark.sql.graftexpr.VecKernel]]) against the HOF forms
  * they replaced — the quantizer under every embedding consumer and the
  * minhash signature-agreement count under the banded pair joins.
  */
class VecExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  test("quantizeFloats kernel == transform(floor(x * 1e6)) on the real corpus") {
    val hof = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
    val bad = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(ArrayOps.quantizeFloats($"embedding", 1000000L).as("k"), hof.as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0)
  }

  test("quantizeFloats matches on negative / zero / extreme floats") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Seq(0.0f, -0.0f, 1.5f, -1.5f, 0.9999995f, -0.9999995f),
      Seq(Float.MinPositiveValue, 3.4e8f, -3.4e8f, 1e-9f, -1e-9f, 123.456f),
      Seq[Float]()).map(a => org.apache.spark.sql.Row(a))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val df = spark.createDataFrame(rows.asJava, schema)
    val hof = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
    val bad = df.select(ArrayOps.quantizeFloats($"embedding", 1000000L).as("k"), hof.as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("int8QuantStats kernel == max-fold/quantize/checksum towers incl. empty") {
    // the exact tower int8Quantize shipped before kernel wave 3
    def hof = {
      val m = expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> greatest(acc, abs(x)))")
      struct(m.as("scale"),
        expr(
          """aggregate(
            |  zip_with(
            |    transform(q, x -> CASE WHEN
            |        aggregate(q, CAST(0 AS BIGINT), (acc, y) -> greatest(acc, abs(y))) = 0
            |      THEN CAST(0 AS BIGINT)
            |      ELSE (x * 127) div aggregate(q, CAST(0 AS BIGINT),
            |        (acc, y) -> greatest(acc, abs(y))) END),
            |    sequence(CAST(1 AS BIGINT), CAST(size(q) AS BIGINT)),
            |    (a, b) -> a * b),
            |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("checksum"),
        array_min(expr(
          """transform(q, x -> CASE WHEN
            |    aggregate(q, CAST(0 AS BIGINT), (acc, y) -> greatest(acc, abs(y))) = 0
            |  THEN CAST(0 AS BIGINT)
            |  ELSE (x * 127) div aggregate(q, CAST(0 AS BIGINT),
            |    (acc, y) -> greatest(acc, abs(y))) END)""".stripMargin)).as("v_min"),
        array_max(expr(
          """transform(q, x -> CASE WHEN
            |    aggregate(q, CAST(0 AS BIGINT), (acc, y) -> greatest(acc, abs(y))) = 0
            |  THEN CAST(0 AS BIGINT)
            |  ELSE (x * 127) div aggregate(q, CAST(0 AS BIGINT),
            |    (acc, y) -> greatest(acc, abs(y))) END)""".stripMargin)).as("v_max"))
    }
    // real corpus (the consumer's input distribution)
    val corpus = graft.functions.Dedup.quantized(spark, "/root/testdata/sf0.01")
      .select($"q")
    val bad = corpus.select(ArrayOps.int8QuantStats($"q").as("k"), hof.as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().take(3).mkString("; "))
    // edges: all-zero (scale 0 -> v=0), negatives, single element, and
    // the EMPTY vector whose tower checksum nulls out through the
    // descending sequence(1, 0) zip — the kernel must replicate that
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Seq(0L, 0L, 0L), Seq(-5L, 3L, -1L), Seq(42L), Seq[Long](),
      Seq(127L, -127L, 1L, -1L), Seq(1000000L, -999999L, 500000L))
      .map(a => org.apache.spark.sql.Row(a))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val nd = spark.createDataFrame(rows.asJava, schema)
    val badE = nd.select(ArrayOps.int8QuantStats($"q").as("k"), hof.as("h"))
      .filter(not($"k" <=> $"h"))
    assert(badE.count() === 0, badE.collect().mkString("; "))
    val empty = nd.filter(size($"q") === 0)
      .select(ArrayOps.int8QuantStats($"q").as("k")).collect().head.getStruct(0)
    assert(empty.getLong(0) === 0L)   // scale fold seeds at 0
    assert(empty.isNullAt(1) && empty.isNullAt(2) && empty.isNullAt(3))
  }

  test("longArrayEqCount kernel == size(filter(zip_with(eq))) incl. length skew") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)),
      (Seq(1L, 2L), Seq(1L, 2L, 3L)), // zip_with pads with null -> dropped
      (Seq[Long](), Seq(1L)),
      (Seq(5L, 5L, 5L, 5L), Seq(5L, 5L, 5L, 5L))).map { case (a, b) =>
      org.apache.spark.sql.Row(a, b)
    }
    val at = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", at),
      org.apache.spark.sql.types.StructField("b", at)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val hof = expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))").cast("long")
    val bad = df.select(ArrayOps.longArrayEqCount($"a", $"b").as("k"), hof.as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("basketPairsMarkers kernel == concat/flatten/slice HOF emit (real baskets)") {
    val hof = expr(
      """concat(
        |  flatten(transform(parts, (p, i) ->
        |    transform(slice(parts, i + 2, size(parts) - i - 1),
        |      q -> struct(p AS a, q AS b)))),
        |  transform(parts, p -> struct(p AS a, CAST(NULL AS BIGINT) AS b)),
        |  array(struct(CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b)))"""
        .stripMargin)
    val baskets = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("parts"))
    val bad = baskets
      .select(ArrayOps.basketPairsMarkers($"parts").as("k"), hof.as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0)
  }

  test("quantizeFloats raises on non-finite input (ANSI cast parity)") {
    // Spark 4's default-ANSI CAST(floor(NaN/Inf * F) AS BIGINT) raises;
    // the kernel must not silently saturate through Double.toLong
    import org.apache.spark.sql.graftexpr.VecKernel
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)) {
      val e = intercept[ArithmeticException] {
        VecKernel.quantizeFloats(new GenericArrayData(Array[Any](1.0f, bad)), 1000000L)
      }
      assert(e.getMessage.contains("quantize_floats"), e.getMessage)
    }
    // finite values stay fine on the same code path
    val ok = VecKernel.quantizeFloats(
      new GenericArrayData(Array[Any](1.5f, null, -2.5f)), 10L)
    assert(ok.numElements() === 3 && ok.getLong(0) === 15L && ok.isNullAt(1))
  }

  test("basketPairsMarkers sizes its output in Long (wide-basket guard)") {
    // k = 66000 makes k*(k-1)/2 overflow Int; the kernel must fail with
    // a named error BEFORE allocating a wrong-size array
    import org.apache.spark.sql.graftexpr.VecKernel
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val wide = new GenericArrayData(
      Array.tabulate(66000)(i => java.lang.Long.valueOf(i.toLong)): Array[Any])
    val e = intercept[IllegalArgumentException] {
      VecKernel.pairsAndMarkers(wide)
    }
    assert(e.getMessage.contains("basket_pairs_markers"), e.getMessage)
    // boundary sanity: a small basket still emits C(k,2) + k + 1 structs
    val small = new GenericArrayData(
      Array[Any](java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L),
        java.lang.Long.valueOf(3L)))
    assert(VecKernel.pairsAndMarkers(small).numElements() === 3 + 3 + 1)
  }

  test("minhash pair sets are unchanged by the kernel swap (real corpus)") {
    // the candidate chain itself is exercised end to end: est_jaccard and
    // the surviving pair set must be what the HOF form produced (pinned
    // value-level by the dedup_minhash_pairs oracle; this is the fast
    // in-suite guard)
    val pairs = graft.functions.Dedup.minhashPairs(spark, "/root/testdata/sf0.01")
    assert(pairs.count() > 0)
    val badRange = pairs.filter($"est_jaccard" < 0.5 || $"est_jaccard" > 1.0)
    assert(badRange.count() === 0)
  }
}
