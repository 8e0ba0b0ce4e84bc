package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graftexpr.GraftBloom

/** Bloom-filter join pre-filter: no false negatives (the transparency
  * guarantee the oracle relies on), bounded false positives, OR-merge
  * across partitions, SQL registration, and the end-to-end prefilter
  * query equals the plain join.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def keysDf(keys: Seq[Long], parts: Int) = {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    keys.toDF("k").repartition(parts)
  }

  test("no false negatives, across a multi-partition (merge-exercising) build") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val blob = keysDf(keys, 8)
      .agg(GraftBloom.build($"k", numBits = 1 << 16, numHashes = 6))
      .head().getAs[Array[Byte]](0)
    assert(keys.forall(GraftBloom.contains(blob, _)),
      "a bloom filter must never reject an inserted key")
  }

  test("false-positive rate stays near the sizing estimate") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val blob = keysDf(keys, 4)
      .agg(GraftBloom.build($"k", numBits = 1 << 16, numHashes = 6))
      .head().getAs[Array[Byte]](0)
    // probe keys disjoint from the inserted set
    val probes = (1L to 20000L).map(_ * 7919L + 1L)
    val fp = probes.count(GraftBloom.contains(blob, _)).toDouble / probes.size
    // 5000 keys in 2^16 bits ≈ 13 bits/key → fpp ≈ 0.2%; assert an
    // order-of-magnitude bound, not the point estimate
    assert(fp < 0.02, s"false-positive rate $fp is far above the sizing estimate")
  }

  test("partitioned build equals single-partition build (merge is OR)") {
    val keys = (1L to 2000L).map(graft.functions.Hashing.lcg)
    val a = keysDf(keys, 1)
      .agg(GraftBloom.build($"k", 1 << 14, 5)).head().getAs[Array[Byte]](0)
    val b = keysDf(keys, 16)
      .agg(GraftBloom.build($"k", 1 << 14, 5)).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b),
      "bloom build must be partitioning-invariant (bitwise OR merge)")
  }

  test("SQL surface: bloom_build and bloom_might_contain registered") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    (1L to 100L).toDF("k").createOrReplaceTempView("bloom_keys")
    val n = spark.sql(
      """WITH bf AS (SELECT bloom_build(k, 8192, 5) AS b FROM bloom_keys)
        |SELECT count(*) AS n FROM bloom_keys, bf
        |WHERE bloom_might_contain(b, k)""".stripMargin)
      .as[Long](Encoders.scalaLong).head()
    assert(n === 100L)
  }

  test("probe codegen actually compiles (no silent interpreted fallback)") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    // With fallback disabled, a Janino compile error in the generated
    // stage fails the query instead of quietly degrading — this is the
    // regression test for the MODULE$-vs-static-forwarder codegen bug.
    val blob = (1L to 64L).toDF("k")
      .agg(GraftBloom.build($"k", 8192, 5)).head().getAs[Array[Byte]](0)
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = (1L to 64L).toDF("k")
        .filter(GraftBloom.mightContain(lit(blob), $"k")).count()
      assert(n === 64L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("malformed blobs raise a named error, not an index crash") {
    for (bad <- Seq(Array.empty[Byte], Array[Byte](1, 2, 3), Array[Byte](0, 0, 0, 5))) {
      val e = intercept[IllegalArgumentException](GraftBloom.contains(bad, 42L))
      assert(e.getMessage.contains("bloom_might_contain"))
      intercept[IllegalArgumentException](GraftBloom.fromBlob(bad))
    }
    // k outside [1,16] (e.g. a random binary that happens to be long)
    val badK = Array.fill[Byte](20)(0x7f.toByte)
    intercept[IllegalArgumentException](GraftBloom.contains(badK, 42L))
  }

  test("j10: prefiltered join result equals the plain join; prefilter prunes rows") {
    val dir = "/root/testdata/sf0.001"
    val plain = {
      val urgent = graft.Tables.orders(spark, dir)
        .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
      graft.Tables.lineitem(spark, dir)
        .join(urgent, $"l_orderkey" === $"o_orderkey").count()
    }
    val urgent = graft.Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val bloom = urgent.agg(GraftBloom.build($"o_orderkey", 1 << 18, 6).as("b"))
    val pre = graft.Tables.lineitem(spark, dir)
      .filter(GraftBloom.mightContainScalar(bloom, $"l_orderkey"))
    val total = graft.Tables.lineitem(spark, dir).count()
    val preCount = pre.count()
    assert(preCount < total * 3 / 5,
      s"prefilter kept $preCount of $total rows — not pruning (1/5 of orders are urgent)")
    val joined = pre.join(urgent, $"l_orderkey" === $"o_orderkey").count()
    assert(joined === plain, "bloom prefilter must be transparent to the exact join")
  }

  test("decontaminate_bloom equals the plain decontamination sweep") {
    val dir = "/root/testdata/sf0.001"
    val plain = CorpusPipeline.decontaminate(spark, dir)
    val bloomed = CorpusPipeline.decontaminateBloom(spark, dir)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty,
      "the bloom prefilter must be invisible in the decontamination answer")
  }

  test("scalar-subquery binding plans no join for the blob") {
    val dir = "/root/testdata/sf0.001"
    val urgent = graft.Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val bloom = urgent.agg(GraftBloom.build($"o_orderkey", 1 << 14, 5).as("b"))
    val pre = graft.Tables.lineitem(spark, dir)
      .filter(GraftBloom.mightContainScalar(bloom, $"l_orderkey"))
    val plan = pre.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"blob must bind as a scalar subquery, not a join:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"expected a subquery binding in:\n$plan")
  }
}
