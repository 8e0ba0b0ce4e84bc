package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graftexpr.GraftKmv

/** KMV/theta sketches: exactness below k, order/partitioning invariance
  * (byte-for-byte — stronger than HLL's), estimator accuracy above k,
  * set-algebra correctness, and SQL registration.
  */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def sketchOf(keys: Seq[Long], k: Int, parts: Int): Array[Byte] = {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    keys.toDF("key").repartition(parts)
      .agg(GraftKmv.build($"key", k).as("sk"))
      .head().getAs[Array[Byte]](0)
  }

  test("below k the sketch is exact, at any partitioning") {
    val keys = (1L to 3000L).map(_ * 31L) ++ (1L to 3000L).map(_ * 31L) // dups
    for (parts <- Seq(1, 16)) {
      assert(GraftKmv.estimate(sketchOf(keys, k = 4096, parts)) === 3000L)
    }
  }

  test("sketches are byte-identical across partitionings (order-invariant)") {
    val keys = (1L to 20000L).map(_ * 17L)
    val a = sketchOf(keys, k = 1024, parts = 1)
    val b = sketchOf(keys, k = 1024, parts = 32)
    assert(java.util.Arrays.equals(a, b),
      "k-minimum-values must not depend on encounter order")
  }

  test("union-of-parts equals sketch-of-whole byte-for-byte") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val keys = (1L to 20000L).map(_ * 13L)
    val whole = sketchOf(keys, k = 512, parts = 4)
    val parts = keys.zipWithIndex
      .map { case (key, i) => (i % 7, key) }
      .toDF("part", "key")
      .groupBy($"part").agg(GraftKmv.build($"key", 512).as("sk"))
      .agg(GraftKmv.union($"sk").as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, parts))
  }

  test("estimator above k stays within 5 RSE of truth") {
    val n = 200000L
    val keys = (1L to n).map(_ * 2654435761L)
    val est = GraftKmv.estimate(sketchOf(keys, k = 4096, parts = 8)).toDouble
    val rse = 1.0 / math.sqrt(4096 - 2)
    assert(math.abs(est - n) / n < 5 * rse,
      s"estimate $est vs true $n exceeds 5·RSE (${5 * rse})")
  }

  test("intersection and union algebra: exact regime") {
    val a = sketchOf((1L to 1000L).toSeq, k = 4096, parts = 4)
    val b = sketchOf((501L to 1500L).toSeq, k = 4096, parts = 4)
    assert(GraftKmv.intersectCard(a, b) === 500L)
    assert(GraftKmv.unionCard(a, b) === 1500L)
  }

  test("intersection estimate above k stays within 5 sigma") {
    // |A|=|B|=100k, |A∩B|=50k
    val a = sketchOf((1L to 100000L).toSeq, k = 4096, parts = 8)
    val b = sketchOf((50001L to 150000L).toSeq, k = 4096, parts = 8)
    val est = GraftKmv.intersectCard(a, b).toDouble
    // sample of the intersection at rate ~k/|A∪B| → expect ~1365
    // surviving hashes; binomial noise ⇒ rse ≈ 1/√1365 ≈ 2.7%
    assert(math.abs(est - 50000.0) / 50000.0 < 0.14,
      s"intersection estimate $est too far from 50000")
  }

  test("SQL surface: kmv functions registered") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    (1L to 500L).toDF("key").createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      """SELECT kmv_card(sk) AS c,
        |  kmv_intersect_card(sk, sk) AS i,
        |  kmv_union_card(sk, sk) AS u
        |FROM (SELECT kmv_build(key, 1024) AS sk FROM kmv_in)""".stripMargin)
      .head()
    assert(r.getLong(0) === 500L && r.getLong(1) === 500L && r.getLong(2) === 500L)
  }

  test("malformed blobs raise a named error") {
    val ex = intercept[Exception] {
      GraftKmv.estimate(Array[Byte](1, 2, 3))
    }
    assert(ex.getMessage.contains("kmv"))
  }
}
