package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.TDigestAgg
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** t-digest quantile aggregate: rank-error bound across partitioned
  * merges, tail accuracy, degenerate groups, and the digest's own
  * invariants (monotonicity, min/max clamping).
  */
class TDigestSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)

  test("rank error stays under 1% of n across many partition merges") {
    val rnd = new scala.util.Random(42)
    val n = 20000
    val values = Seq.fill(n)(rnd.nextGaussian() * 10 + 50)
    val df = values.toDF("v").repartition(32) // force partial merges
    val est = df.agg(TDigestAgg.quantiles($"v", ps).as("qs"))
      .select($"qs").head().getSeq[Double](0)
    val sorted = values.sorted
    ps.zip(est).foreach { case (p, q) =>
      val rank = sorted.count(_ <= q)
      assert(math.abs(rank - p * n) <= 0.01 * n,
        s"p=$p est=$q rank=$rank target=${p * n}")
    }
  }

  test("heavy-tailed data: tail quantiles stay within bound") {
    val rnd = new scala.util.Random(7)
    val n = 10000
    val values = Seq.fill(n)(math.exp(rnd.nextGaussian() * 2)) // lognormal
    val df = values.toDF("v").repartition(16)
    val est = df.agg(TDigestAgg.quantiles($"v", Seq(0.99, 0.999)).as("qs"))
      .select($"qs").head().getSeq[Double](0)
    val sorted = values.sorted
    Seq(0.99, 0.999).zip(est).foreach { case (p, q) =>
      val rank = sorted.count(_ <= q)
      assert(math.abs(rank - p * n) <= 0.005 * n, s"p=$p est=$q rank=$rank")
    }
  }

  test("per-group use; singleton group returns its value for every p") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 42.0))
      .toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(TDigestAgg.quantiles($"v", Seq(0.5)).as("qs"))
      .select($"g", element_at($"qs", 1).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("b") === 42.0)
    assert(got("a") >= 1.0 && got("a") <= 3.0)
  }

  test("digest invariants: quantiles monotone in p, clamped to [min,max]") {
    val d = new TDigestAgg.Digest(100.0)
    val rnd = new scala.util.Random(1)
    (1 to 5000).foreach(_ => d.add(rnd.nextDouble() * 100, 1.0))
    val qs = (0 to 20).map(i => d.quantile(i / 20.0))
    assert(qs == qs.sorted, s"non-monotone: $qs")
    assert(qs.head >= d.min && qs.last <= d.max)
    assert(d.size <= 120, s"digest did not compress: ${d.size} centroids")
  }

  test("SQL surface: tdigest_quantiles and top_k_ids registered as aggregates") {
    (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .createOrReplaceTempView("sqlagg_probe")
    val qs = spark.sql(
      "SELECT tdigest_quantiles(v, 0.5, 0.99) FROM sqlagg_probe")
      .head().getSeq[Double](0)
    assert(math.abs(qs(0) - 500.0) <= 15.0, s"p50=${qs(0)}")
    assert(math.abs(qs(1) - 990.0) <= 15.0, s"p99=${qs(1)}")
    val top = spark.sql(
      "SELECT top_k_ids(id, v, 3) FROM sqlagg_probe")
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0))
    assert(top === Seq(1000L, 999L, 998L))
    // per-group SQL use
    val grouped = spark.sql(
      """SELECT id % 2 AS g, tdigest_quantiles(v, 0.5)[0] AS med
        |FROM sqlagg_probe GROUP BY 1 ORDER BY g""".stripMargin)
      .collect().map(_.getDouble(1))
    assert(grouped.length === 2)
    grouped.foreach(m => assert(math.abs(m - 500.0) <= 20.0, s"group median $m"))
  }

  test("all-null input evaluates to null, not a crash") {
    val df = Seq[Option[Double]](None, None).toDF("v")
    val row = df.agg(TDigestAgg.quantiles($"v", Seq(0.5)).as("qs")).head()
    assert(row.isNullAt(0))
  }
}
