package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graftexpr.FreqItemsAgg

/** Misra-Gries frequent-items aggregate: the undercount bound and the
  * completeness guarantee (every true heavy hitter is in the summary),
  * partitioning-independence of the GUARANTEE (not the counters), SQL
  * registration, and the exactness of the two-pass heavyHitters scan.
  */
class FreqItemsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  /** A zipf-ish multiset: key v appears 2000/v times, v = 1..40. */
  private def zipf: Seq[Long] =
    (1 to 40).flatMap(v => Seq.fill(2000 / v)(v.toLong))

  private def summaryOf(keys: Seq[Long], k: Int, parts: Int): Map[Long, Long] = {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    val rows = keys.toDF("key").repartition(parts)
      .agg(FreqItemsAgg.freqItems($"key", k).as("mg"))
      .select(explode($"mg").as("kv"))
      .select($"kv.key", $"kv.est")
      .collect()
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("estimates undercount by at most N/(k+1), never overcount") {
    val keys = zipf
    val n = keys.size
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32)) {
      val mg = summaryOf(keys, k = 20, parts)
      mg.foreach { case (key, est) =>
        val t = truth(key)
        assert(est <= t, s"key $key overcounted: est $est > true $t")
        assert(est >= t - n / 21,
          s"key $key undercounted past the bound: est $est, true $t, N/(k+1) ${n / 21}")
      }
    }
  }

  test("every key with true count > N/(k+1) survives, at any partitioning") {
    val keys = zipf
    val n = keys.size
    val bound = n / 21 // k = 20
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = truth.filter { case (_, c) => c > bound }.keySet
    for (parts <- Seq(1, 7, 32)) {
      val mg = summaryOf(keys, k = 20, parts)
      val missing = mustKeep -- mg.keySet
      assert(missing.isEmpty,
        s"true heavy hitters lost at parts=$parts: $missing")
    }
  }

  test("SQL surface: freq_items_mg registered and usable in plain SQL") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    zipf.toDF("key").createOrReplaceTempView("mg_in")
    val top = spark.sql(
      "SELECT freq_items_mg(key, 10) AS mg FROM mg_in")
      .selectExpr("mg[0].key", "mg[0].est").head()
    assert(top.getLong(0) === 1L, "key 1 (the hottest) must rank first")
  }

  test("heavyHitters two-pass answer is exact and partitioning-invariant") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    val keys = zipf
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 500L).toMap
    for (parts <- Seq(1, 32)) {
      val got = graft.operators.SkewOps
        .heavyHitters(keys.toDF("key").repartition(parts), "key",
          k = 20, threshold = 500L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === truth, s"exactness broke at parts=$parts")
    }
  }

  test("a threshold inside the error bound is rejected, not silently lossy") {
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    val df = zipf.toDF("key")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.SkewOps.heavyHitters(df, "key", k = 3, threshold = 10L)
    }
    assert(ex.getMessage.contains("error bound"))
  }
}
