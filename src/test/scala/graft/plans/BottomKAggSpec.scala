package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.BottomKAgg
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bottom-k heap aggregate: ascending selection, exact long-key ties,
  * partial merges, and equivalence of the heap-based quota with the
  * window-rank form.
  */
class BottomKAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("keeps the k smallest by key, id-asc tiebreak, sorted ascending") {
    val df = Seq(
      (1L, 5L), (2L, 9L), (3L, 7L), (4L, 5L), (5L, 1L)
    ).toDF("id", "key")
    val got = df.agg(BottomKAgg.bottomKIds($"id", $"key", 3).as("keep"))
      .select(explode($"keep").as("e"))
      .select($"e.id", $"e.key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // key 5 tie: id 1 before id 4
    assert(got == Seq((5L, 1L), (1L, 5L), (4L, 5L)))
  }

  test("exact long keys beyond double precision keep their order") {
    // two keys that would collide if routed through a double score
    val big = (1L << 60) + 1
    val df = Seq((10L, big), (11L, big - 1)).toDF("id", "key")
    val got = df.agg(BottomKAgg.bottomKIds($"id", $"key", 1).as("keep"))
      .select(explode($"keep").as("e")).select($"e.id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L), "the smaller exact key must win, not the id tiebreak")
  }

  test("merges partial heaps across partitions = global answer") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 5000L).map(i => (i, rnd.nextLong())).toSeq
    val got = rows.toDF("id", "key").repartition(16)
      .agg(BottomKAgg.bottomKIds($"id", $"key", 20).as("keep"))
      .select(explode($"keep").as("e")).select($"e.id")
      .collect().map(_.getLong(0)).toSeq
    val expect = rows.sortBy { case (id, k) => (k, id) }.take(20).map(_._1)
    assert(got == expect)
  }

  test("heap-based source quota equals the window-rank form exactly") {
    val dir = "/root/testdata/sf0.01"
    val window = graft.functions.Sampling.sourceQuota(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val heap = graft.functions.Sampling.sourceQuotaHeap(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(heap.nonEmpty)
    assert(heap === window)
  }
}
