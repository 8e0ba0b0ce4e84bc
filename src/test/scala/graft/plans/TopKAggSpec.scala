package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexpr.TopKAgg
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bounded-heap top-k aggregate: ordering, tie-breaks, k larger than
  * the group, per-group use, and partial-merge across many partitions.
  */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("keeps the k best by score desc, id-asc tiebreak, sorted output") {
    val df = Seq(
      (1L, 5.0), (2L, 9.0), (3L, 7.0), (4L, 9.0), (5L, 1.0)
    ).toDF("id", "score")
    val got = df.agg(TopKAgg.topKIds($"id", $"score", 3).as("top"))
      .select(explode($"top").as("e"))
      .select($"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // 9.0 tie: id 2 before id 4
    assert(got == Seq((2L, 9.0), (4L, 9.0), (3L, 7.0)))
  }

  test("k larger than input returns everything") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "score")
    val got = df.agg(TopKAgg.topKIds($"id", $"score", 10).as("top"))
      .select(size($"top")).collect().head.getInt(0)
    assert(got == 2)
  }

  test("per-group top-k") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 4L, 9.0), ("b", 5L, 8.0)
    ).toDF("g", "id", "score")
    val got = df.groupBy($"g")
      .agg(TopKAgg.topKIds($"id", $"score", 2).as("top"))
      .select($"g", $"top.id".as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(got == Map("a" -> List(3L, 2L), "b" -> List(4L, 5L)))
  }

  test("merges partial heaps across many partitions = global sort answer") {
    val n = 10000
    val df = spark.range(n).repartition(17)
      .select($"id", (pmod(($"id" * 2654435761L), lit(1000000L))).cast("double").as("score"))
    val viaAgg = df.agg(TopKAgg.topKIds($"id", $"score", 25).as("top"))
      .select(explode($"top").as("e")).select($"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaSort = df.orderBy($"score".desc, $"id").limit(25)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaAgg == viaSort)
  }
}
