package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Structural invariants of the integer PageRank at sf0.001 (value-level
  * parity is the DuckDB oracle's unrolled replay): one row per graph
  * node, strictly positive ranks, and near-conserved total mass (each
  * truncating division loses < 1 fixed-point unit per node per round).
  */
class GraphRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pagerank covers the node set, stays positive, conserves mass") {
    val dir = "/root/testdata/sf0.001"
    val rows = GraphRank.pagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "fixture graph must be non-empty")
    val srcs = Similarity.knnGraph(spark, dir)
      .select("vec_id").distinct().count()
    assert(rows.length.toLong === srcs, "one rank row per graph node")
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.forall(_._3 > 0L), "ranks must stay positive")
    assert(rows.forall(r => r._2 >= 1L && r._2 <= Similarity.KnnK),
      "out-degrees bounded by KnnK")
    val total = rows.map(_._3).sum
    assert(total <= GraphRank.Scale, s"mass exceeds Scale: $total")
    assert(total > (GraphRank.Scale * 9L) / 10L,
      s"mass leaked beyond truncation bounds: $total")
  }
}
