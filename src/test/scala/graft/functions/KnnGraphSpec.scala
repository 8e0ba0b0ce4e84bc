package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Structural invariants of the LSH k-NN graph at sf0.001 (value-level
  * parity is the DuckDB oracle's job): per-vector neighbor lists are
  * rank-contiguous, capped at KnnK, score-sorted with the deterministic
  * tie-break, self-loop-free, and score-symmetric (an edge scored from
  * either endpoint carries the same cos²).
  */
class KnnGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val rows =
    Similarity.knnGraph(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("neighbor lists are rank-contiguous, capped at KnnK, and sorted") {
    assert(rows.nonEmpty, "fixture buckets must produce neighbors")
    rows.groupBy(_._1).foreach { case (v, es) =>
      val byRank = es.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1L to es.length).toSeq,
        s"vec $v ranks not contiguous")
      assert(es.length <= Similarity.KnnK)
      // sorted by cos2 desc, ties toward the smaller neighbor id
      byRank.sliding(2).foreach {
        case Array((_, _, n1, c1), (_, _, n2, c2)) =>
          assert(c1 > c2 || (c1 == c2 && n1 < n2),
            s"vec $v: rank order violated at neighbors $n1,$n2")
        case _ =>
      }
      assert(es.forall(_._3 != v), s"vec $v has a self-loop")
    }
  }

  test("edge scores are symmetric across directions") {
    val score = rows.map { case (v, _, n, c) => (v, n) -> c }.toMap
    score.foreach { case ((v, n), c) =>
      score.get((n, v)).foreach(back => assert(back === c,
        s"asymmetric score on edge ($v,$n)"))
    }
  }

  test("hard negatives: cross-label only, and exactly the knn relation minus same-label pairs") {
    val dir = "/root/testdata/sf0.001"
    val labels = graft.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val neg = Similarity.hardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(neg.nonEmpty)
    neg.foreach { case (v, _, n, _) =>
      assert(labels(v) !== labels(n), s"same-label pair ($v,$n) survived")
    }
    // per anchor: rank-contiguous, capped, sorted — same contract as knn
    neg.groupBy(_._1).foreach { case (v, es) =>
      assert(es.length <= Similarity.HardNegK)
      assert(es.sortBy(_._2).map(_._2).toSeq === (1L to es.length).toSeq)
    }
    // every hard-negative edge is in the unrestricted candidate
    // relation with the same score: mining only FILTERS, never rescoring
    // (knnGraph keeps top KnnK of all candidates, so compare against
    // anchors whose knn list isn't already truncated below the negative)
    val knnScore = rows.map { case (v, _, n, c) => (v, n) -> c }.toMap
    neg.foreach { case (v, _, n, c) =>
      knnScore.get((v, n)).foreach(kc => assert(kc === c,
        s"score drift on ($v,$n)"))
    }
  }

  test("knn classify: majority vote over the graph's neighbor labels, lowest-label ties") {
    val dir = "/root/testdata/sf0.001"
    val labels = graft.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replay from the knn rows this suite already holds
    val expect = rows.groupBy(_._1).map { case (v, es) =>
      val counts = es.map(e => labels(e._3))
        .groupBy(identity).map { case (l, xs) => (l, xs.length.toLong) }
      val (predicted, votes) = counts.toSeq.maxBy { case (l, c) => (c, -l) }
      v -> (labels(v), predicted, votes,
        if (labels(v) == predicted) 1L else 0L)
    }
    val got = Similarity.knnClassify(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect, "classification must replay the vote exactly")
    // the op only covers vectors that have neighbors — nothing invented
    assert(got.keySet === rows.map(_._1).toSet)
  }
}
