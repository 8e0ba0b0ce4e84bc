package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, GraphRank, Similarity}

/** Contracts of the session-scoped shared fixpoint materialization
  * ([[Materialize]]): the second consumer of a shared artifact performs
  * ZERO of the clustering / candidate-generation work — its plan starts
  * from the checkpointed leaf — and sharing never changes values.
  */
class MaterializeSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan
    p.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(p).toString
  }

  test("repeat calls return the SAME pinned artifact (no recompute)") {
    val a = Dedup.minhashClustersShared(spark, dir)
    val b = Dedup.minhashClustersShared(spark, dir)
    assert(a eq b, "second call must return the memoized frame")
    val g1 = Similarity.knnGraphShared(spark, dir)
    val g2 = Similarity.knnGraphShared(spark, dir)
    assert(g1 eq g2)
  }

  test("second consumer of the cluster map runs zero clustering shuffles") {
    Dedup.minhashClustersShared(spark, dir) // first consumer pays
    val hist = Dedup.clusterSizeHist(spark, dir)
    val plan = finalPlan(hist)
    // the consumer's plan must start from the checkpointed leaf — none
    // of the signature kernel, the banded self-join, or the fixpoint's
    // per-round joins may reappear
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("minhash_sig"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    // two bounded aggregations = at most two keyed exchanges
    val shuffles = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(shuffles <= 2, s"$shuffles keyed exchanges:\n$plan")
  }

  test("second consumer of the k-NN graph runs zero candidate-join work") {
    Similarity.knnGraphShared(spark, dir)
    val deg = GraphRank.assortativity(spark, dir)
    val plan = finalPlan(deg)
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("lsh_bucket_pack"),
      s"LSH bucketing re-executed by a shared-graph consumer:\n$plan")
  }

  test("sharing never changes values: histogram over shared == rebuilt map") {
    val viaShared = Dedup.clusterSizeHist(spark, dir)
      .orderBy($"cluster_size").collect().toSeq
    val rebuilt = Dedup.minhashClusters(spark, dir)
      .groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy($"sz".as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_size", $"n_clusters",
        ($"cluster_size" * $"n_clusters").as("n_docs"))
      .orderBy($"cluster_size").collect().toSeq
    assert(viaShared == rebuilt)
  }

  test("artifacts are keyed per (session, dir); invalidate drops them") {
    val before = Materialize.pinnedCount(spark)
    assert(before > 0, "suite above must have pinned artifacts")
    // a fresh session must not see this session's artifacts
    val s2 = spark.newSession()
    assert(Materialize.pinnedCount(s2) === 0)
    Materialize.invalidate(spark)
    assert(Materialize.pinnedCount(spark) === 0)
    // next call rebuilds (fresh instance, same values); the cluster
    // builder itself consumes the shared pair set, so TWO artifacts pin
    val again = Dedup.minhashClustersShared(spark, dir)
    assert(Materialize.pinnedCount(spark) === 2)
    assert(again.count() > 0)
  }
}
