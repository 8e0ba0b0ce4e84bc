package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Registry-wide interpreted-kernel census, pinned as a RATCHET.
  *
  * The r13–r15 kernel waves replaced every interpreted per-CORPUS-ROW
  * HOF tower with a codegen'd graftexpr kernel; what remains (audited
  * r13, re-judged r15) are per-GROUP towers over bounded arrays —
  * HOFs that execute once per aggregate output row (per cluster, per
  * day-series, per query-group), where the interpreted dispatch is
  * amortized over the group and a kernel would buy nothing measurable.
  * Those live in the explicit allowlist below, each with its bound.
  *
  * The spec mechanizes the audit both ways: it fails the moment a
  * query carries a fallback expression NOT in its allowlist entry (a
  * new interpreted tower — the regression the kernel program exists to
  * prevent), and it fails when an allowlist entry goes STALE (the
  * tower was kernelized but the entry kept — the ratchet only moves
  * down). Aggregate functions are exempt (imperative buffers by
  * design — see [[PlanAudit.codegenFallbacks]]).
  *
  * Plans are BUILT, not executed — the expression census is identical
  * on the initial adaptive plan, and building keeps the walk cheap
  * enough to cover the whole registry in one test.
  */
class CensusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Lambda plumbing nodes that ride along with any allowed HOF — not
    * towers themselves.
    */
  private val lambdaPlumbing = Set("lambdafunction", "namedlambdavariable")

  /** Accepted interpreted towers, by query. Bounds:
    *  - k-means family: HOFs fold over the k×dim centroid array — k
    *    rows after the assignment aggregate, never the corpus.
    *  - day-series smoothers (`ts_*`): one fold per (type) group over
    *    the collected day array — hundreds of elements, dozens of rows.
    *  - per-group rank/drift folds (`eval_*`, `stats_cramers_v`,
    *    `text_token_lang_chi2`, `corpus_source_overlap`,
    *    `text_cooccurrence_pmi`): post-aggregate
    *    projections over per-group arrays bounded by vocab/bin/source
    *    cardinality, not corpus size. (r16: the dsir/source-drift
    *    bigram formation moved to the codegen `token_bigrams` kernel —
    *    their entries ratcheted out.)
    *  - band-array probes (`dedup_incremental`, `dedup_lsh_recall`,
    *    `ir_query_expansion`, `rel_bm25_search`, `pipeline_budget_fill`,
    *    `embed_gram_matrix`, `embed_whiten_diag`):
    *    HOF over a fixed-width signature/weight array in a projection
    *    of an already-reduced (bucketed/aggregated/broadcast) side.
    *  - `set_*_all`: `replicaterows` is Spark's own INTERSECT/EXCEPT
    *    ALL rewrite — the idiomatic plan, not a graft tower.
    *  - `dws_keyword_count_udtf`: the TokenizeExplode Generator —
    *    generators run through GenerateExec's row loop; its splitter
    *    is the codegen'd tokenize kernel, only the emit loop is
    *    interpreted.
    *  - `x2_cdc_route`: `map_filter` over the ~10-entry per-record
    *    column map of the CDC envelope — bounded by table width.
    */
  private val allowed: Map[String, Set[String]] = Map(
    "cluster_kmeans_assign" -> Set("transform"),
    "cluster_kmeans_centroids" -> Set("aggregate", "zip_with", "transform"),
    "cluster_kmeans_inertia" -> Set("transform"),
    "cluster_label_centroids" -> Set("transform", "array_sort"),
    "cluster_silhouette" -> Set("transform"),
    "corpus_source_overlap" -> Set("transform"),
    "dedup_incremental" -> Set("transform"),
    "dedup_lsh_recall" -> Set("transform"),
    "dws_keyword_count_udtf" -> Set("tokenizeexplode"),
    "embed_gram_matrix" -> Set("transform"),
    "embed_whiten_diag" -> Set("aggregate", "zip_with", "transform"),
    "eval_ndcg" -> Set("aggregate"),
    "ir_query_expansion" -> Set("filter"),
    "pipeline_budget_fill" -> Set("filter"),
    "rel_bm25_search" -> Set("filter"),
    "set_except_all" -> Set("replicaterows"),
    "set_intersect_all" -> Set("replicaterows"),
    "stats_cramers_v" -> Set("aggregate"),
    "text_cooccurrence_pmi" -> Set("transform", "filter", "zip_with"),
    "text_token_lang_chi2" -> Set("aggregate"),
    "ts_cusum_daily" -> Set("aggregate"),
    "ts_holt_smooth" -> Set("aggregate"),
    "x2_cdc_route" -> Set("map_filter"),
  )

  test("registry census: no interpreted tower beyond the audited per-group allowlist") {
    // pin the session-shared Materialize artifacts first — consumers
    // then plan them as checkpointed leaves, which is the steady state
    // the audit judges (a builder subtree's towers are charged to the
    // build, not to every consumer plan)
    graft.functions.Dedup.minhashPairsShared(spark, dir).count()
    graft.functions.Dedup.minhashClustersShared(spark, dir).count()
    graft.functions.Similarity.knnGraphShared(spark, dir).count()
    graft.functions.Similarity.bruteForceTopKShared(spark, dir).count()
    graft.functions.GraphRank.knnComponentsShared(spark, dir).count()
    val census: Seq[(String, Set[String])] = SparkEntry.queries.toSeq
      .sortBy(_._1).map { case (name, fn) =>
        name -> (PlanAudit.codegenFallbacks(fn(spark, dir)).toSet -- lambdaPlumbing)
      }
    val newTowers = census.flatMap { case (name, fb) =>
      val extra = fb -- allowed.getOrElse(name, Set.empty)
      if (extra.isEmpty) Nil else Seq(s"$name: ${extra.mkString(", ")}")
    }
    assert(newTowers.isEmpty,
      "interpreted per-row expressions beyond the audited allowlist " +
        s"(kernelize, or justify a new allowlist entry):\n${newTowers.mkString("\n")}")
    val byName = census.toMap
    val stale = allowed.flatMap { case (name, exprs) =>
      val gone = exprs -- byName.getOrElse(name, Set.empty)
      if (gone.isEmpty) Nil else Seq(s"$name: ${gone.mkString(", ")}")
    }
    assert(stale.isEmpty,
      s"allowlist entries no longer planned (ratchet down — remove them):\n${stale.mkString("\n")}")
  }
}
