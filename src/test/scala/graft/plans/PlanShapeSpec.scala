package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Plan contracts: the shapes the engine's scale story depends on,
  * asserted against the actual physical plans at sf0.001. These are the
  * properties that survive (or break) a 100 TB scale-up — column
  * pruning at the scan, broadcast for dims, zero shuffles in the narrow
  * kernel pipelines, shuffle (not corpus broadcast) in candidate joins.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)
  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }
  private def countShuffles(df: DataFrame): Int = {
    // unwrap AQE first: a plan CONTAINING an exchange gets wrapped in
    // AdaptiveSparkPlanExec, which is a LeafExecNode — collecting on the
    // outer plan would return 0 exactly when a shuffle regression
    // appears, making the zero-shuffle assertions vacuous
    val plan = df.queryExecution.executedPlan
    val inner = plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(plan)
    // count KEYED shuffles only: Tables.spread adds a conditional
    // RoundRobinPartitioning over under-split sources (a no-op at
    // cluster scale); the contract these tests enforce is "no
    // aggregation/join exchange", i.e. nothing data-dependent
    inner.collect {
      case s: ShuffleExchangeExec
          if !s.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => s
    }.size
  }

  test("q1 pricing summary: scan reads only the five needed lineitem columns") {
    val scan = planString(q("q1_pricing_summary"))
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"),
      readSchema)
  }

  test("dim enrichment joins broadcast, never sort-merge") {
    val plan = planString(q("j3_dim_enrich"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("minhash signatures are computed with ZERO shuffles") {
    // protocol sort now lives at the Verify edge — the operator itself
    // must be a pure narrow pipeline
    assert(countShuffles(q("dedup_minhash_sig")) == 0)
  }

  test("simhash fingerprints are narrow: no aggregation exchange") {
    assert(countShuffles(q("dedup_simhash")) == 0)
  }

  test("text kernels run inside WholeStageCodegen") {
    // collect() drives THIS Dataset's own QueryExecution (a write would
    // clone it), finalizing the adaptive plan with codegen stages
    val df = q("text_fingerprint")
    df.collect()
    val adaptive = df.queryExecution.executedPlan
    val finalPlan = adaptive.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(adaptive)
    // codegen stages print as "*(n) Operator" in the compact plan string;
    // the stage number shifts when Tables.spread inserts its round-robin
    // exchange, so match any stage id
    val s = finalPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(s).isDefined, s)
  }

  test("filter on source column reaches the parquet scan (PushedFilters)") {
    val plan = planString(q("j5_semi_join"))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority)")
      || plan.contains("EqualTo(o_orderpriority"), plan)
  }

  test("q6 scan probe: every predicate pushed, projection pruned to four columns") {
    // formatted mode: plain toString ellipsizes the PushedFilters list
    val plan = q("q6_revenue_change").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("GreaterThanOrEqual(l_discount") &&
      plan.contains("LessThan(l_quantity"), plan)
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length == 4, readSchema)
  }

  test("LSH candidate join shuffles on the bucket key, corpus side not broadcast") {
    val df = q("dedup_embedding_lsh")
    df.write.format("noop").mode("overwrite").save()
    val adaptive = df.queryExecution.executedPlan
    val finalPlan = adaptive.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(adaptive)
    val s = finalPlan.toString
    assert(s.contains("ShuffledHashJoin") || s.contains("SortMergeJoin"), s)
  }

  test("LSH bucketing is one lsh_bucket_pack kernel, not composed per-plane dots") {
    // the composed form (numTables x planesPerTable long_array_dot-vs-
    // literal terms) blows the JIT compilable-method budget at sf1's
    // plane count and the whole projection stage runs interpreted —
    // measured 6.9 -> 2.5 s at sf1 when collapsed to the single kernel
    // sim_knn_graph's registry entry is the SHARED artifact (its plan is
    // the checkpointed leaf once pinned) — the kernel contract holds on
    // the builder, so assert against knnGraph directly
    val plans = Seq(
      "dedup_embedding_lsh_multi" -> planString(q("dedup_embedding_lsh_multi")),
      "sim_knn_graph(builder)" ->
        planString(graft.functions.Similarity.knnGraph(spark, dir)),
      "sim_lsh_buckets" -> planString(q("sim_lsh_buckets")))
    for ((name, plan) <- plans) {
      assert(plan.contains("lsh_bucket_pack"), s"$name: $plan")
      // column-vs-column dots (candidate distances) are fine; the
      // anti-pattern is the dot-vs-plane-LITERAL bucketing term
      assert("long_array_dot\\(q#\\d+, \\[".r.findFirstIn(plan).isEmpty,
        s"$name still composes per-plane dot-vs-literal terms for bucketing")
    }
  }

  test("train manifest: one cluster-map branch (split is a projection, not a second anti-join)") {
    // the cluster map's singleton anti-join must appear ONCE — the
    // split derives from cluster_id on the canonical row, not from a
    // second splitOfClusters branch re-executing the union/anti-join
    val plan = planString(q("pipeline_train_manifest"))
    val antiJoins = "LeftAnti".r.findAllIn(plan).length
    // 1 when the manifest builds the cluster map inline; 0 when the
    // session-shared artifact is already pinned (the map arrives as a
    // checkpointed leaf) — never a second splitOfClusters branch
    assert(antiJoins <= 1, s"expected <=1 cluster-map anti-join, got $antiJoins:\n$plan")
  }

  // registry-WIDE version of this census lives in CensusSpec; this
  // alias keeps the SQL-surface contract below reading locally
  private def codegenFallbacks(df: DataFrame): Seq[String] =
    PlanAudit.codegenFallbacks(df)

  test("llm_sql_surface: SQL-text fingerprint pass is one narrow projection, no shuffle") {
    val df = q("llm_sql_surface")
    assert(countShuffles(df) === 0, planString(df))
    val plan = planString(df)
    for (fn <- Seq("md5_prefix60", "simhash_fp", "minhash_sig", "word_shingles"))
      assert(plan.contains(fn), s"$fn missing from plan:\n$plan")
  }

  test("SQL-text surface queries carry ZERO CodegenFallback expressions") {
    // the r13 kernel wave's rule — no interpreted HOF in a per-row hot
    // path — now closed at the SQL string boundary too: the registered
    // `tokenize` / `struct_sort_project` kernels replace the
    // filter(split(...)) tokenizer CTE and the transform(array_sort(...))
    // rebuild, so a SQL-only consumer gets the same fully-codegen plan
    // the Scala API builds
    for (name <- Seq("llm_sql_surface", "llm_sql_surface_remove",
        "dws_sql_surface", "dedup_substring_remove")) {
      val fb = codegenFallbacks(q(name))
      assert(fb.isEmpty, s"$name has interpreted expressions: ${fb.mkString(", ")}")
    }
  }

  test("llm_sql_surface_remove: SQL-text removal pass keeps the Scala plan shape") {
    val df = q("llm_sql_surface_remove")
    val plan = planString(df)
    // the text round-trip must not degrade the two hinted hash joins
    // into a nested loop / cartesian, and the registered kernels must
    // appear (tokenize+shingle+fingerprint run engine-side, not as UDFs)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
    for (fn <- Seq("md5_prefix60", "word_shingles"))
      assert(plan.contains(fn), s"$fn missing from plan:\n$plan")
  }

  test("llm_sql_surface_remove equals the Scala removal pass value-for-value") {
    val sqlRows = q("llm_sql_surface_remove")
      .orderBy("doc_id").collect().toSeq
    val scalaRows = q("dedup_substring_remove")
      .orderBy("doc_id").collect().toSeq
    assert(sqlRows === scalaRows)
  }

  test("native as-of join plans AsOfJoinExec with clustered+sorted children") {
    val plan = planString(q("j8_asof_native"))
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("SQL asof_match marker compiles to AsOfJoinExec, never a nested loop") {
    // the pure-SQL surface must reach the same native operator as the
    // Scala API — a missed rewrite would leave an unevaluable marker in
    // a BroadcastNestedLoopJoin condition
    val plan = planString(q("j8_asof_sql"))
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("SQL range_bin_match marker plans a binned equi join, never a nested loop") {
    // the raw range predicate would plan as BNLJ — the marker rewrite
    // must turn it into a hash/sort-merge join on the bin key with the
    // interval side exploded
    val plan = planString(q("j11_range_sql"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Generate explode"), plan)
  }

  test("sampling filters and int8 quantization are pure narrow plans (zero shuffles)") {
    // hash-deterministic sampling/mixing and vector quantization must
    // stay embarrassingly parallel — a shuffle here would be a bug
    assert(countShuffles(q("sample_stratified")) == 0)
    assert(countShuffles(q("pipeline_mix_sources")) == 0)
    assert(countShuffles(q("embed_int8")) == 0)
  }

  test("salted skew join: shuffled two-phase shape, small side exploded not broadcast") {
    val plan = planString(q("j9_salted_skew_join"))
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
    // salt expansion of the small side survives into the physical plan
    assert(plan.contains("Generate explode"), plan)
  }

  test("disjunctive join predicate factors to an equi-join, never a nested loop") {
    // OR-of-ANDs across both sides of l ⋈ p: Catalyst must extract the
    // common l_partkey = p_partkey equi-key and leave the disjunction as
    // a residual — a cross-product nested loop here would be quadratic
    // at scale
    val plan = planString(q("q19_disjunctive"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("bigram LM join is shuffle-hash on the bigram key, LM side never broadcast") {
    // the LM table is bigram-type-sized (vocab²) — not driver-bounded at
    // web scale; the scoring join must shuffle, only the 1-row V scalar
    // may broadcast
    val plan = planString(q("text_lm_score"))
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("EXISTS census aggregates the fact side below the join; NOT EXISTS plans a LeftAnti") {
    // q4's EXISTS(shipdate > orderdate+30) is rewritten to
    // max(shipdate) > orderdate+30: lineitem must collapse to one row
    // per orderkey BEFORE the join (map-side combinable), and the raw
    // fact scan must never be the broadcast build side — the literal
    // LeftSemi form broadcast pruned lineitem at every tested SF
    val semiPlan = q("q4_order_priority").queryExecution.optimizedPlan.toString
    val aggIdx = semiPlan.indexOf("Aggregate [l_orderkey")
    val joinIdx = semiPlan.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && aggIdx > joinIdx,
      s"expected per-orderkey aggregate below the join:\n$semiPlan")
    val anti = planString(q("q22_idle_customers"))
    assert(anti.contains("LeftAnti"), anti)
    // the global-average scalar collapses to a single-row broadcast,
    // never a shuffle of the customer table against itself
    assert(anti.contains("BroadcastNestedLoopJoin") ||
      anti.contains("BroadcastHashJoin"), anti)
  }

  test("funnel step filters reach the scan; retention plans no distinct-Expand") {
    // each funnel pass must read a step-sized slice, not the firehose
    val funnel = q("events_funnel").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(funnel.contains("EqualTo(event_type,view)") &&
      funnel.contains("EqualTo(event_type,click)") &&
      funnel.contains("EqualTo(event_type,purchase)"), funnel)
    // distinct (user, day) FIRST, plain counts after — a countDistinct
    // in the wide rollup would plan the Expand
    val retention = planString(q("retention_cohorts"))
    assert(!retention.contains("Expand"), retention)
    assert(!planString(q("pipeline_end_to_end")).contains("Expand"))
  }

  test("OHLC downsample stays a hash aggregate (decimal-packed min_by order, never SortAggregate)") {
    // a struct-ordered min_by/max_by demotes the plan to SortAggregate —
    // a per-partition sort of the fact table; the packed decimal order
    // must keep the single-pass hash shape
    val plan = planString(q("ts_ohlc_downsample"))
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("group-HAVING semi-join (q18): lineitem aggregates BEFORE joining orders") {
    // the HAVING aggregate must reduce lineitem to per-order rows ahead
    // of the orders join — joining first would shuffle the full fact⋈fact
    val plan = q("q18_large_orders").queryExecution.optimizedPlan.toString
    val aggIdx = plan.indexOf("Aggregate")
    val joinIdx = plan.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && aggIdx > joinIdx,
      s"expected aggregate below the join in the optimized plan:\n$plan")
  }

  test("incremental dedup probes the band index by SHUFFLE, never broadcasting a corpus side") {
    // both sides of the index join derive from the corpus — at snapshot
    // scale neither fits a broadcast; the pinned shuffle_hash must hold
    val plan = planString(q("dedup_incremental"))
    assert(plan.contains("ShuffledHashJoin"), plan)
    val sides = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(sides == 0, s"corpus-derived side broadcast ($sides):\n$plan")
  }

  test("bpe_apply: the vocab broadcasts onto the token stream (corpus side never shuffles to the join)") {
    val plan = planString(q("bpe_apply"))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q8 market share: dims broadcast, facts never nested-loop") {
    val plan = planString(q("q8_market_share"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("un-hinted scaling dims (customer, part) still broadcast via STATS at test scale") {
    // orderWide no longer forces broadcast(part)/broadcast(customer); at
    // sf0.001 file-size stats are far under the threshold, so Catalyst
    // must pick BroadcastHashJoin for every dim join on its own — proving
    // the plan adapts by size rather than by hint (at warehouse scale the
    // same query degrades those two joins to shuffles instead of OOMing)
    val plan = planString(q("j4_order_wide"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast dim joins, got $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("q9: part-family filter reaches the part scan; every join broadcasts onto the fact") {
    val plan = q("q9_product_profit").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // name-substring predicate pushed to the part file, not evaluated
    // post-scan over the whole catalog
    assert(plan.contains("StringContains(p_name,gear)"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q20: ship-year window pushed to the lineitem scan") {
    val plan = q("q20_dominant_suppliers").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"), plan)
  }

  test("ntile: exactly one keyed exchange (the window partition), no extra sort passes") {
    assert(countShuffles(q("window_ntile")) == 1)
  }

  test("corr: one scan, one aggregation exchange, no distinct-Expand") {
    val df = q("agg_corr_exact")
    assert(countShuffles(df) == 1)
    // the five moment sums are plain aggregates — a count(DISTINCT)-style
    // Expand would multiply every fact row per aggregate path
    assert(!planString(df).contains("Expand"), planString(df))
  }

  test("basket pairs: no self-join anywhere below the pair aggregate") {
    // the basket array + narrow HOF expansion replaces the (order, part)
    // self-join; the only joins left are the catalog-bounded lift
    // lookups, which must broadcast
    // the registry entry returns the eagerly-pinned 100-row checkpoint
    // (so the support cache can be released); the contract lives on the
    // pre-checkpoint plan the split-out builder exposes
    val (lazyPlan, stats) =
      graft.operators.AnalyticsOps.basketLiftPairsPlan(spark, dir)
    val plan = planString(lazyPlan)
    stats.unpersist(blocking = false)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan)
  }

  test("basket pairs: one basket pass — every reader scans the persisted support table") {
    // the support/per-part/total readers filter on grouping keys; those
    // filters push through the aggregate and make the branch subtrees
    // canonically different, so without the persist the
    // scan + collect_set + explode pipeline plans (and executes) once
    // PER BRANCH — four lineitem scans, measured 6.9 s at sf1
    val (df, stats) =
      graft.operators.AnalyticsOps.basketLiftPairsPlan(spark, dir)
    val plan = df.queryExecution.executedPlan
    val inner = plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(plan)
    val fileScans = inner.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.isEmpty,
      s"a reader bypassed the persisted support table:\n$inner")
    val imrScans = inner.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(imrScans.size >= 4, // pairs + n_a + n_b + total
      s"expected all four readers on the cached relation, got ${imrScans.size}:\n$inner")
    stats.unpersist(blocking = false)
  }

  test("threshold sweep: the 7-row threshold table is the BNLJ build side, never the pair set") {
    // the sweep's non-equi join is inner precisely so the broadcast()
    // hint on the threshold table is BINDING (outer non-equi joins
    // cannot force the build side); if a stats change ever flipped the
    // build side onto the scaling pair relation, this pins it
    val plan = planString(q("dedup_threshold_sweep"))
    // scope to the jaccard-vs-threshold join: the candidate subtree
    // legitimately contains 1-row-bound BNLJs (the df-cap scalar)
    val sweepJoins = "BroadcastNestedLoopJoin Build\\w+, \\w+, \\(jaccard".r
      .findAllIn(plan).toSeq
    assert(sweepJoins.nonEmpty, s"sweep non-equi join missing:\n$plan")
    assert(sweepJoins.forall(_.contains("BuildLeft, Inner")),
      s"the scaling pair side must never be the build side: $sweepJoins\n$plan")
    // the zero-row restore is a 7x7 equi join — broadcast, not SMJ
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("temperature mix: the corpus draw is a broadcast-rate filter, never a corpus shuffle") {
    // two keyed exchanges exist (per-source aggregate + its total);
    // both are source-bounded. The documents side itself must reach
    // the filter through a BroadcastHashJoin, not an exchange.
    val plan = planString(q("sample_temperature"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("linear attribution: range join keyed on user, never a nested loop") {
    val plan = planString(q("j15_linear_attribution"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("EWMA: fact shuffles once into the rollup; the window re-keys only day rows") {
    // exactly two keyed exchanges, by design: the (type, day) rollup
    // hash carries the fact with map-side combine; the event_type
    // window exchange moves only the day-level aggregate (~days×types
    // rows). Keying the FACT by event_type instead would funnel the
    // full table through ~5 partitions — the wrong trade at scale.
    assert(countShuffles(q("ts_ewma")) == 2)
  }

  test("percent_rank/cume_dist: exactly one keyed exchange") {
    assert(countShuffles(q("window_percent_rank")) == 1)
  }

  test("path analysis: session windows and prefix rank share the user exchange") {
    // expected keyed exchanges: the user-keyed window pass (1), the
    // (user, session) path aggregate reusing it... plus (path, user)
    // and path rollups + the top-50 singleton = bounded small-data
    // exchanges. The contract: no join anywhere (pure window+agg), and
    // the user window pass is ONE exchange, not one per window.
    val df = q("events_path_analysis")
    val plan = planString(df)
    assert(!plan.contains("Join"), plan)
    assert(countShuffles(df) <= 4, plan)
  }

  test("zone maps: bounds and predicate box broadcast, shard rollups never join fact-to-fact") {
    val plan = planString(q("layout_zonemap_prune"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("triangle count: wedge and closure joins shuffle on edge keys, edge set never broadcast") {
    // the edge relation scales with the corpus — it must reach the
    // wedge/closure joins via keyed exchanges, not a broadcast of a
    // corpus-sized side (1-row bounds broadcasts are fine elsewhere)
    val plan = planString(q("graph_triangle_count"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("stats argmax folds are ObjectHashAggregate, never SortAggregate") {
    // max(struct(...)) would silently plan SortAggregate (structs have
    // no mutable buffer) and sort the whole key histogram / cent
    // domain — the OHLC lesson at the fold edge; the bounded heap
    // keeps the hash shape
    Seq("stats_join_cardinality", "stats_ks_drift").foreach { name =>
      val plan = planString(q(name))
      assert(!plan.contains("SortAggregate"), s"$name:\n$plan")
      assert(plan.contains("ObjectHashAggregate"), s"$name:\n$plan")
    }
  }

  test("join-cardinality histograms join shuffle-side, never broadcast") {
    // both count histograms are fact-key-sized — not driver-bounded
    val plan = planString(q("stats_join_cardinality"))
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("inverted index: postings capped by the heap, no rank window") {
    val plan = planString(q("ir_inverted_index"))
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("PMI pairs: generation is narrow; unigram joins shuffle-hash, not broadcast") {
    val plan = planString(q("text_cooccurrence_pmi"))
    // the vocabulary-sized unigram table must not broadcast; the two
    // 1-row totals may
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastNestedLoopJoin BuildRight, Inner"), plan)
  }

  test("bitmap rollup: two keyed exchanges (hour build, day union), hash aggregates") {
    val df = q("dws_uv_bitmap_rollup")
    assert(countShuffles(df) === 2, planString(df))
    assert(!planString(df).contains("SortAggregate"), planString(df))
  }

  test("gram matrix: one scan, partial array-sum aggregation, no extra exchange") {
    val df = q("embed_gram_matrix")
    val plan = planString(df)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(countShuffles(df) <= 1, "gram must shuffle only the 1-row partials")
    assert(!plan.contains("SortAggregate"), "array-sum agg demoted to SortAggregate")
  }

  test("RAKE ends in a bounded TakeOrderedAndProject, not a global sort") {
    val plan = planString(q("text_keyphrase_rake"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("scan-side IR retrieval is ZERO-shuffle up to its bounded top-k") {
    // phrase/proximity answer per document inside the scan (the wave-3b
    // phrase_hits/prox_stats kernels); only the top-k leaves the stage.
    // A positional-postings self-join would shuffle two corpus-sized
    // streams to answer the same question — this pin keeps that plan
    // from ever coming back, and keeps the kernels inside a
    // WholeStageCodegen span ending in TakeOrderedAndProject
    for (name <- Seq("ir_phrase_search", "ir_proximity_search")) {
      val df = q(name)
      assert(countShuffles(df) === 0, s"$name gained a shuffle")
      val plan = planString(df)
      assert(plan.contains("TakeOrderedAndProject"), plan)
      // "*(n)" is how toString renders a WholeStageCodegen span — the
      // kernels must sit inside one, not on an interpreted path
      assert(plan.contains("*("), plan)
    }
    // readability and int8 quantization are pure narrow passes: no
    // shuffle at all (no top-k either — one output row per input row)
    for (name <- Seq("text_readability", "embed_int8")) {
      assert(countShuffles(q(name)) === 0, s"$name gained a shuffle")
    }
  }

  test("budget fill windows per source, never an empty-frame global window") {
    val df = q("pipeline_budget_fill")
    val inner = {
      val p = df.queryExecution.executedPlan
      p.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }.getOrElse(p)
    }
    val windows = inner.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "window without PARTITION BY = single-task funnel"))
  }

  test("bot census is two hash aggregations sharing the user_id partitioning") {
    val df = q("dq_bot_users")
    assert(countShuffles(df) <= 2)
    assert(!planString(df).contains("WindowExec"), "burst census must not window raw events")
  }

  test("calibration bins keep the classifier's argmax a hash aggregate") {
    val plan = planString(q("eval_calibration_bins"))
    assert(!plan.contains("SortAggregate"), plan.linesIterator.take(30).mkString("\n"))
  }

  test("q2 min-cost lookup: decorrelated to one aggregate pass, fact never broadcast") {
    val df = q("q2_min_cost_region")
    val plan = planString(df)
    // the correlated "= (SELECT min ...)" must NOT plan as a window over
    // the cost grid or a fact-side broadcast: the cost grid and its
    // per-part min both hash-shuffle on partkey
    assert(!plan.contains("WindowExec"), "correlated min must be an aggregate, not a window")
    // every BroadcastExchange input is dim-sized: supplier dim star and
    // nothing derived from lineitem (the fact). The lineitem scan feeds
    // only hash aggregates + shuffled joins.
    val inner = df.queryExecution.executedPlan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(df.queryExecution.executedPlan)
    val badBroadcast = inner.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
          if b.child.toString.contains("lineitem") => b
    }
    assert(badBroadcast.isEmpty, "fact-derived subtree under a BroadcastExchange")
  }

  test("empty-frame windows sit only above aggregated (bounded) frames") {
    // r16 replaced corpus-subtree replay in eval_source_drift /
    // pipeline_dsir_exact_stats with Window.partitionBy() sums — safe
    // ONLY because the window input is an already-aggregated frame
    // bounded by construction (sources × 1024 buckets / 1024-row
    // histogram). An empty-frame window over an UNaggregated input
    // moves the whole dataset to one partition — the classic
    // scale-killer this pin exists to catch (r16 VERDICT item 3).
    import org.apache.spark.sql.execution.SparkPlan
    def unwrap(p: SparkPlan): SparkPlan = p.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(p)
    def isAgg(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _ => false
    }
    for (name <- Seq("eval_source_drift", "pipeline_dsir_exact_stats")) {
      val plan = unwrap(q(name).queryExecution.executedPlan)
      val emptyPartWindows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(emptyPartWindows.nonEmpty, s"$name: expected empty-frame windows")
      emptyPartWindows.foreach { w =>
        // every path from the window to a leaf must cross an aggregate
        // BEFORE reaching any scan: the window input is aggregated rows
        def boundedBelow(p: SparkPlan): Boolean =
          if (isAgg(p)) true
          else if (p.children.isEmpty) false
          else p.children.forall(boundedBelow)
        assert(boundedBelow(w.child),
          s"$name: empty-frame window over an unaggregated input:\n$w")
      }
    }
  }
}
