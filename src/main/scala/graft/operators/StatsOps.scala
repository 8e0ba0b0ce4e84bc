package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Distribution-monitoring and planner-statistics operators — the
  * "is the data still what we trained/planned on" layer a production
  * pipeline runs next to its DWS rollups (reference
  * gmall-realtime/.../app/dws/VisitorStatsApp.java materializes the
  * aggregates but has no drift/skew surface at all; these close that
  * gap Spark-first).
  *
  * Exactness contract shared with the rest of the registry: every
  * statistic is derived from exact integer counts (map-side-combined
  * `groupBy.count`), with at most one floating-point division at the
  * end or an integer ppm (parts-per-million) quotient — so the DuckDB
  * oracle reproduces each value bit-for-bit regardless of partition
  * order.
  */
object StatsOps {

  /** Two-sample Kolmogorov–Smirnov drift statistic between the `value`
    * distributions of purchase vs click events — the standard "did the
    * metric distribution shift" monitor between two event populations
    * (week-over-week or A/B arms use the identical plan with a time
    * predicate instead of a type predicate).
    *
    * D = max_x |F_a(x) - F_b(x)| is computed exactly in integer
    * arithmetic: values quantize to cents, each side reduces to
    * per-cent-value counts (map-side combined — the only corpus-sized
    * pass), and the CDF difference is a cumulative window over the
    * merged DISTINCT-VALUE domain; the maximized gap numerator
    * |cum_a·n_b - cum_b·n_a| stays an exact long (overflow-safe to
    * ~3·10^9 rows per side under ANSI), and only the final ppm scaling
    * divides once in double. Output is the single max row plus the
    * value where the gap peaks (smallest such value on ties).
    *
    * Scale shape: the global-order window runs over the bounded
    * distinct-cent domain (|domain| ≤ value-range × 100, independent of
    * row count), NOT over raw events — the classic histogram-then-CDF
    * decomposition. At 100 TB the corpus pass is still one partial
    * aggregation; only the domain-sized frame is single-partition, and
    * it is dimension-sized by construction.
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val e = events(spark, dir)
      .filter($"event_type".isin("purchase", "click"))
      .select($"event_type", cents.as("v"))
    val hist = e.groupBy($"v")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("ca"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("cb"))
    // one row; joined in as a broadcast so the totals are plan constants
    val totals = e.groupBy()
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("na"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // argmax via the engine's bounded heap (greatest score, SMALLEST id
    // on ties — exactly the smallest-arg-max-value contract), which
    // plans as ObjectHashAggregate; a max(struct(...)) here would fall
    // back to SortAggregate (structs have no mutable buffer) and sort
    // the whole domain. gap_num rides as an exact double (< 2^53 up to
    // ~10^7.5 rows per side; beyond that, pre-scale the counts).
    hist
      .withColumn("cuma", sum($"ca").over(w))
      .withColumn("cumb", sum($"cb").over(w))
      .join(broadcast(totals))
      .select($"v",
        abs($"cuma" * $"nb" - $"cumb" * $"na").as("gap_num"),
        $"na", $"nb")
      .groupBy($"na", $"nb")
      .agg(expr("element_at(top_k_ids(v, CAST(gap_num AS DOUBLE), 1), 1)").as("m"))
      .select(($"m.score" / ($"na".cast("double") * $"nb".cast("double")) *
          1000000.0).as("ks_ppm"),
        ($"m.id".cast("double") / 100.0).as("at_value"),
        $"na".as("n_purchase"), $"nb".as("n_click"))
  }

  /** Bin width (cents) for [[valueHistogram]]. */
  val HistBinCents = 5000L

  /** Equal-width histogram of the event `value` column — the profiling
    * primitive behind every distribution chart and the input to drift
    * checks coarser than [[ksDrift]]. Bins are [[HistBinCents]]-cent
    * wide; each emits exact count, exact cent sum, and the bin share
    * in ppm-from-exact-integers.
    *
    * Scale shape: one map-side-combined aggregation onto the bounded
    * bin domain — the same histogram decomposition as [[ksDrift]],
    * kept as its own op because the binned (not per-distinct-value)
    * form is what dashboards and equi-width pre-bucketing consume.
    */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val e = events(spark, dir).select(cents.as("v"))
    val total = e.agg(count(lit(1)).as("n_total"))
    e.groupBy(RelationalOps.floorDiv($"v", HistBinCents).as("bin"))
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_cents"))
      .join(broadcast(total))
      .select(($"bin" * HistBinCents).as("bin_lo_cents"),
        (($"bin" + 1L) * HistBinCents).as("bin_hi_cents"),
        $"n", $"sum_cents",
        ($"n".cast("double") / $"n_total".cast("double") * 1000000.0)
          .as("share_ppm"))
  }

  /** Several exact distinct counts per day in ONE logical pass —
    * WITHOUT the multi-`countDistinct` Expand trap: Spark rewrites
    * `agg(countDistinct(a), countDistinct(b))` into an Expand that
    * duplicates every input row per distinct aggregate (the measured
    * 14× regression documented on `dws_uv_per_hour_approx` in
    * COVERAGE). Here each distinct folds over its OWN pre-deduplicated
    * projection — (day,user), (day,type) — and the day-keyed results
    * join back to the plain row count; every aggregation is partial,
    * nothing is duplicated.
    */
  def multiDistinctDaily(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(date_format($"ts", "yyyy-MM-dd").as("day"),
        $"user_id", $"event_type")
    val uv = e.select($"day", $"user_id").distinct()
      .groupBy($"day").agg(count(lit(1)).as("uv"))
    val types = e.select($"day", $"event_type").distinct()
      .groupBy($"day").agg(count(lit(1)).as("n_types"))
    val n = e.groupBy($"day").agg(count(lit(1)).as("n_events"))
    n.join(uv, "day").join(types, "day")
  }

  /** Exact Mann–Whitney U / AUC between the purchase and click `value`
    * samples — the rank-based drift test next to [[ksDrift]], and
    * simultaneously the EXACT ROC-AUC of `value` as a
    * purchase-vs-click discriminator (U/(n_a·n_b) IS the AUC), the
    * evaluation statistic every scoring pipeline reports.
    *
    * Tie-corrected and fully integer: with midranks doubled to stay
    * integral, a value v with t_v tied rows contributes
    * ca_v·(2·cum_before(v) + t_v + 1) to 2R_a, so 2U_a =
    * Σ… − n_a(n_a+1) accumulates exactly; the only float op is the
    * final AUC division. Same histogram-then-cumulative decomposition
    * as [[ksDrift]] — the corpus pass is one partial aggregation, the
    * rank walk runs over the bounded distinct-cent domain.
    */
  def rankSumDrift(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val e = events(spark, dir)
      .filter($"event_type".isin("purchase", "click"))
      .select($"event_type", cents.as("v"))
    val hist = e.groupBy($"v")
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("ca"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cumall", sum($"ca" + $"cb").over(w))
      .select($"ca", $"cb",
        ($"ca" * (($"cumall" - ($"ca" + $"cb")) * 2L + ($"ca" + $"cb") + 1L))
          .as("r2a"))
      .groupBy()
      .agg(sum($"ca").as("na"), sum($"cb").as("nb"), sum($"r2a").as("sr2a"))
      .select($"na".as("n_purchase"), $"nb".as("n_click"),
        ($"sr2a" - $"na" * ($"na" + 1L)).as("u2_purchase"),
        ((($"sr2a" - $"na" * ($"na" + 1L)).cast("double")) /
          (lit(2.0) * ($"na".cast("double") * $"nb".cast("double"))))
          .as("auc"))
  }

  /** `stats_stickiness`: per-day DAU / trailing-7-day UV — the growth
    * team's engagement ratio, derived entirely from the two UV series
    * the engine already maintains ([[graft.operators.EventOps]] daily
    * UV, [[TimeSeriesOps.rollingUv]]); day-domain join, one double
    * division.
    */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .select(date_format(to_date($"ts"), "yyyy-MM-dd").as("day"), $"user_id")
      .distinct().groupBy($"day").agg(count(lit(1)).as("dau"))
    TimeSeriesOps.rollingUv(spark, dir)
      .join(daily, "day")
      .select($"day", $"dau", $"uv_7d".as("wau"),
        ($"dau".cast("double") / $"uv_7d".cast("double")).as("stickiness"))
  }

  /** `stats_gini`: exact Gini coefficient of revenue concentration
    * across customers — G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over
    * ascending-sorted per-customer cents. The global rank comes from
    * the [[graft.functions.Sampling.curriculumOrder]] machinery —
    * range exchange + in-partition sort + `zipWithIndex` partition
    * offsets — NOT an empty-over() window, which would sort every
    * customer in one task. Σ i·xᵢ accumulates in DECIMAL(38,0)
    * (headroom: rank·cents ≈ 10⁹·10¹² per row, exact past 10¹⁵
    * customers); the two final divisions are the only doubles.
    */
  def giniRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum((RelationalOps.dec($"o_totalprice") * 100).cast("long"))
        .as("cents"))
    val sorted = cust
      .repartitionByRange($"cents".asc, $"o_custkey".asc)
      .sortWithinPartitions($"cents".asc, $"o_custkey".asc)
    val schema = sorted.schema
      .add("rk", org.apache.spark.sql.types.LongType, nullable = false)
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema)
    ranked
      .agg(count(lit(1)).as("n"),
        sum($"cents".cast("decimal(38,0)")).as("sx"),
        sum(($"rk".cast("decimal(38,0)") * $"cents")).as("srx"))
      .select($"n",
        ($"sx".cast("double") / 100.0).as("total_revenue"),
        (lit(2.0) * $"srx".cast("double") /
          ($"n".cast("double") * $"sx".cast("double")) -
          ($"n" + 1L).cast("double") / $"n".cast("double")).as("gini"))
  }

  /** Trim percent (each tail) for [[trimmedMean]]. */
  val TrimPct = 5L

  /** Exact [[TrimPct]]%-trimmed mean of `value` per event type — the
    * robust central-tendency metric dashboards quote when outliers
    * poison the plain mean. No sampling, no approx-percentile: rank
    * cutoffs are exact integers (keep ranks in
    * [n·p div 100 + 1, n·(100−p) div 100]) and each distinct cent
    * value contributes the exact overlap of its rank run with the kept
    * band — so ties at the cut are handled deterministically, which
    * `percentile_approx`-based trimming is not.
    *
    * Scale shape: the same histogram-then-cumulative decomposition as
    * [[ksDrift]], keyed by event type — per-type windows run over the
    * bounded cent domain.
    */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val hist = events(spark, dir)
      .select($"event_type", cents.as("v"))
      .groupBy($"event_type", $"v").agg(count(lit(1)).as("t"))
    val w = Window.partitionBy($"event_type").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = hist.groupBy($"event_type").agg(sum($"t").as("n"))
    hist
      .withColumn("cum", sum($"t").over(w))
      .join(totals.hint("shuffle_hash"), "event_type")
      .withColumn("lo", expr(s"n * $TrimPct div 100"))
      .withColumn("hi", expr(s"n * ${100 - TrimPct} div 100"))
      .withColumn("kept", greatest(lit(0L),
        least($"cum", $"hi") - greatest($"cum" - $"t" + 1L, $"lo" + 1L) + 1L))
      .groupBy($"event_type")
      .agg(max($"n").as("n"), sum($"kept").as("n_kept"),
        sum($"kept" * $"v").as("sum_kept_cents"))
      .select($"event_type", $"n", $"n_kept",
        ($"sum_kept_cents".cast("double") / $"n_kept".cast("double") / 100.0)
          .as("trimmed_mean"))
  }

  /** Exact precision–recall curve for `value` as a purchase-vs-click
    * score, evaluated at the [[HistBinCents]] bin thresholds — the
    * operating-point table that turns [[rankSumDrift]]'s single AUC
    * into deployable thresholds. At each threshold t: predict
    * "purchase" iff value ≥ t; TP/FP come from cumulative-from-above
    * sums over the bin histogram, so precision and recall are two
    * double divisions over exact integers per row.
    *
    * Scale shape: one corpus pass onto the bounded bin domain; the
    * descending cumulative window runs over bins only.
    */
  def prCurve(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val e = events(spark, dir)
      .filter($"event_type".isin("purchase", "click"))
      .select($"event_type", cents.as("v"))
    val bins = e.groupBy(RelationalOps.floorDiv($"v", HistBinCents).as("bin"))
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("pa"),
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("pb"))
    val totals = e.groupBy()
      .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("na"))
    val w = Window.orderBy($"bin".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("tp", sum($"pa").over(w))
      .withColumn("fp", sum($"pb").over(w))
      .join(broadcast(totals))
      .select(($"bin" * HistBinCents).as("threshold_cents"), $"tp", $"fp",
        ($"tp".cast("double") / ($"tp" + $"fp").cast("double")).as("precision"),
        ($"tp".cast("double") / $"na".cast("double")).as("recall"))
  }

  /** Full-outer reconciliation of two revenue pipelines — daily totals
    * from the order headers vs re-derived from the line items — the
    * audit every dual-sourced warehouse runs to catch silent drift
    * between a rollup and its recompute. Full-outer on the day key so
    * a day present in only ONE pipeline surfaces as a row (coalesced
    * zeros), never vanishes; the known header-vs-lines pricing gap
    * (totalprice carries tax) makes the diff column honestly nonzero,
    * which is exactly what the report is for.
    *
    * Scale shape: each side reduces to day-keyed cents first
    * (map-side-combined; the lineitem side re-keys through its order
    * join on the join key, not the fact); the full-outer joins two
    * day-domain-sized aggregates.
    */
  def reconFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val fromOrders = orders(spark, dir)
      .groupBy($"o_orderdate".as("d"))
      .agg(sum((RelationalOps.dec($"o_totalprice") * 100).cast("long"))
        .as("cents_orders"))
    val fromLines = lineitem(spark, dir)
      .select($"l_orderkey",
        (RelationalOps.dec($"l_extendedprice") * 100).cast("long").as("cents"))
      .join(orders(spark, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderdate".as("d"))
      .agg(sum($"cents").as("cents_lines"))
    fromOrders.join(fromLines, Seq("d"), "full_outer")
      .select(date_format($"d", "yyyy-MM-dd").as("day"),
        coalesce($"cents_orders", lit(0L)).as("cents_orders"),
        coalesce($"cents_lines", lit(0L)).as("cents_lines"))
      .withColumn("diff_cents", $"cents_lines" - $"cents_orders")
  }

  /** Join-cardinality estimate from per-key count histograms — the
    * statistic a cost-based planner (or a human sizing a 100 TB join)
    * needs BEFORE running the join: exact output rows of
    * orders ⋈ lineitem on orderkey as Σ_k cnt_o(k)·cnt_l(k), the
    * heaviest single key's contribution, and the skew ratio of that
    * key against the mean in ppm.
    *
    * Scale shape: both sides reduce to per-key counts first (partial
    * aggregation — the only corpus passes), then the key-count tables
    * join on the key and fold to one row. The join of two count
    * tables shuffles key-histogram-sized data, never fact rows; the
    * output estimate is produced without materializing a single joined
    * fact row. This is exactly how `ANALYZE`-style NDV/skew stats are
    * gathered at scale.
    */
  def joinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val co = orders(spark, dir).groupBy($"o_orderkey".as("k"))
      .agg(count(lit(1)).as("n_o"))
    val cl = lineitem(spark, dir).groupBy($"l_orderkey".as("k"))
      .agg(count(lit(1)).as("n_l"))
    // bounded-heap argmax (see [[ksDrift]]): ObjectHashAggregate, no
    // SortAggregate over the key histogram. The histograms are
    // FACT-KEY-sized (not driver-bounded at 100 TB), so the key join is
    // pinned shuffle-side — auto-broadcast of a per-key histogram is
    // exactly the corpus-sized-broadcast trap
    co.hint("shuffle_hash").join(cl, "k")
      .select($"k", ($"n_o" * $"n_l").as("contrib"))
      .groupBy()
      .agg(sum($"contrib").as("join_rows"),
        count(lit(1)).as("matched_keys"),
        expr("element_at(top_k_ids(k, CAST(contrib AS DOUBLE), 1), 1)").as("m"))
      .select($"join_rows", $"matched_keys",
        $"m.id".as("heaviest_key"),
        $"m.score".cast("bigint").as("heaviest_rows"),
        ($"m.score" * $"matched_keys".cast("double") /
          $"join_rows".cast("double") * 1000000.0).as("skew_ppm"))
  }

  /** Drift-split day for [[psiDrift]]: days before this are the baseline
    * distribution, days on/after are the current one.
    */
  val PsiCutoff = "2024-01-16"

  /** Laplace smoothing pseudo-count per bin in [[psiDrift]]. */
  val PsiSmooth = 1L

  /** `stats_psi_drift`: Population Stability Index inputs between the
    * baseline and current halves of the event-value distribution — THE
    * industry-standard "has the input distribution shifted" monitor
    * (PSI < 0.1 stable, > 0.25 action), complementing [[ksDrift]]'s
    * max-gap statistic with a mass-weighted log-ratio one.
    *
    * Determinism: the ORACLED output is the exact integer sufficient
    * statistic — one row per bin `(bin, cb, cc)` plus the global
    * `(nb, nc, n_bins)` totals, all BIGINT. The scalar PSI needs
    * `ln()`, whose last ulp differs between JVM Math.log and DuckDB
    * libm on some arguments (measured; see the NDCG/Benford log-free
    * reworks), so it is computed engine-side by [[psiValue]] from this
    * exact table and verified by ScalaTest against an independent
    * fold, never hash-compared cross-engine. Bins use floor division
    * ([[RelationalOps.floorDiv]]) so negative values bin identically
    * to DuckDB's `//`.
    *
    * Scale shape: ONE map-side-combined aggregation onto the bounded
    * (bin × side) domain, one bounded-domain regroup, a 1-row totals
    * broadcast back. Output: bin-count rows of exact longs.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"value") * 100).cast("long")
    val binned = events(spark, dir)
      .select((date_format($"ts", "yyyy-MM-dd") < PsiCutoff).as("base"),
        cents.as("v"))
      .groupBy(RelationalOps.floorDiv($"v", HistBinCents).as("bin"), $"base")
      .agg(count(lit(1)).as("n"))
    val wide = binned.groupBy($"bin")
      .agg(sum(when($"base", $"n").otherwise(0L)).as("cb"),
        sum(when(!$"base", $"n").otherwise(0L)).as("cc"))
    val tot = wide.agg(sum($"cb").as("nb"), sum($"cc").as("nc"),
      count(lit(1)).as("n_bins"))
    wide.join(broadcast(tot))
      .select($"bin", $"cb", $"cc", $"nb", $"nc", $"n_bins")
  }

  /** Scalar PSI from [[psiDrift]]'s exact per-bin table, with
    * [[PsiSmooth]] Laplace smoothing (zero-proof denominators
    * `N + smooth·bins` on both sides). Engine-side capability — the
    * one transcendental in the stats family, deliberately OUTSIDE the
    * hash-exact oracle gate (see [[psiDrift]] determinism note).
    */
  def psiValue(spark: SparkSession, dir: String): DataFrame =
    psiDrift(spark, dir)
      .agg(sort_array(collect_list(struct($"bin", $"cb", $"cc"))).as("bs"),
        first($"nb").as("nb"), first($"nc").as("nc"),
        first($"n_bins").as("n_bins"))
      .select($"n_bins", $"nb", $"nc",
        expr(s"""aggregate(bs, CAST(0 AS DOUBLE), (acc, x) -> acc +
          |  (CAST(x.cb + $PsiSmooth AS DOUBLE) / CAST(nb + $PsiSmooth * n_bins AS DOUBLE) -
          |   CAST(x.cc + $PsiSmooth AS DOUBLE) / CAST(nc + $PsiSmooth * n_bins AS DOUBLE)) *
          |  ln(CAST(x.cb + $PsiSmooth AS DOUBLE) * CAST(nc + $PsiSmooth * n_bins AS DOUBLE) /
          |     (CAST(x.cc + $PsiSmooth AS DOUBLE) * CAST(nb + $PsiSmooth * n_bins AS DOUBLE))))
          |""".stripMargin).as("psi"))

  /** `stats_pareto_frontier`: the 2-D skyline of the part catalog —
    * every (retail price, size) point not dominated by a part that is
    * both cheaper-or-equal and larger, with strict improvement in at
    * least one dimension. The classic multi-objective shortlist query
    * (cheapest part at every capability level).
    *
    * No pairwise dominance join: the table collapses to one row per
    * DISTINCT PRICE (max size there, with the point's multiplicity)
    * and the frontier is read off a running max over the price-sorted
    * domain — a point survives iff its size strictly exceeds every
    * cheaper point's max size. O(domain log domain), vs the O(n²)
    * dominance anti-join the textbook formulation plans as a nested
    * loop.
    *
    * Scale shape: two partial aggregations onto bounded domains
    * (price × size grid, then price), one broadcast-sized running-max
    * window over the distinct-price domain — the stats-family
    * bounded-domain-window stance ([[trimmedMean]]).
    */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val priceC = (RelationalOps.dec($"p_retailprice") * 100).cast("long")
    val g = part(spark, dir)
      .select(priceC.as("price_c"), $"p_size".cast("long").as("size"))
      .groupBy($"price_c", $"size").agg(count(lit(1)).as("n"))
    val m = g.groupBy($"price_c").agg(max($"size").as("mx"))
    val pts = g.join(m.hint("shuffle_hash"), Seq("price_c"))
      .filter($"size" === $"mx")
      .select($"price_c", $"size", $"n")
    val w = Window.orderBy($"price_c")
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("prev_mx", max($"size").over(w))
      .filter($"prev_mx".isNull || $"size" > $"prev_mx")
      .select($"price_c", $"size", $"n".as("n_parts"))
  }

  /** Benford expected first-digit shares as INTEGER parts-per-billion,
    * round(10⁹·log10(1 + 1/d)) for d = 1..9 — precomputed once and
    * injected into BOTH engines as shared integer literals (the NDCG
    * lesson taken one step further: not only no query-time
    * transcendental, no shared DOUBLE at all — a double literal kept
    * the χ² term one multiply away from an ulp divergence between
    * Spark codegen and DuckDB, measured on 1 of 9 digits).
    */
    lazy val BenfordExpectedPpb: Seq[Long] =
    (1 to 9).map(d => math.round(1e9 * math.log10(1.0 + 1.0 / d)))

  /** `stats_benford`: first-significant-digit census of order totals
    * against Benford's law — the classic fabricated-numbers screen
    * (auditing, fraud, synthetic-data QA: generator output that fails
    * Benford when the real distribution obeys it is a tell). Reports
    * per digit the exact count, observed share, expected share and the
    * χ² contribution `(n_d − N·e_d)² / (N·e_d)`.
    *
    * Determinism: the digit is the first character of the exact cent
    * count's decimal rendering (never float log10 of the value);
    * shares and χ² terms are single expressions over exact longs and
    * the shared literals, identical on both engines. Per-digit rows —
    * no cross-digit double sum to order.
    *
    * Scale shape: ONE map-side-combined aggregation onto the 9-value
    * digit domain.
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val cents = (RelationalOps.dec($"o_totalprice") * 100).cast("long")
    val eppb = BenfordExpectedPpb.zipWithIndex
      .map { case (e, i) => s"WHEN ${i + 1} THEN ${e}L" }
      .mkString("CASE digit ", " ", " END")
    orders(spark, dir)
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
      .join(broadcast(orders(spark, dir).agg(count(lit(1)).as("nt"))))
      .withColumn("eppb", expr(eppb))
      // dev = 10⁹·n − nt·e_ppb stays an exact decimal; χ² term is
      // dev² over the exact denominator, ONE double division
      .withColumn("dev", ($"n".cast("decimal(38,0)") * 1000000000L -
        $"nt".cast("decimal(38,0)") * $"eppb"))
      .select($"digit", $"n",
        ($"n".cast("double") / $"nt".cast("double")).as("share"),
        ($"eppb".cast("double") / 1000000000.0).as("expected"),
        (($"dev" * $"dev").cast("double") /
          ($"nt".cast("decimal(38,0)") * $"eppb" * 1000000000L)
            .cast("double")).as("chi2_term"))
  }

  /** `stats_cramers_v`: Cramér's V association between event type and
    * day-of-week — "does behavior depend on the weekday" as one
    * normalized [0,1] number, the categorical-categorical counterpart
    * of [[psiDrift]]'s numeric drift. χ² is computed from exact
    * integers — cell term = (o·N − r·c)² / (N·r·c), numerator an
    * exact decimal, ONE double division per cell — summed over the
    * bounded (type × dow) grid in cell order (the χ² fold), and
    * V = sqrt(χ²/(N·min(r−1,c−1))) costs one IEEE sqrt (correctly
    * rounded, engine-safe — unlike log).
    *
    * Scale shape: one map-side-combined aggregation onto the bounded
    * contingency grid; margins re-aggregate the CELLS, never the
    * corpus; the fold runs on a single row.
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = events(spark, dir)
      .groupBy($"event_type",
        pmod(datediff(to_date($"ts"), lit("1970-01-05")), lit(7)).as("dow"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy($"event_type").agg(sum($"o").as("r"))
    val colsM = cells.groupBy($"dow").agg(sum($"o").as("c"))
    val n = cells.agg(sum($"o").as("nn"),
      count_distinct($"event_type").as("nr"),
      count_distinct($"dow").as("nc"))
    cells.join(rows.hint("broadcast"), "event_type")
      .join(colsM.hint("broadcast"), "dow")
      .join(broadcast(n))
      .select(struct($"event_type", $"dow",
          (($"o" * $"nn" - $"r" * $"c").cast("decimal(38,0)") *
            ($"o" * $"nn" - $"r" * $"c")).as("num2"),
          ($"nn".cast("decimal(38,0)") * $"r" * $"c").as("den")).as("cell"),
        $"nn", $"nr", $"nc")
      .groupBy($"nn", $"nr", $"nc")
      .agg(sort_array(collect_list($"cell")).as("cs"))
      .select($"nn".as("n"),
        expr("""aggregate(cs, CAST(0 AS DOUBLE), (a, x) ->
          a + CAST(x.num2 AS DOUBLE) / CAST(x.den AS DOUBLE))""").as("chi2"),
        $"nr", $"nc")
      .select($"n", $"chi2",
        sqrt($"chi2" / ($"n".cast("double") *
          least($"nr" - 1, $"nc" - 1).cast("double"))).as("cramers_v"))
  }
}
