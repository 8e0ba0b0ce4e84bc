package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import org.apache.spark.sql.graftexpr.LongArraySumAgg

/** Distributed Lloyd k-means over the quantized embedding space — the
  * trained-codebook counterpart of the deterministic first-K stand-ins
  * the IVF/PQ paths seed with ([[Similarity]]). Everything runs in
  * EXACT integer arithmetic so results are bit-identical across engines
  * and runs:
  *
  *  - vectors are [[Dedup.quantized]] `array<bigint>` (floor(x·1e6));
  *  - assignment is an integer argmin of ‖q−c‖² = |q|² − 2·q·c + |c|²
  *    over the broadcast centroid row, lowest-cid tiebreak — the same
  *    broadcast-argmin shape as [[Similarity]]'s cell ranking;
  *  - the recompute step is `long_array_sum` / count with TRUNCATING
  *    integer division (Spark `div` ≡ DuckDB `//` on BIGINT — both
  *    round toward zero), so centroids stay exact integers.
  *
  * Scale shape per iteration: one narrow pass over the corpus (argmin
  * against K broadcast centroids) into one partial aggregation keyed by
  * cluster — the shuffle carries `clusters × dims × 8 B` buffers, never
  * vectors. At 100 TB that is the textbook mini-batch-free Lloyd layout;
  * iteration count is a constant ([[Iters]]), so the whole training is
  * [[Iters]] map-reduce rounds with no driver-side data loops.
  *
  * A cluster that loses every member simply drops out of the centroid
  * set (standard Lloyd without empty-cluster repair); deterministic, and
  * the oracle replays it identically via inner-join semantics.
  */
object Clustering {

  /** Cluster count: seeded from vectors `vec_id < K` (the deterministic
    * seed stance shared with the IVF/PQ codebooks).
    */
  val K = 8

  /** Lloyd iterations — fixed so the unrolled oracle replay is finite. */
  val Iters = 3

  import org.apache.spark.sql.Column

  /** Corpus projection the argmin scans (|q|² now lives inside the
    * centroid_rank kernel, so no norm column rides along).
    */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Dedup.quantized(spark, dir).select(col("vec_id"), col("q"))

  /** Collect centroids (cid, cv) into the ONE broadcast row the argmin
    * scans; collect_list order is irrelevant because argmin is
    * order-independent.
    */
  private def centRow(cents: DataFrame): DataFrame = {
    import graft.plans.ArrayOps._
    cents.select(struct(col("cid"), col("cv"),
        longArrayNormSq(col("cv")).as("cnorm2")).as("c"))
      .agg(collect_list(col("c")).as("cents"))
  }

  /** struct(s, cid) of the nearest centroid: exact-integer argmin with
    * lowest-cid tiebreak (s = |q|² − 2·q·c + |c|²). The codegen'd
    * [[org.apache.spark.sql.graftexpr.CentroidKernel]] — the
    * `array_sort(transform(...))` tower it replaces ran interpreted per
    * corpus row (CentroidExprSpec pins the equivalence; |q|² is
    * computed inside the kernel, so the `qnorm` column is no longer
    * read here).
    */
  private val nearest: Column = element_at(
    graft.plans.ArrayOps.centroidRank(col("q"), col("cents"), 1, addQNorm = true), 1)

  /** One Lloyd step: assign, then exact integer mean per cluster.
    * Returns (cid, cv, n).
    */
  private def step(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.join(broadcast(centRow(cents)), lit(true))
      .withColumn("cluster", nearest.getField("cid"))
      .groupBy(col("cluster"))
      .agg(LongArraySumAgg.column(col("q")).as("sv"),
        count(lit(1)).as("n"))
      .select(col("cluster").as("cid"),
        expr("transform(sv, x -> x div n)").as("cv"), col("n"))

  /** Centroids (with membership counts) after [[Iters]] Lloyd rounds. */
  private def trained(spark: SparkSession, dir: String): DataFrame = {
    val corpus = vecs(spark, dir)
    val seed = corpus.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cv"))
    (1 to Iters).foldLeft(seed.withColumn("n", lit(0L))) {
      case (cents, _) => step(corpus, cents.select(col("cid"), col("cv")))
    }
  }

  /** `cluster_kmeans_centroids`: one row per surviving cluster — member
    * count plus exact centroid summaries (position-weighted checksum,
    * min, max) so the gate compares scalar columns, not arrays.
    */
  def kmeansCentroids(spark: SparkSession, dir: String): DataFrame =
    trained(spark, dir).select(
      col("cid").as("cluster"), col("n"),
      expr("""aggregate(zip_with(cv,
          |  sequence(CAST(1 AS BIGINT), CAST(size(cv) AS BIGINT)),
          |  (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
        .stripMargin).as("checksum"),
      array_min(col("cv")).as("c_min"),
      array_max(col("cv")).as("c_max"))

  /** `cluster_kmeans_assign`: final assignment of every vector against
    * the trained centroids — (vec_id, cluster, dist2), all exact BIGINT.
    */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .join(broadcast(centRow(trained(spark, dir).select(col("cid"), col("cv")))),
        lit(true))
      .withColumn("near", nearest)
      .select(col("vec_id"), col("near.cid").as("cluster"),
        col("near.s").as("dist2"))

  /** `cluster_kmeans_inertia`: per-cluster within-cluster sum of squared
    * distances to the trained centroid — THE quality metric a k-means
    * deployment tracks (elbow curves, drift alerts). One map-side-
    * combined aggregate over the [[kmeansAssign]] relation: exact
    * BIGINT inertia, member count, and the mean as an exact IEEE
    * division. Nothing new shuffles — the assignment is already a
    * narrow broadcast-argmin pass.
    */
  def kmeansInertia(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(spark, dir)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("inertia"),
        (sum(col("dist2")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_dist2"))

  /** Fixed-point scale of the per-point silhouette: s·10⁴ stays within
    * BIGINT against the worst-case quantized d2 (64 dims × (2·10⁶)² ≈
    * 2.6·10¹⁴; ×10⁴ = 2.6·10¹⁸ < 2⁶³−1), where the ppm scale the other
    * fixed-point ops use would overflow.
    */
  val SilScale = 10000L

  /** `cluster_silhouette`: per-cluster SIMPLIFIED silhouette — for each
    * point, a² = d² to its own centroid (the argmin), b² = d² to the
    * nearest OTHER centroid, s = (b²−a²)/b² ∈ [0,1] (b² ≥ a² by argmin-
    * hood, so no sign cases). The centroid-based form deliberately —
    * classic silhouette needs all-pairs distances within and across
    * clusters, O(n²) at any scale; against broadcast centroids it is the
    * SAME narrow pass as assignment (b² is just the sorted argmin
    * array's second element), which is why it is the variant production
    * clustering QA actually computes.
    *
    * Exact-integer stance: s is kept as the truncating fixed-point
    * `(b²−a²)·SilScale div b²` so the per-cluster SUM is an exact BIGINT
    * (a float silhouette summed in partial aggregation order would not
    * hash-match any oracle); the mean is a single IEEE division at the
    * end. b² = 0 (point coincident with two centroids) scores 0.
    */
  def kmeansSilhouette(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .join(broadcast(centRow(trained(spark, dir).select(col("cid"), col("cv")))),
        lit(true))
      .withColumn("ds",
        graft.plans.ArrayOps.centroidRank(col("q"), col("cents"), 2, addQNorm = true))
      .select(col("vec_id"),
        expr("element_at(ds, 1).cid").as("cluster"),
        expr("element_at(ds, 1).s").as("a2"),
        expr("element_at(ds, 2).s").as("b2"))
      .withColumn("sil", when(col("b2") === 0L, lit(0L))
        .otherwise(expr(s"((b2 - a2) * $SilScale) div b2")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("sil")).as("sum_sil_e4"),
        (sum(col("sil")).cast("double") / count(lit(1)).cast("double")
          / lit(SilScale.toDouble)).as("mean_sil"))

  /** `cluster_label_centroids`: class prototypes and their pairwise
    * separation — the per-LABEL centroid (supervised counterpart of the
    * learned k-means codebook) plus the cosine between every label
    * pair, the confusion-risk matrix SemDeDup-style pruning and
    * prototype classifiers read before trusting a label column.
    *
    * Exact stance: centroids are truncating integer means of the
    * quantized vectors (`long_array_sum` partials / `div`), identical
    * to the k-means recompute step, so prototypes are exact BIGINT
    * arrays; each pair's cosine is one double expression over exact
    * integer dot/norms.
    *
    * Scale shape: ONE corpus pass (partial aggregation keyed by the
    * bounded label domain — the shuffle carries |labels|·dims·8 B, no
    * vectors); the pairwise stage folds the centroid table into a
    * single collected row and explodes its |labels|² bounded pairs —
    * dimension-sized work, no join of scaling tables anywhere.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.ArrayOps._
    val cents = Dedup.quantized(spark, dir)
      .groupBy(col("label").cast("bigint").as("label"))
      .agg(LongArraySumAgg.column(col("q")).as("sv"),
        count(lit(1)).as("n"))
      .select(col("label"), col("n"),
        expr("transform(sv, x -> x div n)").as("cv"))
      .withColumn("cnorm2", longArrayNormSq(col("cv")))
    cents
      .select(struct(col("label"), col("n"), col("cv"), col("cnorm2")).as("c"))
      .agg(collect_list(col("c")).as("cs"))
      .select(explode(expr(
        """flatten(transform(array_sort(cs), (a, i) ->
          |  transform(slice(array_sort(cs), i + 2, size(cs) - i - 1),
          |    b -> struct(a.label AS label_a, b.label AS label_b,
          |                a.n AS n_a, b.n AS n_b,
          |                long_array_dot(a.cv, b.cv) AS dot,
          |                a.cnorm2 AS na2, b.cnorm2 AS nb2))))"""
          .stripMargin)).as("p"))
      .select(col("p.label_a").as("label_a"), col("p.label_b").as("label_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"),
        (col("p.dot").cast("double") /
          (sqrt(col("p.na2").cast("double")) *
            sqrt(col("p.nb2").cast("double")))).as("cos_ab"))
  }

  /** `embed_gram_matrix`: the exact second-moment (Gram) matrix of the
    * quantized embedding corpus — G[i][j] = Σ_v q_i(v)·q_j(v) — the
    * one-pass sufficient statistic behind PCA whitening, covariance
    * shrinkage and OPQ rotation fitting: once G (and the dim sums, its
    * first-moment sibling) exists, the 100 TB corpus never needs to be
    * re-read to fit any of them.
    *
    * Scale shape: each row maps to its dims² outer product (a narrow
    * codegen'd nested transform — no explode, no dims²-row blowup) and
    * ONE `long_array_sum` partial aggregation folds the corpus to a
    * single dims²-long buffer; the shuffle carries dims²·8 B per map
    * partition, independent of corpus size — the k-means-update shape
    * ([[step]]) applied to moment collection. Integer-exact: |q| ≤
    * 2·10⁶ ⇒ a cell overflows only past ~2·10⁶ billion rows (ANSI
    * faults loudly first). Output: (i, j, gram) over the full
    * dims×dims grid, flat index recovered as (k div d, k mod d).
    */
  def gramMatrix(spark: SparkSession, dir: String): DataFrame =
    Dedup.quantized(spark, dir)
      .select(expr("flatten(transform(q, x -> transform(q, y -> x * y)))").as("op"))
      .agg(LongArraySumAgg.column(col("op")).as("g"))
      .withColumn("d", expr("CAST(sqrt(CAST(size(g) AS DOUBLE)) AS BIGINT)"))
      .select($"d", posexplode($"g").as(Seq("k", "gram")))
      .select(expr("CAST(k div d AS BIGINT)").as("i"),
        expr("CAST(k % d AS BIGINT)").as("j"), $"gram")
}
