package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import Hashing._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two paths, same interface:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    At scale this is queries × corpus, so it is only for small query
  *    sets (the corpus side stays distributed; the query side
  *    broadcasts).
  *  - [[lshTopK]]: random-hyperplane LSH buckets (sign bits of integer
  *    projections), then exact scoring within the bucket only — the
  *    100 TB path: candidate generation is a bucket equi-join, i.e. one
  *    shuffle on an 8-bit key, no cross product.
  *
  * Cosine is computed on scalar-quantized vectors ([[Dedup.quantized]])
  * so scores are exact-integer-derived and engine-independent.
  */
object Similarity {

  val NumQueries = 8
  val TopK = 10
  val NumPlanes = 8
  val Dim = 64

  import graft.plans.ArrayOps._

  private def withNorm(df: DataFrame, vecCol: String, prefix: String): DataFrame =
    df.withColumn(s"${prefix}norm", longArrayNormSq(col(vecCol)))

  /** Exact cosine top-k: query vectors (vec_id < NumQueries) joined
    * against the whole corpus; rank by cosine desc with vec_id tiebreak.
    * The query side is tiny → broadcast; corpus scan stays partitioned.
    */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = Dedup.quantized(spark, dir).select($"vec_id", $"q")
    val queries = withNorm(q.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"q".as("qv")), "qv", "q")
    // corpus side hash-spread before the corpus × queries scan (the
    // single-file scan would otherwise score every pair in one task;
    // explicit count so AQE doesn't coalesce the tiny input back to one)
    val corpus = withNorm(q.select($"vec_id", $"q"), "q", "c")
      .repartition(spark.sparkContext.defaultParallelism, $"vec_id")
    val scored = corpus.join(broadcast(queries), $"query_id" =!= $"vec_id")
      .withColumn("dot", longArrayDot($"q", $"qv"))
      .withColumn("cosine",
        $"dot".cast("double") / sqrt($"cnorm".cast("double") * $"qnorm".cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("bigint").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
  }

  /** Bucket-id column: sign bits of NumPlanes integer-hyperplane
    * projections of `q` — codegen'd [[longArrayDot]] per plane, so the
    * bucket is a narrow per-row derivation (no join, no lambda
    * dispatch). Exact integer dot products → deterministic buckets.
    */
  private def bucketCol: Column = bucketColAdaptive(NumPlanes)

  /** [[bucketCol]] widened to `np` planes (same weight indexing, so
    * np = [[NumPlanes]] reproduces it bit-for-bit) — the corpus-size-
    * adaptive single-table bucketing [[knnGraph]] uses. One
    * [[graft.plans.ArrayOps.lshBucketPack]] kernel call, NOT np composed
    * `long_array_dot(q, <literal>)` terms: the composed form's inlined
    * codegen loops blow the JIT method budget past ~a dozen planes and
    * the whole projection stage runs interpreted (see the kernel's
    * scaladoc; bit-identical output, oracle SQL unchanged).
    */
  private def bucketColAdaptive(np: Int): Column =
    element_at(graft.plans.ArrayOps.lshBucketPack($"q", 1, np), 1)

  /** Corpus with bucket and norm attached — all narrow projections over
    * one scan (bucket and norm derive from the vector itself; v1 joined
    * the bucket frame back to the vectors, a pointless self-join).
    */
  private def bucketed(spark: SparkSession, dir: String): DataFrame =
    Dedup.quantized(spark, dir)
      .select($"vec_id", $"q", longArrayNormSq($"q").as("nrm"),
        bucketCol.as("bucket"))

  /** LSH bucket id per vector: oracle-facing view of [[bucketed]]. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    Dedup.quantized(spark, dir)
      .select($"vec_id", $"label", bucketCol.as("bucket"))

  /** Near-dup pairs, LSH-bucketed (the 100 TB path of
    * [[Dedup.embeddingNearDup]]): candidate pairs only within a bucket,
    * exact quantized-cosine check after. The bucket equi-join replaces
    * the all-pairs product; output is always a sound subset of the
    * brute-force pairs.
    *
    * Recall calibration: P(all 8 planes agree) ≈ (1 - θ/π)^8, so at this
    * corpus's weak threshold (cos ≥ 0.35, θ ≈ 69°) measured recall is
    * ~7%; at a true near-dup threshold (cos ≥ 0.95, θ ≈ 18°) it is ~65%
    * per table. Production raises recall with fewer bits, multiple hash
    * tables (union of L independent bucketings), or multi-probe — all
    * the same join shape repeated.
    */
  def lshNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val withB = bucketed(spark, dir)
    // shuffle on the bucket key — broadcasting the corpus side would be
    // the wrong shape at scale (and defeats ReusedExchange here)
    withB.as("x").join(withB.as("y").hint("shuffle_hash"),
        expr("x.bucket = y.bucket AND x.vec_id < y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        longArrayDot(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .withColumn("cos2",
        ($"dot".cast("double") * $"dot".cast("double")) /
          ($"na".cast("double") * $"nb".cast("double")))
      .filter($"dot" > 0 && $"cos2" >= Dedup.Cos2Threshold)
      .select($"a", $"b", $"cos2")
  }

  /** Neighbors kept per vector in [[knnGraph]]. */
  val KnnK = 5

  /** k-NN graph over the LSH-bucketed corpus: for every vector, its
    * [[KnnK]] most-similar same-bucket neighbors by quantized cos² —
    * the all-vectors neighbor structure SemDeDup-style semantic dedup
    * and graph-based curation consume (vs [[lshTopK]], which serves a
    * bounded QUERY set).
    *
    * Scale shape: pair scores are computed ONCE per unordered pair
    * (a<b bucket equi-join, same candidate plan as
    * [[lshNearDupPairs]]); both directed edges then come from a narrow
    * 2-element explode of the scored pair — the candidate join runs
    * once, not once per direction. Ranking is top_k_ids (bounded
    * per-key heaps, partial aggregation), NOT a ranking window — a
    * window would sort every candidate edge inside each shuffle
    * partition; the heap ships k rows per key per partition.
    *
    * The bucketing is ADAPTIVE ([[multiPlanes]], one plane per corpus
    * doubling past [[MultiN0]]) like the multi-table dedup: under the
    * fixed 8-plane bucketing this was the suite's steepest sf1 scaler
    * (6.0× at 10× data — same quadratic bucket-occupancy growth the r7
    * plane knob fixed for `dedup_embedding_lsh_multi`). Plane p keeps
    * weight index p, so at n ≤ [[MultiN0]] the buckets — and the graph
    * — are bit-identical to the fixed bucketing.
    */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val np = multiPlanes(Tables.embeddings(spark, dir).count())
    val withB = Dedup.quantized(spark, dir)
      .select($"vec_id", $"q", longArrayNormSq($"q").as("nrm"),
        bucketColAdaptive(np).as("bucket"))
    val pairs = withB.as("x").join(withB.as("y").hint("shuffle_hash"),
        expr("x.bucket = y.bucket AND x.vec_id < y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        longArrayDot(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .filter($"dot" > 0)
      .select($"a", $"b",
        (($"dot".cast("double") * $"dot".cast("double")) /
          ($"na".cast("double") * $"nb".cast("double"))).as("cos2"))
    pairs
      .select(explode(array(
        struct($"a".as("src"), $"b".as("dst"), $"cos2"),
        struct($"b".as("src"), $"a".as("dst"), $"cos2"))).as("e"))
      .groupBy($"e.src".as("vec_id"))
      .agg(org.apache.spark.sql.graftexpr.TopKAgg.topKIds(
        $"e.dst", $"e.cos2", KnnK).as("nn"))
      .select($"vec_id", posexplode($"nn").as(Seq("i", "n")))
      .select($"vec_id", ($"i" + 1).cast("bigint").as("rank"),
        $"n.id".as("neighbor"), $"n.score".as("cos2"))
  }

  /** [[knnGraph]] as a session-scoped shared artifact
    * ([[graft.Materialize]]): the edge set is the substrate of the whole
    * graph-curation family (pagerank, triangles, components, label
    * propagation, modularity, assortativity, k-core) plus kNN
    * classification, NDCG and cluster-balanced sampling — each used to
    * re-run the LSH-bucketed candidate join and top-k ranking. First
    * consumer builds it; the rest read the checkpointed n·k edge list.
    */
  def knnGraphShared(spark: SparkSession, dir: String): DataFrame =
    graft.Materialize.shared(spark, dir, "knn_graph")(knnGraph(spark, dir))

  /** k-NN majority-vote classification over [[knnGraph]]: each vector's
    * predicted label is the most common label among its [[KnnK]]
    * nearest same-bucket neighbors (ties → lowest label), reported next
    * to its true label — the weak-supervision / label-QA op (a label
    * that disagrees with its neighborhood is the standard mislabeled-
    * example signal in training-data curation).
    *
    * Composition, not a fork: consumes [[knnGraph]] verbatim, so the
    * candidate generation stays the one adaptive-bucketed pair join.
    * The two label attachments are shuffle equi-joins of the bounded
    * k·n edge relation against a TWO-column projection of the corpus
    * (id, label — column-pruned at the scan); the vote argmax is a
    * struct-max aggregate (partial-aggregable), not a ranking window.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("bigint").as("lbl"))
    val best = knnGraphShared(spark, dir)
      .join(labels.select($"vec_id".as("nid"), $"lbl").hint("shuffle_hash"),
        $"neighbor" === $"nid")
      .groupBy($"vec_id", $"lbl")
      .agg(count(lit(1)).as("votes"))
      .groupBy($"vec_id")
      // (votes, smallest-label) packed into one decimal: a struct-
      // ordered max has no mutable buffer and demoted this aggregate
      // to SortAggregate (caught by the PlanShapeSpec contract — the
      // OHLC lesson, applied here as in labelPropagation)
      .agg(max($"votes".cast("decimal(38,0)") * lit(1000000000L) +
        (lit(999999999L) - $"lbl")).as("o"))
      .select($"vec_id",
        (lit(999999999L) - ($"o" % 1000000000L)).cast("long").as("predicted"),
        expr("CAST(o div 1000000000L AS BIGINT)").as("votes"))
    best.join(labels.hint("shuffle_hash"), Seq("vec_id"))
      .select($"vec_id", $"lbl".as("label"), $"predicted", $"votes",
        when($"lbl" === $"predicted", 1L).otherwise(0L).as("correct"))
  }

  /** `eval_confusion_matrix`: exact confusion cells of the
    * [[knnClassify]] predictions plus each cell's share of its
    * actual-label row (the recall contribution) and predicted-label
    * column (the precision contribution) — the model-eval artifact a
    * labeling/distillation pipeline materializes next to its
    * predictions.
    *
    * Scale shape: one pass over the prediction table into a
    * label×label-bounded cell aggregate; the row/column totals derive
    * from the cells themselves (dimension-sized) and join back as
    * broadcasts.
    */
  def confusionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cells = knnClassify(spark, dir)
      .groupBy($"label", $"predicted").agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy($"label").agg(sum($"n").as("n_label"))
    val colTot = cells.groupBy($"predicted").agg(sum($"n").as("n_pred"))
    cells.join(broadcast(rowTot), "label")
      .join(broadcast(colTot), "predicted")
      .select($"label", $"predicted", $"n",
        ($"n".cast("double") / $"n_label".cast("double")).as("row_share"),
        ($"n".cast("double") / $"n_pred".cast("double")).as("col_share"))
  }

  /** Negatives kept per anchor in [[hardNegatives]]. */
  val HardNegK = 5

  /** Hard-negative mining: for every anchor vector, its [[HardNegK]]
    * most-similar vectors carrying a DIFFERENT label — the
    * contrastive-training data op (high-similarity cross-class pairs
    * are the gradients that matter; random negatives are trivially
    * separable). Same adaptive-bucketed candidate join and bounded
    * per-key heap ranking as [[knnGraph]], with the label-mismatch
    * predicate INSIDE the pair join — cross-label filtering never
    * materializes same-label candidates downstream.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val np = multiPlanes(Tables.embeddings(spark, dir).count())
    val withB = Dedup.quantized(spark, dir)
      .select($"vec_id", $"label".cast("bigint").as("label"), $"q",
        longArrayNormSq($"q").as("nrm"), bucketColAdaptive(np).as("bucket"))
    val pairs = withB.as("x").join(withB.as("y").hint("shuffle_hash"),
        expr("x.bucket = y.bucket AND x.vec_id < y.vec_id AND x.label <> y.label"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        longArrayDot(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .filter($"dot" > 0)
      .select($"a", $"b",
        (($"dot".cast("double") * $"dot".cast("double")) /
          ($"na".cast("double") * $"nb".cast("double"))).as("cos2"))
    pairs
      .select(explode(array(
        struct($"a".as("src"), $"b".as("dst"), $"cos2"),
        struct($"b".as("src"), $"a".as("dst"), $"cos2"))).as("e"))
      .groupBy($"e.src".as("vec_id"))
      .agg(org.apache.spark.sql.graftexpr.TopKAgg.topKIds(
        $"e.dst", $"e.cos2", HardNegK).as("nn"))
      .select($"vec_id", posexplode($"nn").as(Seq("i", "n")))
      .select($"vec_id", ($"i" + 1).cast("bigint").as("rank"),
        $"n.id".as("negative_id"), $"n.score".as("cos2"))
  }

  /** Number of independent LSH tables for the multi-table variant. */
  val NumTables = 4

  /** Plane-count calibration for [[multiPlanes]]: at n ≤ [[MultiN0]]
    * vectors the multi-table bucketing uses [[MultiPlanesBase]] planes
    * (= the single-table [[NumPlanes]], so the calibration corpus keeps
    * its original bucketing bit-for-bit) and gains one plane per
    * doubling of the corpus — expected same-bucket candidate pairs
    * n²/2^planes then stay ~linear in n instead of quadratic, the
    * E2LSH k ∝ log n rule.
    */
  val MultiPlanesBase = 8
  val MultiN0 = 500L

  /** Ceiling on [[multiPlanes]] so the oracle's generated weight-table
    * literal stays bounded — covers n ≤ MultiN0·2¹² ≈ 2M vectors. A
    * production deployment at larger n recalibrates MultiN0 upward
    * (coarser growth schedule) rather than growing a single band past
    * this; the weights themselves come from the closed-form
    * [[Hashing.planeWeight]], so nothing but this literal bounds
    * the count.
    */
  val MultiPlanesMax = 20

  /** Planes per table at corpus size n — INTEGER arithmetic only
    * (bit-length of the ceil-ratio n/[[MultiN0]]), because the obvious
    * `ceil(log2(n/n0))` evaluates differently across libm
    * implementations when the ratio sits on/near a power of two: Spark
    * and the DuckDB oracle must derive the identical count from the
    * identical row count.
    */
  def multiPlanes(n: Long): Int = {
    val c = (n + MultiN0 - 1) / MultiN0
    val extra = if (c <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(c - 1)
    math.min(MultiPlanesBase + extra, MultiPlanesMax)
  }

  /** Multi-table LSH near-dup pairs: L independent bucketings (each its
    * own [[multiPlanes]] hyperplanes); a pair is a candidate if it
    * collides in ANY table — recall ≈ 1-(1-r)^L for per-table recall r,
    * at L× the candidate-join cost. Same exact-check contract as
    * [[lshNearDupPairs]].
    *
    * The plane count is the statistics-driven knob: it reads the corpus
    * row count up front (parquet footer metadata — the same
    * cardinality read every cost-based planner does before picking a
    * plan) and widens the bucketing as the corpus grows, holding the
    * candidate-join volume ~linear. Fixed 8-plane bucketing measured
    * 13.3× wall at 10× data before this knob existed.
    */
  def lshNearDupPairsMulti(spark: SparkSession, dir: String): DataFrame = {
    val q = Dedup.quantized(spark, dir).select($"vec_id", $"q")
      .withColumn("nrm", longArrayNormSq($"q"))
    val np = multiPlanes(Tables.embeddings(spark, dir).count())
    // all NumTables buckets in ONE kernel call (table pt uses planes
    // pt*np..pt*np+np-1), then explode the 4-element array — the
    // per-table bucket stream never joins back. The kernel replaced
    // 4·np composed dot-vs-literal terms whose inlined codegen pushed
    // the stage past the JIT budget (4.4 s interpreted → 0.3 s).
    val buckets = graft.plans.ArrayOps.lshBucketPack($"q", NumTables, np)
    val withT = q
      .select($"vec_id", posexplode(buckets))
      .select($"vec_id", $"pos".as("t"), $"col".as("bucket"))
    // dedup cross-table candidates on the (a, b) KEY, then rejoin the
    // vectors — distinct() over rows carrying two 64-long arrays would
    // shuffle and hash ~1 KB per candidate for nothing
    val cand = withT.as("x").join(withT.as("y").hint("shuffle_hash"),
        expr("x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    cand
      .join(q.select($"vec_id".as("a"), $"q", $"nrm"), Seq("a"))
      .join(q.select($"vec_id".as("b"), $"q".as("qb"), $"nrm".as("nrm_b")), Seq("b"))
      .select($"a", $"b", longArrayDot($"q", $"qb").as("dot"),
        $"nrm".as("na"), $"nrm_b".as("nb"))
      .withColumn("cos2",
        ($"dot".cast("double") * $"dot".cast("double")) /
          ($"na".cast("double") * $"nb".cast("double")))
      .filter($"dot" > 0 && $"cos2" >= Dedup.Cos2Threshold)
      .select($"a", $"b", $"cos2")
  }

  /** Multi-probe ANN top-k: score within the query's bucket AND the
    * NumPlanes buckets at Hamming distance 1 (one sign bit flipped) —
    * the standard recall raiser that reuses ONE bucketing instead of L
    * independent tables. The probe set is 9 distinct bucket ids per
    * query, so candidate generation stays a bucket equi-join (probe
    * side explodes 9×, corpus side unchanged); no (query, vec) pair can
    * match twice because a vector has exactly one bucket.
    */
  def lshTopKMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val withB = bucketed(spark, dir)
    val probes = array(
      ($"bucket" +: (0 until NumPlanes).map(p =>
        $"bucket".bitwiseXOR(lit(1L << p)))): _*)
    val queries = withB.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), posexplode(probes),
        $"q".as("qv"), $"nrm".as("qnorm"))
      .select($"query_id", $"col".as("probe"), $"qv", $"qnorm")
    val corpus = withB.withColumnRenamed("nrm", "cnorm")
    val scored = corpus.join(broadcast(queries),
        $"bucket" === $"probe" && $"query_id" =!= $"vec_id")
      .withColumn("dot", longArrayDot($"q", $"qv"))
      .withColumn("cosine",
        $"dot".cast("double") / sqrt($"cnorm".cast("double") * $"qnorm".cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("bigint").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
  }

  /** Number of IVF cells and probed cells for [[ivfTopK]]. */
  val NumCells = 16
  val NProbe = 2

  /** Centroid list as ONE collected row (cent_id, vector, |c|²) —
    * cross-join-broadcast to every corpus row so cell assignment is a
    * narrow argmin over the array, composed with the codegen'd
    * long_array_dot inside the lambda. Centroids here are the first
    * NumCells corpus vectors — a deterministic stand-in for the k-means
    * step (out of the relational engine's scope); the engine shape is
    * what matters: the corpus NEVER shuffles to learn its cell.
    */
  private def centroidRow(spark: SparkSession, dir: String): DataFrame =
    Dedup.quantized(spark, dir)
      .filter($"vec_id" < NumCells)
      .select($"vec_id".as("cent_id"), $"q".as("cv"),
        longArrayNormSq($"q").as("cnorm2"))
      .agg(collect_list(struct($"cent_id", $"cv", $"cnorm2")).as("cents"))

  /** Exact integer cell ranking of `q` against the centroid array: the
    * `k` best (|c|² − 2·q·c, cent_id) structs ascending — argmin
    * distance with lowest-id tiebreak, |q|² constant per row so it is
    * omitted from the score. The codegen'd
    * [[org.apache.spark.sql.graftexpr.CentroidKernel]]; the
    * `array_sort(transform(...))` tower it replaces ran interpreted per
    * corpus row (CentroidExprSpec pins equivalence).
    */
  private def cellRanking(k: Int): Column =
    graft.plans.ArrayOps.centroidRank($"q", $"cents", k, addQNorm = false)

  /** IVF ANN top-k: each query probes its NProbe nearest cells; exact
    * cosine within the probed cells only. The scale path when one LSH
    * table's recall is not enough: the inverted-file cell join replaces
    * the all-pairs scan, candidates ≈ corpus × NProbe / NumCells.
    */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val centArr = centroidRow(spark, dir)
    val base = Dedup.quantized(spark, dir).select($"vec_id", $"q")
      .withColumn("nrm", longArrayNormSq($"q"))
      .join(broadcast(centArr), lit(true))
    val corpus = base
      .withColumn("cell", element_at(cellRanking(1), 1).getField("cid"))
      .select($"vec_id", $"q", $"nrm", $"cell")
    // query-side: same ranking, keep the NProbe best cells
    val probes = base.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"q".as("qv"), $"nrm".as("qnorm"),
        explode(cellRanking(NProbe)).as("probe"))
      .select($"query_id", $"probe".getField("cid").as("probe_cell"),
        $"qv", $"qnorm")
    val scored = corpus.join(broadcast(probes),
        $"cell" === $"probe_cell" && $"query_id" =!= $"vec_id")
      .withColumn("dot", longArrayDot($"q", $"qv"))
      .withColumn("cosine",
        $"dot".cast("double") / sqrt($"nrm".cast("double") * $"qnorm".cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("bigint").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus, then within each cluster
    * drop every vector that is near-duplicate (cos ≥ threshold) of a
    * LOWER-id member — the greedy keep-one-representative pass that
    * removes semantically redundant training examples even when no
    * exact or shingle-level duplicate exists.
    *
    * Clustering reuses the deterministic IVF cell assignment
    * ([[centroidRow]]/[[cellRanking]]: exact integer argmin over the
    * broadcast centroid row). The pairwise pass is confined WITHIN
    * cells — a shuffle_hash self-join on the cell id, never all-pairs
    * and never a corpus broadcast; at 100 TB the cell count scales with
    * the corpus so a cell stays reducer-sized, which is exactly the
    * SemDeDup paper's k-means trick. Same exact-integer cos² contract
    * as [[lshNearDupPairs]]. Output: every vector with its cell and a
    * `kept` verdict (lowest-id representative of each near-dup relation
    * survives).
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val centArr = centroidRow(spark, dir)
    val cells = Dedup.quantized(spark, dir).select($"vec_id", $"q")
      .withColumn("nrm", longArrayNormSq($"q"))
      .join(broadcast(centArr), lit(true))
      .withColumn("cell", element_at(cellRanking(1), 1).getField("cid"))
      .select($"vec_id", $"q", $"nrm", $"cell")
    val dropped = cells.as("x").join(cells.as("y").hint("shuffle_hash"),
        expr("x.cell = y.cell AND x.vec_id < y.vec_id"))
      .select(col("y.vec_id").as("vec_id"),
        longArrayDot(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .withColumn("cos2",
        ($"dot".cast("double") * $"dot".cast("double")) /
          ($"na".cast("double") * $"nb".cast("double")))
      .filter($"dot" > 0 && $"cos2" >= Dedup.Cos2Threshold)
      .select($"vec_id").distinct()
    cells.join(dropped.withColumn("__drop", lit(true)), Seq("vec_id"), "left")
      .select($"vec_id", $"cell", $"__drop".isNull.as("kept"))
  }

  /** ANN top-k via LSH: score only within the query vector's bucket.
    * Recall is approximate by construction (bucket miss ⇒ neighbor
    * miss); at 100 TB, multi-probe or repeated tables raise recall
    * without changing the join shape.
    */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val withB = bucketed(spark, dir)
    val queries = withB.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"bucket".as("qbucket"),
        $"q".as("qv"), $"nrm".as("qnorm"))
    val corpus = withB.withColumnRenamed("nrm", "cnorm")
    val scored = corpus.join(broadcast(queries),
        $"bucket" === $"qbucket" && $"query_id" =!= $"vec_id")
      .withColumn("dot", longArrayDot($"q", $"qv"))
      .withColumn("cosine",
        $"dot".cast("double") / sqrt($"cnorm".cast("double") * $"qnorm".cast("double")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("bigint").as("rank"),
        $"vec_id".as("neighbor_id"), $"cosine")
  }

  /** Per-vector int8 scalar quantization — the vector-compression step
    * of a serving/index pipeline (4× smaller than float32, 8× smaller
    * than the int64 working form): v_i = trunc(q_i · 127 / max|q|),
    * computed entirely in exact integer arithmetic (Spark `div` and
    * DuckDB `//` both truncate toward zero on integers) so the oracle
    * checks the quantized payload bit-for-bit through an order-weighted
    * checksum. Narrow per-row transform: no shuffle, no UDF, all
    * higher-order functions inside codegen.
    */
  def int8Quantize(spark: SparkSession, dir: String): DataFrame =
    // max-abs fold, quantize transform and order-weighted checksum
    // fused into the int8_quant_stats kernel (kernel wave 3: three
    // chained HOF towers each re-walked the vector interpreted per
    // row); VecExprSpec pins kernel ≡ tower incl. the empty-vector
    // NULL-checksum edge and the ANSI overflow contract
    Dedup.quantized(spark, dir).select($"vec_id",
        graft.plans.ArrayOps.int8QuantStats($"q").as("s"))
      .select($"vec_id", $"s.scale".as("scale"), $"s.checksum".as("checksum"),
        $"s.v_min".as("v_min"), $"s.v_max".as("v_max"))

  /** Recall@k of the LSH ANN path against the exact brute-force
    * baseline — the measurement a production ANN deployment tracks to
    * size its bucket/probe parameters. Per query: |LSH∩exact| / k as an
    * exact BIGINT/BIGINT double. Fully deterministic (both paths are),
    * so the oracle checks the recall VALUES, not just shapes.
    */
  def lshRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstBrute(spark, dir, lshTopK(spark, dir))

  /** Recall@k of the multi-probe LSH variant — probing Hamming-1
    * neighbor buckets should strictly dominate single-bucket recall at
    * the same table count (asserted in SimilaritySpec).
    */
  def multiProbeRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstBrute(spark, dir, lshTopKMultiProbe(spark, dir))

  /** Recall@k of the IVF path — the nprobe-cells tradeoff measurement. */
  def ivfRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstBrute(spark, dir, ivfTopK(spark, dir))

  /** Product-quantization geometry: PqM subspaces × PqSub dims (= the
    * 64-dim embedding), PqCodes codewords per subspace.
    */
  val PqM = 8
  val PqSub = 8
  val PqCodes = 16

  /** PQ codebook as ONE collected row — same broadcast-argmin shape as
    * [[centroidRow]]. Codewords are the first PqCodes corpus vectors'
    * sub-slices (the deterministic stand-in for per-subspace k-means,
    * same stance as the IVF centroids).
    */
  private def pqCodebookRow(spark: SparkSession, dir: String): DataFrame =
    Dedup.quantized(spark, dir)
      .filter($"vec_id" < PqCodes)
      .select($"vec_id".as("cid"), $"q".as("cv"))
      .agg(collect_list(struct($"cid", $"cv")).as("cb"))

  /** Per-subspace nearest-codeword encode + reconstruction in one
    * codegen'd pass ([[org.apache.spark.sql.graftexpr.PqKernel]]): for
    * each of the PqM slices, exact integer argmin of
    * ‖sub(q) − sub(codeword)‖² over the broadcast codebook (lowest-cid
    * tiebreak), emitting the concatenated chosen codeword slices.
    * `dot(recon, query)` is algebraically identical to PQ's
    * asymmetric-distance (ADC) lookup sum, kept in exact integer
    * arithmetic for the oracle. A narrow pass — the corpus never
    * shuffles to learn its codes. (The previous two-step HOF tower —
    * transform∘array_sort∘aggregate∘zip_with∘slice for the codes, then
    * flatten∘transform∘filter for the reconstruction — was interpreted
    * end to end; PqExprSpec pins the kernel's equivalence to it.)
    */
  private def pqRecon: Column =
    graft.plans.ArrayOps.pqReconstruct($"q", $"cb", PqM, PqSub)

  /** PQ ANN top-k: the memory-compression scale path — at 100 TB of
    * embeddings the scoring pass reads PqM small code ids per vector
    * (8 bytes here) instead of the 512-byte float vector, a 64×
    * working-set reduction, and scoring is codebook-table arithmetic
    * against the broadcast query side only. Ranked by the exact-integer
    * estimated dot product (deterministic vec_id tiebreak); accuracy is
    * measured, not assumed — [[pqRecall]] scores this path against the
    * brute-force baseline like every other ANN variant.
    */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebookRow(spark, dir)
    val corpus = Dedup.quantized(spark, dir).select($"vec_id", $"q")
      .join(broadcast(cb), lit(true))
      .withColumn("recon", pqRecon)
      .select($"vec_id", $"recon")
    val queries = Dedup.quantized(spark, dir)
      .filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"q".as("qv"))
    val scored = corpus.join(broadcast(queries), $"query_id" =!= $"vec_id")
      .withColumn("est_dot", longArrayDot($"recon", $"qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"est_dot".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("bigint").as("rank"),
        $"vec_id".as("neighbor_id"), $"est_dot")
  }

  /** Recall@k of the PQ path — what the 64× compression costs. */
  def pqRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstBrute(spark, dir, pqTopK(spark, dir))

  /** IVF+PQ ANN top-k — the two scale levers COMPOSED, the standard
    * billion-vector index shape (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011 §V): the inverted file
    * prunes WHICH vectors are scored (≈ corpus × NProbe / NumCells
    * candidates) while PQ codes shrink WHAT is read per scored vector
    * (PqM code bytes, not the raw vector). [[ivfTopK]] alone still
    * reads full vectors; [[pqTopK]] alone still scans every vector —
    * at 10⁹+ vectors a deployment needs both.
    *
    * One narrow corpus pass derives cell AND codes from the two 1-row
    * broadcast codebooks; candidate generation is the same broadcast
    * cell join as [[ivfTopK]]; scoring is the exact-integer ADC dot
    * against the reconstruction. Recall loss vs either single lever is
    * measured, not assumed ([[ivfPqRecall]]).
    */
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val centArr = centroidRow(spark, dir)
    val cb = pqCodebookRow(spark, dir)
    val base = Dedup.quantized(spark, dir).select($"vec_id", $"q")
      .join(broadcast(centArr), lit(true))
      .join(broadcast(cb), lit(true))
    val corpus = base
      .withColumn("cell", element_at(cellRanking(1), 1).getField("cid"))
    val probes = base.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"q".as("qv"),
        explode(cellRanking(NProbe)).as("probe"))
      .select($"query_id", $"probe".getField("cid").as("probe_cell"), $"qv")
    // cell-prune BEFORE the per-vector PQ encode/reconstruct: the
    // expensive code derivation runs only on vectors inside SOME probed
    // cell (semi-join against the distinct probed-cell set, each
    // surviving vector encoded once) — at production cell counts the
    // probed fraction is « 1, so deriving codes for the whole corpus
    // first would throw away the IVF lever's entire point
    val probedCells = probes.select($"probe_cell".as("pc")).distinct()
    val cand = corpus.join(broadcast(probedCells), $"cell" === $"pc")
      .withColumn("recon", pqRecon)
      .select($"vec_id", $"cell", $"recon")
    val scored = cand.join(broadcast(probes),
        $"cell" === $"probe_cell" && $"query_id" =!= $"vec_id")
      .withColumn("est_dot", longArrayDot($"recon", $"qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"est_dot".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= TopK)
      .select($"query_id", $"rank".cast("bigint").as("rank"),
        $"vec_id".as("neighbor_id"), $"est_dot")
  }

  /** Recall@k of the composed IVF+PQ path — cell-miss and
    * quantization losses compound; this measures the product.
    */
  def ivfPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstBrute(spark, dir, ivfPqTopK(spark, dir))

  /** [[bruteForceTopK]] pinned once per (session, dir) — the exact
    * baseline is consumed by SIX registered queries (its own dump plus
    * five recall measurements), and the corpus × queries scoring scan
    * is the family's whole cost; the same [[graft.Materialize]]
    * discipline as the cluster map and the k-NN graph. In a production
    * ANN deployment this is literally the ground-truth table a recall
    * dashboard joins against, refreshed per corpus snapshot.
    */
  def bruteForceTopKShared(spark: SparkSession, dir: String): DataFrame =
    graft.Materialize.shared(spark, dir, "brute_topk")(
      bruteForceTopK(spark, dir))

  private def recallAgainstBrute(spark: SparkSession, dir: String,
      approxTopK: DataFrame): DataFrame = {
    val exact = bruteForceTopKShared(spark, dir)
      .select($"query_id", $"neighbor_id")
    val approx = approxTopK
      .select($"query_id".as("a_query_id"), $"neighbor_id".as("a_neighbor_id"))
    exact.join(approx,
        $"query_id" === $"a_query_id" && $"neighbor_id" === $"a_neighbor_id",
        "left")
      .groupBy($"query_id")
      .agg((sum(when($"a_neighbor_id".isNotNull, 1L).otherwise(0L))
        .cast("double") / lit(TopK.toDouble)).as("recall_at_k"))
  }

  /** `eval_ndcg`: per-query NDCG of the k-NN retrieval ([[knnGraph]])
    * with binary same-label relevance — the position-weighted ranking
    * metric next to [[knnClassify]]'s flat majority vote: a retriever
    * that buries its relevant hits at rank k scores far below one that
    * leads with them, which precision/recall cannot see.
    *
    * Determinism: DCG folds over the rank-sorted neighbor list and
    * IDCG over `sequence(1, n_rel)` — both fixed-order array folds
    * (the χ² stance) — and the k position discounts 1/log₂(rank+1)
    * are PRECOMPUTED in [[NdcgWeights]] and injected into both
    * engines as shared double literals (the BM25 shared-literal
    * association): JVM `Math.log` and DuckDB's libm disagree by an
    * ulp on some integer arguments (measured: 4.7% of queries'
    * DCG), so no query-time log call is allowed on either side.
    * NDCG is null when the query has no relevant neighbor (0/0 has
    * no honest value).
    *
    * Scale shape: the k-NN graph is the corpus-scale part and is
    * already bucketed; everything after is two label broadcast-joins
    * and a per-query fold over ≤ k rows.
    */
  /** Position discounts 1/log₂(r+1), r = 1..[[KnnK]] — the shared
    * literals both engines fold over (see [[evalNdcg]]).
    */
  lazy val NdcgWeights: Seq[Double] =
    (1 to KnnK).map(r => math.log(2) / math.log(r + 1))

  /** [[NdcgWeights]] as an engine-neutral literal list body,
    * `CAST(w1 AS DOUBLE), ...` — Scala's shortest-roundtrip doubles
    * parse back to the identical bits in Spark SQL and DuckDB.
    */
  lazy val ndcgWeightsSqlBody: String =
    NdcgWeights.map(w => s"CAST($w AS DOUBLE)").mkString(", ")

  def evalNdcg(spark: SparkSession, dir: String): DataFrame = {
    val lab = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long").as("lbl"))
    val rels = knnGraphShared(spark, dir)
      .join(lab.withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("lbl", "qlbl"), $"vec_id" === $"qid")
      .join(lab.withColumnRenamed("vec_id", "nid")
        .withColumnRenamed("lbl", "nlbl"), $"neighbor" === $"nid")
      .select($"vec_id", $"rank",
        when($"qlbl" === $"nlbl", 1L).otherwise(0L).as("rel"))
    rels.groupBy($"vec_id")
      .agg(sort_array(collect_list(struct($"rank", $"rel"))).as("rs"))
      .select($"vec_id",
        expr("aggregate(rs, CAST(0 AS BIGINT), (a, x) -> a + x.rel)").as("n_rel"),
        expr(s"""aggregate(rs, CAST(0 AS DOUBLE), (a, x) ->
          a + CAST(x.rel AS DOUBLE) *
            element_at(array($ndcgWeightsSqlBody), CAST(x.rank AS INT)))""").as("dcg"))
      .withColumn("idcg", expr(s"""CASE WHEN n_rel > 0 THEN
        aggregate(sequence(CAST(1 AS BIGINT), n_rel), CAST(0 AS DOUBLE),
          (a, i) -> a + element_at(array($ndcgWeightsSqlBody), CAST(i AS INT)))
        END"""))
      .select($"vec_id", $"n_rel", $"dcg", $"idcg",
        when($"n_rel" > 0, $"dcg" / $"idcg").as("ndcg"))
  }

  /** Diversified picks per query in [[mmrRerank]]. */
  val MmrM = 3

  /** `sim_mmr_rerank`: Maximal Marginal Relevance re-ranking of each
    * query's k-NN candidates — greedy selection of [[MmrM]] results
    * maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected
    * (λ = 0.5, binary-exact) — the diversity-aware retrieval layer
    * (Carbonell & Goldstein '98) a RAG/curation stack puts between ANN
    * and the consumer so three near-identical hits don't fill the
    * result page.
    *
    * The greedy recursion is UNROLLED into [[MmrM]] deterministic
    * rounds of set algebra (the k-means/BPE/pagerank fixed-round
    * contract): each round anti-joins the already-selected set,
    * computes every remaining candidate's penalty as a max over its
    * pairwise cos² to the selected (no double summation anywhere —
    * max and one subtraction only), and picks per query with the
    * bounded-heap argmax (greatest score, smallest id). Candidate and
    * pair tables are query-bounded (≤ k and ≤ k²/2 rows per query)
    * and `localCheckpoint`ed once; every round is joins over leaf
    * relations.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftexpr.TopKAgg
    val cands = knnGraphShared(spark, dir)
      .select($"vec_id".as("qid"), $"neighbor".as("cid"), $"cos2".as("rel2"))
      .localCheckpoint()
    val qv = Dedup.quantized(spark, dir)
      .select($"vec_id", $"q", graft.plans.ArrayOps.longArrayNormSq($"q").as("nrm"))
    val pairs = cands.as("a")
      .join(cands.as("b"),
        col("a.qid") === col("b.qid") && col("a.cid") < col("b.cid"))
      .join(qv.as("x"), col("a.cid") === col("x.vec_id"))
      .join(qv.as("y"), col("b.cid") === col("y.vec_id"))
      .select(col("a.qid").as("qid"), col("a.cid").as("ca"), col("b.cid").as("cb"),
        graft.plans.ArrayOps.longArrayDot(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .select($"qid", $"ca", $"cb",
        when($"dot" > 0,
          ($"dot".cast("double") * $"dot".cast("double")) /
            ($"na".cast("double") * $"nb".cast("double")))
          .otherwise(lit(0.0)).as("sim2"))
      .localCheckpoint()
    val first = cands.groupBy($"qid")
      .agg(expr("element_at(top_k_ids(cid, rel2, 1), 1)").as("m"))
      .select($"qid", $"m.id".as("cid"), $"m.score".as("score"),
        lit(1L).as("pos"))
    (2 to MmrM).foldLeft(first) { case (sel, r) =>
      val selSet = sel.select($"qid".as("sqid"), $"cid".as("sid"))
      val remaining = cands.join(selSet,
        $"qid" === $"sqid" && $"cid" === $"sid", "left_anti")
      val scored = remaining.join(selSet, $"qid" === $"sqid")
        .join(pairs.select($"qid".as("pqid"), $"ca", $"cb", $"sim2"),
          $"pqid" === $"qid" &&
            $"ca" === least($"cid", $"sid") &&
            $"cb" === greatest($"cid", $"sid"), "left")
        .groupBy($"qid", $"cid", $"rel2")
        .agg(max(coalesce($"sim2", lit(0.0))).as("ms"))
        .select($"qid", $"cid",
          (lit(0.5) * $"rel2" - lit(0.5) * $"ms").as("score"))
      val pick = scored.groupBy($"qid")
        .agg(expr("element_at(top_k_ids(cid, score, 1), 1)").as("m"))
        .select($"qid", $"m.id".as("cid"), $"m.score".as("score"),
          lit(r.toLong).as("pos"))
      sel.unionByName(pick)
    }
  }

  /** `eval_calibration_bins`: reliability diagram of the k-NN
    * classifier — predictions grouped by their vote margin
    * (confidence = votes/k), each bin reporting population, exact
    * accuracy and the confidence–accuracy gap. THE well-calibrated-
    * or-not check a weak-supervision pipeline runs before trusting
    * vote shares as probabilities (votes/k ≈ P(correct) iff the gap
    * column hovers near zero).
    *
    * Everything is exact integers until three single divisions per
    * bin; bins are bounded by k+1 values. One pass over the
    * prediction table (itself the bucketed [[knnClassify]] plan).
    */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame =
    knnClassify(spark, dir)
      .groupBy($"votes")
      .agg(count(lit(1)).as("n"), sum($"correct").as("n_correct"))
      .select($"votes", $"n", $"n_correct",
        ($"votes".cast("double") / KnnK.toDouble).as("confidence"),
        ($"n_correct".cast("double") / $"n".cast("double")).as("accuracy"),
        ($"votes".cast("double") / KnnK.toDouble -
          $"n_correct".cast("double") / $"n".cast("double")).as("gap"))

  /** `embed_whiten_diag`: diagonal whitening of the quantized corpus —
    * every dimension rescaled by its corpus standard deviation,
    * emitted as integer-quantized coordinates (checksum/min/max per
    * vector, the [[int8Quantize]] reporting shape). The preprocessing
    * step before cosine/PQ when dimensions have wildly uneven
    * variance; the statistics come from ONE `long_array_sum` pass
    * (Σq and Σq² together), broadcast back as a 1-row frame — the
    * corpus is never re-read and never shuffled.
    *
    * Determinism: variance numerators n·SS_i − S_i² stay exact
    * decimals; each whitened coordinate is
    * `floor(x·1000·n / sqrt(var_num))` — double multiply chain in a
    * fixed order, one correctly-rounded sqrt, one division, one
    * floor — identical IEEE on both engines. Zero-variance
    * dimensions whiten to 0 by contract.
    */
  def whitenDiag(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftexpr.LongArraySumAgg
    val q = Dedup.quantized(spark, dir).select($"vec_id", $"q")
    val stats = q.agg(
      LongArraySumAgg.column($"q").as("s"),
      LongArraySumAgg.column(expr("transform(q, x -> x * x)")).as("ss"),
      count(lit(1)).as("n"))
    val varNum = "CAST(n AS DECIMAL(38,0)) * element_at(ss, i + 1) - " +
      "CAST(element_at(s, i + 1) AS DECIMAL(38,0)) * element_at(s, i + 1)"
    q.join(broadcast(stats))
      .withColumn("w", expr(
        s"""transform(q, (x, i) -> CASE WHEN $varNum = 0 THEN CAST(0 AS BIGINT)
           |  ELSE CAST(floor(CAST(x AS DOUBLE) * 1000.0 * CAST(n AS DOUBLE) /
           |    sqrt(CAST($varNum AS DOUBLE))) AS BIGINT) END)""".stripMargin))
      .select($"vec_id",
        expr("""aggregate(zip_with(w, sequence(CAST(1 AS BIGINT),
          CAST(size(w) AS BIGINT)), (a, b) -> a * b),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("checksum"),
        expr("array_min(w)").as("w_min"),
        expr("array_max(w)").as("w_max"))
  }
}
