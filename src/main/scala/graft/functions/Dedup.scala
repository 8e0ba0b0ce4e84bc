package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._
import Hashing._

/** Deduplication operators for a training-data pipeline: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every stage is a shuffle on a bounded key (hash,
  * band signature, bit block, bucket) — never an unbounded cross join.
  * Candidate generation caps bucket width (frequency / size caps, noted
  * per operator) so a pathological key cannot quadratic-blow a reducer;
  * the caps are part of the operator contract and mirrored in the
  * oracles. AQE skew-join handles residual imbalance.
  */
object Dedup {

  // ---- shared shapes ----------------------------------------------------

  /** Distinct word 3-shingles per doc, hashed into the 31-bit ring.
    * The shingle stream is a rolling 3-word window — the rolling-hash
    * fingerprint stream of the document.
    */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    shinglesOf(documents(spark, dir))

  /** Core of [[shingles]] over any (doc_id, text) frame. */
  def shinglesOf(docs: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens($"text")
    docs
      .select($"doc_id", toks.as("toks"))
      // guard: sequence(0, -1) in Spark is DESCENDING [0, -1], so a
      // <3-token doc would emit spurious short pseudo-shingles; emit none
      .select($"doc_id", explode(expr(
        "CASE WHEN size(toks) >= 3 THEN " +
          "transform(sequence(0, size(toks) - 3), i -> " +
          "concat_ws(' ', toks[i], toks[i+1], toks[i+2])) " +
          "ELSE array() END")).as("shingle"))
      .distinct()
  }

  /** DuckDB twin of [[shingles]] as a CTE body. */
  def sqlShingles: String =
    s"""SELECT DISTINCT doc_id,
       |    toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS shingle
       |  FROM (SELECT doc_id, toks, unnest(range(greatest(len(toks) - 2, 0))) AS i
       |        FROM (SELECT doc_id, ${TextAnalysis.sqlTokens("text")} AS toks FROM documents))""".stripMargin

  // ---- exact dedup ------------------------------------------------------

  /** Exact dedup: hash-groupBy on the normalized fingerprint, keep the
    * lowest doc_id per group. One shuffle on a 128-bit key; at 100 TB
    * this is the cheapest possible full-corpus dedup.
    */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(trim(lower($"text")), "\\s+", " ")
    documents(spark, dir)
      .select($"doc_id", md5(norm).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select($"keep_doc_id", $"n_copies")
      .orderBy($"keep_doc_id")
  }

  // ---- MinHash + LSH ----------------------------------------------------

  val NumPerm = 16
  val BandRows = 4
  val NumBands: Int = NumPerm / BandRows // 4

  /** MinHash signature as one wide aggregation: NumPerm `min` aggregates
    * over the shingle hashes in a single groupBy(doc_id) pass — no
    * perm-explode (the first cut exploded shingles × NumPerm and was the
    * bottleneck of the pairs query). Partial min happens map-side; the
    * shuffle carries one row per doc. Output: doc_id, sig: array<bigint>.
    */
  def minhashSignatureArray(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until NumPerm).map(j =>
      min((lit(minhashA(j)) * $"h" + lit(minhashB(j))) % P31).as(s"mh_$j"))
    shingles(spark, dir)
      .select($"doc_id", md5Hash31($"shingle").as("h"))
      .groupBy($"doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select($"doc_id", array((0 until NumPerm).map(j => col(s"mh_$j")): _*).as("sig"))
  }

  /** Long-form signatures (doc_id, j, mh) — the oracle-facing view. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    minhashSignatureArray(spark, dir)
      .select($"doc_id", posexplode($"sig"))
      .select($"doc_id", $"pos".cast("bigint").as("j"), $"col".as("mh"))

  /** MinHash LSH near-dup pairs: band the signature (NumBands bands of
    * BandRows), bucket-join on (band, band signature), then estimate
    * similarity as the fraction of equal minhashes; keep est ≥ 0.5.
    * Only candidate pairs (≥1 colliding band) are scored — the LSH
    * contract that avoids the all-pairs product at scale.
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // no cache(): the self-join reuses the signature subplan via
    // Catalyst's ReusedExchange; an operator-held cache would pin
    // storage for the session lifetime (library leak)
    val sig = minhashSignatureArray(spark, dir)
    // band signatures by array slice — pure projection, no re-aggregation
    val bands = sig.select($"doc_id", $"sig",
      posexplode(expr(s"transform(sequence(0, ${NumBands - 1}), b -> " +
        s"concat_ws('_', slice(sig, b * $BandRows + 1, $BandRows)))")))
      .select($"doc_id", $"sig", $"pos".as("band"), $"col".as("bandsig"))
    // bucket equi-join on (band, bandsig) — alias self-join so the
    // shuffled band frame is a ReusedExchange (signatures computed once)
    bands.as("x").join(bands.as("y"),
        expr("x.band = y.band AND x.bandsig = y.bandsig AND x.doc_id < y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sig").as("sig"), col("y.sig").as("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig, sig_b, (x, y) -> x = y), v -> v))")
          .cast("double") / lit(NumPerm.toDouble))
      .filter($"est_jaccard" >= 0.5)
      .select($"a", $"b", $"est_jaccard")
      .orderBy($"a", $"b")
  }

  // ---- SimHash ----------------------------------------------------------

  val SimBits = 48

  /** 48-bit SimHash per doc: per-token 60-bit hashes vote ±1 per bit;
    * the sign vector is the fingerprint.
    *
    * One aggregation pass: per bit i, `2·count(bit set) > n_tokens` ⟺
    * the ±1 vote sum is positive, so the whole fingerprint is 48 columnar
    * conditional-sum aggregates + one projection — no bit-explode (the
    * first cut exploded tokens × 48 and was 10× slower). One row per doc
    * crosses the shuffle.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bitCounts = (0 until SimBits).map(i =>
      sum(shiftright($"h", i).bitwiseAND(lit(1L))).as(s"c_$i"))
    val sim = (0 until SimBits).map(i =>
      when(lit(2L) * col(s"c_$i") > $"n", lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    documents(spark, dir)
      .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("tok"))
      .select($"doc_id", md5Prefix60($"tok").as("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), bitCounts: _*)
      .select($"doc_id", sim.as("simhash"))
      .orderBy($"doc_id")
  }

  /** SimHash near-dup pairs: block LSH (4 blocks of 12 bits — any pair
    * within Hamming distance 3 must agree on ≥1 whole block), then exact
    * Hamming ≤ 3 via xor + bit_count. Bucket join keeps candidate
    * generation linear-ish; the 4-block scheme is exact for d ≤ 3.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhash(spark, dir)
    // self-join via aliases of the SAME plan so the shuffled block frame
    // canonicalizes identically on both sides → ReusedExchange (computes
    // the simhash aggregation once, no operator-held cache needed)
    val withBlk = sh.select($"doc_id", $"simhash",
        explode(expr("sequence(0, 3)")).as("blk"))
      .withColumn("blkval",
        expr("shiftright(simhash, cast(blk * 12 as int))").bitwiseAND(lit(4095L)))
    withBlk.as("x").join(withBlk.as("y"),
        expr("x.blk = y.blk AND x.blkval = y.blkval AND x.doc_id < y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.simhash").as("simhash"), col("y.simhash").as("sim_b")).distinct()
      .withColumn("hamming", bit_count($"simhash".bitwiseXOR($"sim_b")).cast("bigint"))
      .filter($"hamming" <= 3)
      .select($"a", $"b", $"hamming")
      .orderBy($"a", $"b")
  }

  // ---- n-gram Jaccard ---------------------------------------------------

  /** Document frequency cap for candidate generation: shingles occurring
    * in more than this many docs are dropped from pairing (standard
    * "stop-shingle" cap — at corpus scale a boilerplate shingle would
    * otherwise pair everything with everything).
    */
  val DfCap = 100

  /** Exact n-gram Jaccard near-dup pairs: candidate pairs share ≥1
    * non-stop shingle; J = |∩| / |∪| computed exactly from per-doc
    * shingle counts; keep J ≥ 0.5.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val df = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" <= DfCap)
    val rare = sh.join(df.select($"shingle"), Seq("shingle"))
    val inter = rare.as("x").join(rare.as("y"),
        expr("x.shingle = y.shingle AND x.doc_id < y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("doc_b"))
      .groupBy($"doc_id", $"doc_b").agg(count(lit(1)).as("n_inter"))
    val szB = sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_sh_b"))
    inter.join(sizes, Seq("doc_id")).join(szB, Seq("doc_b"))
      .select($"doc_id".as("a"), $"doc_b".as("b"),
        ($"n_inter".cast("double") /
          ($"n_sh" + $"n_sh_b" - $"n_inter").cast("double")).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .orderBy($"a", $"b")
  }

  // ---- embedding near-dup ----------------------------------------------

  /** Scalar-quantize an embedding into exact integer space: floor(x*1e6).
    * All downstream arithmetic (dots, norms) is exact BIGINT, making
    * cosine thresholds engine-independent — the oracle-parity form of
    * scalar quantization.
    */
  def quantized(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select($"vec_id", $"label",
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("q"))

  /** Cosine threshold for embedding near-dup pairs. The synthetic
    * embeddings are near-orthogonal (max pairwise cosine ≈ 0.51), so the
    * classic 0.95+ near-dup cutoff matches nothing; 0.35 exercises the
    * operator on a few hundred pairs. cos² form keeps arithmetic exact.
    */
  val CosThreshold = 0.35
  val Cos2Threshold: Double = CosThreshold * CosThreshold

  /** Embedding-cosine near-dup pairs (brute force within the corpus):
    * cos² = dot²/(|a|²|b|²) in exact-int-derived doubles; keep dot>0 and
    * cos ≥ [[CosThreshold]]. Brute-force is the correctness baseline;
    * the LSH bucket path in [[Similarity]] is the scale path.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.ArrayOps._
    // Norms once per vector (not per pair); dot via the codegen'd
    // LongArrayDot — the pair join is then a single tight loop per row.
    val q = quantized(spark, dir).select($"vec_id", $"q")
      .withColumn("nrm", longArrayNormSq($"q"))
    q.as("x").join(q.as("y"), expr("x.vec_id < y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        longArrayDot(col("x.q"), col("y.q")).as("dot"),
        col("x.nrm").as("na"), col("y.nrm").as("nb"))
      .withColumn("cos2",
        ($"dot".cast("double") * $"dot".cast("double")) /
          ($"na".cast("double") * $"nb".cast("double")))
      .filter($"dot" > 0 && $"cos2" >= Cos2Threshold)
      .select($"a", $"b", $"cos2")
      .orderBy($"a", $"b")
  }
}
