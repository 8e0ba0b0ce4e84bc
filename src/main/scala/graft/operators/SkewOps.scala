package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft._

/** Skew-mitigation utilities — the manual fallbacks for when AQE's
  * runtime skew-join splitting isn't applicable (e.g. skewed
  * aggregations, or joins whose skew is known up front).
  *
  * Salting spreads one hot key over `buckets` sub-keys. For an
  * aggregation that is two-phase: partial aggregate on (key, salt), then
  * final aggregate on key — the same shape as Spark's own partial
  * aggregation but with an extra explicit level that caps any single
  * reducer's share of a hot key at 1/buckets. For a join it replicates
  * the small side once per salt value.
  *
  * Determinism: the salt is derived from stable columns via a hash (not
  * rand()), so results — and the oracle compare — are reproducible.
  */
object SkewOps {

  /** Deterministic salt in [0, buckets) from stable columns. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-level (salted) sum aggregation:
    * groupBy(key, salt) partial sums → groupBy(key) final sums.
    */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: Column,
      buckets: Int, saltSource: Column): DataFrame =
    df.withColumn("__salt", salt(buckets, saltSource))
      .groupBy(col(keyCol), $"__salt")
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__pn"))
      .groupBy(col(keyCol))
      .agg(sum($"__partial").as("total"), sum($"__pn").as("n"))

  /** Heavy-hitter detection without a full-key shuffle — the skew SCAN
    * that decides when the mitigations above are needed. Pass 1: one
    * Misra-Gries summary ([[org.apache.spark.sql.graftexpr.FreqItemsAgg]])
    * over the whole frame — partial per task, one k-entry buffer per
    * partition on the wire, no groupBy on the key. Its counters
    * undercount by at most N/(k+1), so `est + N/(k+1) >= threshold`
    * yields a CANDIDATE superset that provably contains every true heavy
    * hitter. Pass 2: exact counts for the ≤ k candidates only (the
    * groupBy shuffles just the candidate keys' rows, ≤ k distinct keys)
    * and the exact `count >= threshold` filter — so the answer is exact
    * even though the summary is order-dependent, and the oracle is a
    * plain GROUP BY ... HAVING. Requires threshold > N/(k+1), checked at
    * runtime — below that MG cannot promise completeness.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      threshold: Long): DataFrame =
    heavyHittersImpl(df, keyCol, k, _ => threshold)

  /** [[heavyHitters]] with the threshold given as a SHARE of the total
    * row count (`shareNum/shareDen`, e.g. 22/1000 = 2.2%), the form a
    * skew scan actually uses — "hot" is relative to N, and a share keeps
    * one query definition valid at every data scale.
    */
  def heavyHittersByShare(df: DataFrame, keyCol: String, k: Int,
      shareNum: Long, shareDen: Long): DataFrame =
    heavyHittersImpl(df, keyCol, k,
      n => (n * shareNum + shareDen - 1) / shareDen)

  private def heavyHittersImpl(df: DataFrame, keyCol: String, k: Int,
      thresholdOf: Long => Long): DataFrame = {
    import org.apache.spark.sql.graftexpr.FreqItemsAgg
    // pass 1 collapses to ONE row of ≤ k entries — collecting it is the
    // runtime-filter pattern (O(k) on the driver), not a data collect
    val row = df.agg(
      FreqItemsAgg.freqItems(col(keyCol), k).as("__mg"),
      count(lit(1)).as("__n")).head()
    val n = row.getLong(1)
    val threshold = thresholdOf(n)
    require(threshold > n / (k + 1),
      s"heavyHitters: threshold $threshold is within the MG error bound " +
        s"N/(k+1) = ${n / (k + 1)} — raise threshold or k")
    val candidates = row.getSeq[org.apache.spark.sql.Row](0)
      .collect { case kv if kv.getLong(1) + n / (k + 1) >= threshold =>
        kv.getLong(0) }
    val candDf = df.sparkSession
      .createDataFrame(candidates.map(Tuple1.apply)).toDF(keyCol)
    df.join(broadcast(candDf), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= threshold)
  }

  /** Salted join: the big (skewed) side gets a salt from stable columns;
    * the small side is exploded once per salt value, then an equi-join
    * on (key, salt). Output = the unsalted join, but no reducer sees
    * more than ~1/buckets of any hot key.
    *
    * The shuffle_hash hint pins the shuffled plan: salting presupposes
    * the small side cannot broadcast (if it could, you would broadcast
    * and skip the salt entirely), and without the hint Catalyst would
    * broadcast the exploded side at test scale, silently testing a
    * different operator than the one that runs at 100 TB.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, bigSaltSource: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(buckets, bigSaltSource))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(explodedSmall.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
