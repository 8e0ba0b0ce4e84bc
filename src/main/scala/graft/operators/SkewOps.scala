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
