package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Equivalence contract for the PQ encode/reconstruct kernel
  * ([[org.apache.spark.sql.graftexpr.PqKernel]]): on the real corpus it
  * must reproduce the original Catalyst HOF tower exactly — argmin per
  * subspace with lowest-cid tiebreak, then concatenated codeword
  * slices — because the `sim_pq*`/`sim_ivfpq*` oracles were gated
  * against that tower.
  */
class PqExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private val dir = "/root/testdata/sf0.01"
  private val M = graft.functions.Similarity.PqM
  private val Sub = graft.functions.Similarity.PqSub
  private val Codes = graft.functions.Similarity.PqCodes

  test("pqReconstruct kernel == HOF codes+recon tower on the real corpus") {
    val cb = graft.functions.Dedup.quantized(spark, dir)
      .filter($"vec_id" < Codes)
      .select($"vec_id".as("cid"), $"q".as("cv"))
      .agg(collect_list(struct($"cid", $"cv")).as("cb"))
    val base = graft.functions.Dedup.quantized(spark, dir)
      .select($"vec_id", $"q")
      .join(broadcast(cb), lit(true))
    val hofCodes = expr(
      s"""transform(sequence(0, ${M - 1}), m ->
         |  element_at(array_sort(transform(cb, c -> struct(
         |    aggregate(zip_with(slice(q, m * $Sub + 1, $Sub),
         |                       slice(c.cv, m * $Sub + 1, $Sub),
         |                       (a, b) -> (a - b) * (a - b)),
         |              0L, (acc, x) -> acc + x) AS d,
         |    c.cid AS cid))), 1).cid)""".stripMargin)
    val hofRecon = expr(
      s"""flatten(transform(codes, (cid, m) ->
         |  slice(element_at(filter(cb, c -> c.cid = cid), 1).cv,
         |        m * $Sub + 1, $Sub)))""".stripMargin)
    val bad = base
      .withColumn("codes", hofCodes)
      .withColumn("h", hofRecon)
      .withColumn("k", ArrayOps.pqReconstruct($"q", $"cb", M, Sub))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0)
  }
}
