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

  test("pqReconstruct names the expression on malformed input") {
    // empty codebook / short vector / short codeword must raise a
    // descriptive error, not getStruct(-1) or an index crash deep in
    // generated code
    import org.apache.spark.sql.graftexpr.PqKernel
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    def longs(n: Int): GenericArrayData =
      new GenericArrayData(Array.tabulate(n)(i => java.lang.Long.valueOf(i.toLong)): Array[Any])
    def cbOf(cvLen: Int): GenericArrayData = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](java.lang.Long.valueOf(0L), longs(cvLen)))))
    val emptyCb = new GenericArrayData(Array.empty[Any])
    val e1 = intercept[IllegalArgumentException] {
      PqKernel.reconstruct(longs(8), emptyCb, 2, 4)
    }
    assert(e1.getMessage.contains("pq_reconstruct") &&
      e1.getMessage.contains("empty codebook"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PqKernel.reconstruct(longs(7), cbOf(8), 2, 4)
    }
    assert(e2.getMessage.contains("pq_reconstruct") &&
      e2.getMessage.contains("vector"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      PqKernel.reconstruct(longs(8), cbOf(7), 2, 4)
    }
    assert(e3.getMessage.contains("pq_reconstruct") &&
      e3.getMessage.contains("codeword"), e3.getMessage)
    // well-formed input on the same code path still reconstructs
    assert(PqKernel.reconstruct(longs(8), cbOf(8), 2, 4).numElements() === 8)
  }
}
