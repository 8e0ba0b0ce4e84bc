package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The canonical-collapse contract: collapsing exact-duplicate items
  * before near-dup pairing must lose NOTHING — the weighted rep pairs
  * plus the intra-group pairs reconstruct the uncollapsed pair count
  * exactly. This is the accounting identity that justifies never
  * materializing the Θ(Σ g²) per-copy pairs at scale.
  */
class DedupCollapseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private val dir = "/root/testdata/sf0.01"

  test("embedding collapse: Σ weights + intra-group pairs == uncollapsed pair count") {
    val uncollapsed = Dedup.embeddingNearDup(spark, dir).count()
    val collapsed = Dedup.embeddingNearDupCollapsed(spark, dir)
    val crossWeight = collapsed.agg(sum($"n_vec_pairs")).head.getLong(0)
    // intra-group pairs all pass the uncollapsed filter (cos == 1)
    // EXCEPT zero-norm groups, whose dot <= 0 fails it
    val intra = Dedup.quantized(spark, dir)
      .withColumn("nrm", graft.plans.ArrayOps.longArrayNormSq($"q"))
      .filter($"nrm" > 0)
      .groupBy($"q").agg(count(lit(1)).as("sz"))
      .agg(sum((($"sz" * ($"sz" - 1)) / 2).cast("long"))).head.getLong(0)
    assert(crossWeight + intra === uncollapsed,
      s"cross=$crossWeight intra=$intra uncollapsed=$uncollapsed")
  }

  test("embedding collapse: rep pairs are a subset of uncollapsed pairs with equal cos2") {
    val un = Dedup.embeddingNearDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val reps = Dedup.embeddingNearDupCollapsed(spark, dir).collect()
    assert(reps.nonEmpty, "fixture must produce collapsed pairs")
    reps.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(un.contains(k), s"rep pair $k missing from uncollapsed output")
      assert(un(k) === r.getDouble(2), s"cos2 mismatch for $k")
    }
  }

  test("simhash collapse: Σ weights + intra-group pairs == uncollapsed pair count") {
    val uncollapsed = Dedup.simhashPairs(spark, dir).count()
    val collapsed = Dedup.simhashPairsCollapsed(spark, dir)
    // post-collapse pairs are hamming 1..3 by construction
    assert(collapsed.filter($"hamming" === 0).count() === 0)
    val crossWeight = Option(
      collapsed.agg(sum($"n_doc_pairs")).head.get(0)).fold(0L)(_.asInstanceOf[Long])
    // identical fingerprints are hamming 0 — every intra-group pair
    // passes the uncollapsed <= 3 filter
    val intra = Dedup.simhash(spark, dir)
      .groupBy($"simhash").agg(count(lit(1)).as("sz"))
      .agg(sum((($"sz" * ($"sz" - 1)) / 2).cast("long"))).head.getLong(0)
    assert(crossWeight + intra === uncollapsed,
      s"cross=$crossWeight intra=$intra uncollapsed=$uncollapsed")
  }
}
