package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sequence packing: the distributed window form must equal a
  * sequential per-source reference pack, and pack geometry invariants
  * must hold (dense layout, offsets inside the pack, span arithmetic).
  */
class PackSequencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private case class Packed(docId: Long, source: String, nTokens: Long,
      startPack: Long, startOffset: Long, nPacks: Long)

  private lazy val rows: Seq[Packed] =
    Sampling.packSequences(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => Packed(r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq

  test("equals a sequential per-source reference pack") {
    val L = Sampling.PackLen
    rows.groupBy(_.source).foreach { case (source, docs) =>
      var cum = 0L
      docs.sortBy(_.docId).foreach { d =>
        val expStartPack = cum / L
        val expOffset = cum % L
        val expPacks =
          if (d.nTokens == 0) 0L else (cum + d.nTokens - 1) / L - cum / L + 1
        assert((d.startPack, d.startOffset, d.nPacks) ===
          ((expStartPack, expOffset, expPacks)),
          s"doc ${d.docId} in $source (cum=$cum, n=${d.nTokens})")
        cum += d.nTokens
      }
    }
  }

  test("geometry invariants: dense, in-range offsets, spans cover the tokens") {
    val L = Sampling.PackLen
    assert(rows.nonEmpty && rows.exists(_.nPacks > 1),
      "fixture must contain at least one boundary-crossing document")
    rows.foreach { d =>
      assert(d.startOffset >= 0 && d.startOffset < L, s"doc ${d.docId}")
      // tokens available in the spanned packs must cover the document
      if (d.nTokens > 0) {
        val capacity = d.nPacks * L - d.startOffset
        assert(d.nTokens <= capacity, s"doc ${d.docId} overflows its span")
        assert(d.nTokens > capacity - L, s"doc ${d.docId} spans a spare pack")
      }
    }
    // dense: per source, total tokens == last doc's start position + its count
    rows.groupBy(_.source).foreach { case (source, docs) =>
      val sorted = docs.sortBy(_.docId)
      val total = sorted.map(_.nTokens).sum
      val last = sorted.last
      assert(last.startPack * L + last.startOffset + last.nTokens === total,
        s"$source layout must be gap-free")
    }
  }
}
