package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Exact cross-source vocabulary Jaccard: hand-checked on a constructed
  * corpus (including repeated tokens, which must collapse to the
  * distinct vocabulary before any counting) and structurally on the
  * driver fixture.
  */
class OverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  test("sourceOverlap computes distinct-vocabulary Jaccard per source pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ovl").toString
    spark.createDataFrame(Seq(
      (1L, "apple banana apple", "en", "A", 18L), // 'apple' twice: vocab {apple,banana}
      (2L, "banana cherry", "en", "B", 13L),
      (3L, "Cherry! banana", "en", "B", 14L), // casing/punct fold into same vocab
      (4L, "date", "en", "C", 4L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.sourceOverlap(spark, dir)
      .orderBy($"src_a", $"src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    // A={apple,banana} B={banana,cherry} C={date}
    // A-B share {banana}: 1/3; pairs with C share nothing and emit no row
    assert(got === Seq(("A", "B", 2L, 2L, 1L, 1.0 / 3.0)))
  }

  test("sourceOverlap on the fixture: jaccard in (0,1], n_common bounded by both vocabularies") {
    val out = TextAnalysis.sourceOverlap(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (na, nb, common, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(common >= 1L && common <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
      assert(r.getString(0) < r.getString(1), "pairs are canonical a<b")
    }
  }
}
