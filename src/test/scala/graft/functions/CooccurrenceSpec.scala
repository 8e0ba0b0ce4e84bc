package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Windowed co-occurrence PMI: pair generation replayed by hand on a
  * constructed corpus (shift semantics, tail-null filtering, canonical
  * pair order, cross-doc isolation) and the PMI ratio checked against
  * the definition.
  */
class CooccurrenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("shifted-zip pairs match the positional definition; PMI exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cooc").toString
    // doc1: a b c  -> shift1: (a,b) (b,c); shift2: (a,c)
    // doc2: c a    -> shift1: (a,c) canonicalized
    spark.createDataFrame(Seq(
      (1L, "a b c", "en", "s", 5L),
      (2L, "c a", "en", "s", 3L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.cooccurrencePmi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // pair counts: (a,b)=1 (b,c)=1 (a,c)=2; T=4; unigrams a=2 b=1 c=2, U=5
    assert(got.keySet === Set(("a", "b"), ("b", "c"), ("a", "c")))
    assert(got(("a", "c"))._1 === 2L)
    assert(got(("a", "b"))._1 === 1L)
    def pmi(nab: Long, ca: Long, cb: Long): Double =
      ((nab.toDouble * 5.0) * 5.0) / ((4.0 * ca.toDouble) * cb.toDouble)
    assert(got(("a", "c"))._2 === pmi(2, 2, 2))
    assert(got(("a", "b"))._2 === pmi(1, 2, 1))
    assert(got(("b", "c"))._2 === pmi(1, 1, 2))
    // no cross-document pair: (b,?) with doc2's tokens never appears
    assert(!got.contains(("b", "c")) || got(("b", "c"))._1 === 1L)
  }

  test("single-token and empty docs emit no pairs; window caps reach") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cooc2").toString
    // 'a ... d': distance 3 > window 2, so (a,d) must NOT pair
    spark.createDataFrame(Seq(
      (1L, "a b c d", "en", "s", 7L),
      (2L, "x", "en", "s", 1L),
      (3L, "", "en", "s", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val keys = TextAnalysis.cooccurrencePmi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!keys.contains(("a", "d")), "window radius must bound pair reach")
    assert(!keys.exists(p => p._1 == "x" || p._2 == "x"))
    assert(keys === Set(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")))
  }
}
