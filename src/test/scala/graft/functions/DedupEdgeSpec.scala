package graft.functions

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Regression cases from review: short documents must produce no
  * pseudo-shingles (Spark's sequence(0,-1) is descending).
  */
class DedupEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  test("docs with fewer than 3 tokens produce zero shingles") {
    val docs = spark.createDataFrame(Seq(
      (1L, "foo bar"), (2L, "foo"), (3L, ""), (4L, "a b c d")))
      .toDF("doc_id", "text")
    val sh = Dedup.shinglesOf(docs)
    val byDoc = sh.groupBy($"doc_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!byDoc.contains(1L) && !byDoc.contains(2L) && !byDoc.contains(3L))
    assert(byDoc(4L) === 2L) // 'a b c', 'b c d'
  }
}
