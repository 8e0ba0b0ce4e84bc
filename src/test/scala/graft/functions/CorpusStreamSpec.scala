package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming exact-dedup ingest: duplicate text (even with differing
  * whitespace/case) is dropped within the watermark; the first arrival
  * wins; distinct docs all pass.
  */
class CorpusStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  case class D(doc_id: Long, text: String, ts: Long)
  implicit lazy val enc: org.apache.spark.sql.Encoder[D] = Encoders.product[D]
  val t0 = 1700000000000L

  test("streaming dedup drops normalized-equal duplicates, keeps firsts") {
    val ms = MemoryStream[D](enc, spark)
    val q = CorpusPipeline.dedupStream(ms.toDF())
      .writeStream.format("memory").queryName("corpus_dedup")
      .outputMode("append").start()
    try {
      ms.addData(
        D(1, "The quick fox", t0),
        D(2, "the  QUICK   fox ", t0 + 1000), // dup of 1 after normalize
        D(3, "something else", t0 + 2000))
      q.processAllAvailable()
      ms.addData(D(4, "the quick fox", t0 + 3000)) // dup within watermark
      q.processAllAvailable()
      val got = spark.table("corpus_dedup").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 3L))
    } finally q.stop()
  }
}
