package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Tile-level (line/paragraph-hash) dedup: intra-document first-occurrence
  * semantics and the cross-document boilerplate pass, on fixtures small
  * enough to hand-verify. TileLen = 2, so docs are cut into consecutive
  * 2-word tiles.
  */
class TileDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("intra-doc tile dedup keeps first occurrences in position order") {
    // tiles: [a b][c d][a b][e] — tile 2 repeats tile 0; the odd tail
    // tile is its own (shorter) segment and never merges with neighbors
    val out = TextAnalysis.tileDedupOf(docs(
      (1L, "a b c d a b e"),
      (2L, "x y x y x y"), // tiles [x y]×3 → one survivor
      (3L, "p q r s"))) // no repeats → unchanged
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((4L, 3L, "a b c d e")))
    assert(out(2L) === ((3L, 1L, "x y")))
    assert(out(3L) === ((2L, 2L, "p q r s")))
  }

  test("tokenizer alignment: punctuation and case fold before tiling") {
    val out = TextAnalysis.tileDedupOf(docs((7L, "A, b! a B c")))
      .collect().head
    // tokens (a b a b c) → tiles [a b][a b][c] → [a b][c]
    assert((out.getLong(1), out.getLong(2), out.getString(3)) ===
      ((3L, 2L, "a b c")))
  }

  test("boilerplate pass drops tiles above the 4%-of-docs bar, keeps docs intact otherwise") {
    // 30 docs: every doc starts with the same 2 words (df = 100%), then
    // carries a unique payload (df = 1 doc ≈ 3% < 4%)
    val fixture = (0L until 30L).map(i => (i, s"the footer w${i}a w${i}b"))
    val out = CorpusPipeline.boilerplateTilesOf(docs(fixture: _*))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.size === 30)
    (0L until 30L).foreach { i =>
      assert(out(i) === ((2L, 1L, s"w${i}a w${i}b")))
    }
  }

  test("a doc that is pure boilerplate still emits, with empty clean_text") {
    val fixture = (0L until 30L).map(i => (i, s"the footer w${i}a w${i}b")) :+
      (99L -> "the footer")
    val out = CorpusPipeline.boilerplateTilesOf(docs(fixture: _*))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(99L) === ((1L, 1L, "")))
  }

  test("streaming boilerplate clean matches the batch pass (stateless stream-static form)") {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val fixture = (0L until 30L).map(i => (i, s"the footer w${i}a w${i}b"))
    val batchDocs = docs(fixture: _*)
    val expected = CorpusPipeline.boilerplateTilesOf(batchDocs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val bp = CorpusPipeline.boilerplateSet(batchDocs)
    implicit val enc: org.apache.spark.sql.Encoder[(Long, String)] =
      Encoders.product[(Long, String)]
    val ms = MemoryStream[(Long, String)](enc, spark)
    val q = CorpusPipeline.boilerplateCleanStream(
        ms.toDF().toDF("doc_id", "text"), bp)
      .writeStream.format("memory").queryName("bp_clean")
      .outputMode("append").start()
    try {
      ms.addData(fixture.take(15): _*)
      q.processAllAvailable()
      ms.addData(fixture.drop(15): _*)
      q.processAllAvailable()
      val got = spark.table("bp_clean").collect().map((r: Row) =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("intra-doc dedup is a pure narrow pipeline: zero shuffles") {
    val df = TextAnalysis.tileDedup(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan
    val inner = plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(plan)
    val keyed = inner.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if !s.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => s
    }
    assert(keyed.isEmpty, inner.toString)
  }
}
