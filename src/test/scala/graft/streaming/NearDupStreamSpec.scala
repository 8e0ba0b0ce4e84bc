package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

object NearDupStreamSpec {
  case class D(doc_id: Long, text: String, ts: Long)
}

/** Streaming MinHash-LSH near-dup detection: first owner wins, later
  * colliders are flagged against the owner, distinct docs pass, and
  * state carries across micro-batches.
  */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr
  import NearDupStreamSpec.D

  implicit lazy val enc: org.apache.spark.sql.Encoder[D] = Encoders.product[D]
  val t0 = 1700000000000L

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the sun sets slowly behind distant purple mountains tonight"

  test("near-identical docs flag against the first owner across batches") {
    val ms = MemoryStream[D](enc, spark)
    val q = NearDupStream.nearDups(ms.toDF())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      ms.addData(
        D(1, base, t0),
        D(2, "a completely different tiny document about database engines and " +
          "storage formats with columnar layouts and vectorized execution", t0 + 1000))
      q.processAllAvailable()
      // batch 2: a near-copy of doc 1 (one word changed) and an exact copy
      ms.addData(D(3, base.replace("lazy", "sleepy"), t0 + 2000),
        D(4, base, t0 + 3000))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .select($"doc_id", $"dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // docs 3 and 4 must both be flagged against owner 1; doc 2 clean
      assert(got.contains((4L, 1L)), got)
      assert(got.exists(_._1 == 3L), got)
      assert(!got.exists(_._1 == 2L), got)
      assert(!got.exists(_._1 == 1L), got)
    } finally q.stop()
  }

  test("a late duplicate with a SMALLER doc_id is flagged against the stored owner") {
    val ms = MemoryStream[D](enc, spark)
    val q = NearDupStream.nearDups(ms.toDF())
      .writeStream.format("memory").queryName("neardup_late")
      .outputMode("append").start()
    try {
      ms.addData(D(10, base, t0))
      q.processAllAvailable()
      ms.addData(D(3, base, t0 + 1000)) // exact copy, smaller id, later batch
      q.processAllAvailable()
      val got = spark.table("neardup_late")
        .select($"doc_id", $"dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((3L, 10L)), got)
    } finally q.stop()
  }

  test("band-owner state survives query restart from checkpoint") {
    val work = java.nio.file.Files.createTempDirectory("neardup-restart").toString
    val ms = MemoryStream[D](enc, spark)
    val out = NearDupStream.nearDups(ms.toDF())
    def start() = out.writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()

    val q1 = start()
    ms.addData(D(1, base, t0))
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // fresh query instance, same checkpoint
    ms.addData(D(7, base, t0 + 1000)) // duplicate seen only post-restart
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(s"$work/out")
      .select($"doc_id", $"dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // flagged against the PRE-restart owner only if state was recovered
    assert(got == Set((7L, 1L)), got)
  }

  test("batch mode (NoTimeout path) matches the collision contract") {
    import spark.implicits._
    val df = Seq(D(10, base, t0), D(11, base, t0 + 1),
      D(12, "unrelated short words only here", t0 + 2)).toDF()
    val got = NearDupStream.nearDups(df)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((11L, 10L)))
  }
}
