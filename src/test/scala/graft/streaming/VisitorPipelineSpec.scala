package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import VisitorPipeline.PageEvent

/** ST2 (UV dedup) and ST3 (bounce/CEP) semantics, streaming vs batch
  * twin, covering the FIXTURES.md §2 bounce cases:
  * (a) entry→entry within 10 s ⇒ first bounces,
  * (b) entry then silence ⇒ bounce via event-time timeout,
  * (c) entry→non-entry within 10 s ⇒ no bounce.
  */
class VisitorPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  implicit lazy val enc = Encoders.product[PageEvent]

  val t0 = 1700000000000L // fixed epoch base

  test("uv dedup (streaming): one row per mid per day, cross-batch state") {
    val ms = MemoryStream[PageEvent](enc, spark)
    val out = VisitorPipeline.uvStreaming(ms.toDF())
    val q = out.writeStream.format("memory").queryName("uv_out")
      .outputMode("append").start()
    try {
      ms.addData(
        PageEvent("m1", "home", null, t0),
        PageEvent("m1", "home", "", t0 + 1000), // same day, entry again
        PageEvent("m1", "detail", "home", t0 + 2000)) // not an entry
      q.processAllAvailable()
      ms.addData(PageEvent("m1", "home", null, t0 + 86400000L + 1000)) // next day
      q.processAllAvailable()
      val got = spark.table("uv_out").select("mid", "dt")
      assert(got.count() === 2) // one per day
    } finally q.stop()
  }

  test("bounce cases (a) and (c) in one batch") {
    val ms = MemoryStream[PageEvent](enc, spark)
    val out = VisitorPipeline.bounceStreaming(ms.toDS())
    val q = out.writeStream.format("memory").queryName("bounce_ac")
      .outputMode("append").start()
    try {
      ms.addData(
        // m1: entry -> entry 5 s later => first bounces (a)
        PageEvent("m1", "home", null, t0),
        PageEvent("m1", "home", "", t0 + 5000),
        // m2: entry -> page view 3 s later => no bounce (c)
        PageEvent("m2", "home", null, t0),
        PageEvent("m2", "detail", "home", t0 + 3000))
      q.processAllAvailable()
      val got = spark.table("bounce_ac").as[PageEvent](enc).collect()
      assert(got.map(e => (e.mid, e.ts)).toSet === Set(("m1", t0)))
    } finally q.stop()
  }

  test("bounce case (b): silence triggers event-time timeout") {
    val ms = MemoryStream[PageEvent](enc, spark)
    val out = VisitorPipeline.bounceStreaming(ms.toDS())
    val q = out.writeStream.format("memory").queryName("bounce_b")
      .outputMode("append").start()
    try {
      ms.addData(PageEvent("m3", "home", null, t0))
      q.processAllAvailable()
      // advance the watermark far past t0+10s via another key
      ms.addData(PageEvent("mx", "home", "prev", t0 + 60000))
      q.processAllAvailable()
      ms.addData(PageEvent("mx", "detail", "home", t0 + 61000))
      q.processAllAvailable()
      val got = spark.table("bounce_b").as[PageEvent](enc).collect()
      assert(got.exists(e => e.mid == "m3" && e.ts == t0))
    } finally q.stop()
  }

  test("late event from before the pending entry does not clear it") {
    val ms = MemoryStream[PageEvent](enc, spark)
    val out = VisitorPipeline.bounceStreaming(ms.toDS())
    val q = out.writeStream.format("memory").queryName("bounce_late")
      .outputMode("append").start()
    try {
      ms.addData(PageEvent("m7", "home", null, t0)) // entry becomes pending
      q.processAllAvailable()
      // a non-entry event from BEFORE the entry arrives late (within the
      // 1 s disorder tolerance): must not count as a follow-up page
      ms.addData(PageEvent("m7", "prev", "x", t0 - 500))
      q.processAllAvailable()
      // silence + watermark advance => the pending entry still bounces
      ms.addData(PageEvent("zz", "p", "x", t0 + 60000))
      q.processAllAvailable()
      ms.addData(PageEvent("zz", "p2", "p", t0 + 61000))
      q.processAllAvailable()
      val got = spark.table("bounce_late").as[PageEvent](enc).collect()
      assert(got.exists(e => e.mid == "m7" && e.ts == t0),
        "late pre-entry event must not suppress the bounce")
    } finally q.stop()
  }

  test("a late ENTRY before the pending entry bounces itself") {
    val ms = MemoryStream[PageEvent](enc, spark)
    val out = VisitorPipeline.bounceStreaming(ms.toDS())
    val q = out.writeStream.format("memory").queryName("bounce_late_entry")
      .outputMode("append").start()
    try {
      ms.addData(PageEvent("m8", "home", null, t0)) // pending entry
      q.processAllAvailable()
      // late entry 500ms earlier: in event-time order it was followed by
      // the pending entry => entry->entry pattern, it bounced
      ms.addData(PageEvent("m8", "home", "", t0 - 500))
      q.processAllAvailable()
      val got = spark.table("bounce_late_entry").as[PageEvent](enc).collect()
      assert(got.exists(e => e.mid == "m8" && e.ts == t0 - 500))
    } finally q.stop()
  }

  import graft.ColStr // $ interpolator for DataFrame twin

  test("streaming semantics match the batch lead() twin on a closed input") {
    val events = Seq(
      PageEvent("m1", "home", null, t0),
      PageEvent("m1", "home", "", t0 + 5000),
      PageEvent("m1", "cart", "home", t0 + 6000),
      PageEvent("m2", "home", null, t0),
      PageEvent("m2", "detail", "home", t0 + 3000),
      PageEvent("m3", "home", null, t0),
      PageEvent("m4", "home", null, t0),
      PageEvent("m4", "list", "home", t0 + 20000))
    val batchDf = spark.createDataFrame(events)
    val expected = VisitorPipeline.bounceBatch(batchDf)
      .as[PageEvent](enc).collect().map(e => (e.mid, e.ts)).toSet

    val ms = MemoryStream[PageEvent](enc, spark)
    val q = VisitorPipeline.bounceStreaming(ms.toDS())
      .writeStream.format("memory").queryName("bounce_eq")
      .outputMode("append").start()
    try {
      ms.addData(events: _*)
      q.processAllAvailable()
      // flush pending timeouts with a late watermark-advancing key
      ms.addData(PageEvent("zz", "home", "x", t0 + 999000))
      q.processAllAvailable()
      ms.addData(PageEvent("zz", "home", "x", t0 + 999500))
      q.processAllAvailable()
      val got = spark.table("bounce_eq").as[PageEvent](enc).collect()
        .map(e => (e.mid, e.ts)).toSet
      assert(got === expected)
      // the closed-input truth: m1@t0 (a), m3@t0 (b), m4@t0 (gap>10s)
      assert(expected === Set(("m1", t0), ("m3", t0), ("m4", t0)))
    } finally q.stop()
  }
}
