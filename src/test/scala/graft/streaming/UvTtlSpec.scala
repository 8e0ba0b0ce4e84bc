package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import VisitorPipeline.PageEvent

/** ST2 exact-TTL variant: per-mid date state with event-time timeout. */
class UvTtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  implicit lazy val enc = Encoders.product[PageEvent]
  // 01:00 UTC so +1h/+2h stay within the same calendar day
  val t0 = 1700000000000L - (1700000000000L % 86400000L) + 3600000L

  test("emits one entry per mid per day; non-entries never emit") {
    val ms = MemoryStream[PageEvent](enc, spark)
    val q = VisitorPipeline.uvStreamingTtl(ms.toDS())
      .writeStream.format("memory").queryName("uvttl_out")
      .outputMode("append").start()
    try {
      ms.addData(
        PageEvent("m1", "home", null, t0),
        PageEvent("m1", "list", "", t0 + 5000),      // same day entry: dedup
        PageEvent("m1", "detail", "home", t0 + 9000)) // non-entry: never
      q.processAllAvailable()
      // other-key traffic advances the watermark; m1's day-state must
      // survive (TTL is anchored on m1's newest event, not the epoch-0
      // first-batch watermark)
      ms.addData(PageEvent("mX", "home", null, t0 + 3600000L))
      q.processAllAvailable()
      ms.addData(PageEvent("m1", "home", null, t0 + 7200000L)) // same day again
      q.processAllAvailable()
      ms.addData(PageEvent("m1", "home", null, t0 + 86400000L + 1000)) // next day
      q.processAllAvailable()
      val got = spark.table("uvttl_out").as[PageEvent](enc).collect()
        .map(e => (e.mid, e.ts)).toSet
      assert(got === Set(("m1", t0), ("mX", t0 + 3600000L),
        ("m1", t0 + 86400000L + 1000)))
    } finally q.stop()
  }
}
