package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import RetentionStream.{ActivityEvent, DayActive}

/** Streaming retention twin: watermark-ordered cohort assignment under
  * out-of-order arrival, batch parity against the ADS retention matrix,
  * and the DWS serving path (cell counts through DwsSink) with
  * checkpoint restart.
  */
class RetentionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr
  implicit lazy val enc = Encoders.product[ActivityEvent]

  val Day = 86400000L
  val B = 1700006400000L // 2023-11-15 00:00:00 UTC, a day boundary
  val Hour = 3600000L

  test("batch twin reproduces the retention matrix cell counts on real events") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, dir)
      .select($"user_id", unix_millis($"ts").as("ts"))
      .as[ActivityEvent]
    val got = RetentionStream.cellCounts(RetentionStream.dayActivations(evs))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = graft.operators.FunnelOps.retentionCohorts(spark, dir)
      .select($"cohort", $"day_offset", $"users")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.nonEmpty && got.exists(_._1._2 > 0L),
      "fixture must exercise non-zero day offsets")
  }

  test("late-arriving earliest day still assigns the cohort; days emit once") {
    val work = Files.createTempDirectory("retention-stream").toString
    val ms = MemoryStream[ActivityEvent](enc, spark)
    val q = RetentionStream.dayActivations(ms.toDS()).writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()
    try {
      // user 1's DAY-1 event arrives before their day-0 event inside
      // the same watermark horizon — the fold must still consume the
      // earlier ts first, assigning cohort day 0 (an arrival-order
      // running-min would assign day 1 and then trip on day 0); the
      // day-1 repeat must not re-emit
      ms.addData(ActivityEvent(1, B + Day + Hour), ActivityEvent(1, B + Hour),
        ActivityEvent(1, B + Day + 2 * Hour), ActivityEvent(2, B + Day + 3 * Hour))
      q.processAllAvailable()
      // drain: advance the watermark far past everything
      ms.addData(ActivityEvent(99, B + 5 * Day))
      q.processAllAvailable()
      ms.addData(ActivityEvent(99, B + 6 * Day))
      q.processAllAvailable()

      val got = spark.read.parquet(s"$work/out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val d0 = Math.floorDiv(B, Day)
      val expect = Set(
        (1L, d0, 0L), (1L, d0, 1L), // user 1: cohort day 0, active days 0 and 1
        (2L, d0 + 1, 0L), // user 2's cohort is day 1
        (99L, d0 + 5, 0L)) // the final sentinel stays held at stop
      assert(got === expect)
    } finally q.stop()
  }

  test("DWS retention cells survive checkpoint restart without double counting") {
    val work = Files.createTempDirectory("retention-dws").toString
    val ms = MemoryStream[ActivityEvent](enc, spark)
    def start() = RetentionStream.serveCells(
      RetentionStream.dayActivations(ms.toDS()), s"$work/store", s"$work/ckpt")
    def stored(): Map[(String, Long), Long] =
      DwsSink.read(spark, s"$work/store", "retention",
        Seq("cohort", "day_offset", "users"))
        .collect()
        .map(r => (r.getString(0), r.getString(1).toLong) -> r.getString(2).toLong)
        .toMap
    val cohort0 = "2023-11-15"

    val q1 = start()
    try {
      ms.addData(ActivityEvent(1, B + Hour), ActivityEvent(2, B + 2 * Hour))
      q1.processAllAvailable()
      ms.addData(ActivityEvent(3, B + 26 * Hour)) // day 1 entrant, drains day 0
      q1.processAllAvailable()
      ms.addData(ActivityEvent(3, B + 30 * Hour))
      q1.processAllAvailable()
      // the post-batch no-data micro-batch fires user 3's timer once
      // the watermark clears their entry event
      assert(stored() === Map((cohort0, 0L) -> 2L, ("2023-11-16", 0L) -> 1L))
    } finally q1.stop()

    // restart on the same checkpoint: user 3's held day-1 entry and
    // user 1's day-1 return (both ahead of the recovered watermark)
    // must count exactly once each; user 1's second day-1 event and
    // user 3's second day-1 event must NOT recount
    val q2 = start()
    try {
      ms.addData(ActivityEvent(1, B + 30 * Hour))
      q2.processAllAvailable()
      ms.addData(ActivityEvent(3, B + 3 * Day), ActivityEvent(1, B + 31 * Hour))
      q2.processAllAvailable()
      ms.addData(ActivityEvent(3, B + 4 * Day))
      q2.processAllAvailable()
      val s = stored()
      assert(s((cohort0, 0L)) === 2L)
      assert(s((cohort0, 1L)) === 1L)
      // day-1 cohort (user 3): entry day counted once in q1, the
      // 3-day return (offset 2) drains here; the 4-day return is still
      // inside the watermark horizon at stop
      assert(s === Map((cohort0, 0L) -> 2L, (cohort0, 1L) -> 1L,
        ("2023-11-16", 0L) -> 1L, ("2023-11-16", 2L) -> 1L))
    } finally q2.stop()
  }
}
