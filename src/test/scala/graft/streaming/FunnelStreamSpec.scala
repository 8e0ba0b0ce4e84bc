package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import FunnelStream.{FunnelEvent, StepReach}

/** Streaming funnel twin: min-ts chain semantics under out-of-order
  * arrival, batch/streaming parity against the ADS funnel operator, and
  * the DWS serving path (step counts maintained through DwsSink) with
  * checkpoint restart.
  */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr
  implicit lazy val enc = Encoders.product[FunnelEvent]

  val B = 1700000000000L
  val Hour = 3600000L

  test("batch twin reproduces the ADS funnel per-step user counts on real events") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_millis($"ts").as("ts"))
      .as[FunnelEvent]
    val got = FunnelStream.stepReaches(evs).toDF()
      .groupBy($"step").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = graft.operators.FunnelOps.funnel(spark, dir)
      .select($"step", $"users")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("out-of-order arrival folds in event-time order; steps fire once per user") {
    val work = Files.createTempDirectory("funnel-stream").toString
    val ms = MemoryStream[FunnelEvent](enc, spark)
    val q = FunnelStream.stepReaches(ms.toDS()).writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()
    try {
      // user 1's click ARRIVES before their view (both within watermark);
      // user 2's first click precedes their view in event time, so only
      // the second click qualifies; user 3 views only
      ms.addData(FunnelEvent(1, "click", B + 2000), FunnelEvent(3, "view", B + 1000),
        FunnelEvent(2, "click", B + 1000))
      q.processAllAvailable()
      ms.addData(FunnelEvent(1, "view", B + 1000), FunnelEvent(2, "view", B + 3000))
      q.processAllAvailable()
      ms.addData(FunnelEvent(1, "purchase", B + 5000), FunnelEvent(2, "click", B + 4000))
      q.processAllAvailable()
      // advance the watermark far past the real events so held buffers drain
      ms.addData(FunnelEvent(99, "noop", B + 3 * Hour))
      q.processAllAvailable()
      ms.addData(FunnelEvent(99, "noop", B + 4 * Hour))
      q.processAllAvailable()

      val got = spark.read.parquet(s"$work/out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val expect = Set(
        (1L, 1L, B + 1000), (1L, 2L, B + 2000), (1L, 3L, B + 5000),
        (2L, 1L, B + 3000), (2L, 2L, B + 4000),
        (3L, 1L, B + 1000))
      assert(got === expect)
    } finally q.stop()
  }

  test("DWS step counts served through DwsSink survive checkpoint restart without double counting") {
    val work = Files.createTempDirectory("funnel-dws").toString
    val ms = MemoryStream[FunnelEvent](enc, spark)
    def start() = FunnelStream.serveCounts(FunnelStream.stepReaches(ms.toDS()),
      s"$work/store", s"$work/ckpt")
    def stored(): Map[String, Long] =
      DwsSink.read(spark, s"$work/store", "funnel", Seq("step_name", "users"))
        .collect().map(r => r.getString(0) -> r.getString(1).toLong).toMap

    val q1 = start()
    try {
      ms.addData(FunnelEvent(1, "view", B + 1000), FunnelEvent(1, "click", B + 2000),
        FunnelEvent(2, "view", B + 1500))
      q1.processAllAvailable()
      ms.addData(FunnelEvent(99, "noop", B + 3 * Hour)) // drain horizon
      q1.processAllAvailable()
      ms.addData(FunnelEvent(99, "noop", B + 4 * Hour))
      q1.processAllAvailable()
      assert(stored() === Map("view" -> 2L, "click" -> 1L))
    } finally q1.stop()

    // restart on the same checkpoint: chain state (user 1 already past
    // click, user 2 at view) and the running counts must both recover —
    // user 1's purchase now qualifies, user 2's re-view must NOT recount
    val q2 = start()
    try {
      ms.addData(FunnelEvent(1, "purchase", B + 5 * Hour),
        FunnelEvent(2, "view", B + 5 * Hour))
      q2.processAllAvailable()
      ms.addData(FunnelEvent(99, "noop", B + 7 * Hour))
      q2.processAllAvailable()
      ms.addData(FunnelEvent(99, "noop", B + 8 * Hour))
      q2.processAllAvailable()
      assert(stored() === Map("view" -> 2L, "click" -> 1L, "purchase" -> 1L))
    } finally q2.stop()
  }
}
