package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import LogPipeline.LogEvent

/** Stateful-query restart: the is_new keyed state must survive a query
  * stop/start on the same checkpoint (the state-store recovery contract
  * a production job relies on across deploys/failures).
  */
class StateRestartSpec extends AnyFunSuite {
  case class O4(event_id: Long, event_type: String, value: Double, ts: Long)
  case class E3(user_id: Long, event_type: String, ts: Long)
  lazy val spark = TestSpark.spark
  implicit lazy val enc = Encoders.product[LogEvent]

  test("is_new state survives query restart from checkpoint") {
    val work = Files.createTempDirectory("restart").toString
    val ms = MemoryStream[LogEvent](enc, spark)
    val out = LogPipeline.fixIsNewStreaming(ms.toDS())
    def start() = out.writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()

    val q1 = start()
    ms.addData(LogEvent("m1", "1", "home", null, 1000L))
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // fresh query instance, same checkpoint
    ms.addData(LogEvent("m1", "1", "detail", "home", 2000L))
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(s"$work/out")
      .orderBy("ts").select("mid", "is_new")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // second sighting flipped to "0" only if state was recovered
    assert(got === Seq(("m1", "1"), ("m1", "0")))
  }

  test("streaming OHLC window state survives restart: open set before the stop, stolen after it") {
    import graft.ColStr
    val work = Files.createTempDirectory("restart-ohlc").toString
    implicit val oEnc: org.apache.spark.sql.Encoder[O4] = Encoders.product[O4]
    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    val ms = MemoryStream[O4](oEnc, spark)
    val out = WindowedAggs.ohlcPerWindow(ms.toDF())
    def start() = out.writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()

    val q1 = start()
    ms.addData(O4(1, "x", 5.0, h0 + 10000), O4(2, "x", 9.0, h0 + 20000))
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // same checkpoint: the open window's buffer must be recovered
    ms.addData(O4(3, "x", 7.0, h0 + 5000))       // steals open ACROSS the restart
    ms.addData(O4(9, "x", 1.0, h0 + 3 * 3600000L)) // watermark past window end
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(s"$work/out")
      .where($"event_type" === "x" && $"n_events" === 3)
      .select($"open", $"high", $"low", $"close", $"vol_cents")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(got.toSeq === Seq((7.0, 9.0, 5.0, 9.0, 2100L)))
  }

  test("bitmap window state survives restart: exact UV across the stop, blob canonical") {
    import graft.ColStr
    val work = Files.createTempDirectory("restart-bm").toString
    implicit val eEnc: org.apache.spark.sql.Encoder[E3] = Encoders.product[E3]
    val h0 = 1700000000000L - (1700000000000L % 3600000L)
    val ms = MemoryStream[E3](eEnc, spark)
    val out = WindowedAggs.uvBitmapPerWindow(ms.toDF())
    def start() = out.writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()

    val q1 = start()
    ms.addData((1 to 30).map(u => E3(u.toLong, "c", h0 + u * 1000L)): _*)
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // open window's bitmap buffer must be recovered
    ms.addData((21 to 50).map(u => E3(u.toLong, "c", h0 + u * 1000L)): _*)
    ms.addData(E3(999, "z", h0 + 3 * 3600000L)) // close the window
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(s"$work/out")
      .where($"uv" > 1).collect()
    assert(rows.length === 1)
    // exact across the restart: 50 distinct, not 60 events
    assert(rows.head.getLong(2) === 50L)
    import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
    val batch = (1L to 50L).toDF("k")
      .agg(org.apache.spark.sql.graftexpr.GraftBitmap.build($"k"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(rows.head.getAs[Array[Byte]](1), batch),
      "recovered-state blob must stay canonical")
  }
}
