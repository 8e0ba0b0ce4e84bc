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
}
