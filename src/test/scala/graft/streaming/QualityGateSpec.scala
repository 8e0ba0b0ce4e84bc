package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming gate must report each micro-batch's planted
  * violations exactly, and agree with the batch census semantics.
  */
class QualityGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  case class Ev(event_id: Long, user_id: Option[Long], value: Double)

  test("per-batch census counts planted violations batch by batch") {
    implicit val enc = Encoders.product[Ev]
    val ms = MemoryStream[Ev](enc, spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-qg").toString
    val q = QualityGate.censusStream(ms.toDF(), dir)
    try {
      ms.addData(Ev(1, Some(7), 1.0), Ev(2, None, -2.0))
      q.processAllAvailable()
      ms.addData(Ev(3, Some(8), 3.0))
      q.processAllAvailable()
      val report = spark.read.parquet(s"$dir/report")
        .collect()
        .map(r => ((r.getAs[Long]("batch_id"), r.getAs[String]("check_name")),
          (r.getAs[Long]("violations"), r.getAs[Long]("checked")))).toMap
      assert(report((0L, "events_user_id_null")) === ((1L, 2L)))
      assert(report((0L, "events_value_negative")) === ((1L, 2L)))
      assert(report((1L, "events_user_id_null")) === ((0L, 1L)))
      assert(report((1L, "events_value_negative")) === ((0L, 1L)))
    } finally q.stop()
  }
}
