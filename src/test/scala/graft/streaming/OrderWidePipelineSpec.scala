package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.GmallSchemas.{OrderDetail, OrderInfo}

/** OrderWideApp: interval join (±5 s) batch/streaming equivalence and
  * dim enrichment (FIXTURES.md §5-§6 cases: detail within ±5 s joins,
  * >5 s dropped, one order with N details → N wide rows, missing dim key
  * passes through un-enriched).
  */
class OrderWidePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  val t0 = 1700000000000L
  def info(id: Long, ts: Long): OrderInfo =
    OrderInfo(id, 17L, "1001", 42L, BigDecimal("299.00"), BigDecimal("0.00"),
      BigDecimal("0.00"), BigDecimal("299.00"), BigDecimal("12.00"),
      null, "2026-08-12 10:15:30", null, "2026-08-12", "10", ts)
  def detail(id: Long, orderId: Long, ts: Long): OrderDetail =
    OrderDetail(id, orderId, 5L, 2L, BigDecimal("149.50"),
      BigDecimal("299.00"), BigDecimal("0.00"), BigDecimal("0.00"),
      "widget", "2026-08-12 10:15:30", ts)

  val infos = Seq(info(1L, t0), info(2L, t0 + 100000))
  val details = Seq(
    detail(11L, 1L, t0 + 3000),  // within +5s -> joins
    detail(12L, 1L, t0 - 4000),  // within -5s -> joins
    detail(13L, 1L, t0 + 9000),  // outside -> dropped
    detail(21L, 2L, t0 + 100000)) // exact match -> joins

  test("interval join (batch): +-5s window, N details -> N rows") {
    val got = OrderWidePipeline.intervalJoinBatch(
      spark.createDataFrame(infos), spark.createDataFrame(details))
    assert(got.select($"detail_id").as[Long](Encoders.scalaLong)
      .collect().toSet === Set(11L, 12L, 21L))
  }

  test("interval join (streaming) matches batch on a closed input") {
    val iEnc = Encoders.product[OrderInfo]
    val dEnc = Encoders.product[OrderDetail]
    val msI = MemoryStream[OrderInfo](iEnc, spark)
    val msD = MemoryStream[OrderDetail](dEnc, spark)
    val out = OrderWidePipeline.intervalJoinStreaming(msI.toDS(), msD.toDS())
    val q = out.writeStream.format("memory").queryName("ow_join")
      .outputMode("append").start()
    try {
      msI.addData(infos: _*)
      msD.addData(details: _*)
      q.processAllAvailable()
      val got = spark.table("ow_join").select($"detail_id")
        .as[Long](Encoders.scalaLong).collect().toSet
      assert(got === Set(11L, 12L, 21L))
    } finally q.stop()
  }

  test("left-outer interval join: orphan detail emits with nulls after the watermark closes") {
    val iEnc = Encoders.product[OrderInfo]
    val dEnc = Encoders.product[OrderDetail]
    val msI = MemoryStream[OrderInfo](iEnc, spark)
    val msD = MemoryStream[OrderDetail](dEnc, spark)
    val out = OrderWidePipeline.intervalJoinLeftStreaming(msI.toDS(), msD.toDS())
    val q = out.writeStream.format("memory").queryName("ow_left")
      .outputMode("append").start()
    try {
      // phase 1: everything within ±9 s of t0 — the watermark (max
      // event − 5 s) cannot yet prove detail 13's window is empty
      msI.addData(info(1L, t0))
      msD.addData(detail(11L, 1L, t0 + 3000), detail(12L, 1L, t0 - 4000),
        detail(13L, 1L, t0 + 9000))
      q.processAllAvailable()
      val early = spark.table("ow_left")
        .filter($"detail_id" === 13L).count()
      assert(early === 0L, "orphan must not emit before the watermark closes")
      // phase 2: advance BOTH watermarks far past t0 → the orphan's
      // window is provably closed and the null-padded row is released
      msI.addData(info(99L, t0 + 600000))
      msD.addData(detail(99L, 99L, t0 + 600000))
      q.processAllAvailable()
      val orphan = spark.table("ow_left").filter($"detail_id" === 13L)
      assert(orphan.count() === 1L)
      assert(orphan.filter($"order_id_i".isNull).count() === 1L,
        "orphan row must carry null order columns")
      // matched rows are identical to the inner form
      val matched = spark.table("ow_left").filter($"order_id_i".isNotNull)
        .select($"detail_id").as[Long](Encoders.scalaLong).collect().toSet
      assert(matched === Set(11L, 12L, 99L))
    } finally q.stop()
  }

  test("interval-join buffered state survives query restart from checkpoint") {
    val work = java.nio.file.Files.createTempDirectory("ow-restart").toString
    val iEnc = Encoders.product[OrderInfo]
    val dEnc = Encoders.product[OrderDetail]
    val msI = MemoryStream[OrderInfo](iEnc, spark)
    val msD = MemoryStream[OrderDetail](dEnc, spark)
    val out = OrderWidePipeline.intervalJoinStreaming(msI.toDS(), msD.toDS())
    def start() = out.writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt").start()

    val q1 = start()
    msI.addData(info(1L, t0)) // order arrives; its detail has not
    q1.processAllAvailable(); q1.stop()

    val q2 = start() // fresh query instance, same checkpoint
    msD.addData(detail(11L, 1L, t0 + 3000)) // within +5s of the order
    q2.processAllAvailable(); q2.stop()

    // the join can only emit if the buffered order-info row was
    // recovered from the state store across the restart
    val got = spark.read.parquet(s"$work/out")
      .select($"detail_id", $"order_id_i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((11L, 1L)))
  }

  test("enrichment: six-dim chain, missing key stays null (left join)") {
    val wide = OrderWidePipeline.intervalJoinBatch(
      spark.createDataFrame(infos), spark.createDataFrame(details))
    def dimDf(rows: (String, Map[String, String])*) =
      spark.createDataFrame(rows).toDF("__pk", "row")
    val dims = Map(
      "dim_user_info" -> dimDf("42" -> Map("gender" -> "F", "birthday" -> "1990-05-01")),
      "dim_base_province" -> dimDf("17" -> Map(
        "name" -> "Beijing", "area_code" -> "110000",
        "iso_code" -> "CN-11", "iso_3166_2" -> "CN-BJ")),
      "dim_sku_info" -> dimDf("5" -> Map(
        "spu_id" -> "500", "tm_id" -> "9", "category3_id" -> "61")),
      "dim_spu_info" -> dimDf("500" -> Map("spu_name" -> "Widget Pro")),
      "dim_base_trademark" -> dimDf(), // empty: tm_name must stay null
      "dim_base_category3" -> dimDf("61" -> Map("name" -> "Gadgets")))
    val got = OrderWidePipeline.enrich(wide, dims)
    val r = got.filter($"detail_id" === 11L).head()
    assert(r.getAs[String]("province_name") === "Beijing")
    assert(r.getAs[String]("user_gender") === "F")
    assert(r.getAs[String]("spu_name") === "Widget Pro")
    assert(r.getAs[String]("category3_name") === "Gadgets")
    assert(r.getAs[String]("tm_name") === null)
    assert(r.getAs[Int]("user_age") >= 36)
  }
}
