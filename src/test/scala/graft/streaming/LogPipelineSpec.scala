package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BaseLogApp pipeline: golden gmall-shaped JSON (FIXTURES.md §2)
  * through parse → dirty split → is_new fix → 3-way split.
  */
class LogPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits.{localSeqToDatasetHolder, newStringEncoder}

  def logLine(mid: String, isNew: String, pageId: String,
      lastPageId: String, ts: Long, displays: String = "null",
      start: Boolean = false): String = {
    val startPart = if (start) """"start":{"entry":"icon","open_ad_id":1,"loading_time":2311,"open_ad_ms":3123,"open_ad_skip_ms":0},""" else ""
    val pagePart = if (start) "" else
      s""""page":{"page_id":"$pageId","last_page_id":${if (lastPageId == null) "null" else s""""$lastPageId""""},"during_time":1234,"item":null,"item_type":null},"""
    s"""{"common":{"mid":"$mid","is_new":"$isNew","ar":"110000","ch":"appstore","vc":"v2.1.134","uid":"42","os":"iOS","md":"iPhone X","ba":"iPhone"},$startPart$pagePart"displays":$displays,"ts":$ts}"""
  }

  val displays =
    """[{"display_type":"activity","item":"1","item_type":"activity_id","order":1,"pos_id":3},
      | {"display_type":"query","item":"9","item_type":"sku_id","order":2,"pos_id":5}]""".stripMargin

  lazy val raw = Seq(
    logLine("m1", "1", "home", null, 1000L, displays),
    logLine("m1", "1", "detail", "home", 2000L),
    logLine("m2", "0", "home", null, 3000L),
    logLine("m3", "1", null, null, 4000L, start = true),
    "not json at all",
    """{"truncated": true""").toDF("value")

  test("parse diverts dirty records without failing") {
    val parsed = LogPipeline.parse(raw)
    assert(LogPipeline.clean(parsed).count() === 4)
    assert(LogPipeline.dirty(parsed).count() === 2)
  }

  test("is_new fix (batch): second sighting of a mid flips 1 -> 0") {
    val events = LogPipeline.clean(LogPipeline.parse(raw))
    val fixed = LogPipeline.fixIsNewBatch(events)
    val m1 = fixed.filter("common.mid = 'm1'").orderBy("ts")
      .select("common.is_new").as[String](Encoders.STRING).collect()
    assert(m1.toSeq === Seq("1", "0"))
    // m2 arrived with 0 and stays 0
    assert(fixed.filter("common.mid = 'm2'").select("common.is_new")
      .as[String](Encoders.STRING).head() === "0")
  }

  test("is_new fix (streaming) matches batch across micro-batches") {
    import LogPipeline.LogEvent
    implicit val enc = Encoders.product[LogEvent]
    val ms = MemoryStream[LogEvent](enc, spark)
    val out = LogPipeline.fixIsNewStreaming(ms.toDS())
    val q = out.writeStream.format("memory").queryName("isnew_out")
      .outputMode("append").start()
    try {
      // same mid split across two micro-batches: state must carry over
      ms.addData(LogEvent("m1", "1", "home", null, 1000L))
      q.processAllAvailable()
      ms.addData(LogEvent("m1", "1", "detail", "home", 2000L),
        LogEvent("m9", "1", "home", null, 2500L))
      q.processAllAvailable()
      val got = spark.table("isnew_out").orderBy("ts")
        .select("mid", "is_new").as[(String, String)](
          Encoders.tuple(Encoders.STRING, Encoders.STRING)).collect().toSeq
      assert(got === Seq(("m1", "1"), ("m1", "0"), ("m9", "1")))
    } finally q.stop()
  }

  test("three-way split: start/page/display with parent page_id tag") {
    val events = LogPipeline.clean(LogPipeline.parse(raw))
    val (start, page, display) = LogPipeline.split(events)
    assert(start.count() === 1)
    assert(page.count() === 3)
    val disp = display.select("display.page_id", "display.item")
      .as[(String, String)](Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .collect().toSet
    assert(disp === Set(("home", "1"), ("home", "9")))
  }

  test("json round-trip keeps branch payload") {
    val events = LogPipeline.clean(LogPipeline.parse(raw))
    val (_, page, _) = LogPipeline.split(events)
    val lines = LogPipeline.toJsonLines(page).as[String](Encoders.STRING).collect()
    assert(lines.forall(_.contains("\"mid\":")))
  }
}
