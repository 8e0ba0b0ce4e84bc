package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** DWS serving store: update-mode windowed counts maintained in the
  * bucketed table; later re-emissions of a window supersede earlier
  * partials, and the store is readable between batches.
  */
class DwsSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  case class E(user_id: Long, event_type: String, ts: Long)
  implicit lazy val enc = Encoders.product[E]
  val h0 = 1700000000000L - (1700000000000L % 3600000L)

  test("store keys are injective under separator characters in dim values") {
    val work = java.nio.file.Files.createTempDirectory("dws-keys").toString
    val ms = MemoryStream[E](enc, spark)
    val agg = WindowedAggs.tumblingCounts(ms.toDF(), Seq("event_type"))
    val q = DwsSink.maintain(agg, s"$work/store", "t",
      keyCols = Seq("window_start", "event_type"), checkpoint = s"$work/ckpt")
    try {
      // dim values crafted to collide under naive 'a|b' concatenation
      ms.addData(E(1, "a|b", h0 + 1000), E(2, "a", h0 + 2000))
      q.processAllAvailable()
      val rows = DwsSink.read(spark, s"$work/store", "t",
        Seq("event_type", "n")).collect()
      assert(rows.length === 2, "distinct keys must not merge")
    } finally q.stop()
  }

  test("windowed counts land in the store; re-emitted windows supersede partials") {
    val work = java.nio.file.Files.createTempDirectory("dws-sink").toString
    val ms = MemoryStream[E](enc, spark)
    val agg = WindowedAggs.tumblingCounts(ms.toDF(), Seq("event_type"))
    val q = DwsSink.maintain(agg, s"$work/store", "dws_hourly",
      keyCols = Seq("window_start", "event_type"), checkpoint = s"$work/ckpt")
    try {
      ms.addData(E(1, "click", h0 + 1000), E(2, "click", h0 + 2000))
      q.processAllAvailable()
      def counts(): Map[String, Long] =
        DwsSink.read(spark, s"$work/store", "dws_hourly", Seq("event_type", "n"))
          .collect().map(r => r.getString(0) -> r.getString(1).toLong).toMap
      // update mode: the partial count is already queryable
      assert(counts() === Map("click" -> 2L))
      // same window grows + a second dim appears: the click row must be
      // SUPERSEDED (one row per key, latest value), not duplicated
      ms.addData(E(3, "click", h0 + 3000), E(4, "view", h0 + 4000))
      q.processAllAvailable()
      assert(counts() === Map("click" -> 3L, "view" -> 1L))
      val rows = DwsSink.read(spark, s"$work/store", "dws_hourly",
        Seq("window_start", "event_type", "n"))
      assert(rows.count() === 2, "exactly one row per (window, dim) key")
    } finally q.stop()
  }

  test("sketch columns round-trip the store and roll up without the raw stream") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftexpr.GraftHll
    val work = java.nio.file.Files.createTempDirectory("dws-sketch").toString
    val ms = MemoryStream[E](enc, spark)
    // hourly UV sketches into the store; the binary blob travels base64
    // (the store's row map is schema-on-read strings)
    val agg = WindowedAggs.uvSketchPerWindow(ms.toDF(), p = 12)
      .select($"window_start", base64($"sketch").as("sketch_b64"))
    val q = DwsSink.maintain(agg, s"$work/store", "dws_uv",
      keyCols = Seq("window_start"), checkpoint = s"$work/ckpt")
    try {
      // users 1..30 in hour 0, 16..45 in hour 1 (15 overlap both hours)
      ms.addData((1 to 30).map(u => E(u.toLong, "c", h0 + u * 1000L)): _*)
      ms.addData((16 to 45).map(u => E(u.toLong, "c", h0 + 3600000L + u * 1000L)): _*)
      q.processAllAvailable()
      // serving-side roll-up: union the stored hourly sketches — no
      // events scan — and estimate the cross-hour distinct count
      val rolled = DwsSink.read(spark, s"$work/store", "dws_uv", Seq("sketch_b64"))
        .agg(GraftHll.cardinality(GraftHll.union(unbase64($"sketch_b64"))).as("uv"))
        .head().getLong(0)
      assert(math.abs(rolled - 45L) <= 5L,
        s"union of stored hourly sketches must count ~45 distinct users, got $rolled")
    } finally q.stop()
  }
}
