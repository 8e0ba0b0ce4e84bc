package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming windowed aggregations: watermarked tumbling windows emit
  * finalized results; session_window merges events within the gap and
  * splits across it.
  */
class WindowedAggsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  case class E(user_id: Long, event_type: String, ts: Long)
  case class P(item: String, ts: Long)
  case class V(value: Double, ts: Long)
  case class O(event_id: Long, event_type: String, value: Double, ts: Long)
  implicit lazy val enc = Encoders.product[E]
  val h0 = 1700000000000L - (1700000000000L % 3600000L) // hour-aligned base

  test("tumbling window finalizes when the watermark passes") {
    val ms = MemoryStream[E](enc, spark)
    val out = WindowedAggs.tumblingCounts(ms.toDF(), Seq("event_type"))
    val q = out.writeStream.format("memory").queryName("tumb_out")
      .outputMode("append").start()
    try {
      ms.addData(E(1, "click", h0 + 1000), E(2, "click", h0 + 2000),
        E(3, "view", h0 + 3000))
      q.processAllAvailable()
      // append mode: nothing final until watermark passes the window end
      assert(spark.table("tumb_out").count() === 0)
      ms.addData(E(9, "click", h0 + 3 * 3600000L)) // advance watermark 3h
      q.processAllAvailable()
      val got = spark.table("tumb_out")
        .select($"event_type", $"n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === Set(("click", 2L), ("view", 1L)))
    } finally q.stop()
  }

  test("streaming OHLC: a late-but-in-watermark row steals open; event_id breaks close ties") {
    implicit val oEnc: org.apache.spark.sql.Encoder[O] = Encoders.product[O]
    val ms = MemoryStream[O](oEnc, spark)
    val q = WindowedAggs.ohlcPerWindow(ms.toDF())
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      ms.addData(O(1, "x", 5.0, h0 + 10000), O(2, "x", 9.0, h0 + 20000))
      q.processAllAvailable()
      // batch 2, same window: earlier timestamp (must steal open) and a
      // close-tie row (same ts as id 2, higher id -> becomes close)
      ms.addData(O(3, "x", 7.0, h0 + 5000), O(4, "x", 3.0, h0 + 20000))
      q.processAllAvailable()
      assert(spark.table("ohlc_out").count() === 0) // window still open
      ms.addData(O(9, "x", 1.0, h0 + 3 * 3600000L)) // watermark past end
      q.processAllAvailable()
      val got = spark.table("ohlc_out")
        .select($"event_type", $"open", $"high", $"low", $"close", $"vol_cents", $"n_events")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6))).toSet
      assert(got === Set(("x", 7.0, 9.0, 3.0, 3.0, 2400L, 4L)))
    } finally q.stop()
  }

  test("windowed t-digest quantiles finalize with the watermark, digest merged across batches") {
    implicit val vEnc: org.apache.spark.sql.Encoder[V] = Encoders.product[V]
    val ms = MemoryStream[V](vEnc, spark)
    val out = WindowedAggs.valueQuantilesPerWindow(ms.toDF(), Seq(0.5, 0.9))
    val q = out.writeStream.format("memory").queryName("quant_out")
      .outputMode("append").start()
    try {
      // values 1..100 split across two micro-batches of the SAME window:
      // the emitted digest must merge both batches' partial sketches
      ms.addData((1 to 50).map(i => V(i.toDouble, h0 + i * 1000L)): _*)
      q.processAllAvailable()
      ms.addData((51 to 100).map(i => V(i.toDouble, h0 + i * 1000L)): _*)
      q.processAllAvailable()
      assert(spark.table("quant_out").count() === 0) // window still open
      ms.addData(V(0.0, h0 + 3 * 3600000L)) // advance watermark 3h
      q.processAllAvailable()
      val rows = spark.table("quant_out").collect()
      assert(rows.length === 1)
      val qs = rows.head.getSeq[Double](1)
      assert(math.abs(qs(0) - 50.0) <= 3.0, s"p50=${qs(0)}")
      assert(math.abs(qs(1) - 90.0) <= 3.0, s"p90=${qs(1)}")
    } finally q.stop()
  }

  test("keyword window tokenizes search terms and counts per keyword") {
    implicit val pEnc: org.apache.spark.sql.Encoder[P] = Encoders.product[P]
    val ms = MemoryStream[P](pEnc, spark)
    val out = WindowedAggs.keywordCounts(ms.toDF())
    val q = out.writeStream.format("memory").queryName("kw_out")
      .outputMode("append").start()
    try {
      ms.addData(P("red dress", h0 + 1000), P("Red shoes!", h0 + 2000),
        P(null, h0 + 3000))
      q.processAllAvailable()
      ms.addData(P("later", h0 + 3 * 3600000L)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("kw_out").select($"keyword", $"n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // tokenizer lowercases and strips punctuation: "red" counts twice
      assert(got === Set(("red", 2L), ("dress", 1L), ("shoes", 1L)))
    } finally q.stop()
  }

  test("uv sketch window: cross-batch duplicates collapse; sketch matches batch build") {
    val ms = MemoryStream[E](enc, spark)
    val out = WindowedAggs.uvSketchPerWindow(ms.toDF(), p = 12)
    val q = out.writeStream.format("memory").queryName("uvsk_out")
      .outputMode("append").start()
    try {
      // users 1..40 in batch 1, 21..60 in batch 2, same window: the
      // merged sketch must count 60 distinct, not 80 events — the
      // property that distinguishes sketch state from count state
      ms.addData((1 to 40).map(u => E(u.toLong, "c", h0 + u * 1000L)): _*)
      q.processAllAvailable()
      ms.addData((21 to 60).map(u => E(u.toLong, "c", h0 + u * 1000L)): _*)
      q.processAllAvailable()
      assert(spark.table("uvsk_out").count() === 0) // window still open
      ms.addData(E(999, "z", h0 + 3 * 3600000L)) // watermark closes it
      q.processAllAvailable()
      val rows = spark.table("uvsk_out")
        .filter($"uv_est" > 1).collect() // drop the closer's own window if emitted
      assert(rows.length === 1)
      val sketch = rows.head.getAs[Array[Byte]](1)
      val est = rows.head.getLong(2)
      // the streamed sketch must be byte-identical to a batch build of
      // the same distinct keys (order/batching invariance)...
      import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
      val batch = (1L to 60L).toDF("k")
        .agg(org.apache.spark.sql.graftexpr.GraftHll.build($"k", 12))
        .head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(sketch, batch))
      // ...and near-exact at this cardinality
      assert(math.abs(est - 60L) <= 6L, s"est=$est")
    } finally q.stop()
  }

  test("uv bitmap window: cross-batch EXACT distinct; blob matches batch build") {
    val ms = MemoryStream[E](enc, spark)
    val out = WindowedAggs.uvBitmapPerWindow(ms.toDF())
    val q = out.writeStream.format("memory").queryName("uvbm_out")
      .outputMode("append").start()
    try {
      ms.addData((1 to 40).map(u => E(u.toLong, "c", h0 + u * 1000L)): _*)
      q.processAllAvailable()
      ms.addData((21 to 60).map(u => E(u.toLong, "c", h0 + u * 1000L)): _*)
      q.processAllAvailable()
      assert(spark.table("uvbm_out").count() === 0) // window still open
      ms.addData(E(999, "z", h0 + 3 * 3600000L)) // watermark closes it
      q.processAllAvailable()
      val rows = spark.table("uvbm_out").filter($"uv" > 1).collect()
      assert(rows.length === 1)
      // exact, not approximate: 60 distinct across overlapping batches
      assert(rows.head.getLong(2) === 60L)
      // canonical blob: streamed state ≡ batch build, byte-for-byte
      import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
      val batch = (1L to 60L).toDF("k")
        .agg(org.apache.spark.sql.graftexpr.GraftBitmap.build($"k"))
        .head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(rows.head.getAs[Array[Byte]](1), batch))
    } finally q.stop()
  }

  test("cm sketch window: cross-batch counts ADD; sketch matches batch build") {
    val ms = MemoryStream[E](enc, spark)
    val out = WindowedAggs.cmSketchPerWindow(ms.toDF(), depth = 4, width = 256)
    val q = out.writeStream.format("memory").queryName("cmsk_out")
      .outputMode("append").start()
    try {
      // user 7 appears in BOTH micro-batches (2 + 2 occurrences): the
      // merged sketch must count 4 total (frequency state adds, unlike
      // the HLL's distinct)
      ms.addData(E(7, "c", h0 + 1000), E(7, "c", h0 + 2000), E(8, "c", h0 + 3000))
      q.processAllAvailable()
      ms.addData(E(7, "c", h0 + 4000), E(7, "c", h0 + 5000), E(9, "c", h0 + 6000))
      q.processAllAvailable()
      ms.addData(E(999, "z", h0 + 3 * 3600000L)) // watermark closes it
      q.processAllAvailable()
      val rows = spark.table("cmsk_out").collect()
        .filter { r =>
          val est = org.apache.spark.sql.graftexpr.GraftCountMin
            .estimate(r.getAs[Array[Byte]](1), 7L)
          est > 0
        }
      assert(rows.length === 1)
      val sketch = rows.head.getAs[Array[Byte]](1)
      assert(org.apache.spark.sql.graftexpr.GraftCountMin.estimate(sketch, 7L) === 4L)
      assert(org.apache.spark.sql.graftexpr.GraftCountMin.estimate(sketch, 8L) === 1L)
      // batching invariance: byte-identical to a batch build of the keys
      import spark.implicits.{localSeqToDatasetHolder, newLongEncoder}
      val batch = Seq(7L, 7L, 8L, 7L, 7L, 9L).toDF("k")
        .agg(org.apache.spark.sql.graftexpr.GraftCountMin.build($"k", 4, 256))
        .head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(sketch, batch))
    } finally q.stop()
  }

  test("session_window merges within gap, splits across it") {
    val ms = MemoryStream[E](enc, spark)
    val out = WindowedAggs.sessionized(ms.toDF())
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      ms.addData(
        E(1, "a", h0), E(1, "b", h0 + 60000),          // one session
        E(1, "c", h0 + 2 * 3600000L),                  // 2h later: new session
        E(2, "a", h0))
      q.processAllAvailable()
      ms.addData(E(9, "z", h0 + 6 * 3600000L)) // close everything
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .filter($"user_id" === 1).select($"n_events")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L))
    } finally q.stop()
  }
}
