package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Encoders
import graft._
import graft.sources.GmallSchemas.TableProcess

/** End-to-end streaming demo: the reference's three apps wired over file
  * streams (the Kafka-less fixture transport; swap `format("json")` for
  * `format("kafka")` + topic options in production — every transform in
  * between is identical).
  *
  * Usage: runMain graft.streaming.StreamingDemo [workDir]
  * Writes gmall-shaped fixture lines, runs
  *  1. BaseLogApp: parse → is_new fix → 3-way split → 3 parquet sinks,
  *  2. BaseDBLog: CDC route → kafka-shaped sink + dim-store MERGE,
  *  3. UserJumpDetail: bounce detection on the page stream,
  * then prints per-sink row counts.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft-demo").toString
    val spark = Session.get("graft-streaming-demo")
    import org.apache.spark.sql.functions._

    // ---- fixture input ------------------------------------------------
    val logDir = s"$work/in/ods_base_log"
    val dbDir = s"$work/in/ods_base_db"
    Files.createDirectories(Paths.get(logDir))
    Files.createDirectories(Paths.get(dbDir))
    val t0 = 1754956800000L
    def page(mid: String, isNew: String, pid: String, last: String, ts: Long,
        item: String = null) =
      s"""{"common":{"mid":"$mid","is_new":"$isNew","ar":"110000","ch":"appstore","vc":"v2","uid":"1","os":"iOS","md":"x","ba":"x"},"page":{"page_id":"$pid","last_page_id":${Option(last).map("\"" + _ + "\"").getOrElse("null")},"during_time":100,"item":${Option(item).map("\"" + _ + "\"").getOrElse("null")},"item_type":${if (item == null) "null" else "\"keyword\""}},"displays":[{"display_type":"activity","item":"1","item_type":"activity_id","order":1,"pos_id":3}],"ts":$ts}"""
    def start(mid: String, ts: Long) =
      s"""{"common":{"mid":"$mid","is_new":"1","ar":"110000","ch":"appstore","vc":"v2","uid":"1","os":"iOS","md":"x","ba":"x"},"start":{"entry":"icon","open_ad_id":1,"loading_time":10,"open_ad_ms":20,"open_ad_skip_ms":0},"ts":$ts}"""
    Files.writeString(Paths.get(s"$logDir/batch0.jsonl"), Seq(
      start("m1", t0),
      page("m1", "1", "home", null, t0 + 1000),
      page("m1", "1", "detail", "home", t0 + 2000),
      page("m2", "1", "home", null, t0 + 1000),
      page("m2", "1", "home", null, t0 + 4000), // entry->entry: bounce
      "corrupt {not json",
      page("m3", "0", "good_list", "home", t0 + 3000, item = "red dress"),
      page("m3", "0", "good_list", "good_list", t0 + 5000, item = "red shoes"),
      page("m3", "0", "home", null, t0 + 1000)).mkString("\n"))
    def env(table: String, op: String, after: String) =
      s"""{"database":"gmall2021","tableName":"$table","before":{},"after":$after,"type":"$op"}"""
    Files.writeString(Paths.get(s"$dbDir/batch0.jsonl"), Seq(
      env("order_info", "insert", """{"id":"1","user_id":"42","total_amount":"299.00","secret":"x"}"""),
      env("user_info", "insert", """{"id":"7","name":"alice","birthday":"1990-05-01","gender":"F"}"""),
      env("user_info", "update", """{"id":"7","name":"alice2","birthday":"1990-05-01","gender":"F"}"""),
      env("order_info", "delete", """{"id":"1"}""")).mkString("\n"))

    // ---- 1. BaseLogApp ------------------------------------------------
    // topics resolve through the Transport abstraction (file transport
    // here; KafkaTransport on a real cluster, same pipeline code)
    val transport = new graft.sources.FileTransport(s"$work/in")
    val rawLog = transport.readStream(spark, "ods_base_log")
    val parsed = LogPipeline.parse(rawLog.select($"value"))
    val events = LogPipeline.clean(parsed)
    import LogPipeline.LogEvent
    val enc = Encoders.product[LogEvent]
    val typed = events.select($"common.mid".as("mid"),
      $"common.is_new".as("is_new"), $"page.page_id".as("page_id"),
      $"page.last_page_id".as("last_page_id"), $"ts").as[LogEvent](enc)
    val fixedTyped = LogPipeline.fixIsNewStreaming(typed)
    val logQ = events.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        val (s, p, d) = LogPipeline.split(b)
        s.write.mode("append").parquet(s"$work/out/dwd_start_log")
        p.write.mode("append").parquet(s"$work/out/dwd_page_log")
        d.write.mode("append").parquet(s"$work/out/dwd_display_log")
        b.unpersist(); ()
      }
      .option("checkpointLocation", s"$work/ckpt/log").start()
    val isNewQ = fixedTyped.writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out/dwd_is_new_fixed")
      .option("checkpointLocation", s"$work/ckpt/isnew").start()

    // ---- 2. BaseDBLog -------------------------------------------------
    val config = Seq(
      TableProcess("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount"),
      TableProcess("user_info", "insert", "hbase", "dim_user_info", "id,name,birthday,gender"),
      TableProcess("user_info", "update", "hbase", "dim_user_info", "id,name,birthday,gender"))
    val rawDb = transport.readStream(spark, "ods_base_db")
    val dbQ = rawDb.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (toKafka, toDim) = CdcRouter.route(CdcRouter.parse(batch), config)
        toKafka.write.mode("append").parquet(s"$work/out/kafka_shaped")
        CdcRouter.sinkDims(s"$work/out/dim_store", toDim, config)
        ()
      }
      .option("checkpointLocation", s"$work/ckpt/db").start()

    // ---- 3. bounce detection ------------------------------------------
    import VisitorPipeline.PageEvent
    val pEnc = Encoders.product[PageEvent]
    val pages = events.filter($"page".isNotNull)
      .select($"common.mid".as("mid"), $"page.page_id".as("page_id"),
        $"page.last_page_id".as("last_page_id"), $"ts").as[PageEvent](pEnc)
    val bounceQ = VisitorPipeline.bounceStreaming(pages)
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out/dwm_user_jump")
      .option("checkpointLocation", s"$work/ckpt/bounce").start()

    // ---- 4. DWS keyword window ----------------------------------------
    val searchPages = events.filter($"page".isNotNull)
      .select($"page.item".as("item"), $"ts")
    val kwQ = WindowedAggs.keywordCounts(searchPages)
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out/dws_keyword")
      .option("checkpointLocation", s"$work/ckpt/keyword").start()

    // ---- 5. streaming corpus near-dup ingest --------------------------
    val docsDir = s"$work/in/docs"
    Files.createDirectories(Paths.get(docsDir))
    val baseDoc = "the quick brown fox jumps over the lazy dog while the " +
      "sun sets slowly behind distant purple mountains tonight"
    def docLine(id: Long, text: String, ts: Long) =
      s"""{"doc_id":$id,"text":"$text","ts":$ts}"""
    Files.writeString(Paths.get(s"$docsDir/batch0.jsonl"), Seq(
      docLine(1, baseDoc, t0),
      docLine(2, "an unrelated catalog entry describing warehouse layouts and " +
        "columnar storage with vectorized execution pipelines", t0 + 1000),
      docLine(3, baseDoc.replace("lazy", "sleepy"), t0 + 2000), // near-dup of 1
      docLine(4, baseDoc, t0 + 3000)).mkString("\n")) // exact dup of 1
    val docsStream = spark.readStream
      .schema("doc_id long, text string, ts long").json(docsDir)
    val dupQ = NearDupStream.nearDups(docsStream)
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$work/out/corpus_near_dups")
      .option("checkpointLocation", s"$work/ckpt/neardup").start()

    // ---- 6. DWS serving store (the ClickHouse-sink role) --------------
    // update-mode hourly page counts maintained as a queryable bucketed
    // table: the ADS-facing layer the reference configured but never
    // built. Projects from the SAME typed page frame stage 3 built.
    val dwsQ = DwsSink.maintain(
      WindowedAggs.tumblingCounts(
        pages.toDF().select($"page_id", $"ts"), Seq("page_id")),
      s"$work/out/dws_store", "dws_page_hourly",
      keyCols = Seq("window_start", "page_id"),
      checkpoint = s"$work/ckpt/dws_store")

    // ---- 6b. near-dup census serving ------------------------------------
    // the third streaming parity family served the way stages 6-7 serve
    // the windowed aggregates: the watermark-ordered census fold
    // (owner = event-time-first doc of each near-dup family) maintained
    // as queryable cluster-size cells in the same DWS store. Reads the
    // SAME docs stream stage 5 ingests.
    val censusQ = NearDupStream.serveCensus(docsStream,
      s"$work/out/dws_store", s"$work/ckpt/census")

    // ---- 6c. collapsed census serving ----------------------------------
    // the streaming twin of the batch canonical-collapse guard
    // (dedup_simhash_collapsed): fingerprint-keyed group cells — one
    // state row and one serving cell per exact-dup family, never
    // materialized pairs. Docs 1 and 4 are exact copies (one collapse
    // family of size 2); docs 2 and 3 are singleton fingerprints.
    val collapseQ = NearDupStream.serveCollapsedCensus(docsStream,
      s"$work/out/dws_store", s"$work/ckpt/collapse")

    // ---- 7. OrderWideApp end-to-end ------------------------------------
    // the reference's flagship DWM app: order_info ⋈ order_detail within
    // ±5 s event time, then enrichment — here against the LIVE dim store
    // stage 2 maintains, re-read per micro-batch (dims follow the stream
    // exactly like the routing config does). Fixtures arrive in a later
    // round, after the dim store exists.
    val orderDir = s"$work/in/ods_order"
    Files.createDirectories(Paths.get(orderDir))
    import graft.sources.GmallSchemas.{OrderDetail, OrderInfo}
    val orderCdc = CdcRouter.parse(transport.readStream(spark, "ods_order"))
    def a(c: String) = $"after".getItem(c)
    val infoTyped = OrderWidePipeline.deriveOrderInfoTimes(
      orderCdc.filter($"tableName" === "order_info").select(
        a("id").cast("long").as("id"),
        a("province_id").cast("long").as("province_id"),
        a("order_status").as("order_status"),
        a("user_id").cast("long").as("user_id"),
        a("total_amount").cast("decimal(38,18)").as("total_amount"),
        lit(null).cast("decimal(38,18)").as("activity_reduce_amount"),
        lit(null).cast("decimal(38,18)").as("coupon_reduce_amount"),
        lit(null).cast("decimal(38,18)").as("original_total_amount"),
        lit(null).cast("decimal(38,18)").as("feight_fee"),
        lit(null).cast("string").as("expire_time"),
        a("create_time").as("create_time"),
        lit(null).cast("string").as("operate_time")))
      .as[OrderInfo](Encoders.product[OrderInfo])
    val detailTyped = OrderWidePipeline.deriveOrderDetailTimes(
      orderCdc.filter($"tableName" === "order_detail").select(
        a("id").cast("long").as("id"),
        a("order_id").cast("long").as("order_id"),
        a("sku_id").cast("long").as("sku_id"),
        a("sku_num").cast("long").as("sku_num"),
        a("order_price").cast("decimal(38,18)").as("order_price"),
        a("split_total_amount").cast("decimal(38,18)").as("split_total_amount"),
        lit(null).cast("decimal(38,18)").as("split_activity_amount"),
        lit(null).cast("decimal(38,18)").as("split_coupon_amount"),
        a("sku_name").as("sku_name"),
        a("create_time").as("create_time")))
      .as[OrderDetail](Encoders.product[OrderDetail])
    val owQ = OrderWidePipeline
      .intervalJoinStreaming(infoTyped, detailTyped)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val dims = Seq("dim_user_info")
            .filter(t => new java.io.File(s"$work/out/dim_store/$t").exists())
            .map(t => t -> spark.read.parquet(s"$work/out/dim_store/$t"))
            .toMap
          OrderWidePipeline.enrich(batch, dims)
            .write.mode("append").parquet(s"$work/out/dwm_order_wide")
        }
        ()
      }
      .option("checkpointLocation", s"$work/ckpt/orderwide").start()

    val queries = Seq(logQ, isNewQ, dbQ, bounceQ, kwQ, dupQ, dwsQ, censusQ,
      collapseQ, owQ)
    queries.foreach(_.processAllAvailable())
    // the dim store now exists (stage 2 ran): feed the order streams,
    // user 7 joins the alice2 dim row written-and-superseded above.
    // Write-then-rename: owQ is already polling this directory, and a
    // partially-written file would be read empty and marked seen forever
    // temp file on the SAME filesystem (sibling dir) so the move is atomic
    val orderTmp = Files.createTempFile(Paths.get(s"$work/in"), "orders", ".tmp")
    Files.writeString(orderTmp, Seq(
      env("order_info", "insert",
        """{"id":"101","province_id":"17","order_status":"1001","user_id":"7","total_amount":"299.00","create_time":"2026-08-12 10:15:30"}"""),
      env("order_detail", "insert",
        """{"id":"1001","order_id":"101","sku_id":"5","sku_num":"2","order_price":"149.50","split_total_amount":"299.00","sku_name":"widget","create_time":"2026-08-12 10:15:31"}"""),
      env("order_detail", "insert",
        """{"id":"1002","order_id":"101","sku_id":"6","sku_num":"1","order_price":"0.00","split_total_amount":"0.00","sku_name":"gadget","create_time":"2026-08-12 10:25:00"}""") // >5s: dropped
      ).mkString("\n"))
    Files.move(orderTmp, Paths.get(s"$orderDir/batch0.jsonl"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    queries.foreach(_.processAllAvailable())
    // append-mode windows finalize only when the watermark passes: feed
    // two late batches (the watermark computed from batch N applies to
    // batch N+1) so the keyword window closes in this demo run
    Files.writeString(Paths.get(s"$logDir/batch1.jsonl"),
      page("m9", "0", "home", null, t0 + 7200000L))
    queries.foreach(_.processAllAvailable())
    Files.writeString(Paths.get(s"$logDir/batch2.jsonl"),
      page("m9", "0", "home", "home", t0 + 7300000L))
    queries.foreach(_.processAllAvailable())
    // the census fold holds hits until the docs-stream watermark passes
    // them: a far-ahead sentinel document closes the t0 family so the
    // cells drain into the serving store in this demo run
    Files.writeString(Paths.get(s"$docsDir/batch1.jsonl"),
      docLine(99, "watermark sentinel advancing far ahead of the corpus",
        t0 + 48L * 3600000L))
    queries.foreach(_.processAllAvailable())
    queries.foreach(_.stop())

    // ---- report -------------------------------------------------------
    def count(path: String): Long =
      try spark.read.parquet(path).count() catch { case _: Throwable => -1 }
    println(s"demo-out work=$work")
    Seq("dwd_start_log", "dwd_page_log", "dwd_display_log",
      "dwd_is_new_fixed", "kafka_shaped", "dim_store/dim_user_info",
      "dwm_user_jump", "dws_keyword", "corpus_near_dups",
      "dws_store/dws_page_hourly", "dws_store/neardup_census",
      "dwm_order_wide").foreach { p =>
      println(f"demo-out ${p}%-28s rows=${count(s"$work/out/$p")}")
    }
    println("demo-out order_wide enriched: " +
      spark.read.parquet(s"$work/out/dwm_order_wide")
        .selectExpr("detail_id", "order_id", "user_gender", "user_age")
        .collect().mkString(","))
    println("demo-out dim_user_info row: " +
      spark.read.parquet(s"$work/out/dim_store/dim_user_info")
        .selectExpr("__pk", "row['name']").collect().mkString(","))
    // served census: docs 1/3/4 are one near-dup family, owner = the
    // event-time-first doc (1), cluster_size counts the owner itself
    val census = DwsSink.read(spark, s"$work/out/dws_store",
        "neardup_census", Seq("owner", "cluster_size"))
      .collect().map(r => r.getString(0).toLong -> r.getString(1).toLong)
      .toMap
    println(s"demo-out neardup_census cells: $census")
    require(census == Map(1L -> 3L),
      s"expected served census {1 -> 3}, got $census")
    // served collapsed census: docs 1 and 4 share a fingerprint exactly
    // (exact copies) → one cell (rep 1, size 2, 1 implied pair); docs
    // 2, 3 and the sentinel are singleton fingerprints
    val collapsed = DwsSink.read(spark, s"$work/out/dws_store",
        "neardup_collapsed", Seq("owner", "group_size", "n_doc_pairs"))
      .collect()
      .map(r => r.getString(0).toLong ->
        ((r.getString(1).toLong, r.getString(2).toLong)))
      .toMap
    println(s"demo-out neardup_collapsed cells: $collapsed")
    require(collapsed(1L) == ((2L, 1L)),
      s"expected collapse family (rep 1, size 2, 1 pair), got $collapsed")
    require(collapsed.count(_._2._1 == 1L) == 3, // docs 2, 3, sentinel
      s"expected 3 singleton fingerprint cells, got $collapsed")
    spark.stop()
  }
}
