package graft.sources

import org.apache.spark.sql.types._

/** Record schemas of the reference's two ingest streams (SURVEY.md §1.2).
  *
  * Log event (reference accesses at gmall-realtime/.../app/dwd/
  * BaseLogApp.java:74,87,112,121-131; UniqueVisitApp.java:78,87): nested
  * `common` / `page` / optional `start` / `displays[]` + epoch-ms `ts`.
  *
  * CDC envelope (produced by CustomerDeserialization.java:18-83):
  * {database, tableName, before, after, type}. `before`/`after` are kept
  * as MapType(String,String) — the reference treats all dim columns as
  * varchar (TableProcessFunction.java:128-153), and a map survives
  * schema drift in the source tables.
  */
object GmallSchemas {

  val commonSchema: StructType = StructType(Seq(
    StructField("mid", StringType),
    StructField("uid", StringType),
    StructField("is_new", StringType),
    StructField("ar", StringType),
    StructField("ch", StringType),
    StructField("vc", StringType),
    StructField("os", StringType),
    StructField("md", StringType),
    StructField("ba", StringType)))

  val pageSchema: StructType = StructType(Seq(
    StructField("page_id", StringType),
    StructField("last_page_id", StringType),
    StructField("during_time", LongType),
    StructField("item", StringType),
    StructField("item_type", StringType)))

  val startSchema: StructType = StructType(Seq(
    StructField("entry", StringType),
    StructField("open_ad_id", LongType),
    StructField("loading_time", LongType),
    StructField("open_ad_ms", LongType),
    StructField("open_ad_skip_ms", LongType)))

  val displaySchema: StructType = StructType(Seq(
    StructField("display_type", StringType),
    StructField("item", StringType),
    StructField("item_type", StringType),
    StructField("order", LongType),
    StructField("pos_id", LongType)))

  val logSchema: StructType = StructType(Seq(
    StructField("common", commonSchema),
    StructField("page", pageSchema),
    StructField("start", startSchema),
    StructField("displays", ArrayType(displaySchema)),
    StructField("ts", LongType)))

  val cdcSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("tableName", StringType),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("type", StringType)))

  /** Routing config row (reference bean/TableProcess.java:12-24). */
  case class TableProcess(
      sourceTable: String, operateType: String, sinkType: String,
      sinkTable: String, sinkColumns: String,
      sinkPk: String = "id", sinkExtend: String = "")

  /** Typed order records (reference bean/OrderInfo.java:9-23,
    * bean/OrderDetail.java:9-19). Money = Decimal(16,2) per §1.3;
    * `create_ts` is the derived epoch-ms event time
    * (OrderWideApp.java:53-59).
    */
  case class OrderInfo(
      id: Long, province_id: Long, order_status: String, user_id: Long,
      total_amount: BigDecimal, activity_reduce_amount: BigDecimal,
      coupon_reduce_amount: BigDecimal, original_total_amount: BigDecimal,
      feight_fee: BigDecimal, expire_time: String, create_time: String,
      operate_time: String, create_date: String, create_hour: String,
      create_ts: Long)

  case class OrderDetail(
      id: Long, order_id: Long, sku_id: Long, sku_num: Long,
      order_price: BigDecimal, split_total_amount: BigDecimal,
      split_activity_amount: BigDecimal, split_coupon_amount: BigDecimal,
      sku_name: String, create_time: String, create_ts: Long)
}
