package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft._
import graft.sources.GmallSchemas.{OrderDetail, OrderInfo}

/** The OrderWideApp pipeline (reference gmall-realtime/.../app/dwm/
  * OrderWideApp.java:29-126): OrderInfo ⋈ OrderDetail within ±5 s event
  * time, then dim enrichment. The reference left enrichment unfinished
  * (only the user dim, result unassigned, :116-121); here the full
  * six-dim chain from bean/OrderWide.java:40-53 is implemented.
  */
object OrderWidePipeline {

  /** J1 interval-join bound (reference OrderWideApp.java:91: ±5 s,
    * "max expected latency in prod").
    */
  val JoinWindowMs = 5000L

  /** Datetime derivations on a parsed order_info JSON frame (P6,
    * reference OrderWideApp.java:50-62).
    */
  def deriveOrderInfoTimes(df: DataFrame): DataFrame =
    df.withColumn("create_date", split($"create_time", " ").getItem(0))
      .withColumn("create_hour", split(split($"create_time", " ").getItem(1), ":").getItem(0))
      .withColumn("create_ts",
        unix_timestamp($"create_time", "yyyy-MM-dd HH:mm:ss") * 1000)

  def deriveOrderDetailTimes(df: DataFrame): DataFrame =
    df.withColumn("create_ts",
      unix_timestamp($"create_time", "yyyy-MM-dd HH:mm:ss") * 1000)

  /** J1 streaming: stream-stream inner join with watermarks and a
    * time-range predicate. Spark's StreamingSymmetricHashJoinExec keeps
    * per-key state and evicts it once the watermark passes the ±window —
    * the same state-cleanup contract as Flink's interval join.
    */
  def intervalJoinStreaming(info: Dataset[OrderInfo],
      detail: Dataset[OrderDetail]): DataFrame = {
    val i = info.toDF()
      .withColumn("info_time", timestamp_millis($"create_ts"))
      .withWatermark("info_time", "5 seconds")
      .select($"id".as("order_id_i"), $"province_id", $"order_status",
        $"user_id", $"total_amount", $"create_date", $"create_hour",
        $"info_time")
    val d = detail.toDF()
      .withColumn("detail_time", timestamp_millis($"create_ts"))
      .withWatermark("detail_time", "5 seconds")
      .select($"id".as("detail_id"), $"order_id", $"sku_id", $"sku_num",
        $"order_price", $"sku_name", $"split_total_amount", $"detail_time")
    d.join(i, expr(
      """order_id = order_id_i AND
        |detail_time >= info_time - INTERVAL 5 SECONDS AND
        |detail_time <= info_time + INTERVAL 5 SECONDS""".stripMargin))
  }

  /** J1 left-outer variant: details that never meet an order inside the
    * ±5 s window EMIT (with null order columns) once the watermark
    * closes the window, instead of vanishing — the streaming "orphan
    * detail" diagnostic the inner form cannot express. Spark holds the
    * unmatched left row in join state and releases the null-padded row
    * only when the watermark proves no matching order can still arrive;
    * state is evicted on the same schedule, so the operator stays
    * bounded at any runtime.
    */
  def intervalJoinLeftStreaming(info: Dataset[OrderInfo],
      detail: Dataset[OrderDetail]): DataFrame = {
    val i = info.toDF()
      .withColumn("info_time", timestamp_millis($"create_ts"))
      .withWatermark("info_time", "5 seconds")
      .select($"id".as("order_id_i"), $"province_id", $"order_status",
        $"user_id", $"total_amount", $"create_date", $"create_hour",
        $"info_time")
    val d = detail.toDF()
      .withColumn("detail_time", timestamp_millis($"create_ts"))
      .withWatermark("detail_time", "5 seconds")
      .select($"id".as("detail_id"), $"order_id", $"sku_id", $"sku_num",
        $"order_price", $"sku_name", $"split_total_amount", $"detail_time")
    d.join(i, expr(
      """order_id = order_id_i AND
        |detail_time >= info_time - INTERVAL 5 SECONDS AND
        |detail_time <= info_time + INTERVAL 5 SECONDS""".stripMargin),
      "leftOuter")
  }

  /** Batch twin of the interval join: equi key + |Δt| ≤ 5 s predicate. */
  def intervalJoinBatch(info: DataFrame, detail: DataFrame): DataFrame = {
    val i = info.select($"id".as("order_id_i"), $"province_id",
      $"order_status", $"user_id", $"total_amount", $"create_ts".as("info_ts"))
    val d = detail.select($"id".as("detail_id"), $"order_id", $"sku_id",
      $"sku_num", $"order_price", $"sku_name", $"create_ts".as("detail_ts"))
    d.join(i, $"order_id" === $"order_id_i" &&
      abs($"detail_ts" - $"info_ts") <= JoinWindowMs)
  }

  /** J3/J4: the six-dim enrichment chain (user, province, sku, spu,
    * trademark, category3) as left broadcast joins against the dim
    * store — the Catalyst replacement of the reference's async
    * Redis/Phoenix lookups (DimAsyncFunction.java:46-82). `user_age` is
    * derived from birthday as in the intended spec.
    */
  def enrich(orderWide: DataFrame, dims: Map[String, DataFrame]): DataFrame = {
    var out = orderWide
    def ljoin(d: DataFrame, cond: org.apache.spark.sql.Column): Unit =
      out = out.join(broadcast(d), cond, "left")

    if (dims.contains("dim_user_info")) {
      val u = dims("dim_user_info").select($"__pk".as("u_pk"),
        $"row".getItem("gender").as("user_gender"),
        $"row".getItem("birthday").as("u_birthday"))
      ljoin(u, $"user_id".cast("string") === $"u_pk")
      out = out.withColumn("user_age",
        floor(months_between(current_date(), to_date($"u_birthday")) / 12).cast("int"))
        .drop("u_birthday", "u_pk")
    }
    if (dims.contains("dim_base_province")) {
      val p = dims("dim_base_province").select($"__pk".as("p_pk"),
        $"row".getItem("name").as("province_name"),
        $"row".getItem("area_code").as("province_area_code"),
        $"row".getItem("iso_code").as("province_iso_code"),
        $"row".getItem("iso_3166_2").as("province_3166_2_code"))
      ljoin(p, $"province_id".cast("string") === $"p_pk")
      out = out.drop("p_pk")
    }
    if (dims.contains("dim_sku_info")) {
      val s = dims("dim_sku_info").select($"__pk".as("s_pk"),
        $"row".getItem("spu_id").as("spu_id"),
        $"row".getItem("tm_id").as("tm_id"),
        $"row".getItem("category3_id").as("category3_id"))
      ljoin(s, $"sku_id".cast("string") === $"s_pk")
      out = out.drop("s_pk")
    }
    if (dims.contains("dim_spu_info")) {
      val s = dims("dim_spu_info").select($"__pk".as("spu_pk"),
        $"row".getItem("spu_name").as("spu_name"))
      ljoin(s, $"spu_id" === $"spu_pk")
      out = out.drop("spu_pk")
    }
    if (dims.contains("dim_base_trademark")) {
      val t = dims("dim_base_trademark").select($"__pk".as("tm_pk"),
        $"row".getItem("tm_name").as("tm_name"))
      ljoin(t, $"tm_id" === $"tm_pk")
      out = out.drop("tm_pk")
    }
    if (dims.contains("dim_base_category3")) {
      val c = dims("dim_base_category3").select($"__pk".as("c3_pk"),
        $"row".getItem("name").as("category3_name"))
      ljoin(c, $"category3_id" === $"c3_pk")
      out = out.drop("c3_pk")
    }
    out
  }
}
