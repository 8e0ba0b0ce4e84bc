package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Event-stream operators — batch twins of the reference's DataStream
  * pipeline, expressed over the driver's `events` table
  * (event_id, ts, user_id, event_type, value, props-JSON).
  *
  * Each has a Structured Streaming twin in [[graft.streaming]]; the batch
  * form is the DuckDB-oracle-checkable one (SURVEY.md §7.1 batch-first
  * stance). Window functions partition by `user_id` — the same hash
  * partitioning the reference gets from `keyBy(mid)`
  * (gmall-realtime/.../app/dwd/BaseLogApp.java:74). One shuffle on the
  * key, then all per-user logic is partition-local; scales linearly with
  * users.
  */
object EventOps {

  /** P1/P2: JSON parse with dirty-record diversion (reference
    * BaseLogApp.java:55-71 side-output "Dirty"). `get_json_object`
    * returns null on corrupt input, so clean/dirty are two filters over
    * one parse — no exceptions, no job failure on bad records.
    */
  def jsonParse(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("bigint").as("k"))
      .withColumn("clean", $"k".isNotNull)

  /** P6/P7: datetime derivations (reference OrderWideApp.java:50-62
    * create_date/create_hour/create_ts; UniqueVisitApp.java:71 dt).
    */
  def datetimeDerive(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        $"event_id",
        date_format($"ts", "yyyy-MM-dd").as("dt"),
        hour($"ts").cast("bigint").as("hr"),
        unix_timestamp($"ts").as("epoch_sec"))

  /** ST1: new/returning-visitor correction (reference
    * BaseLogApp.java:73-101: keyed ValueState flips is_new "1"→"0" after
    * the first sighting). Batch twin: first event per user keeps
    * is_new=1, all later events 0. Deterministic tiebreak on event_id.
    */
  def isNewFix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .select($"event_id", $"user_id",
        when($"rn" === 1, lit(1L)).otherwise(lit(0L)).as("is_new"))
  }

  /** ST2: daily unique-visitor dedup (reference UniqueVisitApp.java:53-102:
    * keyed date-valued state with 24 h TTL keeps one event per mid per
    * day). Batch twin: min event per (user, day). The streaming twin uses
    * `dropDuplicates` under a 1-day watermark — same answer, bounded
    * state.
    */
  def dailyUniqueVisitors(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("dt", date_format($"ts", "yyyy-MM-dd"))
      .groupBy($"user_id", $"dt")
      .agg(min($"event_id").as("first_event_id"), count(lit(1)).as("n_events"))

  /** ST3: bounce detection, batch twin (reference UserJumpDetailApp
    * CEP: session-entry then another entry or silence within 10 s ⇒
    * bounce; gmall-realtime/.../app/dwm/UserJumpDetailApp.java:85-111).
    *
    * Sessionization by gap: an event is a session entry when >30 min have
    * passed since the user's previous event; a bounce is an entry whose
    * next event is >600 s away (or absent) — covering both the CEP
    * "pattern match" (next is a fresh entry) and the "timeout" branch in
    * one predicate, exactly what the streaming twin's
    * flatMapGroupsWithState emits on match/timeout.
    */
  def bounceDetect(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("next_ts", lead($"ts", 1).over(w))
      .withColumn("is_entry",
        $"prev_ts".isNull || unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800)
      .filter($"is_entry" &&
        ($"next_ts".isNull || unix_timestamp($"next_ts") - unix_timestamp($"ts") > 600))
      .select($"event_id", $"user_id")
  }

  /** X1/X4: multi-way split with explode (reference BaseLogApp.java:103-142
    * splits one stream into start/page/display, display = exploded
    * `displays[]` array tagged with parent page_id). Here: signup events
    * are the "start" branch, everything else "page"; the "display" branch
    * explodes a derived item array, each element tagged with its parent's
    * event_type — the same generator + parent-tag semantics.
    */
  def logSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("bigint"))
    val start = e.filter($"event_type" === "signup")
      .select($"event_id", lit("start").as("branch"),
        lit(null).cast("bigint").as("item"), lit(null).cast("string").as("page_id"))
    val page = e.filter($"event_type" =!= "signup")
      .select($"event_id", lit("page").as("branch"),
        lit(null).cast("bigint").as("item"), lit(null).cast("string").as("page_id"))
    // the k % 4 >= 1 predicate lives INSIDE the generator (CASE → null →
    // explode emits nothing): as a separate filter it would be pushed
    // into the scan and re-evaluate the JSON parse once in the filter
    // and again in the projection (sequence(1, 0) is DESCENDING in
    // Spark, so the zero case cannot be left to an empty sequence)
    val display = e.filter($"event_type" =!= "signup")
      .select($"event_id",
        explode(expr(
          "CASE WHEN k % 4 >= 1 THEN sequence(CAST(1 AS BIGINT), k % 4) END")).as("item"),
        $"event_type".as("page_id"))
      .select($"event_id", lit("display").as("branch"), $"item", $"page_id")
    start.unionByName(page).unionByName(display)
  }

  /** S4/P3: CDC envelope normalization + delete filter (reference
    * CustomerDeserialization.java:29-83 maps binlog ops, "create" →
    * "insert"; BaseDBLog.java:60-66 drops deletes). Orders stand in for
    * the change stream: status → op-type, then normalize + filter.
    */
  def cdcNormalize(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .withColumn("raw_type",
        when($"o_orderstatus" === "O", lit("create"))
          .when($"o_orderstatus" === "F", lit("update"))
          .otherwise(lit("delete")))
      .withColumn("type",
        when($"raw_type" === "create", lit("insert")).otherwise($"raw_type"))
      .filter($"type" =!= "delete")
      .select(lit("gmall2021").as("database"), lit("order_info").as("tableName"),
        $"o_orderkey".as("id"), $"type")

  /** SCD2 (type-2 slowly-changing-dimension) history construction from a
    * change log — the batch companion to the K3 dim upsert: where the
    * reference's dim layer keeps only the LATEST row per key
    * (DimSinkFunction.java upsert semantics), a training/analytics store
    * usually needs the full validity history. Each user's event stream
    * stands in for a dim key's change log, `event_type` for the tracked
    * attribute: consecutive duplicate values collapse into one run
    * (change detection via `lag`), each run becomes one history row with
    * `[valid_from, valid_to)` micros, `is_current`, and a per-key
    * `version`. One shuffle on the key; the change-filter preserves the
    * sort, so both window passes share a single Exchange+Sort — at
    * 100 TB this is exactly one repartition of the change log, and the
    * per-key work is partition-local regardless of history depth.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val runs = events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
    runs
      .withColumn("valid_to", unix_micros(lead($"ts", 1).over(w)))
      .withColumn("version", row_number().over(w).cast("long"))
      .select($"user_id", $"event_type".as("attr"),
        unix_micros($"ts").as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"), $"version")
  }

  /** Point-in-time lookup against the SCD2 history (the consumer side of
    * [[scd2History]] — the reference's versioned-dim semantics, where a
    * fact is enriched with the attribute value that was CURRENT at the
    * fact's timestamp, not today's). Probes are a deterministic sample
    * of the event stream shifted +30 s, so a probe can land inside its
    * own run, a later run, or past the final change (caught by the
    * open-ended `valid_to IS NULL` current row).
    *
    * Join shape at scale: equi-key on user_id (history and probes
    * co-partition) with the interval containment as a residual — one
    * shuffle, no nested loop; history depth per key is bounded by the
    * change count, not the event count.
    */
  def scd2PointInTime(spark: SparkSession, dir: String): DataFrame = {
    val hist = scd2History(spark, dir)
    val probes = events(spark, dir)
      .filter($"event_id" % 37 === 0)
      .select($"event_id", $"user_id".as("p_user"),
        (unix_micros($"ts") + 30000000L).as("at_us"))
    probes.join(hist,
        probes("p_user") === hist("user_id") &&
          probes("at_us") >= hist("valid_from") &&
          (hist("valid_to").isNull || probes("at_us") < hist("valid_to")))
      .select($"event_id", $"p_user".as("user_id"), $"at_us",
        hist("attr").as("attr_at"), hist("version").as("version_at"))
  }

  /** X2/K2/K3 batch twin of the full CDC route (reference BaseDBLog +
    * TableProcessFunction): orders become change envelopes with an
    * `after` map; a config table routes insert→kafka / update→hbase,
    * prunes `after` to the configured columns, and emits the
    * dynamic-topic JSON payload. Deletes are dropped (P3); unknown
    * (table, op) combos would be dropped by the inner join (X2's
    * "no such key" branch).
    */
  def cdcRoute(spark: SparkSession, dir: String): DataFrame = {
    val cdc = orders(spark, dir)
      .withColumn("type",
        when($"o_orderstatus" === "O", lit("insert"))
          .when($"o_orderstatus" === "F", lit("update"))
          .otherwise(lit("delete")))
      .filter($"type" =!= "delete")
      .select($"o_orderkey".as("id"), $"type",
        map(
          lit("id"), $"o_orderkey".cast("string"),
          lit("user_id"), $"o_custkey".cast("string"),
          lit("total_amount"), $"o_totalprice".cast("decimal(18,2)").cast("string"),
          lit("secret"), lit("x")).as("after"))
    val cfg = broadcast(spark.createDataFrame(Seq(
      ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount"),
      ("order_info", "update", "hbase", "dim_order_info", "id,total_amount")))
      .toDF("sourceTable", "operateType", "sinkType", "sinkTable", "sinkColumns"))
    cdc.join(cfg, $"type" === cfg("operateType") && cfg("sourceTable") === "order_info")
      // (hoisting split() into its own column is a no-op: CollapseProject
      // inlines a single-use alias back into the lambda body)
      .withColumn("pruned",
        map_filter($"after", (k, _) => array_contains(split($"sinkColumns", ","), k)))
      .select($"id", $"sinkType".as("sink_type"), $"sinkTable".as("topic"),
        to_json($"pruned").as("value"))
  }

  /** Routing config: (source_type, sink_type, sink_table) — the
    * `table_process` table of the reference (bean/TableProcess.java:12-24),
    * built in-memory here; in production a JDBC-read config table
    * refreshed per micro-batch.
    */
  def routeConfig(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq(
      ("click", "kafka", "dwd_click"),
      ("view", "kafka", "dwd_view"),
      ("purchase", "hbase", "dim_purchase"),
      ("signup", "hbase", "dim_signup")))
      .toDF("source_type", "sink_type", "sink_table")

  /** J2/X2/K2: config-driven routing via broadcast control join (reference
    * BaseDBLog.java:81-105 + TableProcessFunction: broadcast config state,
    * route each record to kafka vs hbase by lookup, unmatched dropped).
    * The config DF broadcasts (it is tiny by construction); the inner join
    * drops unmatched types exactly like the reference's "no such key"
    * branch; `sink_table` is the dynamic topic column the Kafka sink
    * consumes.
    */
  def configRoute(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val cfg = routeConfig(spark)
    e.join(broadcast(cfg), e("event_type") === cfg("source_type"))
      .select($"event_id", $"sink_type", $"sink_table".as("topic"))
  }

  /** J2 in its SKEWED form: the same config-route join, via
    * [[SkewOps.saltedJoin]] — the fallback for when the dim side cannot
    * broadcast and the stream key is hot. `event_type` has 5 distinct
    * values, so an unsalted shuffle join lands each type's entire
    * volume on ONE reducer regardless of cluster size; the salt spreads
    * every type over 8 sub-keys. (AQE's OptimizeSkewedJoin also
    * mitigates this at runtime, but only for joins it planned itself
    * and only within a batch — the salt is the plan-level guarantee.)
    * Same output contract and oracle as `j2_config_route`.
    */
  def saltedRoute(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select($"event_id", $"event_type")
    val cfg = routeConfig(spark).withColumnRenamed("source_type", "event_type")
    SkewOps.saltedJoin(e, cfg, "event_type", buckets = 8,
        bigSaltSource = $"event_id")
      .select($"event_id", $"sink_type", $"sink_table".as("topic"))
  }

  /** Salted AGGREGATION twin of [[saltedRoute]]: per-type value totals
    * over the 5-hot-key `event_type` column via [[SkewOps.saltedSum]]'s
    * two-level shape — partial sums on (key, salt) cap any reducer's
    * share of a hot key at 1/buckets, the final reduce sees `buckets`
    * rows per key. Decimal partials keep the double output exact, so
    * the oracle (the plain unsalted GROUP BY) value-matches.
    */
  def saltedTypeTotals(spark: SparkSession, dir: String): DataFrame =
    SkewOps.saltedSum(events(spark, dir), "event_type",
        $"value".cast("decimal(18,2)"), buckets = 8, saltSource = $"event_id")
      .select($"event_type", $"total".cast("double").as("total"), $"n")

  /** Heavy-hitter SCAN over a zipf-shaped key via the Misra-Gries
    * two-pass ([[SkewOps.heavyHittersByShare]]): which keys hold ≥ 2.2%
    * of all rows? The key is a deterministic power-law derivation from
    * `event_id` (share of key v ≈ 1/v(v+1)), standing in for the hot-key
    * column a real skew scan probes. The answer is exact (MG candidates,
    * exact recheck) — the oracle is the plain GROUP BY ... HAVING — but
    * the plan never shuffles the full key space: pass 1 ships one
    * 64-entry summary per partition, pass 2 aggregates only candidate
    * keys' rows.
    */
  def heavyHitterScan(spark: SparkSession, dir: String): DataFrame = {
    val keyed = events(spark, dir)
      .select(expr("10000 div ((event_id % 10000) + 1)").as("hh_key"))
    SkewOps.heavyHittersByShare(keyed, "hh_key", k = 64,
      shareNum = 22, shareDen = 1000)
  }

  /** P4: data-driven column pruning (reference
    * TableProcessFunction.java:183-195 keeps only config-listed keys).
    * The projection is built at plan time from the config string — the
    * runtime analogue of Catalyst's static ColumnPruning, and it reaches
    * the parquet scan (ReadSchema shows only these columns).
    */
  def dynamicPrune(spark: SparkSession, dir: String,
      sinkColumns: String = "event_id,event_type,user_id"): DataFrame = {
    val cols = sinkColumns.split(",").map(c => col(c.trim))
    events(spark, dir).select(cols: _*)
  }

  /** P9/K2: dynamic-topic sink projection (reference MyKafkaUtil.java:23-31
    * per-record topic + JSON value). Emits the exact (topic, value) shape
    * Spark's Kafka sink consumes; value is canonical JSON of the payload.
    */
  def dynamicTopic(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select($"event_id",
        concat(lit("dwd_"), $"event_type").as("topic"),
        to_json(struct($"event_id", $"event_type", $"user_id")).as("value"))
}
