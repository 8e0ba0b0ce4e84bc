package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Declarative data-quality audit: one pass per table computes every
  * row-local constraint as conditional aggregates, referential checks
  * run aggregate-below-join, and the result is a uniform
  * (check_name, violations, checked) report — the contract-testing
  * layer a 100 TB ingest needs before anything downstream trusts the
  * data. The reference validates records one at a time inside its
  * parse/ETL operators (reference
  * gmall-realtime/.../app/ods/BaseLogApp.java dirty-side-out);
  * this is the corpus-level census twin of that row-level gate.
  *
  * Scale notes:
  *  - Row-local constraints on one table share ONE scan: each check is
  *    a `sum(when(violated, 1))` conditional aggregate, so adding a
  *    check adds a column to the aggregation buffer, not a pass over
  *    100 TB. The per-table result is a single row, unpivoted to the
  *    report shape with `stack` (rows are born after aggregation —
  *    nothing corpus-sized is ever widened).
  *  - Referential checks aggregate the fact side to distinct-key counts
  *    FIRST (bounded by key cardinality, not row count), then left-anti
  *    join the dimension: the join input is already dimension-sized, so
  *    AQE broadcasts it; violation rows are recovered exactly from the
  *    per-key counts. Never an anti join of raw facts against a
  *    scaling dimension.
  *  - The final UNION of one-row reports is driver-negligible at any
  *    scale.
  */
object QualityOps {

  /** One row-local census over one table: every (name, predicate) check
    * becomes a conditional aggregate in a single hash aggregate; the
    * 1-row result `stack`s into report rows (rows are born AFTER
    * aggregation).
    */
  private def census(df: DataFrame)(checks: (String, Column)*): DataFrame = {
    val aggs = checks.map { case (n, violated) =>
      sum(when(violated, 1L).otherwise(0L)).as(n)
    } :+ count(lit(1)).as("checked")
    val stackArgs = checks.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${checks.size}, $stackArgs) AS (check_name, violations)"), $"checked")
  }

  /** Referential-integrity census: how many FACT ROWS point at a key
    * absent from the dimension. Expressed aggregate-below-join — the
    * fact side collapses to (key, cnt) before the anti join, so the
    * dangling row count is reconstructed exactly from per-key counts.
    * Catalyst's PushDownLeftSemiAntiJoin then swaps the two (the anti
    * join key IS the group key, so the rewrite is exact): with a
    * broadcastable dimension that is strictly better — the raw scan
    * anti-joins with no exchange and the aggregate sees only dangling
    * survivors; with a dimension too big to broadcast the join
    * degrades to a shuffle of raw fact rows, and the bounded-key
    * aggregate this method declares is the shape a 100 TB run would
    * pin (e.g. by disabling the rule) — both forms stay key-partitioned,
    * never all-pairs.
    */
  private def fkCensus(name: String, fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val perKey = fact.groupBy(col(factKey)).agg(count(lit(1)).as("cnt"))
    val total = fact.agg(count(lit(1)).as("checked"))
    val dangling = perKey
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_anti")
      .agg(coalesce(sum($"cnt"), lit(0L)).as("violations"))
    dangling.crossJoin(total) // two 1-row aggregates
      .select(lit(name).as("check_name"), $"violations", $"checked")
  }

  /** Events-shaped census over an ARBITRARY frame — the entry the
    * streaming per-batch gate ([[graft.streaming.QualityGate]]) shares
    * with the batch audit, so both report identical check names and
    * semantics.
    */
  def eventsCensus(df: DataFrame): DataFrame = census(df)(
    "events_user_id_null" -> $"user_id".isNull,
    "events_value_negative" -> ($"value" < 0))

  /** Text-corpus audit — the documents-table twin of [[constraints]]:
    * key uniqueness plus the row-local contracts a text pipeline
    * assumes before tokenizing (non-empty text, the stored char count
    * agreeing with the payload, a known language tag). One scan for
    * the row-local checks, one aggregate for uniqueness.
    */
  def documentConstraints(spark: SparkSession, dir: String): DataFrame = {
    val rowLocal = census(documents(spark, dir))(
      "documents_text_empty" -> ($"text".isNull || length($"text") === 0),
      "documents_nchars_mismatch" -> ($"n_chars" =!= length($"text")),
      "documents_lang_unknown" -> !$"lang".isin("en", "de", "fr", "es", "zh"))
    val unique = documents(spark, dir)
      .agg((count(lit(1)) - count_distinct($"doc_id")).as("violations"),
        count(lit(1)).as("checked"))
      .select(lit("documents_doc_id_unique").as("check_name"), $"violations", $"checked")
    rowLocal.union(unique)
  }

  /** The audit suite over the star schema: null-rate, domain, key
    * uniqueness and referential integrity, one report row per check.
    */
  def constraints(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsCensus(events(spark, dir))
    val li = census(lineitem(spark, dir))(
      "lineitem_discount_domain" -> !$"l_discount".between(0.0, 1.0),
      "lineitem_quantity_positive" -> ($"l_quantity" <= 0))
    val cust = customer(spark, dir)
      .agg((count(lit(1)) - count_distinct($"c_custkey")).as("violations"),
        count(lit(1)).as("checked"))
      .select(lit("customer_custkey_unique").as("check_name"), $"violations", $"checked")
    val fkOrders = fkCensus("orders_custkey_fk",
      orders(spark, dir), "o_custkey", customer(spark, dir), "c_custkey")
    val fkLine = fkCensus("lineitem_orderkey_fk",
      lineitem(spark, dir), "l_orderkey", orders(spark, dir), "o_orderkey")
    ev.union(li).union(cust).union(fkOrders).union(fkLine)
  }

  /** `dq_functional_deps`: functional-dependency discovery over a fixed
    * candidate list — does column A determine column B? The profiling
    * primitive behind schema inference, normalization advice and silent
    * denormalization-drift alarms (an FD that held for years breaking
    * is usually an upstream join bug). A→B holds iff no A value maps
    * to more than one distinct B; the report counts violating A values
    * exactly.
    *
    * Scale shape: per candidate one (A-keyed, map-side-combined)
    * aggregation with a single `countDistinct` — the one-distinct form
    * rewrites WITHOUT the Expand multiplication — folded to a 1-row
    * census; candidates union to a report of candidate-list size.
    */
  def functionalDeps(spark: SparkSession, dir: String): DataFrame = {
    def dep(table: String, df: DataFrame, a: String, b: String): DataFrame =
      df.select(col(a).as("a"), col(b).as("b"))
        .groupBy($"a").agg(count_distinct($"b").as("nb"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when($"nb" > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(table).as("tbl"), lit(a).as("lhs"), lit(b).as("rhs"),
          $"n_lhs", $"n_violating", ($"n_violating" === 0L).as("holds"))
    dep("part", part(spark, dir), "p_partkey", "p_brand")
      .unionByName(dep("part", part(spark, dir), "p_brand", "p_type"))
      .unionByName(dep("customer", customer(spark, dir),
        "c_nationkey", "c_mktsegment"))
      .unionByName(dep("orders", orders(spark, dir),
        "o_orderkey", "o_orderdate"))
  }

  /** Re-identification threshold for [[kAnonymity]]: a quasi-identifier
    * group with fewer than this many members is an at-risk cohort.
    */
  val KAnon = 10L

  /** `dq_k_anonymity`: k-anonymity audit over the customer table's
    * quasi-identifier tuple (nation, market segment, account-balance
    * band) — the privacy census run before a dataset derived from user
    * records is released for training. A row is re-identifiable when
    * its QI combination is shared by fewer than [[KAnon]] rows; the
    * report is one row per QI cohort with its population and risk
    * flag, so both the dataset's k (min cohort size) and the exact
    * at-risk population read directly off it.
    *
    * The balance band is `floor(acctbal / 1000)` on the exact decimal
    * — floor (not truncation) so negative balances band correctly and
    * both engines agree on the boundary.
    *
    * Scale shape: ONE map-side-combined hash aggregate over the scan;
    * the output is bounded by the QI domain (nations × segments ×
    * bands), not row count — the same census stance as [[census]].
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .groupBy($"c_nationkey",
        $"c_mktsegment",
        floor(RelationalOps.dec($"c_acctbal").cast("double") / 1000.0)
          .cast("long").as("bal_band"))
      .agg(count(lit(1)).as("n"))
      .select($"c_nationkey", $"c_mktsegment", $"bal_band", $"n",
        ($"n" < KAnon).as("at_risk"))

  /** Distinct-sensitive-value threshold for [[lDiversity]]. */
  val LDiv = 3L

  /** `dq_l_diversity`: l-diversity audit — the privacy check k-anonymity
    * alone cannot make. A QI cohort can be large (k-anonymous) yet leak
    * the sensitive attribute anyway when every member shares the same
    * value (the homogeneity attack); this census reports, per
    * quasi-identifier cohort (nation × balance band), the population AND
    * the number of distinct sensitive values (market segment), flagging
    * cohorts below [[LDiv]] as at-risk. Run alongside [[kAnonymity]]
    * before releasing user-derived training data.
    *
    * Scale shape: ONE hash aggregate over the scan with a single exact
    * count-distinct (Spark expands it to a two-level aggregate on the
    * same QI keys — no extra shuffle beyond the QI exchange); output is
    * QI-domain-bounded, never row-count-sized.
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .groupBy($"c_nationkey",
        floor(RelationalOps.dec($"c_acctbal").cast("double") / 1000.0)
          .cast("long").as("bal_band"))
      .agg(count(lit(1)).as("n"),
        countDistinct($"c_mktsegment").as("n_sensitive"))
      .select($"c_nationkey", $"bal_band", $"n", $"n_sensitive",
        ($"n_sensitive" < LDiv).as("at_risk"))

  /** Burst threshold (events within one minute) for [[botUsers]]. */
  val BotBurst = 5L

  /** `dq_bot_users`: traffic-quality census — each user's peak
    * events-per-minute burst, total volume, active minutes, and a bot
    * flag when the peak burst reaches [[BotBurst]] — the rate-based
    * automation screen run before behavioral data feeds a model (the
    * reference pipeline has jsonMalformed dirty-side-out; this is the
    * semantic layer above it).
    *
    * Scale shape: two-level aggregation — (user × minute) counts with
    * map-side combine, then a user-keyed max/sum rollup; both hash on
    * user_id so AQE reuses one co-partitioning. Never a window over
    * raw events.
    */
  def botUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy($"user_id",
        date_format(date_trunc("minute", $"ts"), "yyyy-MM-dd HH:mm").as("m"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg(max($"n").as("max_per_minute"), sum($"n").as("n_events"),
        count(lit(1)).as("active_minutes"))
      .select($"user_id", $"max_per_minute", $"n_events", $"active_minutes",
        ($"max_per_minute" >= BotBurst).as("is_bot"))
}
