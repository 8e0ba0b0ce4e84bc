package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The audit census must count exactly the violations planted in a
  * corrupted mini star-schema — and report all-clean on the driver's
  * clean synthetic data.
  */
class QualityOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def reportOf(dir: String): Map[String, (Long, Long)] =
    QualityOps.constraints(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("planted violations are counted exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    spark.createDataFrame(Seq(
      (1L, ts, Some(7L), "view", 1.0, "{}"),
      (2L, ts, None: Option[Long], "view", -2.0, "{}"), // null user + negative value
      (3L, ts, Some(8L), "err", -0.5, "{}")))           // negative value
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // customer 10 duplicated; orders 101 dangles (custkey 99); both its
    // lineitems dangle once the order with a missing key is... present,
    // so only l_orderkey 999 dangles
    spark.createDataFrame(Seq((10L, "a", 1, 0.0, "B"), (10L, "b", 1, 0.0, "B"), (11L, "c", 1, 0.0, "B")))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    spark.createDataFrame(Seq(
      (100L, 10L, "O", 5.0, ts, "1-URGENT"),
      (101L, 99L, "O", 5.0, ts, "1-URGENT")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    spark.createDataFrame(Seq(
      (100L, 1L, 1L, 1, 1.0, 10.0, 0.05, 0.01, "N", "O", ts),
      (100L, 1L, 1L, 2, 0.0, 10.0, 1.50, 0.01, "N", "O", ts),  // qty<=0, discount>1
      (999L, 1L, 1L, 1, 2.0, 10.0, -0.10, 0.01, "N", "O", ts))) // dangling order, discount<0
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")

    val got = reportOf(dir)
    assert(got("events_user_id_null") === ((1L, 3L)))
    assert(got("events_value_negative") === ((2L, 3L)))
    assert(got("lineitem_discount_domain") === ((2L, 3L)))
    assert(got("lineitem_quantity_positive") === ((1L, 3L)))
    assert(got("customer_custkey_unique") === ((1L, 3L)))
    assert(got("orders_custkey_fk") === ((1L, 2L)))
    assert(got("lineitem_orderkey_fk") === ((1L, 3L)))
  }

  test("documents census counts planted text violations exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dqdoc").toString
    spark.createDataFrame(Seq(
      (1L, "good text", "en", "web", 9L),
      (1L, "dup id", "de", "web", 6L),        // duplicate doc_id
      (2L, "", "en", "web", 0L),              // empty text
      (3L, "short", "xx", "web", 99L)))       // unknown lang + wrong n_chars
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = QualityOps.documentConstraints(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("documents_text_empty") === ((1L, 4L)))
    assert(got("documents_nchars_mismatch") === ((1L, 4L)))
    assert(got("documents_lang_unknown") === ((1L, 4L)))
    assert(got("documents_doc_id_unique") === ((1L, 4L)))
  }

  test("driver synthetic data audits clean on referential checks") {
    val got = reportOf("/root/testdata/sf0.001")
    assert(got("orders_custkey_fk")._1 === 0L)
    assert(got("lineitem_orderkey_fk")._1 === 0L)
    assert(got("customer_custkey_unique")._1 === 0L)
    assert(got.size === 7)
  }

  test("functional deps: keys hold, non-keys violate with exact counts") {
    val got = QualityOps.functionalDeps(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // a primary key determines everything
    val (nKeys, vKeys, holdsKeys) = got(("orders", "o_orderkey", "o_orderdate"))
    assert(holdsKeys && vKeys === 0L)
    assert(nKeys === graft.Tables.orders(spark, "/root/testdata/sf0.001").count())
    // brand -> type does NOT hold; violation count replayed by hand
    val expectViolating = graft.Tables.part(spark, "/root/testdata/sf0.001")
      .select("p_brand", "p_type")
      .distinct().groupBy("p_brand").count()
      .filter("count > 1").count()
    val (_, vBrand, holdsBrand) = got(("part", "p_brand", "p_type"))
    assert(!holdsBrand && vBrand === expectViolating)
  }

  test("k-anonymity census partitions the table and flags exactly the sub-K cohorts") {
    val sf = "/root/testdata/sf0.001"
    val out = QualityOps.kAnonymity(spark, sf).collect()
    assert(out.map(_.getLong(3)).sum ===
      graft.Tables.customer(spark, sf).count(), "cohorts partition the table")
    out.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(3) < QualityOps.KAnon), s"risk flag: $r")
    }
    // QI tuples are unique report rows
    // c_nationkey's physical type is the writer's (INT32 here) — compare
    // generically rather than pinning a width the census doesn't define
    val keys = out.map(r => (r.get(0), r.getString(1), r.getLong(2)))
    assert(keys.distinct.length === keys.length)
  }

  test("l-diversity census partitions the table; flag matches distinct-sensitive count") {
    val sf = "/root/testdata/sf0.001"
    val out = QualityOps.lDiversity(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum ===
      graft.Tables.customer(spark, sf).count(), "cohorts partition the table")
    out.foreach { r =>
      assert(r.getLong(3) >= 1L && r.getLong(3) <= r.getLong(2),
        s"distinct-sensitive bounded by population: $r")
      assert(r.getBoolean(4) === (r.getLong(3) < QualityOps.LDiv),
        s"risk flag: $r")
    }
    // a cohort can be k-anonymous yet not l-diverse — the two censuses
    // must disagree on SOME cohort shape for the op to add information;
    // at minimum the QI domains differ (no segment key here)
    val keys = out.map(r => (r.get(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("bot census: burst replay on a constructed burst, totals reconcile") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bot").toString
    val ts = (m: Int, s: Int) => java.sql.Timestamp.valueOf(f"2024-01-02 10:$m%02d:$s%02d")
    // user 1: 6 events in one minute (bot); user 2: spread out (human)
    val rows = (1 to 6).map(i => (i.toLong, ts(0, i), 1L, "view", 1.0, "{}")) ++
      Seq((7L, ts(1, 0), 2L, "view", 1.0, "{}"), (8L, ts(5, 0), 2L, "view", 1.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = QualityOps.botUsers(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((6L, 6L, 1L, true)))
    assert(out(2L) === ((1L, 2L, 2L, false)))
  }
}
