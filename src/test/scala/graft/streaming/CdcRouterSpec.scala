package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.GmallSchemas.TableProcess

/** BaseDBLog router: envelope parse + delete filter, config-driven
  * routing, column pruning, dynamic topic, dim-store MERGE (FIXTURES.md
  * §3-§4 cases).
  */
class CdcRouterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  val config = Seq(
    TableProcess("order_info", "insert", "kafka", "dwd_order_info",
      "id,user_id,total_amount", "id", ""),
    TableProcess("user_info", "insert", "hbase", "dim_user_info",
      "id,name,birthday,gender", "id", ""),
    TableProcess("user_info", "update", "hbase", "dim_user_info",
      "id,name,birthday,gender", "id", ""))

  def env(table: String, op: String, after: String): String =
    s"""{"database":"gmall2021","tableName":"$table","before":{},"after":$after,"type":"$op"}"""

  lazy val raw = {
    import spark.implicits.{localSeqToDatasetHolder, newStringEncoder}
    Seq(
      env("order_info", "insert", """{"id":"3001","user_id":"42","total_amount":"299.00","secret":"drop-me"}"""),
      env("order_info", "create", """{"id":"3002","user_id":"43","total_amount":"88.00"}"""),
      env("order_info", "delete", """{"id":"3001"}"""),
      env("user_info", "insert", """{"id":"7","name":"alice","birthday":"1990-05-01","gender":"F","junk":"x"}"""),
      env("user_info", "update", """{"id":"7","name":"alice2","birthday":"1990-05-01","gender":"F"}"""),
      env("mystery_table", "insert", """{"id":"1"}""")).toDF("value")
  }

  test("parse drops deletes and normalizes create to insert") {
    val cdc = CdcRouter.parse(raw)
    assert(cdc.count() === 5) // delete gone
    assert(cdc.filter($"type" === "create").count() === 0)
    assert(cdc.filter($"tableName" === "order_info").count() === 2)
  }

  test("route: kafka branch gets dynamic topic + pruned JSON; unmatched dropped") {
    val (toKafka, toDim) = CdcRouter.route(CdcRouter.parse(raw), config)
    val k = toKafka.collect()
    assert(k.length === 2)
    assert(k.forall(_.getString(0) == "dwd_order_info"))
    val v = k.map(_.getString(1)).find(_.contains("3001")).get
    assert(!v.contains("secret"), "sinkColumns pruning must drop extra keys")
    assert(toDim.count() === 2)
    // mystery_table had no route: dropped entirely
    assert(toKafka.count() + toDim.count() === 4)
  }

  test("dim store MERGE: insert then update, latest wins; auto-creates table") {
    val dir = Files.createTempDirectory("dimstore").toString
    val (_, toDim) = CdcRouter.route(CdcRouter.parse(raw), config)
    CdcRouter.sinkDims(dir, toDim, config)
    val dim = spark.read.parquet(s"$dir/dim_user_info")
    assert(dim.count() === 1)
    val row = dim.select($"row".getItem("name")).as[String](Encoders.STRING).head()
    assert(row === "alice2", "update must supersede insert for the same pk")
    // idempotent re-merge
    CdcRouter.sinkDims(dir, toDim, config)
    assert(spark.read.parquet(s"$dir/dim_user_info").count() === 1)
  }
}
