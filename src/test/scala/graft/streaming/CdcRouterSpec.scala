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

  import org.apache.spark.sql.functions.{hash, lit, pmod}

  private def dimRow(id: String, name: String) = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    Seq(("dim_user_info", "id",
      Map("id" -> id, "name" -> name))).toDF("sinkTable", "sinkPk", "row")
  }

  private def bucketOf(id: String): Int = {
    import spark.implicits.{localSeqToDatasetHolder, newStringEncoder}
    Seq(id).toDF("pk")
      .select(pmod(hash($"pk"), lit(CdcRouter.DimStoreBuckets)))
      .head().getInt(0)
  }

  /** (relative file name -> md5) for every data file under a dir. */
  private def fileHashes(dir: java.io.File): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet")).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      f.getPath.stripPrefix(dir.getPath) -> md5.map("%02x".format(_)).mkString
    }.toMap
  }

  test("bucketed MERGE rewrites only touched buckets (others byte-identical)") {
    val dir = Files.createTempDirectory("dimstore").toString
    // two pks guaranteed to land in different buckets
    val idA = "7"
    val idB = (8 to 200).map(_.toString).find(bucketOf(_) != bucketOf(idA)).get
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow(idA, "alice"))
    val bucketA = new java.io.File(s"$dir/dim_user_info/__bucket=${bucketOf(idA)}")
    val before = fileHashes(bucketA)
    assert(before.nonEmpty, "bucket dir for idA must exist after first merge")
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow(idB, "bob"))
    assert(fileHashes(bucketA) === before,
      "merging a key of another bucket must not rewrite idA's bucket")
    val dim = spark.read.parquet(s"$dir/dim_user_info")
    assert(dim.count() === 2)
    // and updating idA rewrites its bucket but leaves idB's alone
    val bucketB = new java.io.File(s"$dir/dim_user_info/__bucket=${bucketOf(idB)}")
    val beforeB = fileHashes(bucketB)
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow(idA, "alice2"))
    assert(fileHashes(bucketB) === beforeB)
    assert(fileHashes(bucketA) !== before)
    val names = spark.read.parquet(s"$dir/dim_user_info")
      .select($"row".getItem("name")).as[String](Encoders.STRING)
      .collect().toSet
    assert(names === Set("alice2", "bob"))
  }

  test("interrupted bucket swap (.bak left, live missing) is healed on next merge") {
    val dir = Files.createTempDirectory("dimstore").toString
    val idA = "7"
    val idB = (8 to 200).map(_.toString).find(bucketOf(_) != bucketOf(idA)).get
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow(idA, "alice"))
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow(idB, "bob"))
    // simulate a crash between live->bak and tmp->live for idA's bucket
    // (backups live in the SIBLING <table>.bak dir, outside the read path)
    val bucketA = new java.io.File(s"$dir/dim_user_info/__bucket=${bucketOf(idA)}")
    val bakA = new java.io.File(s"$dir/dim_user_info.bak/__bucket=${bucketOf(idA)}")
    bakA.getParentFile.mkdirs()
    assert(bucketA.renameTo(bakA))
    // next merge (touching only idB's bucket) must first restore the .bak
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow(idB, "bob2"))
    assert(bucketA.exists() && !bakA.exists())
    val names = spark.read.parquet(s"$dir/dim_user_info")
      .select($"row".getItem("name")).as[String](Encoders.STRING)
      .collect().toSet
    assert(names === Set("alice", "bob2"))
  }

  test("a mid-swap backup never makes the table readable with duplicates") {
    val dir = Files.createTempDirectory("dimstore").toString
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow("7", "alice"))
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow("7", "alice2"))
    // backups are staged OUTSIDE the table dir, so even if one were left
    // behind, reading the table sees exactly one row per pk and __bucket
    // stays integer-typed
    val dim = spark.read.parquet(s"$dir/dim_user_info")
    assert(dim.count() === 1)
    assert(!new java.io.File(s"$dir/dim_user_info").listFiles()
      .exists(_.getName.endsWith(".bak")))
  }

  test("pre-bucketed flat store layout is rejected with a rebuild message") {
    val dir = Files.createTempDirectory("dimstore").toString
    // fabricate a legacy flat store: parquet files, no __bucket= dirs
    dimRow("7", "alice").select($"row".getItem("id").as("__pk"), $"row")
      .write.parquet(s"$dir/dim_user_info")
    val ex = intercept[IllegalStateException] {
      CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow("8", "bob"))
    }
    assert(ex.getMessage.contains("rebuild"), ex.getMessage)
  }

  test("bucket-count mismatch is rejected loudly (marker persisted on create)") {
    val dir = Files.createTempDirectory("dimstore").toString
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow("7", "alice"))
    val marker = new java.io.File(s"$dir/dim_user_info/_bucket_count")
    assert(marker.exists(), "create must persist the bucket count")
    assert(new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
      .trim === CdcRouter.DimStoreBuckets.toString)
    // a store written under a different bucket count must refuse the merge
    // (drop the local-FS checksum sidecar too — a real foreign store's
    // marker would carry its own consistent crc)
    java.nio.file.Files.write(marker.toPath, "8".getBytes("UTF-8"))
    new java.io.File(marker.getParentFile, "._bucket_count.crc").delete()
    val ex = intercept[IllegalStateException] {
      CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow("8", "bob"))
    }
    assert(ex.getMessage.contains("8 buckets"), ex.getMessage)
    // ...a corrupted/truncated marker maps to the same loud rebuild
    // error, not a bare NumberFormatException
    java.nio.file.Files.write(marker.toPath, "16 bu ".getBytes("UTF-8"))
    new java.io.File(marker.getParentFile, "._bucket_count.crc").delete()
    val exCorrupt = intercept[IllegalStateException] {
      CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow("8", "bob"))
    }
    assert(exCorrupt.getMessage.contains("rebuild"), exCorrupt.getMessage)
    // ...and a bucketed store with no marker at all is equally rejected
    java.nio.file.Files.delete(marker.toPath)
    val ex2 = intercept[IllegalStateException] {
      CdcRouter.mergeDim(spark, dir, "dim_user_info", "id", dimRow("8", "bob"))
    }
    assert(ex2.getMessage.contains("_bucket_count"), ex2.getMessage)
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
