package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.CdcRouter

/** Contract for [[org.apache.spark.sql.graftexpr.DimStoreBucketPrune]]:
  * a `__pk` point lookup over the bucketed dim store must read exactly
  * the bucket the writer routed that key to — Spark's partition pruning
  * driven by the rule-injected `__bucket` predicate.
  */
class DimStorePruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr
  import org.apache.spark.sql.functions._

  private def dimRow(pairs: (String, String)*) = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    pairs.map { case (id, name) =>
      ("dim_user_info", "id", Map("id" -> id, "name" -> name))
    }.toDF("sinkTable", "sinkPk", "row")
  }

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan
    val inner = plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(plan)
    inner.collectFirst { case s: FileSourceScanExec => s }.get
  }

  /** A store whose 40 keys are guaranteed to span several buckets. */
  private lazy val store: String = {
    val dir = Files.createTempDirectory("dimprune").toString
    CdcRouter.mergeDim(spark, dir, "dim_user_info", "id",
      dimRow((1 to 40).map(i => i.toString -> s"user$i"): _*))
    s"$dir/dim_user_info"
  }

  test("point lookup on __pk reads exactly one bucket") {
    val bucketDirs = new java.io.File(store)
      .listFiles().count(_.getName.startsWith("__bucket="))
    assert(bucketDirs >= 3, s"fixture must span buckets, got $bucketDirs")

    val look = spark.read.parquet(store).filter($"__pk" === "7")
    val scan = scanOf(look)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "__bucket")),
      s"rule must inject a __bucket partition filter: ${scan.partitionFilters}")
    assert(scan.metrics("numFiles").value === 1,
      "a point lookup must read exactly one bucket file")
    assert(look.select($"row".getItem("name")).head().getString(0) === "user7")
  }

  test("IN-list lookup prunes to the union of the keys' buckets") {
    val look = spark.read.parquet(store).filter($"__pk".isin("7", "8", "9"))
    val scan = scanOf(look)
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "__bucket")))
    assert(scan.metrics("numFiles").value <= 3)
    assert(look.count() === 3)
  }

  test("type-mismatched predicate (cast around __pk) is left alone, still correct") {
    // cast(__pk as int) = 7 compares different bytes than the writer
    // hashed — the rule must not fire, and the full-scan answer is right
    val look = spark.read.parquet(store).filter($"__pk".cast("int") === 7)
    val scan = scanOf(look)
    assert(scan.partitionFilters.isEmpty, scan.partitionFilters.toString)
    assert(look.count() === 1)
  }

  test("a bucketed layout WITHOUT the marker is not treated as a dim store") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val dir = Files.createTempDirectory("notadim").toString
    (1 to 10).map(i => (i.toString, i % 4)).toDF("__pk", "__bucket")
      .write.partitionBy("__bucket").parquet(s"$dir/t")
    val look = spark.read.parquet(s"$dir/t").filter($"__pk" === "7")
    val scan = scanOf(look)
    assert(scan.partitionFilters.isEmpty,
      "no _bucket_count marker -> unknown routing -> must not prune")
    assert(look.count() === 1)
  }
}
