package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The canonical-URL contract: all surface variants of the same resource
  * map to one canonical string (the cross-snapshot dedup key), distinct
  * resources stay distinct, and the pipeline is narrow (no shuffle).
  */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("case, www, default port, tracking params, fragment all unify") {
    val variants = canon(
      "https://example.com/a?id=1",
      "HTTPS://EXAMPLE.COM/a?id=1",
      "https://www.example.com/a?id=1",
      "https://example.com:443/a?id=1",
      "https://example.com/a?utm_source=x&id=1",
      "https://example.com/a?id=1&utm_campaign=y",
      "https://example.com/a?id=1#section-3")
    assert(variants.distinct == Seq("https://example.com/a?id=1"), variants)
  }

  test("distinct resources stay distinct") {
    val out = canon(
      "https://example.com/a",
      "https://example.com/b",
      "https://example.com/a?id=2",
      "https://other.com/a",
      "http://example.com/a")
    assert(out.distinct.size == 5, out)
  }

  test("trailing slashes unify; path case is preserved") {
    assert(canon("https://example.com/Path/", "https://example.com/Path").distinct
      == Seq("https://example.com/Path"))
    assert(canon("https://example.com/CaseSensitive").head
      == "https://example.com/CaseSensitive")
  }

  test("params merely CONTAINING a tracking name survive (boundary anchor)") {
    // href / pref contain "ref" but are not the ref param; utm_x only
    // strips when it is the whole parameter name after ? or &.
    assert(canon("https://example.com/a?href=foo").head
      == "https://example.com/a?href=foo")
    assert(canon("https://example.com/a?pref=y&id=1").head
      == "https://example.com/a?pref=y&id=1")
    assert(canon("https://example.com/a?id=1&myutm_source=z").head
      == "https://example.com/a?id=1&myutm_source=z")
    // a real tracking param sandwiched between survivors still goes
    assert(canon("https://example.com/a?href=foo&ref=tw&id=1").head
      == "https://example.com/a?href=foo&id=1")
  }

  test("path segments containing ref= are untouched") {
    assert(canon("https://example.com/p/ref=abc/x?id=1").head
      == "https://example.com/p/ref=abc/x?id=1")
  }

  test("non-default port survives canonicalization") {
    assert(canon("https://example.com:8443/a").head
      == "https://example.com:8443/a")
  }

  test("canonicalization query is a pure narrow plan") {
    val df = UrlOps.urlCanonicalize(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
