package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Crawl-style URL canonicalization — the first step of any web-corpus
  * pipeline (dedup across snapshots keys on the CANONICAL url, never the
  * raw string).
  *
  * Canonical form: lowercased scheme and host, `www.` and default-port
  * suffix stripped, fragment dropped, tracking parameters (`utm_*`,
  * `ref`) removed, empty query separators and trailing slashes cleaned.
  * Everything is regexp_extract/regexp_replace over the RE2∩Java common
  * dialect, with the patterns defined ONCE here and applied by both the
  * Spark query and the generated DuckDB oracle — engine parity by
  * construction, per-row value-checked.
  *
  * Scale: pure narrow projection (no shuffle, no UDF); at 100 TB it runs
  * inside the scan stage alongside the other text kernels.
  *
  * The corpus has no URL column, so (like the PII and normalize ops) each
  * row seeds a deterministic raw URL exercising every rule: mixed-case
  * scheme/host, `WWW.`, `:443`, tracking params in three layouts, a
  * fragment, and a plain no-query variant.
  */
object UrlOps {

  /** Tracking parameters stripped from query strings. Anchored to a
    * captured `?`/`&` separator so only a whole parameter NAMED
    * `utm_*`/`ref` matches — `?href=x`, `&pref=y`, or a path segment
    * containing `ref=` must survive. The separator is restored via
    * backreference (`$1` in Java/Spark, `\1` in RE2/DuckDB).
    */
  val trackingParamPattern = "([?&])(utm_[a-zA-Z]+|ref)=[^&]*"

  val schemePattern = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  val hostPattern = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
  /** Path + query (fragment excluded) after scheme://host. */
  val restPattern = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"
  val registeredDomainPattern = "([^.]+\\.[^.]+)$"

  /** Seeded raw URL (Spark side). Twin: [[sqlSeededUrl]]. */
  def seededUrl(docId: Column): Column =
    concat(
      lit("HTTPS://WWW.Example"), (docId % 7).cast("string"),
      lit(".COM:443/Path/"), docId.cast("string"),
      when(docId % 3 === 0,
        concat(lit("/?utm_source=feed&id="), (docId % 13).cast("string"),
          lit("&utm_campaign=x#sec")))
        .when(docId % 3 === 1, lit("?ref=tw&q=a+b"))
        .otherwise(lit("/")))

  /** DuckDB twin of [[seededUrl]]. */
  def sqlSeededUrl: String =
    """'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) ||
      |  '.COM:443/Path/' || CAST(doc_id AS VARCHAR) ||
      |  CASE doc_id % 3
      |    WHEN 0 THEN '/?utm_source=feed&id=' || CAST(doc_id % 13 AS VARCHAR) || '&utm_campaign=x#sec'
      |    WHEN 1 THEN '?ref=tw&q=a+b'
      |    ELSE '/' END""".stripMargin

  /** Canonical host: lowercase, strip `www.` prefix and default port. */
  def canonHost(url: Column): Column = {
    val h = lower(regexp_extract(url, hostPattern, 1))
    regexp_replace(regexp_replace(h, "^www\\.", ""), ":(80|443)$", "")
  }

  def sqlCanonHost(urlExpr: String): String = {
    val h = s"lower(regexp_extract($urlExpr, '$hostPattern', 1))"
    s"regexp_replace(regexp_replace($h, '^www\\.', ''), ':(80|443)$$', '')"
  }

  /** Canonical path+query: tracking params out, separators cleaned,
    * trailing slash dropped (so `/Path/` and `/Path` unify).
    */
  def canonRest(url: Column): Column = {
    val r0 = regexp_extract(url, restPattern, 1)
    val r1 = regexp_replace(r0, trackingParamPattern, "$1")
    val r2 = regexp_replace(r1, "[?&]+$", "")
    val r3 = regexp_replace(r2, "\\?&+", "?")
    val r4 = regexp_replace(r3, "&&+", "&")
    regexp_replace(r4, "/+$", "")
  }

  def sqlCanonRest(urlExpr: String): String = {
    val r0 = s"regexp_extract($urlExpr, '$restPattern', 1)"
    val r1 = s"regexp_replace($r0, '$trackingParamPattern', '\\1', 'g')"
    val r2 = s"regexp_replace($r1, '[?&]+$$', '', 'g')"
    val r3 = s"regexp_replace($r2, '\\?&+', '?', 'g')"
    val r4 = s"regexp_replace($r3, '&&+', '&', 'g')"
    s"regexp_replace($r4, '/+$$', '', 'g')"
  }

  def canonicalUrl(url: Column): Column =
    concat(lower(regexp_extract(url, schemePattern, 1)), lit("://"),
      canonHost(url), canonRest(url))

  def sqlCanonicalUrl(urlExpr: String): String =
    s"lower(regexp_extract($urlExpr, '$schemePattern', 1)) || '://' || " +
      s"${sqlCanonHost(urlExpr)} || ${sqlCanonRest(urlExpr)}"

  /** Registry query: per-doc raw → canonical URL, host, registered
    * domain, plus the 60-bit canonical-url fingerprint (the cross-
    * snapshot dedup key).
    */
  def urlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val raw = seededUrl($"doc_id")
    documents(spark, dir).select(
      $"doc_id",
      raw.as("url_raw"),
      canonicalUrl(raw).as("url_canon"),
      canonHost(raw).as("domain"),
      regexp_extract(canonHost(raw), registeredDomainPattern, 1)
        .as("registered_domain"),
      Hashing.md5Prefix60(canonicalUrl(raw)).as("url_fp60"))
  }

  /** DuckDB twin of [[urlCanonicalize]]. */
  def sqlUrlCanonicalize: String = {
    val raw = s"(${sqlSeededUrl})"
    s"""WITH seeded AS (SELECT doc_id, $raw AS url_raw FROM documents)
       |SELECT doc_id, url_raw,
       |  ${sqlCanonicalUrl("url_raw")} AS url_canon,
       |  ${sqlCanonHost("url_raw")} AS domain,
       |  regexp_extract(${sqlCanonHost("url_raw")}, '$registeredDomainPattern', 1) AS registered_domain,
       |  ${Hashing.sqlMd5Prefix60(sqlCanonicalUrl("url_raw"))} AS url_fp60
       |FROM seeded ORDER BY doc_id""".stripMargin
  }
}
