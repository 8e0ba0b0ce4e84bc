package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * The LLM-pipeline operators (MinHash, SimHash, LSH) need a hash that
  * both Spark and the DuckDB oracle can compute bit-identically. Spark's
  * `hash`/`xxhash64` have no DuckDB twin, so the portable primitive is a
  * 60-bit integer from the md5 hex prefix: md5 is identical everywhere,
  * 60 bits fits BIGINT safely, and all downstream mixing is plain modular
  * arithmetic kept below 2^63.
  *
  * For production throughput where oracle parity is not needed,
  * [[fastHash64]] (xxhash64, codegen'd, no hex round-trip) is the drop-in
  * replacement — same pipeline shapes, cheaper hash.
  */
object Hashing {
  /** Mersenne prime 2^31-1: hash mixing stays below 2^62 pre-mod. */
  val P31: Long = 2147483647L

  /** 60-bit hash of a string column: first 15 hex chars of md5.
    * DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT
    */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Canonical text normalization for fingerprinting/dedup (lowercase,
    * trim, collapse whitespace) — the ONE definition all dedup sites
    * (batch exact, streaming ingest, fingerprint query) and the
    * generated oracle SQL ([[sqlNormText]]) share.
    */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** DuckDB twin of [[normText]]. */
  def sqlNormText(expr: String): String =
    s"regexp_replace(trim(lower($expr)), '\\s+', ' ', 'g')"

  /** Same reduced into the 31-bit ring for overflow-safe mixing. */
  def md5Hash31(c: Column): Column = md5Prefix60(c) % P31

  /** Production-grade non-portable hash (no oracle twin). */
  def fastHash64(c: Column): Column = xxhash64(c)

  /** Deterministic LCG-derived constant stream, shared with SQL gen. */
  def lcg(i: Long): Long = (1103515245L * (i + 1) + 12345L) % P31

  /** MinHash permutation coefficients: h_j(x) = (a_j * x + b_j) mod P31,
    * a_j odd and nonzero.
    */
  def minhashA(j: Int): Long = { val v = lcg(2L * j); (v | 1L) % P31 }
  def minhashB(j: Int): Long = lcg(2L * j + 1)

  /** Count-Min row-hash coefficients — a disjoint slice of the LCG
    * stream from the MinHash pairs (offset 1000), `a` forced odd+nonzero.
    */
  def cmA(r: Int): Long = { val v = lcg(1000L + 2 * r); (v | 1L) % P31 }
  def cmB(r: Int): Long = lcg(1001L + 2 * r)

  /** Random-hyperplane weight for LSH plane `p`, component `i`:
    * integer in [-1e6, 1e6], zero-mean-ish, deterministic.
    */
  def planeWeight(p: Int, i: Int): Long =
    (1103515245L * (p * 64L + i + 1) + 12345L) % 2000001L - 1000000L

  // ---- SQL fragment generators (keep oracle constants in lockstep) ----

  /** DuckDB expression computing [[md5Prefix60]] of `expr`. */
  def sqlMd5Prefix60(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  def sqlMd5Hash31(expr: String): String =
    s"(${sqlMd5Prefix60(expr)} % $P31)"

  /** DuckDB list literal of the `n` MinHash `a` coefficients. */
  def sqlMinhashAList(n: Int): String =
    (0 until n).map(minhashA).mkString("[", ", ", "]")
  def sqlMinhashBList(n: Int): String =
    (0 until n).map(minhashB).mkString("[", ", ", "]")

  /** DuckDB list-of-lists literal of hyperplane weights [planes][dim]. */
  def sqlPlaneList(planes: Int, dim: Int): String =
    (0 until planes).map(p =>
      (0 until dim).map(i => planeWeight(p, i)).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
}
