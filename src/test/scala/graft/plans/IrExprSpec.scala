package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Equivalence contracts for the wave-3 IR/readability kernels
  * ([[org.apache.spark.sql.graftexpr.IrKernel]],
  * [[org.apache.spark.sql.graftexpr.TokenKernel.lixCounts]]) against
  * the HOF towers they replaced — `ir_phrase_search`,
  * `ir_proximity_search` and `text_readability` were oracle-gated
  * against those towers, so the kernels must match them cell by cell,
  * including the null-padding / not-found / empty-input edges.
  */
class IrExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private val corpus = "/root/testdata/sf0.01"

  private def hofTokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z0-9]+"), x => length(x) > 0)

  // edge battery: adjacency at start/end, repeated phrase, overlapping
  // occurrences, single-token, empty, only-delimiters, terms absent or
  // one-sided, tabs/newlines (trim strips spaces ONLY)
  private val cases = Seq(
    "table hash join", "hash table hash table hash", "table hash",
    "table", "hash", "", "   ", "...!!!", "table hash. table hash!",
    "no match here at all", "table alone and hash apart table, hash",
    "table hash table hash table hash", "x table hash", "table hash x",
    "Sentence one. sentence two! three? four", ". leading dot",
    "trailing dot.", "only spaces between.   .dots", "a.b.c.d",
    "tab\tseparated. and\nnewline only segment\n. done",
    "verylongwordhere and short ones. another verylongtoken!",
    "a1b2c3 000 zzz 9. UPPER Case MiXeD")

  private def df = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cases.zipWithIndex.map { case (t, i) => org.apache.spark.sql.Row(i.toLong, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
  }

  private val (w1, w2) = graft.functions.Relevance.Phrase
  private val win = graft.functions.Relevance.ProxWindow

  /** The original phrase mask: zip-against-tail + filter + position. */
  private def hofPhrase(toks: org.apache.spark.sql.Column) = {
    val m = zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => a === lit(w1) && b === lit(w2))
    struct(
      size(toks).cast("long").as("n_tokens"),
      size(filter(m, x => x)).cast("long").as("phrase_count"),
      array_position(m, true).cast("long").as("first_pos"))
  }

  /** The original proximity tower: positions + nested fold. */
  private def hofProx(toks: org.apache.spark.sql.Column) = {
    def positions(term: String) = filter(
      transform(toks, (x, i) => when(x === lit(term), i + 1).otherwise(lit(-1))),
      p => p >= 0)
    val pa = positions(w1)
    val pb = positions(w2)
    struct(
      size(pa).cast("long").as("n_a"),
      size(pb).cast("long").as("n_b"),
      array_min(transform(pa, i => array_min(transform(pb, j => abs(i - j)))))
        .cast("long").as("min_dist"),
      aggregate(transform(pa, i => size(filter(pb, j => abs(i - j) <= win))),
        lit(0L), (acc, x) => acc + x.cast("long")).as("near_pairs"))
  }

  /** The original LIX counts: regex splits + trim/length filters. */
  private def hofLix(text: org.apache.spark.sql.Column) = {
    val toks = hofTokens(text)
    val sents = filter(split(text, "[.!?]+"), s => length(trim(s)) > 0)
    struct(
      size(sents).cast("long").as("n_sentences"),
      size(toks).cast("long").as("n_words"),
      size(filter(toks, t => length(t) > graft.functions.TextAnalysis.LixLongLen))
        .cast("long").as("n_long_words"))
  }

  test("phraseHits kernel == zip-against-tail mask on edges and the corpus") {
    for (frame <- Seq(df, graft.Tables.documents(spark, corpus))) {
      val bad = frame.select(
          ArrayOps.phraseHits(ArrayOps.tokenize($"text"), w1, w2).as("k"),
          hofPhrase(ArrayOps.tokenize($"text")).as("h"))
        .filter(not($"k" <=> $"h"))
      assert(bad.count() === 0, bad.collect().take(5).mkString("; "))
    }
  }

  test("proxStats kernel == positions + nested fold on edges and the corpus") {
    for (frame <- Seq(df, graft.Tables.documents(spark, corpus))) {
      val bad = frame.select(
          ArrayOps.proxStats(ArrayOps.tokenize($"text"), w1, w2, win).as("k"),
          hofProx(ArrayOps.tokenize($"text")).as("h"))
        .filter(not($"k" <=> $"h"))
      assert(bad.count() === 0, bad.collect().take(5).mkString("; "))
    }
  }

  test("lixCounts kernel == split/trim + token filters on edges and the corpus") {
    for (frame <- Seq(df, graft.Tables.documents(spark, corpus))) {
      val bad = frame.select(
          ArrayOps.lixCounts($"text", graft.functions.TextAnalysis.LixLongLen).as("k"),
          hofLix($"text").as("h"))
        .filter(not($"k" <=> $"h"))
      assert(bad.count() === 0, bad.collect().take(5).mkString("; "))
    }
  }

  test("null tokens: skipped by phraseHits, match neither term in proxStats") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Seq(w1, null, w2),       // not adjacent -> no phrase hit
      Seq(w1, w2, null, w1, w2), // two hits; trailing null harmless
      Seq[String](null, null)).map(a => org.apache.spark.sql.Row(a))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("toks",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true))))
    val nd = spark.createDataFrame(rows.asJava, schema)
    val bad = nd.select(
        ArrayOps.phraseHits($"toks", w1, w2).as("kp"),
        hofPhrase($"toks").as("hp"),
        ArrayOps.proxStats($"toks", w1, w2, win).as("kx"),
        hofProx($"toks").as("hx"))
      .filter(not($"kp" <=> $"hp") || not($"kx" <=> $"hx"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
    val hits = nd.select(ArrayOps.phraseHits($"toks", w1, w2).as("k"))
      .collect().map(r => r.getStruct(0).getLong(1)).toList
    assert(hits === List(0L, 2L, 0L))
  }
}
