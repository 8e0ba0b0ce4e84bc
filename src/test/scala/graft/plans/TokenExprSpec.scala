package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Equivalence contract for the codegen'd tokenize/tile kernels
  * ([[org.apache.spark.sql.graftexpr.TokenKernel]]): on every input —
  * including the edge shapes the kernels special-case — they must
  * produce exactly what the original Catalyst HOF chains produced,
  * because the whole DuckDB oracle surface of the text family was
  * gated against those chains.
  */
class TokenExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private val TileLen = graft.functions.TextAnalysis.TileLen

  /** The original tokenizer: split on non-alnum, drop empties. */
  private def hofTokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z0-9]+"), x => length(x) > 0)

  /** The original tile cutter: sequence + slice + array_join. */
  private def hofTiles(c: org.apache.spark.sql.Column) = {
    val toks = hofTokens(c)
    val nTiles = ((size(toks) + TileLen - 1) / TileLen).cast("int")
    when(size(toks) === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), nTiles - 1),
        i => array_join(slice(toks, i * TileLen + 1, lit(TileLen)), " ")))
  }

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "", "   ", "...!!!", "a", "ab", "a b", "a b c", "a b c d",
    "  leading and trailing  ", "UPPER Case MiXeD 123 abc999x",
    "tabs\tand\nnewlines\r\nhere", "num3r1c t0kens 42 007",
    "dup dup dup dup", "x y x y x y", "one two one two three four",
    "café Étude naïve", // accented letters are separators
    "İstanbul İstanbul", // dotted capital I lowers into ascii i + combining mark
    "punct-uation, splits;everything:else (really) [yes] {ok}",
    "a1b2c3 000 zzz 9", "emoji 😀 between tokens",
    "single-tile", "exactly four words here now")

  private def df = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cases.zipWithIndex.map { case (t, i) => org.apache.spark.sql.Row(i.toLong, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
  }

  test("tokenize kernel == split+filter HOF chain on all edge shapes") {
    val bad = df.select($"id",
        ArrayOps.tokenize($"text").as("k"), hofTokens($"text").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("wordTiles kernel == sequence+slice+array_join HOF chain") {
    val bad = df.select($"id",
        graft.functions.TextAnalysis.tileArray($"text").as("k"),
        hofTiles($"text").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("tileDedupStats kernel == first-occurrence filter HOF chain") {
    val tl = hofTiles($"text")
    val kept = filter(tl, (t, i) => array_position(tl, t) === i + 1)
    val bad = df.select($"id",
        ArrayOps.tileDedupStats(graft.functions.TextAnalysis.tileArray($"text")).as("k"),
        struct(size(tl).cast("bigint").as("n_tiles"),
          size(kept).cast("bigint").as("n_kept"),
          array_join(kept, " ").as("dedup_text")).as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("tokenProfile kernel == the three original per-row passes") {
    val stop = graft.functions.TextAnalysis.stopwords
    val stopArr = array(stop.map(lit): _*)
    val toks = hofTokens($"text")
    // gopher's originals: aggregate-length, distinct-rescan max_tf, filter-count
    val hof = struct(
      size(toks).cast("bigint").as("n_tokens"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_chars"),
      coalesce(array_max(transform(array_distinct(toks),
        t => size(filter(toks, x => x === t)))), lit(0)).cast("bigint").as("max_tf"),
      size(filter(toks, t => array_contains(stopArr, t))).cast("bigint").as("n_stop"))
    val k = ArrayOps.tokenProfile(ArrayOps.tokenize($"text"), stop)
    val bad = df.select($"id", k.as("k"), hof.as("h"))
      .filter(not(struct($"k.n_tokens", $"k.sum_chars", $"k.max_tf", $"k.n_stop") <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("tokenProfile top_token == sorted-fold longest-run pick") {
    // repetition's original: fold the SORTED tokens, strict > keeps the
    // first (lexicographically smallest) max-frequency token
    val zero = struct(
      lit("").as("prev"), lit(0L).as("run"),
      lit("").as("best_tok"), lit(0L).as("best_run"))
    val top = aggregate(
      array_sort(hofTokens($"text")), zero,
      (st, t) => {
        val run = when(t === st("prev"), st("run") + 1L).otherwise(lit(1L))
        val better = run > st("best_run")
        struct(
          t.as("prev"), run.as("run"),
          when(better, t).otherwise(st("best_tok")).as("best_tok"),
          when(better, run).otherwise(st("best_run")).as("best_run"))
      })
    val k = ArrayOps.tokenProfile(ArrayOps.tokenize($"text"), Nil)
    val bad = df
      .select($"id", k.getField("top_token").as("kt"), k.getField("max_tf").as("kf"),
        top.getField("best_tok").as("ht"), top.getField("best_run").as("hf"),
        k.getField("n_tokens").as("n"))
      .filter($"n" > 0L)
      .filter(not($"kt" <=> $"ht") || not($"kf" <=> $"hf"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("kernels agree with the HOF chains on the real corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val bad = docs.select(
        ArrayOps.tokenize($"text").as("kt"), hofTokens($"text").as("ht"),
        graft.functions.TextAnalysis.tileArray($"text").as("kl"),
        hofTiles($"text").as("hl"))
      .filter(not($"kt" <=> $"ht") || not($"kl" <=> $"hl"))
    assert(bad.count() === 0)
  }

  test("tokenBigrams kernel == zip_with(slice, slice) chain incl. empty/1-token") {
    def hofBigrams(c: org.apache.spark.sql.Column) = {
      val toks = hofTokens(c)
      val n1 = greatest(size(toks) - 1, lit(0))
      zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    }
    val bad = df.select($"id",
        ArrayOps.tokenBigrams(ArrayOps.tokenize($"text")).as("k"),
        hofBigrams($"text").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val badC = corpus.select(
        ArrayOps.tokenBigrams(ArrayOps.tokenize($"text")).as("k"),
        hofBigrams($"text").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(badC.count() === 0)
  }

  test("tokenBigrams drops pairs touching a null token (containsNull=false output holds)") {
    // unreachable via tokenize (non-null output); pinned because
    // token_bigrams is a registered SQL function admitting
    // array<string> with null elements — emitting null w1/w2 into the
    // declared containsNull=false schema would be undefined downstream
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Seq("a", null, "b", "c"), // (a,null) and (null,b) dropped; (b,c) kept
      Seq[String](null, null),  // nothing survives
      Seq("x", "y")).map(a => org.apache.spark.sql.Row(a))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("toks",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true))))
    val nd = spark.createDataFrame(rows.asJava, schema)
    val got = nd.select(ArrayOps.tokenBigrams($"toks").as("bg"))
      .select(expr("transform(bg, p -> concat(p.w1, '_', p.w2))").as("s"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("b_c"), Nil, List("x_y")))
    // same via the registered SQL function
    val sql = spark.sql(
      "SELECT token_bigrams(array('a', CAST(NULL AS STRING), 'b'))")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(sql.isEmpty)
  }

  test("rakePhrases kernel == aggregate fold incl. stopword/null/empty edges") {
    val stopwords = graft.functions.TextAnalysis.stopwords
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    // the exact fold rakeKeyphrases shipped before kernel wave 3
    def hofPhrases(toks: org.apache.spark.sql.Column) = {
      val folded = expr(
        s"""aggregate(
          |  toks,
          |  named_struct('ph', CAST(array() AS ARRAY<STRING>),
          |    'cur', CAST(array() AS ARRAY<STRING>)),
          |  (acc, t) -> CASE WHEN t IN ($stopList)
          |    THEN named_struct(
          |      'ph', CASE WHEN size(acc.cur) > 0
          |        THEN concat(acc.ph, array(concat_ws(' ', acc.cur)))
          |        ELSE acc.ph END,
          |      'cur', CAST(array() AS ARRAY<STRING>))
          |    ELSE named_struct('ph', acc.ph,
          |      'cur', concat(acc.cur, array(t))) END,
          |  acc -> CASE WHEN size(acc.cur) > 0
          |    THEN concat(acc.ph, array(concat_ws(' ', acc.cur)))
          |    ELSE acc.ph END)""".stripMargin)
      folded // caller must alias a column named `toks`
    }
    // edge-shape battery: stopword-delimited runs, leading/trailing
    // stopwords, all-stopwords, no stopwords, empty text
    val bad = df.select(ArrayOps.tokenize($"text").as("toks"))
      .select(
        ArrayOps.rakePhrases($"toks", stopwords).as("k"),
        hofPhrases($"toks").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
    // the real corpus (the consumer's exact input distribution)
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(ArrayOps.tokenize($"text").as("toks"))
    val badC = corpus.select(
        ArrayOps.rakePhrases($"toks", stopwords).as("k"),
        hofPhrases($"toks").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(badC.count() === 0)
    // null tokens: extend the run but contribute no text; an all-null
    // run emits the EMPTY phrase — exactly the fold's concat_ws path
    import scala.jdk.CollectionConverters._
    val stop0 = stopwords.head
    val rows = Seq(
      Seq("aa", null, "bb", stop0, "cc"), // "aa bb" then "cc"
      Seq[String](null, null),          // one empty phrase
      Seq(stop0, null, stop0),          // "" (null run between stops)
      Seq[String]()).map(a => org.apache.spark.sql.Row(a))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("toks",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true))))
    val nd = spark.createDataFrame(rows.asJava, schema)
    val badN = nd.select(
        ArrayOps.rakePhrases($"toks", stopwords).as("k"),
        hofPhrases($"toks").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(badN.count() === 0, badN.collect().mkString("; "))
    val got = nd.select(ArrayOps.rakePhrases($"toks", stopwords).as("k"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("aa bb", "cc"), List(""), List(""), Nil))
  }

  test("tileDedupStats drops null elements exactly like the HOF filter") {
    // array_position(tl, null) is NULL -> the HOF predicate is null and
    // the element is dropped from kept, while size(tl) still counts it
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Seq("a", null, "a", "b", null),
      Seq[String](null, null),
      Seq("x")).map(a => org.apache.spark.sql.Row(a))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tl",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true))))
    val nd = spark.createDataFrame(rows.asJava, schema)
    val kept = filter($"tl", (t, i) => array_position($"tl", t) === i + 1)
    val bad = nd.select(
        ArrayOps.tileDedupStats($"tl").as("k"),
        struct(size($"tl").cast("bigint").as("n_tiles"),
          size(kept).cast("bigint").as("n_kept"),
          array_join(kept, " ").as("dedup_text")).as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  /** The HOF tower structSortProject replaces, parameterized on the
    * struct's field names (the kernel is positional).
    */
  private def hofSortProject(c: org.apache.spark.sql.Column, v: String) =
    transform(array_sort(c), x => x.getField(v))

  test("structSortProject == transform(array_sort(...)) joined, long ranks") {
    // the dedup-rewrite rebuild shape: bigint pos + token, CASE-null
    // structs dropped by collect_list upstream; here nulls are kept in
    // the array to pin the join-level equivalence (array_join skips the
    // nulls the HOF sorts to the end; the kernel never emits them)
    import scala.jdk.CollectionConverters._
    val structT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tok", org.apache.spark.sql.types.StringType)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(structT, containsNull = true))))
    def r(pos: java.lang.Long, tok: String) = org.apache.spark.sql.Row(pos, tok)
    val rows = Seq(
      Seq(r(3L, "c"), r(1L, "a"), r(2L, "b")),
      Seq(r(2L, "z"), null, r(1L, "y"), null),
      Seq(r(5L, null), r(4L, "keep")), // null value: join skips it either way
      Seq(r(1L, "dup"), r(1L, "dup"), r(1L, "aaa")), // rank ties -> value order
      Seq(r(null, "nullrank"), r(0L, "zero")), // null rank sorts first
      Seq[org.apache.spark.sql.Row](),
      Seq(r(-9L, "neg"), r(9L, "pos"))).map(a => org.apache.spark.sql.Row(a))
    val nd = spark.createDataFrame(rows.asJava, schema)
    val bad = nd.select(
        array_join(ArrayOps.structSortProject($"a"), " ").as("k"),
        array_join(hofSortProject($"a", "tok"), " ").as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("structSortProject == HOF tower on int ranks (funnel path shape)") {
    import scala.jdk.CollectionConverters._
    val structT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rn", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("et", org.apache.spark.sql.types.StringType)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(structT, containsNull = false))))
    def r(rn: Int, et: String) = org.apache.spark.sql.Row(rn, et)
    val rows = Seq(
      Seq(r(2, "view"), r(1, "click"), r(3, "pay")),
      Seq(r(1, "solo")),
      Seq[org.apache.spark.sql.Row]()).map(a => org.apache.spark.sql.Row(a))
    val nd = spark.createDataFrame(rows.asJava, schema)
    val bad = nd.select(
        concat_ws(">", ArrayOps.structSortProject($"a")).as("k"),
        concat_ws(">", hofSortProject($"a", "et")).as("h"))
      .filter(not($"k" <=> $"h"))
    assert(bad.count() === 0, bad.collect().mkString("; "))
  }

  test("structSortProject rebuild equals the removal pass on the real corpus") {
    // end-to-end: the dedup_substring_remove rebuild aggregate built
    // with the kernel vs the original HOF tower, same corpus
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select($"doc_id",
        posexplode(graft.functions.TextAnalysis.tokens($"text")))
      .select($"doc_id", $"pos".cast("bigint").as("pos"), $"col".as("tok"))
    val k = toks.groupBy($"doc_id")
      .agg(array_join(ArrayOps.structSortProject(
        expr("collect_list(struct(pos, tok))")), " ").as("t"))
    val h = toks.groupBy($"doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), " +
        "x -> x.tok), ' ')").as("t"))
    val bad = k.as("k").join(h.as("h"), "doc_id")
      .filter(not(col("k.t") <=> col("h.t")))
    assert(bad.count() === 0)
  }
}
