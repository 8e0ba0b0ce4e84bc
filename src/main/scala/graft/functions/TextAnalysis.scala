package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft._
import graft.Tables._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All are per-row narrow transforms (no shuffle except where a groupBy
  * is the point), so they scale embarrassingly: at 100 TB each executor
  * streams its parquet splits through codegen'd expressions. Ratios are
  * computed as BIGINT/BIGINT double divisions — identical inputs give
  * bit-identical doubles in any engine, keeping the oracle exact.
  */
object TextAnalysis {

  /** Canonical tokenizer: lowercase, split on non-alphanumerics —
    * the codegen'd [[org.apache.spark.sql.graftexpr.TokenKernel]] one-pass
    * form of `filter(split(lower(c), "[^a-z0-9]+"), x -> length(x) > 0)`
    * (the HOF filter was CodegenFallback and broke whole-stage codegen
    * at every call site of the text family; TokenExprSpec pins the
    * equivalence against the original chain).
    */
  def tokens(c: Column): Column = graft.plans.ArrayOps.tokenize(c)

  /** BPE-ish piece pattern: letter runs, digit runs, single punct. */
  val piecePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Token counting: whitespace tokens + BPE-ish piece count + chars. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select($"doc_id",
        size(tokens($"text")).cast("bigint").as("n_tokens"),
        size(expr(s"regexp_extract_all(lower(text), '$piecePattern', 0)"))
          .cast("bigint").as("n_pieces"),
        length($"text").cast("bigint").as("n_chars"))

  /** Per-source tokenizer fertility: the doc/char/token/piece budget of
    * each source plus the two ratios a mix decision actually reads —
    * pieces per whitespace token (how much the BPE-ish tokenizer
    * fragments this source) and chars per piece (bytes bought per
    * sequence position). Exact BIGINT sums; ratios are one double
    * division at the edge (cross-engine bit-identical, the repo's
    * standard stance).
    *
    * Scale shape: one narrow per-row projection, one hash aggregate on
    * the bounded source key — nothing else.
    */
  def sourceFertility(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select($"source",
        size(tokens($"text")).cast("bigint").as("t"),
        size(expr(s"regexp_extract_all(lower(text), '$piecePattern', 0)"))
          .cast("bigint").as("p"),
        length($"text").cast("bigint").as("c"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"t").as("n_tokens"),
        sum($"p").as("n_pieces"), sum($"c").as("n_chars"))
      .withColumn("pieces_per_token",
        $"n_pieces".cast("double") / $"n_tokens".cast("double"))
      .withColumn("chars_per_piece",
        $"n_chars".cast("double") / $"n_pieces".cast("double"))

  /** English-ish stopwords drawn from the corpus vocabulary. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality scoring: token stats + stopword/alpha ratios + a composite
    * score, all exact-integer-derived doubles.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    // token count + stopword count ride the one-pass token_profile
    // kernel (the stopword filter HOF was an interpreted island)
    val tp = graft.plans.ArrayOps.tokenProfile(tokens($"text"), stopwords)
    val nTok = tp.getField("n_tokens")
    val nStop = tp.getField("n_stop")
    val nAlpha = length(regexp_replace(lower($"text"), "[^a-z]", "")).cast("bigint")
    val nChars = length($"text").cast("bigint")
    documents(spark, dir)
      .select($"doc_id", nTok.as("n_tokens"),
        (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
        (nAlpha.cast("double") / nChars.cast("double")).as("alpha_ratio"),
        (nChars.cast("double") / nTok.cast("double")).as("chars_per_token"))
      .withColumn("quality",
        when($"n_tokens" >= 10 && $"stopword_ratio" > 0.0 && $"alpha_ratio" > 0.5,
          lit(1L)).otherwise(lit(0L)))
  }

  // ---- Gopher-style rule filter ----------------------------------------

  /** Word-count bounds for [[gopherRules]] (Gopher used 50..100k; the
    * floor is scaled to this corpus's ~30-word docs so both rule
    * outcomes stay live).
    */
  val GopherMinWords = 10L
  val GopherMaxWords = 100000L

  /** Mean-word-length bounds (chars), compared cross-multiplied so the
    * boundary is exact integer arithmetic.
    */
  val GopherMinMeanLen = 3L
  val GopherMaxMeanLen = 10L

  /** Max share of the most frequent token, as the multiplier M in
    * `max_tf · M ≤ n_words` (5 ⇒ 20% — the token-level analogue of
    * Gopher's top-n-gram-fraction caps).
    */
  val GopherRepMultiplier = 5L

  /** Minimum stopword OCCURRENCES (Gopher: ≥ 2 of a fixed list). */
  val GopherMinStopwords = 2L

  /** `text_gopher_rules`: the rule-based document filter of the
    * Gopher/C4 lineage — per-doc boolean rules over exact integer
    * counts (word-count bounds, mean word length, single-token
    * repetition cap, stopword presence) and the conjunction `keep`.
    * Every boundary is cross-multiplied integer arithmetic, never a
    * float ratio, so the keep set is engine-exact.
    *
    * Scale shape: one narrow projection over the corpus — the token
    * statistics are per-row HOFs (no explode, no shuffle at all), which
    * is what lets the filter run inline ahead of every other pipeline
    * stage at 100 TB.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    // one codegen'd pass (TokenKernel.tokenProfile) for all four token
    // statistics — the previous max_tf expression alone
    // (array_max ∘ transform ∘ array_distinct ∘ filter) was an
    // O(distinct × n) interpreted rescan per row
    documents(spark, dir)
      .withColumn("tp", graft.plans.ArrayOps.tokenProfile(tokens($"text"), stopwords))
      .select(
        $"doc_id",
        $"tp.n_tokens".as("n_words"),
        $"tp.sum_chars".as("sum_chars"),
        $"tp.max_tf".as("max_tf"),
        $"tp.n_stop".as("n_stop"))
      .withColumn("r_word_count",
        $"n_words" >= GopherMinWords && $"n_words" <= GopherMaxWords)
      .withColumn("r_mean_len",
        $"sum_chars" >= lit(GopherMinMeanLen) * $"n_words" &&
          $"sum_chars" <= lit(GopherMaxMeanLen) * $"n_words")
      .withColumn("r_repetition", $"max_tf" * GopherRepMultiplier <= $"n_words")
      .withColumn("r_stopwords", $"n_stop" >= GopherMinStopwords)
      .withColumn("keep",
        $"r_word_count" && $"r_mean_len" && $"r_repetition" && $"r_stopwords")
  }

  /** Language-marker lists for the n-gram-profile-style language ID
    * heuristic (scaled-down word-level profiles; a production system
    * would use character n-gram profiles — the pipeline shape is the
    * same: explode → join profile → argmax).
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "fast", "en" -> "slow",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "petit",
    "es" -> "el", "es" -> "los", "es" -> "y", "es" -> "rapido",
    "de" -> "der", "de" -> "und", "de" -> "das", "de" -> "schnell")

  /** Language ID: tokens ⋈ broadcast marker profile → per-(doc,lang) hit
    * counts → argmax with deterministic tiebreak (hit count desc, lang
    * asc); docs with no marker hits predict "und" (undetermined).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers = spark.createDataFrame(langMarkers).toDF("cand_lang", "marker")
    val d = documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
    val hits = d.join(broadcast(markers), $"tok" === $"marker")
      .groupBy($"doc_id", $"cand_lang").agg(count(lit(1)).as("hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"hits".desc, $"cand_lang")
    val best = hits.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"doc_id", $"cand_lang", $"hits")
    documents(spark, dir).select($"doc_id")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cand_lang", lit("und")).as("pred_lang"),
        coalesce($"hits", lit(0L)).as("marker_hits"))
  }

  /** Normalized content fingerprint: md5 of whitespace-collapsed
    * lowercase text (hex) plus its 60-bit numeric reduction — the exact
    * dedup key. A content-defined rolling-hash variant lives in
    * [[Dedup.shingles]] (shingle stream = rolling window fingerprints).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val norm = Hashing.normText($"text")
    documents(spark, dir)
      .select($"doc_id", md5(norm).as("fp_md5"),
        graft.plans.ArrayOps.md5Prefix60(norm).as("fp60"))
  }

  /** Vocabulary size for [[vocabBuild]]. The corpus has only 31 distinct
    * tokens, so V is set below that to keep the OOV (-1) path of
    * [[tokensToIds]] live; production would use 32k-128k.
    */
  val VocabSize = 20

  /** Pretraining-prep: build a frequency-ranked vocabulary — top-V
    * tokens with dense ids (rank by count desc, token asc). The id
    * assignment is a global sort of V rows, not of the corpus: token
    * counting is the only full-corpus pass and it partial-aggregates
    * map-side.
    */
  def vocabBuild(spark: SparkSession, dir: String): DataFrame = {
    val counts = documents(spark, dir)
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
    // top-k FIRST (TakeOrderedAndProject: per-partition heaps, k rows to
    // one task), THEN rank — an unpartitioned ranking window over the
    // full token-count table would sort the entire vocabulary in a
    // single partition at corpus scale. After the limit the global
    // window sees ≤ VocabSize rows, so its single partition is bounded
    // by the parameter, not the data.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"freq".desc, $"token")
    counts.orderBy($"freq".desc, $"token").limit(VocabSize)
      .withColumn("token_id", row_number().over(w).cast("bigint"))
      .select($"token_id", $"token", $"freq")
  }

  /** Pretraining-prep: tokenize the corpus to vocabulary ids — one row
    * per (doc, position), OOV → -1. The vocab broadcasts; the corpus
    * side never shuffles.
    */
  def tokensToIds(spark: SparkSession, dir: String): DataFrame = {
    val vocab = vocabBuild(spark, dir).select($"token", $"token_id")
    documents(spark, dir)
      .select($"doc_id", posexplode(tokens($"text")))
      .select($"doc_id", $"pos".cast("bigint").as("pos"), $"col".as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .select($"doc_id", $"pos",
        coalesce($"token_id", lit(-1L)).as("token_id"))
  }

  /** Repetition ratio per doc: the share of the document taken by its
    * most frequent token (ties toward the lexicographically first) —
    * the boilerplate/spam signal (high ratio = repeated filler). Exact
    * BIGINT/BIGINT double division.
    *
    * The top token is PER-ROW state: sort the doc's token array and take
    * the longest run in one `aggregate` pass, so the whole operator is a
    * narrow map over the scan — no explode, no shuffle, no window sort.
    * Scanning runs of the SORTED array with a strict `>` keeps the first
    * (= lexicographically smallest) token on freq ties, matching the
    * oracle's `ORDER BY freq DESC, token` row_number pick. Empty docs
    * yield no row (the exploded form never produced one).
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    // max_tf/top_token from the one-pass token_profile kernel: the max
    // frequency IS the longest run of the sorted array, and the kernel's
    // smallest-token tie-break matches the sorted fold's strict `>`
    // keeping the first (lexicographically smallest) run — the same
    // `ORDER BY freq DESC, token` pick the oracle makes. The previous
    // form sorted each doc's tokens and folded an interpreted
    // aggregate() lambda over them, O(n log n) + per-element dispatch.
    documents(spark, dir)
      .select($"doc_id",
        graft.plans.ArrayOps.tokenProfile(tokens($"text"), Nil).as("tp"))
      .filter($"tp.n_tokens" > 0L)
      .select($"doc_id", $"tp.top_token".as("top_token"),
        $"tp.max_tf".as("top_freq"), $"tp.n_tokens".as("n_tokens"),
        ($"tp.max_tf".cast("double") / $"tp.n_tokens".cast("double"))
          .as("repetition_ratio"))
  }

  /** Unigram commonness score per doc: sum of corpus-wide token
    * frequencies over the doc's tokens — an exact-integer proxy for
    * unigram log-likelihood (higher = more boilerplate-like), the
    * rare-document signal without floating-point logs.
    */
  def commonness(spark: SparkSession, dir: String): DataFrame = {
    val freqs = documents(spark, dir)
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
    documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .join(broadcast(freqs), Seq("token"))
      .groupBy($"doc_id")
      .agg(sum($"freq").as("commonness"), count(lit(1)).as("n_tokens"))
  }

  /** Bigram-LM fluency score per doc — the model-based quality signal
    * (CCNet-style: score text against a language model and bucket by the
    * result; here the LM is an add-one-smoothed bigram model trained on
    * the corpus itself). For each document bigram (w1,w2) the smoothed
    * conditional probability is (c(w1,w2)+1)/(ctx(w1)+V); the reported
    * `fluency` is the micro-average — sum of numerators over sum of
    * denominators — chosen over log-perplexity because it needs ONE
    * floating-point division at the very end: both integer sums are
    * exact, so the score is bit-identical across engines (log-based
    * perplexity would compound libm differences per token).
    *
    * Shape at scale: the LM table is bigram-TYPE-sized (grows with
    * vocabulary², far sublinear in corpus size, but NOT driver-bounded
    * at web scale) — so the corpus-sized bigram stream joins it with a
    * `shuffle_hash` hint rather than a broadcast, after the context
    * counts are folded in by a bigram-type-sized pre-join. The V scalar
    * is one broadcast row. Docs with <2 tokens have no bigrams and emit
    * no row.
    */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val toks = tokens($"text")
    // codegen'd bigram emitter (TokenKernel.tokenBigrams) — the
    // zip_with(slice, slice) tower it replaces ran interpreted and the
    // plan replays this subtree under each of the three bigram readers
    val bigrams = docs
      .select($"doc_id",
        explode(graft.plans.ArrayOps.tokenBigrams(toks)).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val c12 = bigrams.groupBy($"w1", $"w2").agg(count(lit(1)).as("bfreq"))
    val ctx = bigrams.groupBy($"w1").agg(count(lit(1)).as("cfreq"))
    val vocab = docs.select(explode(toks).as("t"))
      .agg(countDistinct($"t").as("v"))
    val lm = c12.join(ctx, "w1") // bigram-type-sized ⋈ vocab-sized
    bigrams.join(lm.hint("shuffle_hash"), Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum($"bfreq" + 1).as("sum_num"),
        sum($"cfreq" + $"v").as("sum_den"))
      .withColumn("fluency",
        $"sum_num".cast("double") / $"sum_den".cast("double"))
  }

  /** Shared DuckDB fragment: the canonical tokenizer. */
  // ---- tile-level (line/paragraph) dedup --------------------------------

  /** Tile length in words for [[tileDedup]] and
    * [[CorpusPipeline.boilerplateTiles]]. A "tile" is the segment unit of
    * line/paragraph-hash dedup (CCNet-style): real corpora segment on
    * newlines; this corpus is a single line per doc, so consecutive
    * TileLen-word windows stand in. 2 because the seeded 31-word
    * vocabulary only produces repeats at that width — production would
    * use newline segments or ~50-word windows.
    */
  val TileLen = 2

  /** The document cut into consecutive [[TileLen]]-word tiles, as an
    * array column — computed NARROWLY per row (no explode/shuffle; the
    * per-doc tile list stays inside one row until a caller chooses to
    * explode it) by the codegen'd
    * [[org.apache.spark.sql.graftexpr.TokenKernel.wordTiles]] kernel.
    * The previous `transform(sequence(...), i -> array_join(slice(...)))`
    * chain was three nested interpreted HOFs per row and the dominant
    * cost of the tile family; TokenExprSpec pins the equivalence.
    */
  def tileArray(text: Column): Column =
    graft.plans.ArrayOps.wordTiles(tokens(text), TileLen)

  /** Intra-document tile dedup (Lee et al. "Deduplicating Training Data
    * Makes LMs Better", within-doc pass): drop every tile whose exact
    * text already occurred earlier in the SAME document, keeping first
    * occurrences in position order. Entirely narrow — a per-row
    * higher-order filter (keep tile i iff its first occurrence index is
    * i), ZERO shuffles at any scale; the per-doc O(tiles²) membership
    * scan is bounded by document length, not corpus size.
    */
  def tileDedup(spark: SparkSession, dir: String): DataFrame =
    // ~0.5 ms/doc of interpreted HOF work (the O(tiles²) first-occurrence
    // scan) dwarfs a row's shuffle cost — the documented opt-in case for
    // Tables.spread (no-op once the scan is already wide)
    tileDedupOf(Tables.spread(documents(spark, dir)))

  /** [[tileDedup]] over an arbitrary (doc_id, text) frame. The
    * first-occurrence scan is the codegen'd
    * [[org.apache.spark.sql.graftexpr.TokenKernel.tileDedupStats]] —
    * one hashed pass per row, replacing the O(tiles²)
    * `filter(tl, (t, i) -> array_position(tl, t) == i + 1)` interpreted
    * rescan (and with it, the let-binding gymnastics that kept the HOF
    * chain from being re-evaluated per consumer: a single struct-typed
    * kernel call is cheap enough that projection collapse is harmless).
    */
  def tileDedupOf(docs: DataFrame): DataFrame = {
    val stats = graft.plans.ArrayOps.tileDedupStats(tileArray($"text"))
    docs.select($"doc_id", stats.as("s"))
      .select($"doc_id", $"s.n_tiles", $"s.n_kept", $"s.dedup_text")
  }

  /** DuckDB twin of [[tileArray]] (1-based list ops; inclusive slices). */
  def sqlTileArray(toksExpr: String): String =
    s"list_transform(range((len($toksExpr) + ${TileLen - 1}) // $TileLen), " +
      s"i -> array_to_string($toksExpr[i * $TileLen + 1 : i * $TileLen + $TileLen], ' '))"

  /** DuckDB twin of [[tileDedup]]: list_filter's lambda index and
    * list_position are both 1-based, so `first-occurrence = own index`
    * needs no +1 shift.
    */
  def sqlTileDedup: String =
    s"""WITH tl AS (SELECT doc_id, ${sqlTileArray(sqlTokens("text"))} AS tiles
       |  FROM documents)
       |SELECT doc_id, len(tiles) AS n_tiles,
       |  len(list_filter(tiles, (x, i) -> list_position(tiles, x) = i)) AS n_kept,
       |  array_to_string(list_filter(tiles, (x, i) -> list_position(tiles, x) = i), ' ') AS dedup_text
       |FROM tl ORDER BY doc_id""".stripMargin

  def sqlTokens(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'), x -> length(x) > 0)"

  // ---- PII redaction ----------------------------------------------------

  /** PII patterns, ordered: email first (its domain would otherwise be
    * chewed up by the IP pattern's digit runs), then phone, then IPv4.
    * Written in the common Java-regex/RE2 dialect — character classes,
    * bounded repetition, ASCII `\b` — so Spark (java.util.regex) and the
    * DuckDB oracle (RE2) match identically; no lookarounds or
    * backreferences (RE2 has none).
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]"),
    ("phone", """\b\d{3}[-.]\d{3}[-.]\d{4}\b""", "[PHONE]"),
    ("ip", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "[IP]"))

  /** Redact PII from a text column: each pattern's matches are counted,
    * then replaced (all occurrences) in [[PiiPatterns]] order. A NARROW
    * per-row transform — at 100 TB this is a pure map stage fused into
    * the scan, no shuffle.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-kind match counts for audit metrics (before redaction). */
  def piiCounts(text: Column): Seq[Column] =
    PiiPatterns.map { case (kind, pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long").as(s"n_$kind")
    }

  /** The corpus text carries no digits, so the redaction demo grafts
    * deterministic pseudo-PII derived from doc_id onto each document —
    * the oracle builds the identical string — then redacts and reports
    * per-kind counts plus the 60-bit fingerprint of the redacted text
    * (value-checking the full replacement output without shipping it).
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    // 6 java.util.regex passes + 6 extract-alls + an md5 per row is the
    // genuinely-heavy per-row profile Tables.spread exists for (isolated
    // A/B at sf0.1: 0.66–0.77 s single-task → 0.50–0.55 s spread; the
    // cheap single-pass kernels like text_langid go the OTHER way — see
    // the round-6 numbers in Tables.spread's scaladoc)
    val seeded = Tables.spread(documents(spark, dir)).select($"doc_id",
      concat($"text",
        lit(" contact user"), $"doc_id".cast("string"),
        lit("@example.com or 555-"),
        lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
        lit("-0199 from 10."), ($"doc_id" % 256).cast("string"),
        lit(".0.7")).as("text"))
    seeded.select(
      ($"doc_id" +: piiCounts($"text")) :+
        Hashing.md5Prefix60(redactPii($"text")).as("redacted_fp60"): _*)
  }

  /** Unicode canonicalization (NFC + control-strip + space-collapse) via
    * the codegen'd [[org.apache.spark.sql.graftexpr.NormalizeText]]
    * kernel — the cleaning step that makes visually-identical strings
    * byte-identical before the dedup/fingerprint family. The corpus rows
    * are ASCII-clean, so (as with [[piiRedact]]) the query seeds each row
    * with deterministic dirt — a decomposed e+U+0301, tab/bell/DEL
    * controls, double spaces, leading/trailing junk — and the oracle
    * applies the SAME seeding, making the per-row value comparison a
    * real NFC-parity check between engines.
    */
  def normalizeCorpus(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(
      lit("Café \t "),
      substring($"text", 1, 80),
      lit(" x"), $"doc_id".cast("string"),
      lit("  étude  "))
    documents(spark, dir).select($"doc_id",
      graft.plans.ArrayOps.normalizeText(dirty).as("text_norm"))
      .withColumn("n_chars_norm", length($"text_norm").cast("bigint"))
  }

  /** DuckDB twin of [[normalizeCorpus]]'s seeded dirty text. */
  def sqlNormalizeSeeded: String =
    "'Cafe' || chr(769) || ' ' || chr(9) || ' ' || substring(text, 1, 80) || " +
      "' ' || chr(7) || 'x' || CAST(doc_id AS VARCHAR) || '  e' || chr(769) || " +
      "'tude ' || chr(127) || ' '"

  /** DuckDB twin of the normalization kernel itself.
    *
    * The regex class starts at `\x01`, not `\x00`: a NUL cannot be
    * written into a DuckDB SQL string/regex literal, so the twin cannot
    * express it. The Scala kernel additionally maps U+0000 to space
    * (`raw < 0x20`) — a deliberate, documented divergence on an input
    * the parquet/DuckDB path can never carry; see
    * [[org.apache.spark.sql.graftexpr.NormalizeTextKernel]].
    */
  def sqlNormalizeText(expr: String): String =
    s"trim(regexp_replace(regexp_replace(nfc_normalize($expr), " +
      s"'[\\x01-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g'))"

  /** DuckDB twin of [[piiRedact]]'s seeded text. */
  def sqlPiiSeededText: String =
    """text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |  '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      |  '-0199 from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7'""".stripMargin

  /** DuckDB twin of [[redactPii]] over an expression. */
  def sqlRedactPii(expr: String): String =
    PiiPatterns.foldLeft(expr) { case (e, (_, pat, repl)) =>
      s"regexp_replace($e, '$pat', '$repl', 'g')"
    }

  /** Long-word length cutoff for [[readability]] (LIX definition). */
  val LixLongLen = 6

  /** `text_readability`: the LIX readability index per document —
    * words/sentences + 100·(long words/words), long = more than
    * [[LixLongLen]] characters. Chosen over Flesch because it needs no
    * syllable model: every term is an exact integer count (sentences
    * from a `[.!?]+` split with empty fragments dropped, words from
    * the canonical tokenizer), so the score is two divisions over
    * exact longs — deterministic cross-engine where syllable
    * heuristics are not. Zero-sentence or zero-word docs report null.
    * Pure narrow pass.
    */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    // all three counts fused into the lix_counts kernel (kernel wave 3:
    // the split+trim sentence filter and the long-word filter were the
    // registry's last interpreted per-document filters); IrExprSpec
    // pins kernel ≡ HOF chain clause by clause on the corpus + edges
    documents(spark, dir)
      .select($"doc_id",
        graft.plans.ArrayOps.lixCounts($"text", LixLongLen).as("c"))
      .select($"doc_id",
        $"c.n_sentences".as("n_sentences"),
        $"c.n_words".as("n_words"),
        $"c.n_long_words".as("n_long_words"))
      .withColumn("lix",
        when($"n_sentences" > 0L && $"n_words" > 0L,
          $"n_words".cast("double") / $"n_sentences".cast("double") +
            lit(100.0) * ($"n_long_words".cast("double") /
              $"n_words".cast("double"))))
  }

  /** Vocabulary sizes probed by [[vocabCoverage]]. */
  val CoverageKs: Seq[Int] = Seq(10, 20, 50, 100)

  /** `vocab_coverage`: corpus token coverage of the top-K vocabulary
    * for each K in [[CoverageKs]] — the OOV-rate-vs-vocab-size curve a
    * tokenizer design reads before fixing its vocab budget. Types rank
    * by (count DESC, token); coverage at K = cumulative token count
    * through rank K over the corpus total.
    *
    * Scale note: the rank/cumsum window runs over the VOCABULARY
    * (corpus-sublinear but unbounded at web scale — there the same
    * range-exchange rank as `pipeline_curriculum` substitutes); the
    * corpus-sized pass is only the initial token count.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = documents(spark, dir)
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
    val w = Window.orderBy($"n".desc, $"tok")
    val cum = counts
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .withColumn("cum", sum($"n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = counts.agg(sum($"n").as("n_total"),
      count(lit(1)).as("n_types"))
    cum.join(broadcast(total))
      .select($"rk", $"cum", $"n_total", $"n_types",
        explode(typedlit(CoverageKs.map(_.toLong))).as("k"))
      .filter($"rk" <= $"k")
      .groupBy($"k")
      .agg(max($"cum").as("covered_tokens"),
        max($"rk").as("vocab_used"),
        max($"n_total").as("n_total"))
      .select($"k", $"vocab_used", $"covered_tokens", $"n_total",
        ($"covered_tokens".cast("double") / $"n_total".cast("double"))
          .as("coverage"))
  }

  /** Context-window radius for [[cooccurrencePmi]]. */
  val CoocWindow = 2

  /** Pairs reported by [[cooccurrencePmi]]. */
  val CoocTopN = 100

  /** `text_cooccurrence_pmi`: the top co-occurring token pairs within a
    * ±[[CoocWindow]] context window, with the PMI ratio
    * p(a,b)/(p(a)·p(b)) — the co-occurrence statistic embedding
    * trainers (GloVe/PPMI-SVD) and collocation extractors consume (the
    * documents-side sibling of `basket_lift_pairs`, with positional
    * context instead of basket membership).
    *
    * Pair generation is NARROW: for each shift 1..[[CoocWindow]] the
    * token array zips with its own shifted self (tail zip-nulls
    * filtered before canonicalization — `least`/`greatest` IGNORE
    * nulls in Spark, so filtering after would fabricate (a,a) pairs),
    * so no positions table and no per-doc self-join ever exists.
    * Counts are exact; the ratio is one double expression with fixed
    * parenthesization over exact longs. Ranking is a top-[[CoocTopN]]
    * heap on (n_ab DESC, w1, w2).
    */
  def cooccurrencePmi(spark: SparkSession, dir: String): DataFrame = {
    val arr = documents(spark, dir)
      .select($"doc_id", tokens($"text").as("ts"))
    val pairs = arr.select(explode(expr(
      s"""flatten(transform(sequence(1, $CoocWindow), s ->
         |  filter(zip_with(ts, slice(ts, s + 1, size(ts)), (a, b) ->
         |    struct(a AS a, b AS b)), x -> x.b IS NOT NULL)))"""
        .stripMargin)).as("p"))
      .select(least($"p.a", $"p.b").as("w1"),
        greatest($"p.a", $"p.b").as("w2"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("n_ab"))
    val uni = arr.select(explode($"ts").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    // r16 (guide §1.2 "don't compute things you throw away"): the two
    // scalar totals are CLOSED FORMS of the token counts — t = Σ_docs
    // Σ_{s≤W} max(n_tok − s, 0) (every shifted zip emits exactly that
    // many pairs) and utot = Σ_docs n_tok — so they come from ONE
    // narrow size(ts) scan instead of re-planning the pair/unigram
    // aggregation subtrees (profiled sf1: the tot branch replayed the
    // whole 6.5 s pair pass; exchange reuse does not fire across the
    // differently-projected branches). Exact longs, values unchanged.
    val sz = size($"ts").cast("bigint")
    val totals = arr.agg(
      sum((1 to CoocWindow).map(s => greatest(sz - s, lit(0L))).reduce(_ + _))
        .as("t"),
      sum(sz).as("utot"))
    // the unigram table is VOCABULARY-sized — sublinear in corpus but
    // not driver-bounded at web scale, so it joins shuffle-side (the
    // [[lmScore]] stance), never as a broadcast; only the 1-row totals
    // broadcast
    pairs
      .join(uni.select($"w".as("w1"), $"c".as("ca")).hint("shuffle_hash"), "w1")
      .join(uni.select($"w".as("w2"), $"c".as("cb")).hint("shuffle_hash"), "w2")
      .join(broadcast(totals))
      .select($"w1", $"w2", $"n_ab",
        ((($"n_ab".cast("double") * $"utot".cast("double")) *
          $"utot".cast("double")) /
          (($"t".cast("double") * $"ca".cast("double")) *
            $"cb".cast("double"))).as("pmi_ratio"))
      .orderBy($"n_ab".desc, $"w1", $"w2")
      .limit(CoocTopN)
  }

  /** DuckDB twin of [[cooccurrencePmi]] (positions self-join — value-
    * equivalent to the engine's shifted-zip, which SQL lacks the HOF
    * null semantics to mirror directly).
    */
  def sqlCooccurrencePmi: String = {
    val toksE = sqlTokens("text")
    s"""WITH pos AS (SELECT doc_id, CAST(i AS BIGINT) AS p,
       |    ts[CAST(i AS BIGINT) + 1] AS w
       |  FROM (SELECT doc_id, $toksE AS ts FROM documents) a,
       |    unnest(range(len(a.ts))) AS t(i)),
       |pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
       |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
       |    AND b.p - a.p BETWEEN 1 AND $CoocWindow),
       |pairs AS (SELECT w1, w2, count(*) AS n_ab FROM pr GROUP BY 1, 2),
       |uni AS (SELECT w, count(*) AS c FROM pos GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS t FROM pairs),
       |u AS (SELECT count(*) AS utot FROM pos)
       |SELECT w1, w2, n_ab,
       |  ((CAST(n_ab AS DOUBLE) * CAST(utot AS DOUBLE)) * CAST(utot AS DOUBLE)) /
       |    ((CAST(t AS DOUBLE) * CAST(ca.c AS DOUBLE)) * CAST(cb.c AS DOUBLE))
       |    AS pmi_ratio
       |FROM pairs JOIN uni ca ON pairs.w1 = ca.w
       |JOIN uni cb ON pairs.w2 = cb.w, tot, u
       |ORDER BY n_ab DESC, w1, w2 LIMIT $CoocTopN""".stripMargin
  }

  /** `corpus_source_overlap`: pairwise vocabulary Jaccard between
    * sources — the exact cross-domain contamination/diversity matrix a
    * mixing plan reads next to [[graft.functions.Sampling]]'s quotas
    * (the sketched sibling is `kmv_segment_overlap`; this is the exact
    * form over the bounded source domain).
    *
    * Scale shape: the corpus pass reduces to distinct (source, token)
    * rows (partial agg on a token-keyed shuffle); pair counting then
    * groups BY TOKEN, folds each token's source set (≤ |sources|) and
    * explodes its bounded pairs — no vocab×vocab self-join, and the
    * per-token fan-out is |sources-sharing-token|², capped by the
    * domain squared, not by corpus size. Per-source vocabulary sizes
    * join back as a broadcast. A thousand-source catalog would cap or
    * bucket the per-token set; at the reference's domain size the
    * exact fold is the right tool.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val st = documents(spark, dir)
      .select($"source", explode(tokens($"text")).as("tok"))
      .distinct()
    val sizes = st.groupBy($"source").agg(count(lit(1)).as("n"))
    val pairs = st.groupBy($"tok")
      .agg(sort_array(collect_set($"source")).as("srcs"))
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
          |  transform(slice(srcs, i + 2, size(srcs) - i - 1),
          |    b -> struct(a AS src_a, b AS src_b))))""".stripMargin)).as("p"))
      .groupBy($"p.src_a".as("src_a"), $"p.src_b".as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sizes.select($"source".as("src_a"), $"n".as("n_a"))), "src_a")
      .join(broadcast(sizes.select($"source".as("src_b"), $"n".as("n_b"))), "src_b")
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"n_common",
        ($"n_common".cast("double") /
          ($"n_a" + $"n_b" - $"n_common").cast("double")).as("jaccard"))
  }

  /** `eval_langid_confusion`: confusion matrix of [[langId]] against
    * the documents table's ground-truth `lang` column — exact cell
    * counts plus each cell's recall contribution (share of its true-
    * lang row). The language-ID twin of the k-NN classifier's
    * confusion report: the drift alarm when a crawl's language mix
    * shifts under a fixed marker profile.
    *
    * One pass over the prediction table (itself one corpus pass) onto
    * the lang×lang-bounded grid; row totals re-aggregate the CELLS.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir)
      .join(documents(spark, dir).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang".as("true_lang"), $"pred_lang")
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy($"true_lang").agg(sum($"n").as("row_n"))
    cells.join(rows.hint("broadcast"), "true_lang")
      .select($"true_lang", $"pred_lang", $"n",
        ($"n".cast("double") / $"row_n".cast("double")).as("recall_share"),
        ($"true_lang" === $"pred_lang").as("correct"))
  }
}
