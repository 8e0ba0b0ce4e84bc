package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd tokenize / tile kernels for the text-analysis family.
  *
  * The corpus tokenizer used to be `split(lower(text), "[^a-z0-9]+")`
  * followed by `filter(t, x -> length(x) > 0)`. The filter is a
  * higher-order function — `ArrayFilter` is CodegenFallback, so every
  * call site broke whole-stage codegen and paid per-element lambda
  * dispatch on an interpreted path; the regex split additionally
  * allocated the empty leading/trailing fragments just to drop them.
  * Since `tokens()` sits under the entire text family (quality, langid,
  * token counts, shingle→minhash chain, tiles), that interpreted island
  * sat in the hottest per-row loop the corpus side has.
  *
  * [[TokenKernel.tokenize]] is the same function as ONE pass over the
  * lowercased string — emit each maximal [a-z0-9] run — with no regex,
  * no empty fragments, no lambda dispatch, inlined into whole-stage
  * codegen like the sibling kernels in [[TextHash]].
  *
  * [[TokenKernel.wordTiles]] replaces the tile cutter
  * (`transform(sequence(...), i -> array_join(slice(toks, ...), " "))`
  * — three nested HOFs, all interpreted) for
  * `TextAnalysis.tileArray`; [[TokenKernel.tileDedupStats]] replaces
  * the within-document first-occurrence scan
  * (`filter(tl, (t, i) -> array_position(tl, t) == i + 1)` — an
  * O(tiles²) interpreted membership scan per document) with one hashed
  * pass. Semantics are bit-identical in all three cases; the
  * `text_tile_dedup` / `pipeline_boilerplate_tiles` oracle rows and
  * TokenExprSpec's HOF-equivalence property pin them.
  *
  * Scale: all three are narrow per-row kernels — no shuffle, no state;
  * they ride inside the scan stage at any corpus size.
  */
object TokenKernel {
  private val Space = UTF8String.fromString(" ")

  private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Lowercase [a-z0-9] runs of `s`, in order. Exactly
    * `filter(split(lower(s), "[^a-z0-9]+"), x -> length(x) > 0)`:
    * the lowercasing is the same `UTF8String.toLowerCase` Spark's
    * `Lower` uses, and a maximal alnum run of the lowered string is
    * precisely a non-empty split fragment.
    */
  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val n = str.length
    val out = new java.util.ArrayList[Any](16)
    var i = 0
    while (i < n) {
      if (isTokenChar(str.charAt(i))) {
        val start = i
        i += 1
        while (i < n && isTokenChar(str.charAt(i))) i += 1
        out.add(UTF8String.fromString(str.substring(start, i)))
      } else {
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Consecutive `tileLen`-element groups of `arr`, each joined by one
    * space; the last tile may be shorter. Empty array in, empty out.
    */
  def wordTiles(arr: ArrayData, tileLen: Int): ArrayData = {
    val num = arr.numElements()
    if (num == 0) return new GenericArrayData(Array.empty[Any])
    val nTiles = (num + tileLen - 1) / tileLen
    val out = new Array[Any](nTiles)
    var t = 0
    while (t < nTiles) {
      val start = t * tileLen
      val len = math.min(tileLen, num - start)
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) {
        parts(j) = if (arr.isNullAt(start + j)) null else arr.getUTF8String(start + j)
        j += 1
      }
      out(t) = UTF8String.concatWs(Space, parts.toIndexedSeq: _*)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document token statistics in ONE hashed pass:
    * (n_tokens, sum_chars, max_tf, top_token, n_stop) where `max_tf` is
    * the highest token frequency, `top_token` the lexicographically
    * (binary UTF8) smallest token achieving it — the same pick as a
    * sorted-array longest-run scan with strict `>` — and `n_stop` the
    * number of tokens contained in `stop`. Replaces three separate
    * interpreted per-row passes, one of which
    * (`array_max(transform(array_distinct(toks), t ->
    * size(filter(toks, x -> x = t))))`) was O(distinct × n) per row.
    * Empty input: (0, 0, 0, "", 0).
    */
  def tokenProfile(arr: ArrayData, stop: java.util.HashSet[UTF8String]): InternalRow = {
    val num = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](math.max(16, num * 2))
    var sumChars = 0L
    var nStop = 0L
    var i = 0
    while (i < num) {
      val t = arr.getUTF8String(i)
      sumChars += t.numChars()
      if (stop.contains(t)) nStop += 1
      counts.merge(t, 1L, (a, b) => a + b)
      i += 1
    }
    var maxTf = 0L
    var topTok: UTF8String = UTF8String.EMPTY_UTF8
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > maxTf || (c == maxTf && maxTf > 0 && e.getKey.compareTo(topTok) < 0)) {
        maxTf = c
        topTok = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](num.toLong, sumChars, maxTf, topTok, nStop))
  }

  /** First-occurrence dedup of a tile array in ONE hashed pass:
    * (n_tiles, n_kept, kept tiles joined by ' ' in position order) —
    * the same output as keeping tile i iff `array_position(tl, t) ==
    * i + 1`, without the O(tiles²) rescan. Null elements replay the
    * HOF exactly: `array_position` yields NULL for a null needle, so
    * the filter predicate is null and the element is DROPPED from
    * `kept` — but `size(tl)` still counts it in `n_tiles`.
    * (Unreachable via [[wordTiles]], whose output is containsNull =
    * false; pinned because the expression accepts any array<string>.)
    */
  def tileDedupStats(arr: ArrayData): InternalRow = {
    val num = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, num * 2))
    val kept = new java.util.ArrayList[UTF8String](num)
    var i = 0
    while (i < num) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (seen.add(t)) kept.add(t)
      }
      i += 1
    }
    val txt = UTF8String.concatWs(
      Space, kept.toArray(new Array[UTF8String](kept.size())).toIndexedSeq: _*)
    new GenericInternalRow(Array[Any](num.toLong, kept.size().toLong, txt))
  }

  /** Consecutive (w1, w2) token pairs — the bigram emitter under the
    * bigram-LM fluency scorer, replacing
    * `zip_with(slice(toks, 1, n-1), slice(toks, 2, n-1), (a, b) ->
    * struct(a, b))` (interpreted, two slice allocations per row, and
    * the plan replays the tower once per consumer of the bigram
    * frame). Empty and 1-token arrays yield the empty array, exactly
    * like the zero-length slices.
    *
    * Null elements: a pair touching a null token is DROPPED — a null
    * token can't form a bigram, and emitting null fields would violate
    * the declared containsNull = false output (downstream codegen
    * reading an UnsafeRow field it believes non-null is undefined
    * behavior). Unreachable via [[tokenize]] (non-null output); pinned
    * because `token_bigrams` is a registered SQL function whose input
    * type admits array<string> with null elements (the
    * [[tileDedupStats]] null stance).
    */
  def tokenBigrams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - 1, 0)
    val out = new Array[Any](m)
    var k = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
        out(k) = new GenericInternalRow(
          Array[Any](arr.getUTF8String(i), arr.getUTF8String(i + 1)))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(if (k == m) out else out.take(k))
  }

  /** LIX readability counts of a raw text in two scans and zero
    * allocations: sentences, words, long words (> `longLen` chars).
    *
    * Replaces the last interpreted tower under `text_readability` —
    * `filter(split(text, "[.!?]+"), s -> length(trim(s)) > 0)` plus
    * `filter(tokens, t -> length(t) > longLen)` (two regex splits, two
    * lambda-dispatch filters, and the token array built just to count
    * it). Equivalence, clause by clause:
    *  - a split fragment survives `length(trim(s)) > 0` iff it
    *    contains a character other than ' ' (trim strips spaces ONLY —
    *    a tab/newline-only fragment counts); fragments are the maximal
    *    runs between `[.!?]` characters, and the empty leading/
    *    trailing fragments the regex split produces can never contain
    *    one — so sentences = maximal non-delimiter runs containing a
    *    non-space character;
    *  - words are [[tokenize]]'s maximal [a-z0-9] runs of the
    *    lowercased text; a token's char length IS its run length (the
    *    runs are ASCII), so long words count without materializing the
    *    token.
    */
  def lixCounts(s: UTF8String, longLen: Int): InternalRow = {
    val orig = s.toString
    var sentences = 0L
    var segHasContent = false
    var i = 0
    val n = orig.length
    while (i < n) {
      val c = orig.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        if (segHasContent) sentences += 1
        segHasContent = false
      } else if (c != ' ') segHasContent = true
      i += 1
    }
    if (segHasContent) sentences += 1
    val low = s.toLowerCase.toString
    val m = low.length
    var words = 0L
    var longWords = 0L
    var run = 0
    var j = 0
    while (j <= m) {
      if (j < m && isTokenChar(low.charAt(j))) run += 1
      else {
        if (run > 0) {
          words += 1
          if (run > longLen) longWords += 1
        }
        run = 0
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](sentences, words, longWords))
  }

  /** Maximal stopword-free token runs, each joined by ' ' — the RAKE
    * candidate-phrase assembler (Rose et al. 2010), replacing the
    * interpreted per-document `aggregate(toks, struct(ph, cur), ...)`
    * fold (a CASE + two array concats of LAMBDA DISPATCH per token,
    * per corpus row — the hottest per-GROUP tower left after kernel
    * wave 2, and it runs per ROW, not per group).
    *
    * Equivalence with the HOF fold, token by token:
    *  - a stopword CLOSES the current run: if anything was appended
    *    since the last close, `concat_ws(' ', cur)` is emitted;
    *  - any other token extends the run;
    *  - a NULL token extends the run but contributes no text
    *    (`t IN (stoplist)` is NULL ⇒ the CASE falls to the else
    *    branch and appends null; `size(acc.cur)` counts it;
    *    `concat_ws` skips it) — so a run of only nulls emits the
    *    EMPTY phrase, exactly like the fold. Unreachable via
    *    [[tokenize]]; pinned because the expression accepts any
    *    array<string>.
    *  - the finish lambda flushes a trailing open run.
    */
  def rakePhrases(arr: ArrayData, stop: java.util.HashSet[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](8)
    val cur = new java.util.ArrayList[UTF8String](8)
    var curLen = 0 // appended elements INCLUDING nulls (HOF size(acc.cur))
    def flush(): Unit = {
      if (curLen > 0) {
        out.add(UTF8String.concatWs(Space,
          cur.toArray(new Array[UTF8String](cur.size())).toIndexedSeq: _*))
        cur.clear()
        curLen = 0
      }
    }
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) curLen += 1
      else {
        val t = arr.getUTF8String(i)
        if (stop.contains(t)) flush()
        else { cur.add(t); curLen += 1 }
      }
      i += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  /** Sort an array<struct<rank, value>> by (rank, value) and project
    * the string values, in ONE pass over primitive arrays — the
    * codegen'd replacement for the rebuild/path-signature tower
    * `transform(array_sort(collect_list(struct(rank, v))), x -> x.v)`
    * (`ArraySort` + `ArrayTransform` are both CodegenFallback, so the
    * tower ran interpreted per GROUP in the hottest aggregates the
    * dedup-rewrite and funnel families have).
    *
    * Equivalence to the HOF chain, element-by-element: `array_sort`
    * orders structs lexicographically by field with NULL STRUCTS LAST
    * and null fields first; a projected `x.v` that is null is then
    * skipped by the downstream `array_join`/`concat_ws` — so the
    * kernel drops null structs AND null-value structs up front (they
    * can contribute nothing to the joined output) and sorts the rest
    * by (rank asc, value asc binary). Output therefore declares
    * containsNull = false. `intRank` selects the rank accessor
    * (IntegerType vs LongType first field).
    */
  def structSortProject(arr: ArrayData, intRank: Boolean): ArrayData = {
    val num = arr.numElements()
    val ranks = new Array[Long](num)
    val vals = new Array[UTF8String](num)
    var n = 0
    var i = 0
    while (i < num) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(1)) {
          ranks(n) = if (row.isNullAt(0)) Long.MinValue
            else if (intRank) row.getInt(0).toLong else row.getLong(0)
          vals(n) = row.getUTF8String(1)
          n += 1
        }
      }
      i += 1
    }
    // index sort: ranks are near-unique (row_number / token position),
    // so the value tie-break almost never evaluates
    val idx = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(ranks(a), ranks(b))
        if (c != 0) c else vals(a).compareTo(vals(b))
      }
    })
    val out = new Array[Any](n)
    var j = 0
    while (j < n) { out(j) = vals(idx(j)); j += 1 }
    new GenericArrayData(out)
  }

  /** Exact-substring span-removal rebuild, ONE pass per document (r17;
    * the Lee-et-al rewrite's final step). Inputs: the document's token
    * array and the SORTED ASCENDING start positions of its non-owner
    * duplicated k-grams (each start s marks tokens [s, s+k-1] for
    * removal; overlapping marks union — the same island merge the
    * gaps-and-islands window + sequence-explode + anti-join pipeline
    * computed, because consecutive starts ≤ k-1 apart cover exactly
    * the merged span). Output struct:
    * (n_tokens, n_removed, clean_text = kept tokens joined by ' ').
    *
    * Replaces, per document: the window-function island merge, the
    * span-range explode (rows ≈ removed words), the (doc, pos)-keyed
    * shuffle join of EVERY corpus token against the removal set, and
    * the collect_list + structSortProject rebuild aggregate — the
    * whole token-granular shuffle tier of the two `*_remove` queries.
    * The per-document scan is O(tokens + starts); state is one int.
    */
  def spanRemove(toks: ArrayData, starts: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    val m = starts.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var removed = 0L
    var coveredUntil = -1L // highest token index covered by starts seen
    var j = 0
    var i = 0
    while (i < n) {
      while (j < m && starts.getLong(j) <= i) {
        val e = starts.getLong(j) + (k - 1)
        if (e > coveredUntil) coveredUntil = e
        j += 1
      }
      if (i <= coveredUntil) removed += 1
      else kept.add(toks.getUTF8String(i))
      i += 1
    }
    val cleanText = UTF8String.concatWs(Space,
      kept.toArray(new Array[UTF8String](kept.size)).toIndexedSeq: _*)
    new GenericInternalRow(Array[Any](n.toLong, removed, cleanText))
  }
}

/** Canonical corpus tokenizer (see [[TokenKernel.tokenize]]). */
case class Tokenize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(v: Any): Any =
    TokenKernel.tokenize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Consecutive fixed-width tiles of a token array (see
  * [[TokenKernel.wordTiles]]).
  */
case class WordTiles(child: Expression, tileLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(tileLen >= 1, s"word_tiles: tile width must be >= 1, got $tileLen")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_tiles"

  override def nullSafeEval(v: Any): Any =
    TokenKernel.wordTiles(v.asInstanceOf[ArrayData], tileLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.wordTiles($c, $tileLen)")

  override protected def withNewChildInternal(newChild: Expression): WordTiles =
    copy(child = newChild)
}

/** Per-document token statistics struct (see [[TokenKernel.tokenProfile]]).
  * `stopwords` is baked into the expression and shipped to executors as a
  * codegen reference object.
  */
case class TokenProfile(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_chars", LongType, nullable = false),
    StructField("max_tf", LongType, nullable = false),
    StructField("top_token", StringType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "token_profile"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TokenKernel.tokenProfile(v.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.tokenProfile($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenProfile =
    copy(child = newChild)
}

/** LIX readability counts of a raw text column (see
  * [[TokenKernel.lixCounts]]).
  */
case class LixCounts(child: Expression, longLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(longLen >= 1, s"lix_counts: longLen must be >= 1, got $longLen")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_sentences", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_long_words", LongType, nullable = false)))
  override def prettyName: String = "lix_counts"

  override def nullSafeEval(v: Any): Any =
    TokenKernel.lixCounts(v.asInstanceOf[UTF8String], longLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.lixCounts($c, $longLen)")

  override protected def withNewChildInternal(newChild: Expression): LixCounts =
    copy(child = newChild)
}

/** RAKE candidate phrases of a token array (see
  * [[TokenKernel.rakePhrases]]). `stopwords` is baked into the
  * expression and shipped to executors as a codegen reference object
  * (the [[TokenProfile]] pattern).
  */
case class RakePhrases(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "rake_phrases"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    TokenKernel.rakePhrases(v.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.rakePhrases($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): RakePhrases =
    copy(child = newChild)
}

/** Consecutive token bigram structs (see [[TokenKernel.tokenBigrams]]). */
case class TokenBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_bigrams"

  override def nullSafeEval(v: Any): Any =
    TokenKernel.tokenBigrams(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.tokenBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenBigrams =
    copy(child = newChild)
}

/** Rank-sorted string projection of an array<struct<rank, value>>
  * (see [[TokenKernel.structSortProject]]). Accepts an int or long
  * first field; resolves the accessor once at analysis time.
  */
case class StructSortProject(child: Expression)
    extends UnaryExpression {
  private def structType: Option[StructType] = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 => Some(s)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    structType match {
      case Some(s) if (s(0).dataType == IntegerType || s(0).dataType == LongType) &&
          s(1).dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"struct_sort_project expects array<struct<int|bigint, string>>, got ${child.dataType.sql}")
    }

  private lazy val intRank: Boolean =
    structType.exists(_(0).dataType == IntegerType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "struct_sort_project"

  override def nullSafeEval(v: Any): Any =
    TokenKernel.structSortProject(v.asInstanceOf[ArrayData], intRank)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.structSortProject($c, $intRank)")

  override protected def withNewChildInternal(newChild: Expression): StructSortProject =
    copy(child = newChild)
}

/** Within-document first-occurrence tile dedup stats (see
  * [[TokenKernel.tileDedupStats]]).
  */
case class TileDedupStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tiles", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("dedup_text", StringType, nullable = false)))
  override def prettyName: String = "tile_dedup_stats"

  override def nullSafeEval(v: Any): Any =
    TokenKernel.tileDedupStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.tileDedupStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TileDedupStats =
    copy(child = newChild)
}

/** Span-removal document rebuild (see [[TokenKernel.spanRemove]]):
  * (token array, sorted non-owner gram start positions, gram width k) →
  * struct(n_tokens, n_removed, clean_text). The `left` child is the
  * tokens, `right` the sorted array<bigint> of removal starts.
  */
case class SpanRemove(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "span_remove"

  override def nullSafeEval(toks: Any, starts: Any): Any =
    TokenKernel.spanRemove(
      toks.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"org.apache.spark.sql.graftexpr.TokenKernel.spanRemove($t, $s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanRemove =
    copy(left = newLeft, right = newRight)
}
