package graft.plans

import org.apache.spark.sql.Column

/** Engine-facing aliases for the custom Catalyst array expressions (see
  * [[org.apache.spark.sql.graftexpr.LongArrayDot]] for why the
  * implementation lives under the Spark package).
  */
object ArrayOps {
  def longArrayDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.longArrayDot(a, b)

  def longArrayNormSq(a: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.longArrayNormSq(a)

  def lshBucketPack(q: Column, numTables: Int, planesPerTable: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions
      .lshBucketPack(q, numTables, planesPerTable)

  def md5Prefix60(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.md5Prefix60(c)

  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.wordShingles(c, n)

  def minhashSig(c: Column, numPerm: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.minhashSig(c, numPerm)

  def simhashFp(c: Column, bits: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.simhashFp(c, bits)

  def normalizeText(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.normalizeText(c)

  def tokenize(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.tokenize(c)

  def wordTiles(c: Column, tileLen: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.wordTiles(c, tileLen)

  def tileDedupStats(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.tileDedupStats(c)

  def structSortProject(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.structSortProject(c)

  def centroidRank(q: Column, cents: Column, k: Int, addQNorm: Boolean): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.centroidRank(q, cents, k, addQNorm)

  def tokenBigrams(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.tokenBigrams(c)

  def spanRemove(toks: Column, starts: Column, k: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.spanRemove(toks, starts, k)

  def tokenProfile(c: Column, stopwords: Seq[String]): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.tokenProfile(c, stopwords)

  def rakePhrases(c: Column, stopwords: Seq[String]): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.rakePhrases(c, stopwords)

  def phraseHits(c: Column, w1: String, w2: String): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.phraseHits(c, w1, w2)

  def proxStats(c: Column, t1: String, t2: String, window: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.proxStats(c, t1, t2, window)

  def lixCounts(c: Column, longLen: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.lixCounts(c, longLen)

  def int8QuantStats(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.int8QuantStats(c)

  def pqReconstruct(q: Column, cb: Column, m: Int, sub: Int): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.pqReconstruct(q, cb, m, sub)

  def quantizeFloats(c: Column, factor: Long): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.quantizeFloats(c, factor)

  def longArrayEqCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.longArrayEqCount(a, b)

  def basketPairsMarkers(c: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.basketPairsMarkers(c)

  def zValue2(x: Column, y: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.zValue2(x, y)
}
