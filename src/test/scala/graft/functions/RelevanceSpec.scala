package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{ColStr, TestSpark}

/** Relevance-scoring contracts: ranking semantics, scale-shaped plans
  * (value-level parity with DuckDB is the CORRECTNESS gate's job).
  */
class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  test("tfidf top terms: <=3 per doc, ranked by weight desc then term") {
    val rows = Relevance.tfidfTopTerms(spark, sf)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    for ((doc, rs) <- rows) {
      assert(rs.length <= 3, s"doc $doc")
      val ordered = rs.sortBy(_.getLong(5))
      val pairs = ordered.map(r => (r.getDouble(4), r.getString(1)))
      assert(pairs.sliding(2).forall {
        case Array((w1, t1), (w2, t2)) => w1 > w2 || (w1 == w2 && t1 < t2)
        case _ => true
      }, s"doc $doc not ranked: ${pairs.mkString}")
    }
  }

  test("rarer term outweighs commoner term at equal tf") {
    // weight = tf*N/df strictly decreases in df for fixed tf
    val byTerm = Relevance.tfidfTopTerms(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    for (Seq((_, tf1, df1, w1), (_, tf2, df2, w2)) <- byTerm.toSeq.combinations(2).take(2000)
         if tf1 == tf2 && df1 < df2)
      assert(w1 > w2)
  }

  test("bm25: positive scores, sorted desc, query-term docs only") {
    val rows = Relevance.bm25Search(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("bm25 scoring pass is narrow: one tiny stats aggregate, no corpus shuffle") {
    val plan = Relevance.bm25Search(spark, sf).queryExecution.executedPlan.toString
    // the only exchanges allowed: the single-row stats aggregate + the
    // TakeOrdered collect — never a hash exchange of corpus rows
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("invertedIndex: postings ranked (tf desc, doc asc), df/cf exact, capped, no window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ir").toString
    spark.createDataFrame(Seq(
      (1L, "a a a b", "en", "s", 7L),
      (2L, "a b b", "en", "s", 5L),
      (3L, "a a b c", "en", "s", 7L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // long form (term, df, cf, rnk, doc_id, tf); regroup per term here
    val rows = Relevance.invertedIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val got = rows.groupBy(_._1).map { case (t, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to rs.length))
      t -> (rs.head._2, rs.head._3, sorted.map(_._5).toSeq, sorted.map(_._6).toSeq)
    }
    // 'a': tf 3,1,2 -> postings [1,3,2]; 'b': tf 1,2,1 -> [2,1,3] (tie 1<3)
    assert(got("a") === ((3L, 6L, Seq(1L, 3L, 2L), Seq(3L, 2L, 1L))))
    assert(got("b") === ((3L, 4L, Seq(2L, 1L, 3L), Seq(2L, 1L, 1L))))
    assert(got("c") === ((1L, 1L, Seq(3L), Seq(1L))))
    val out = Relevance.invertedIndex(spark, "/root/testdata/sf0.001")
    assert(out.collect().forall(_.getLong(3) <= Relevance.PostingsK))
    // the postings cap must come from the bounded heap, not a rank window
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("tokenLangChi2 matches a driver-side chi-square replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chi2").toString
    // 'hund' appears only in de (perfectly discriminative), 'the' in
    // every doc (chi2 0), 'dos' in one of two es docs
    spark.createDataFrame(Seq(
      (1L, "the hund", "de", "s", 8L),
      (2L, "the hund dog", "de", "s", 12L),
      (3L, "the cat", "en", "s", 7L),
      (4L, "the dog", "en", "s", 7L),
      (5L, "the dos", "es", "s", 7L),
      (6L, "the uno", "es", "s", 7L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Relevance.tokenLangChi2(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent replay, literally Σ (o-e)^2/e over ALL cells
    val langs = Map("de" -> 2L, "en" -> 2L, "es" -> 2L)
    val n = 6L
    def chi2(obs: Map[String, Long]): Double = {
      val df = obs.values.sum
      langs.toSeq.sortBy(_._1).map { case (l, nl) =>
        val o = obs.getOrElse(l, 0L).toDouble
        val e = df.toDouble * nl.toDouble / n.toDouble
        (o - e) * (o - e) / e
      }.sum
    }
    val expect = Map(
      "hund" -> Map("de" -> 2L), "the" -> Map("de" -> 2L, "en" -> 2L, "es" -> 2L),
      "dos" -> Map("es" -> 1L), "dog" -> Map("de" -> 1L, "en" -> 1L))
    expect.foreach { case (tok, obs) =>
      val (gdf, gchi) = got(tok)
      assert(gdf === obs.values.sum, s"df of $tok")
      assert(math.abs(gchi - chi2(obs)) < 1e-9, s"chi2 of $tok: got $gchi expect ${chi2(obs)}")
    }
    // a token present in every doc of every language carries no signal
    assert(math.abs(got("the")._2) < 1e-9)
    // the perfectly-discriminative token dominates the shared one
    assert(got("hund")._2 > got("dog")._2)
  }

  test("RAKE: phrase split at stopwords, degree/frequency scores replay by hand") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rake").toString
    // "quick brown fox" twice, "lazy dog" once, "fox" once solo
    spark.createDataFrame(Seq(
      (1L, "the quick brown fox and a lazy dog", "en", "web", 34L),
      (2L, "a quick brown fox in the fox", "en", "web", 28L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Relevance.rakeKeyphrases(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // word stats: quick/brown: freq 2, deg 6; fox: freq 3, deg 7; lazy/dog: 1/2
    val quick = 6L * 1000000L / 2L; val fox = 7L * 1000000L / 3L
    assert(out("quick brown fox") === ((2L, quick * 2 + fox)))
    assert(out("lazy dog") === ((1L, 2L * 1000000L / 1L * 2)))
    assert(out("fox") === ((1L, fox)))
    assert(out.size === 3)
  }

  test("phrase search: adjacency only, exact counts and first positions, zero-shuffle plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    import spark.implicits._
    // doc 1: two hits, first at pos 1; doc 2: one hit at pos 2; doc 3:
    // both terms present but NOT adjacent (the inverted-index false
    // positive this op exists to reject); doc 4: phrase at the very end
    // (the zip-tail edge); doc 5: single token
    Seq(
      (1L, "table hash table hash", "en", "src0", 21L),
      (2L, "x table hash y", "en", "src0", 14L),
      (3L, "table x hash", "en", "src0", 12L),
      (4L, "z table hash", "en", "src0", 12L),
      (5L, "table", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Relevance.phraseSearch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 1L), (2L, 1L, 2L), (4L, 1L, 2L)))
    // scan-side kernel: no exchange anywhere — top-k is TakeOrdered
    val plan = Relevance.phraseSearch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phrase search shuffled:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("proximity search: window cut, pair counts, ranking; zero-shuffle plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prox").toString
    import spark.implicits._
    // d1: dist 4 (inside the 5-token window); d2: dist 6 (outside ->
    // excluded); d3: reversed order still counts (|i-j|); d4: two "table"
    // against one "hash" -> 2 near pairs, ranked first; d5: one term only
    Seq(
      (1L, "table x x x hash", "en", "src0", 16L),
      (2L, "table x x x x x hash", "en", "src0", 20L),
      (3L, "hash table", "en", "src0", 10L),
      (4L, "table hash table", "en", "src0", 16L),
      (5L, "table only", "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Relevance.proximitySearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      (4L, 2L, 1L, 1L, 2L), (3L, 1L, 1L, 1L, 1L), (1L, 1L, 1L, 4L, 1L)))
    val plan = Relevance.proximitySearch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"proximity search shuffled:\n$plan")
  }

  test("query expansion: no query terms, scores replay, terms come from feedback docs") {
    val dir = "/root/testdata/sf0.01"
    val out = Relevance.queryExpansion(spark, dir).collect()
    assert(out.length === Relevance.PrfTerms)
    val fbIds = Relevance.bm25Search(spark, dir).limit(Relevance.PrfDocs)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val fbVocab = graft.Tables.documents(spark, dir)
      .filter($"doc_id".isin(fbIds.toSeq: _*))
      .select(explode(array_distinct(TextAnalysis.tokens($"text"))).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    val n = graft.Tables.documents(spark, dir).count()
    out.foreach { r =>
      val term = r.getString(0)
      assert(!Relevance.QueryTerms.contains(term), s"query term leaked: $term")
      assert(fbVocab(term), s"term outside feedback vocabulary: $term")
      assert(r.getLong(3) === r.getLong(1) * n / r.getLong(2))
      assert(r.getLong(1) >= 1 && r.getLong(1) <= Relevance.PrfDocs)
    }
  }
}
