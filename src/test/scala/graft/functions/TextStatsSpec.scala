package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Readability + vocabulary-coverage + LSH-recall invariants, with the
  * LIX arithmetic replayed on a constructed corpus.
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  val sf = "/root/testdata/sf0.001"

  test("readability: LIX replayed by hand; degenerate docs report null") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lix").toString
    spark.createDataFrame(Seq(
      (1L, "One two. Three!", "en", "s", 15L), // 2 sentences, 3 words, 0 long
      (2L, "wonderful administration", "en", "s", 24L), // 1 sent, 2 words, 2 long
      (3L, "", "en", "s", 0L))) // no words -> null
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.readability(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(1L) === ((2L, 3L, 0L, Some(3.0 / 2.0 + 0.0))))
    assert(got(2L) === ((1L, 2L, 2L, Some(2.0 + 100.0 * 1.0))))
    assert(got(3L)._4 === None)
  }

  test("vocabCoverage: monotone in K, bounded by 1, exact at the fixture") {
    val rows = TextAnalysis.vocabCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._5 <= hi._5, "coverage must grow with K")
      case _ =>
    }
    rows.foreach { case (k, used, covered, total, cov) =>
      assert(used <= k && covered <= total)
      assert(cov === covered.toDouble / total.toDouble)
    }
    // driver replay of the top-K cut for the smallest K
    val counts = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        TextAnalysis.tokens($"text")).as("t"))
      .groupBy($"t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }
    val k0 = rows.head._1.toInt
    val expect = counts.take(k0).map(_._2).sum
    assert(rows.head._3 === expect)
  }

  test("clusterBalancedSample: sqrt quota honored, singletons always kept") {
    val comp = GraphRank.knnComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val kept = Sampling.clusterBalancedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byComp = kept.groupBy(_._2)
    byComp.foreach { case (cid, rows) =>
      val size = rows.head._3
      val quota = math.max(1L, math.sqrt(size.toDouble).toLong)
      assert(rows.length.toLong === math.min(quota, size), s"component $cid")
      assert(rows.forall(_._4 == quota))
    }
    // every singleton survives
    val singles = comp.filter(_._2._2 == 1L).map(_._1).toSet
    val keptIds = kept.map(_._1).toSet
    assert(singles.subsetOf(keptIds))
    // components larger than 1 are subsampled sublinearly
    comp.map(_._2).distinct.filter(_._2 > 3L).foreach { case (cid, size) =>
      assert(byComp(cid).length < size)
    }
  }

  test("lshRecall: counts consistent, ratios exact") {
    val r = Dedup.lshRecall(spark, sf).collect()(0)
    val (t, c, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(h <= math.min(t, c))
    assert(r.getDouble(3) === h.toDouble / t.toDouble)
    assert(r.getDouble(4) === h.toDouble / c.toDouble)
    assert(t > 0, "fixture must contain near-dup ground truth")
  }

  test("dedupFunnel: monotone survivors, drops reconcile, final stage = cleanCorpus") {
    val rows = CorpusPipeline.dedupFunnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq === Seq("raw", "quality", "exact_dedup", "near_dup"))
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur._3 <= prev._3, "survivors cannot grow")
        assert(cur._4 === prev._3 - cur._3, "drop must reconcile with the previous stage")
      case _ =>
    }
    assert(rows.head._3 === Tables.documents(spark, sf).count())
    assert(rows.last._3 === CorpusPipeline.cleanCorpus(spark, sf).count(),
      "the funnel's final stage IS the clean corpus")
  }

  private val Tables = graft.Tables

  test("langid confusion: cells partition docs, recall shares sum to 1 per true lang") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.langIdConfusion(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(out.map(_.getLong(2)).sum === nDocs)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
    out.foreach(r => assert(r.getBoolean(4) === (r.getString(0) == r.getString(1))))
  }

  test("gopher rules: each rule fires on its canonical violation, clean doc keeps") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("gopher").toString
    val docs = Seq(
      (1L, "the a quick brown fox jumps over the lazy dog again today"), // clean: 12 words
      (2L, "the a word"),                                      // too few words
      (3L, "the a " + Seq.fill(10)("go").mkString(" ")),       // mean len < 3
      (4L, "the a extraordinarily " + Seq.fill(9)("supercalifragilistic").mkString(" ")), // mean len > 10
      (5L, "the the the the the the a b c d e f"),             // repetition: 'the' 6/12
      (6L, "fox jumps over lazy dog again today quick brown paws tail bark"), // no stopwords
      (7L, ""))                                                // empty
    spark.createDataFrame(docs).toDF("doc_id", "text")
      .write.parquet(s"$work/documents.parquet")
    val out = TextAnalysis.gopherRules(spark, work).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)))).toMap
    assert(out(1L) === ((true, true, true, true, true)))
    assert(out(2L)._1 === false && out(2L)._5 === false)
    assert(out(3L)._2 === false, "short-token doc must fail mean length")
    assert(out(4L)._2 === false, "long-token doc must fail mean length")
    assert(out(5L)._3 === false, "'the'-heavy doc must fail repetition")
    assert(out(6L)._4 === false, "stopword-free doc must fail stopwords")
    assert(out(7L) === ((false, true, true, false, false)),
      "empty doc: word-count+stopword rules fail, vacuous bounds hold")
  }

  test("split leakage pairs are minhash near-dups with exactly one train side") {
    val dir = "/root/testdata/sf0.01"
    val splits = Sampling.splitAssign(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = Dedup.minhashPairs(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val out = Dedup.splitLeakage(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t, e, sp, j) = (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))
      assert(splits(t) === "train" && splits(e) === sp && sp != "train")
      val key = if (t < e) (t, e) else (e, t)
      assert(pairs(key) === j, "leak pair must carry the pair set's estimate")
    }
    // completeness: every cross-split near-dup pair surfaces
    val expected = pairs.keys.count { case (a, b) =>
      (splits(a) == "train") != (splits(b) == "train")
    }
    assert(out.length === expected)
  }

  test("budget fill: kept prefix respects the exclusive-prefix budget rule") {
    val dir = "/root/testdata/sf0.001"
    val out = Sampling.budgetFill(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nKept, nTotal, tKept, tTotal) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nKept >= 1 && nKept <= nTotal, "first doc always fits")
      assert(tKept <= tTotal)
      // at most one overshoot doc: tokens_kept minus its last doc is < budget
      if (nKept < nTotal) assert(tKept >= Sampling.FillBudget,
        "stopped early despite remaining budget")
    }
  }
}
