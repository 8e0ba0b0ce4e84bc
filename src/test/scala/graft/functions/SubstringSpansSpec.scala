package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Dedup.substringSpansOf]]: positional exact-substring dedup census
  * (stride-1 K-gram fingerprints, gaps-and-islands span merge).
  */
class SubstringSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def spans(docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Long, Long)] = {
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    Dedup.substringSpansOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  // 12 shared words -> duplicated gram positions 0..4 -> one span [0, 11]
  private val shared12 = (0 until 12).map(i => s"s$i").mkString(" ")

  test("cross-doc shared prefix merges overlapping gram positions into one maximal span") {
    val out = spans(Seq(
      (1L, shared12 + " u1 u2 u3 u4"),
      (2L, shared12 + " v1 v2 v3 v4"),
      (3L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15")))
    assert(out.keySet.map(_._1) === Set(1L, 2L)) // doc 3 fully unique
    assert(out((1L, 1L)) === ((0L, 11L, 12L)))
    assert(out((2L, 1L)) === ((0L, 11L, 12L)))
  }

  test("within-doc repeat counts as duplicated; non-overlapping occurrences stay separate spans") {
    val phrase = (0 until Dedup.SpanK).map(i => s"p$i").mkString(" ")
    // positions 0 and 11 both carry `phrase` (gap 11 > K-1 = 7)
    val out = spans(Seq((1L, phrase + " x1 x2 x3 " + phrase)))
    assert(out((1L, 1L)) === ((0L, 7L, 8L)))
    assert(out((1L, 2L)) === ((11L, 18L, 8L)))
  }

  test("occurrences exactly K words apart (touching, not overlapping) remain two spans") {
    val phrase = (0 until Dedup.SpanK).map(i => s"q$i").mkString(" ")
    val mid = (0 until Dedup.SpanK).map(i => s"m$i").mkString(" ")
    // doc 1: phrase at 0 and 16; doc 2 repeats phrase so it is duplicated,
    // mid is unique to doc 1 -> duplicated positions {0, 16}, gap 16 > 7
    val out = spans(Seq(
      (1L, phrase + " " + mid + " " + phrase),
      (2L, phrase + " z1 z2 z3 z4 z5 z6 z7 z8")))
    assert(out((1L, 1L)) === ((0L, 7L, 8L)))
    assert(out((1L, 2L)) === ((16L, 23L, 8L)))
    assert(out((2L, 1L)) === ((0L, 7L, 8L)))
  }

  test("docs shorter than K words emit no grams and no spans") {
    val out = spans(Seq(
      (1L, "a b c"), (2L, "a b c"),
      (3L, (0 until Dedup.SpanK).map(_ => "dup").mkString(" ")),
      (4L, (0 until Dedup.SpanK).map(_ => "dup").mkString(" "))))
    assert(out.keySet.map(_._1) === Set(3L, 4L))
  }

  private def removal(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    Dedup.substringSpanRemoveOf(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4))).toMap
  }

  test("removal keeps the first occurrence corpus-wide, excises every other") {
    val out = removal(Seq(
      (1L, shared12 + " u1 u2 u3 u4"),
      (2L, shared12 + " v1 v2 v3 v4"),
      (3L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")))
    // doc 1 owns every shared gram (min doc_id) -> nothing removed
    assert(out(1L) === ((16L, 0L, shared12 + " u1 u2 u3 u4")))
    // doc 2 loses the whole shared span [0, 11], keeps its unique tail
    assert(out(2L) === ((16L, 12L, "v1 v2 v3 v4")))
    assert(out(3L)._2 === 0L)
  }

  test("within-doc repeat: the first occurrence stays, the later is excised") {
    val phrase = (0 until Dedup.SpanK).map(i => s"p$i").mkString(" ")
    val out = removal(Seq((1L, phrase + " x1 x2 x3 " + phrase)))
    val (n, rm, clean) = out(1L)
    assert(n === 19L && rm === 8L)
    assert(clean === phrase + " x1 x2 x3")
  }

  test("spans, removal and token counts reconcile on sf0.01 (census vs rewrite)") {
    val dir = "/root/testdata/sf0.01"
    val k = Dedup.SpanK
    // census: per-doc set of positions covered by some duplicated span
    val census = Dedup.substringSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .view.mapValues(_.flatMap { case (_, s, e) => s to e }.toSet).toMap
    val rem = Dedup.substringSpanRemove(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    rem.foreach { case (id, nTok, nRm, clean) =>
      // count identity: kept tokens = n_tokens - n_removed
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept === (nTok - nRm).toInt, s"doc $id")
      // removal ⊆ census coverage: the rewrite never removes a position
      // the census didn't flag as sitting in a duplicated span
      assert(nRm <= census.getOrElse(id, Set.empty[Long]).size.toLong, s"doc $id")
    }
    // global ownership: every duplicated gram family keeps >= 1
    // occurrence — total removed words < total census-covered words
    // whenever any doc owns a span (sf0.01 has cross-doc duplicates)
    val totalCensus = census.values.map(_.size.toLong).sum
    val totalRemoved = rem.map(_._3).sum
    assert(totalRemoved > 0L, "fixture corpus has duplicated spans")
    assert(totalRemoved < totalCensus,
      "owners must retain their first occurrences")
  }

  test("sf0.01 spans cover exactly the positions whose gram repeats corpus-wide (driver-side replay)") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val k = Dedup.SpanK
    val occ = new scala.collection.mutable.HashMap[Seq[String], Int]
    val positions = toks.flatMap { case (id, w) =>
      (0 to w.length - k).map { p =>
        val g = w.slice(p, p + k); occ.update(g, occ.getOrElse(g, 0) + 1)
        (id, p, g)
      }
    }
    val dupPos = positions.filter { case (_, _, g) => occ(g) > 1 }
      .map { case (id, p, _) => (id, p.toLong) }.toSet
    val out = Dedup.substringSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // every span is a maximal union of duplicated gram positions
    val covered = out.flatMap { case (id, s, e) =>
      (s to e - k + 1).map(p => (id, p))
    }.toSet
    assert(covered === dupPos, "span gram positions must equal duplicated positions")
    // maximality: spans of one doc never overlap or touch within K-1
    out.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, s1, e1), (_, s2, _)) =>
          assert(s2 > e1 - k + 1 + (k - 1), s"spans [$s1,$e1] and start $s2 should have merged")
        case _ =>
      }
    }
  }

  test("span_remove kernel rebuild equals the legacy window/explode/join pipeline (sf0.01)") {
    // r17: substringSpanRemoveOf's island merge + rebuild moved into the
    // codegen span_remove kernel; this pins value-equality against the
    // r16 plan it replaced (gaps-and-islands window over non-owner gram
    // positions, span-range explode, (doc, pos)-keyed anti join,
    // collect_list + struct_sort_project rebuild), built inline here.
    import org.apache.spark.sql.functions._
    val k = Dedup.SpanK
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val toks = docs
      .select($"doc_id", posexplode(TextAnalysis.tokens($"text")))
      .select($"doc_id", $"pos".cast("bigint").as("pos"), $"col".as("tok"))
    val grams = docs
      .select($"doc_id",
        posexplode(graft.plans.ArrayOps.wordShingles(TextAnalysis.tokens($"text"), k)))
      .select($"doc_id", $"pos".cast("bigint").as("pos"),
        graft.functions.Hashing.md5Prefix60($"col").as("fp"))
    val own = grams.groupBy($"fp")
      .agg(count(lit(1)).as("n_occ"), min(struct($"doc_id", $"pos")).as("own"))
      .filter($"n_occ" > 1)
    val rmGram = grams.join(own.hint("shuffle_hash"), Seq("fp"))
      .filter(!($"doc_id" === $"own.doc_id" && $"pos" === $"own.pos"))
      .select($"doc_id", $"pos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val rmPos = rmGram
      .withColumn("ns",
        when($"pos" - coalesce(lag($"pos", 1).over(w), lit(-k.toLong))
          > (k - 1), 1L).otherwise(0L))
      .withColumn("span_id", sum($"ns").over(w))
      .groupBy($"doc_id", $"span_id")
      .agg(min($"pos").as("s"), (max($"pos") + (k - 1)).as("e"))
      .select($"doc_id", explode(sequence($"s", $"e")).as("pos"))
    val rebuilt = toks
      .join(rmPos.withColumn("rm", lit(1)).hint("shuffle_hash"),
        Seq("doc_id", "pos"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"rm".isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(graft.plans.ArrayOps.structSortProject(
          expr("collect_list(CASE WHEN rm IS NULL THEN struct(pos, tok) END)")),
          " ").as("clean_text"))
    val legacy = docs.select($"doc_id").join(rebuilt, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"n_removed", lit(0L)).as("n_removed"),
        ($"n_tokens".isNotNull &&
          ($"n_removed" === $"n_tokens")).as("fully_duplicated"),
        coalesce($"clean_text", lit("")).as("clean_text"))
      .orderBy($"doc_id").collect().toSeq
    val kernel = Dedup.substringSpanRemove(spark, "/root/testdata/sf0.01")
      .orderBy($"doc_id").collect().toSeq
    assert(kernel === legacy)
  }

  test("span_remove kernel edge cases: empty doc, overlap union, touching spans, full removal") {
    import org.apache.spark.sql.functions._
    val k = Dedup.SpanK
    def run(toks: Seq[String], starts: Seq[Long]): (Long, Long, String) = {
      val df = spark.createDataFrame(Seq((toks, starts))).toDF("t", "s")
        .select(graft.plans.ArrayOps.spanRemove($"t", $"s", k).as("r"))
        .select($"r.n_tokens", $"r.n_removed", $"r.clean_text")
      val row = df.collect().head
      (row.getLong(0), row.getLong(1), row.getString(2))
    }
    assert(run(Nil, Nil) === ((0L, 0L, "")))
    val ws = (0 until 20).map(i => s"w$i")
    assert(run(ws, Nil) === ((20L, 0L, ws.mkString(" "))))
    // starts 0 and 5 overlap (5 <= 0 + k - 1): union covers [0, 12]
    assert(run(ws, Seq(0L, 5L)) ===
      ((20L, 13L, (13 until 20).map(i => s"w$i").mkString(" "))))
    // starts exactly k apart touch without overlapping: both removed
    assert(run(ws, Seq(0L, k.toLong)) ===
      ((20L, 16L, (16 until 20).map(i => s"w$i").mkString(" "))))
    // full removal yields the empty rebuild
    val ws8 = ws.take(k)
    assert(run(ws8, Seq(0L)) === ((k.toLong, k.toLong, "")))
  }
}
