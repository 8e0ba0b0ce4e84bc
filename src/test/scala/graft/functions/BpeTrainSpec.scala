package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The BPE correctness crux is that engine-native literal replace on the
  * bracket encoding is EXACTLY the left-to-right non-overlapping merge —
  * these cases pin the two failure modes a naive string encoding has
  * (shared separators on adjacent repeats; fake matches across symbol
  * boundaries), plus training-level invariants.
  */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits.{StringToColumn => _, _}

  private def mergeStep(syms: String, pair: String): String = {
    val merged = pair.replace("> <", "")
    Seq(syms).toDF("syms")
      .select(expr(s"replace(syms, '$pair', '$merged')").as("out"))
      .as[String].head()
  }

  test("adjacent repeats merge left-to-right non-overlapping") {
    // aaaa → (aa)(aa); aaa → (aa)(a)
    assert(mergeStep("<a> <a> <a> <a>", "<a> <a>") == "<aa> <aa>")
    assert(mergeStep("<a> <a> <a>", "<a> <a>") == "<aa> <a>")
    assert(mergeStep("<a> <a> <a> <a> <a>", "<a> <a>") == "<aa> <aa> <a>")
  }

  test("no fake matches across symbol boundaries") {
    // symbol <xa> must not donate its trailing 'a' to a (<a>, <b>) merge
    assert(mergeStep("<xa> <b>", "<a> <b>") == "<xa> <b>")
    // symbol <bc> must not donate its leading 'b'
    assert(mergeStep("<a> <bc>", "<a> <b>") == "<a> <bc>")
    // a true occurrence after a multi-char symbol still merges
    assert(mergeStep("<ab> <a> <b>", "<a> <b>") == "<ab> <ab>")
  }

  test("merged symbols participate in later merges") {
    assert(mergeStep("<m> <er>", "<m> <er>") == "<mer>")
    assert(mergeStep("<x> <m> <er> <y>", "<m> <er>") == "<x> <mer> <y>")
  }

  test("training invariants: ranks 1..K, merged = pair collapsed, freqs non-increasing") {
    val m = BpeTrain.bpeTrain(spark, "/root/testdata/sf0.001", merges = 4)
      .orderBy(col("merge_rank")).collect()
    assert(m.map(_.getLong(0)).toSeq == (1L to 4L))
    m.foreach { r =>
      assert(r.getString(2) == r.getString(1).replace("> <", ""))
    }
    val freqs = m.map(_.getLong(3)).toSeq
    assert(freqs == freqs.sorted.reverse,
      s"max pair frequency must be non-increasing across rounds: $freqs")
  }

  test("bpe fertility: reconciles with bpeApply per source; proxy sits alongside, not equal") {
    val dir = "/root/testdata/sf0.001"
    val fert = BpeTrain.bpeFertility(spark, dir, merges = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    // the BPE numbers must be exactly what the apply stream sums
    val applied = BpeTrain.bpeApply(spark, dir, merges = 4)
      .join(graft.Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("t"), sum(col("n_pieces")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fert.keySet === applied.keySet)
    fert.foreach { case (src, (t, bp, rp, bppt, rppt)) =>
      assert((t, bp) === applied(src), s"source $src")
      assert(bppt === bp.toDouble / t.toDouble)
      assert(rppt === rp.toDouble / t.toDouble)
      // trained BPE with few merges fragments harder than the proxy —
      // the point of reporting both is that they differ measurably
      assert(bp !== rp, s"source $src: proxy equals BPE, nothing to compare")
    }
  }
}
