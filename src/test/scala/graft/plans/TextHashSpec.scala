package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{Dedup, Hashing, TextAnalysis}

/** The codegen'd text-hash kernels (Md5Prefix60, WordShingles,
  * MinHashSig, SimHashFp) must be BIT-IDENTICAL to the composed
  * built-in forms they replaced — that equality is what keeps the
  * generated DuckDB oracle SQL valid without modification.
  */
class TextHashSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "short",
    "",
    "  ",
    "a b",
    "a b c",
    "ONE two THREE one TWO three one",
    "punct, punct; 123 punct!  tabs\tand\nnewlines",
    "unicode café naïve 中文 tokens here ok",
    "dup dup dup dup dup dup dup"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def docs = texts.toDF("doc_id", "text")

  test("md5_prefix60 equals conv(substring(md5,1,15),16,10)") {
    val rows = docs
      .select($"text",
        ArrayOps.md5Prefix60($"text").as("fast"),
        Hashing.md5Prefix60($"text").as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"text=${r.getString(0)}"))
  }

  test("word_shingles equals the transform/sequence composition") {
    val toks = TextAnalysis.tokens($"text")
    val rows = docs
      .select($"doc_id", toks.as("toks"))
      .select($"doc_id",
        ArrayOps.wordShingles($"toks", 3).as("fast"),
        expr("CASE WHEN size(toks) >= 3 THEN " +
          "transform(sequence(0, size(toks) - 3), i -> " +
          "concat_ws(' ', toks[i], toks[i+1], toks[i+2])) " +
          "ELSE array() END").as("composed"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc_id=${r.getLong(0)}")
    }
  }

  test("minhash_sig equals the per-permutation min aggregation") {
    import Hashing._
    val toks = TextAnalysis.tokens($"text")
    val fast = docs
      .select($"doc_id", ArrayOps.wordShingles(toks, 3).as("sh"))
      .filter(size($"sh") > 0)
      .select($"doc_id", ArrayOps.minhashSig($"sh", Dedup.NumPerm).as("sig"))
    val aggs = (0 until Dedup.NumPerm).map(j =>
      min((lit(minhashA(j)) * $"h" + lit(minhashB(j))) % P31).as(s"mh_$j"))
    val composed = docs
      .select($"doc_id", explode(ArrayOps.wordShingles(toks, 3)).as("shingle"))
      .select($"doc_id", md5Hash31($"shingle").as("h"))
      .groupBy($"doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select($"doc_id",
        array((0 until Dedup.NumPerm).map(j => col(s"mh_$j")): _*).as("sig"))
    val f = fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f == c)
    assert(f.nonEmpty)
  }

  test("simhash_fp equals the 48-column conditional-sum aggregation") {
    import Hashing._
    val bits = Dedup.SimBits
    val toks = TextAnalysis.tokens($"text")
    val fast = docs
      .select($"doc_id", toks.as("toks"))
      .filter(size($"toks") > 0)
      .select($"doc_id", ArrayOps.simhashFp($"toks", bits).as("fp"))
    val bitCounts = (0 until bits).map(i =>
      sum(shiftright($"h", i).bitwiseAND(lit(1L))).as(s"c_$i"))
    val sim = (0 until bits).map(i =>
      when(lit(2L) * col(s"c_$i") > $"n", lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val composed = docs
      .select($"doc_id", explode(toks).as("tok"))
      .select($"doc_id", md5Prefix60($"tok").as("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), bitCounts: _*)
      .select($"doc_id", sim.as("fp"))
    val f = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == c)
    assert(f.nonEmpty)
  }

  test("SQL registration exposes the kernels") {
    docs.createOrReplaceTempView("texthash_docs")
    val r = spark.sql(
      """SELECT doc_id,
        |       md5_prefix60(text) AS h,
        |       simhash_fp(filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) > 0), 48) AS fp,
        |       minhash_sig(word_shingles(filter(split(lower(text), '[^a-z0-9]+'), x -> length(x) > 0), 3), 16) AS sig
        |FROM texthash_docs WHERE doc_id = 0""".stripMargin).collect()
    assert(r.length == 1 && r.head.getSeq[Long](3).length == 16)
  }

  test("optimizer rewrites the composed conv/substring/md5 form to the kernel") {
    // parquet-backed source so ConvertToLocalRelation can't pre-fold
    val pdocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val df = pdocs.select(Hashing.md5Prefix60($"text").as("h"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("md5_prefix60"), optimized)
    assert(!optimized.contains("conv("), optimized)
    // and SQL text written in the portable form gets the kernel too
    pdocs.createOrReplaceTempView("texthash_pdocs")
    val viaSql = spark.sql(
      "SELECT CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) AS h FROM texthash_pdocs")
    assert(viaSql.queryExecution.optimizedPlan.toString.contains("md5_prefix60"))
    // values unchanged by the rewrite
    val direct = pdocs.select(ArrayOps.md5Prefix60($"text")).collect().map(_.getLong(0))
    assert(viaSql.collect().map(_.getLong(0)).toSeq == direct.toSeq)
  }

  test("null and empty inputs") {
    val df = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val rows = df.select(
      ArrayOps.md5Prefix60($"text").as("h"),
      ArrayOps.wordShingles(TextAnalysis.tokens($"text"), 3).as("sh"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1)) // null text → null
    assert(!rows(1).isNullAt(0) && rows(1).getSeq[String](1).isEmpty)
  }

  test("empty arrays fingerprint to NULL, not a sentinel") {
    val df = Seq(Tuple1(Seq.empty[String]), Tuple1(Seq("a", "b", "c")))
      .toDF("toks")
    val rows = df.select(
      ArrayOps.minhashSig(ArrayOps.wordShingles($"toks", 3), 16).as("sig"),
      ArrayOps.simhashFp($"toks", 48).as("fp")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(1))
  }

  test("width parameters are validated at construction") {
    intercept[IllegalArgumentException](ArrayOps.minhashSig($"x", 65))
    intercept[IllegalArgumentException](ArrayOps.minhashSig($"x", 0))
    intercept[IllegalArgumentException](ArrayOps.simhashFp($"x", 65))
    intercept[IllegalArgumentException](ArrayOps.wordShingles($"x", 0))
  }

  test("top_k_ids rejects wrongly-typed inputs at analysis") {
    val df = Seq(("a", 1.0)).toDF("id", "score")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(org.apache.spark.sql.graftexpr.TopKAgg.topKIds($"id", $"score", 5))
        .collect()
    }
    assert(ex.getMessage.contains("top_k_ids") || ex.getMessage.contains("DATATYPE"))
  }
}
