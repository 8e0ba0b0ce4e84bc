package graft

import org.apache.spark.sql.Encoders
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated properties for the pure transforms (SURVEY.md
  * §5.4): datetime derivations, coalesce merge, CDC normalization,
  * tokenizer parity. Samples are drawn with ScalaCheck Gens (fixed seed,
  * no scalatestplus bridge in the offline cache) and evaluated in one
  * DataFrame per property.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr
  import org.apache.spark.sql.functions._

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("P6 datetime derivation agrees with java.time for arbitrary epochs") {
    val secs = samples(Gen.choose(0L, 4102444800L))
    val df = spark.createDataFrame(secs.map(Tuple1(_))).toDF("sec")
      .select($"sec",
        date_format(timestamp_seconds($"sec"), "yyyy-MM-dd").as("dt"),
        hour(timestamp_seconds($"sec")).as("hr"))
    df.collect().foreach { r =>
      val t = java.time.Instant.ofEpochSecond(r.getLong(0))
        .atZone(java.time.ZoneOffset.UTC)
      assert(r.getString(1) === t.toLocalDate.toString, s"sec=${r.getLong(0)}")
      assert(r.getInt(2) === t.getHour, s"sec=${r.getLong(0)}")
    }
  }

  test("P11 firstNonNull merge: coalesce picks left iff left non-null") {
    val pairs = samples(for {
      a <- Gen.option(Gen.alphaStr); b <- Gen.option(Gen.alphaStr)
    } yield (a, b))
    val df = spark.createDataFrame(pairs.map { case (a, b) => (a.orNull, b.orNull) })
      .toDF("a", "b").select($"a", $"b", coalesce($"a", $"b").as("m"))
    df.collect().foreach { r =>
      val (a, b) = (Option(r.getString(0)), Option(r.getString(1)))
      assert(Option(r.getString(2)) === a.orElse(b))
    }
  }

  test("S4 CDC op normalization: create -> insert, others unchanged") {
    val ops = samples(Gen.oneOf("create", "insert", "update", "delete", "read"), 50)
    val df = spark.createDataFrame(ops.map(Tuple1(_))).toDF("type")
      .select($"type",
        when($"type" === "create", lit("insert")).otherwise($"type").as("norm"))
    df.collect().foreach { r =>
      val expected = if (r.getString(0) == "create") "insert" else r.getString(0)
      assert(r.getString(1) === expected)
    }
  }

  test("tokenizer parity: UDTF equals composed split-explode on messy text") {
    val texts = samples(
      Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const(","),
        Gen.const("--"), Gen.const("É"), Gen.const("42"))).map(_.mkString), 100)
    val df = spark.createDataFrame(texts.zipWithIndex.map(_.swap)).toDF("id", "text")
    val composed = df.select($"id",
        explode(graft.functions.TextAnalysis.tokens($"text")).as("t"))
      .as[(Int, String)](Encoders.tuple(Encoders.scalaInt, Encoders.STRING))
      .collect().sorted.toSeq
    val udtf = df.selectExpr("id", "tokenize_explode(text) AS t")
      .as[(Int, String)](Encoders.tuple(Encoders.scalaInt, Encoders.STRING))
      .collect().sorted.toSeq
    assert(udtf === composed)
  }

  test("lsh_bucket_pack parity: kernel equals a driver-side re-derivation on random vectors") {
    // random dims 0..64, random magnitudes incl. negatives and zeros —
    // the kernel must reproduce sign(dot(q, plane_p)) bit-packing for
    // every (table, plane) under arbitrary vector shapes
    val vecs = samples(for {
      dim <- Gen.choose(0, 64)
      v <- Gen.listOfN(dim, Gen.choose(-1000L, 1000L))
    } yield v, 150)
    val numTables = 3; val np = 7
    val df = spark.createDataFrame(vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("id", "q")
      .select($"id", graft.plans.ArrayOps.lshBucketPack($"q", numTables, np).as("b"))
    val got = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val expect = (0 until numTables).map { t =>
        (0 until np).map { p =>
          val dot = v.indices.map(j =>
            v(j) * graft.functions.Hashing.planeWeight(t * np + p, j)).sum
          if (dot > 0) 1L << p else 0L
        }.sum
      }
      assert(got(i.toLong) === expect, s"vec $i dim=${v.length}")
    }
  }
}
