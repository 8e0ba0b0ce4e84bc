package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sampling/mixing/chunking: determinism under repartitioning, achieved
  * rates near targets, and chunk-shape invariants.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private val dir = "/root/testdata/sf0.01"

  test("uniform k-sample is a pure function of the data (stable under repartition)") {
    val a = Sampling.uniformK(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // recompute over a differently-partitioned scan: same sample
    val docs = graft.Tables.documents(spark, dir).repartition(7)
    val b = docs
      .select($"doc_id",
        Hashing.md5Prefix60(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("sample:"),
            $"doc_id".cast("string"))).as("priority"))
      .orderBy($"priority", $"doc_id").limit(Sampling.UniformK)
      .collect().map(_.getLong(0)).toSet
    assert(a.size === Sampling.UniformK)
    assert(a === b)
  }

  test("stratified sample hits each class rate within 3 points") {
    val totals = graft.Tables.events(spark, dir)
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.stratified(spark, dir)
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Sampling.StratifiedRates.foreach { case (cls, rate) =>
      val achieved = 100.0 * kept.getOrElse(cls, 0L) / totals(cls)
      assert(math.abs(achieved - rate) <= 3.0,
        s"$cls: target $rate%, achieved $achieved%")
      if (rate == 100) assert(kept(cls) === totals(cls), s"$cls must keep all")
    }
  }

  test("source mix keeps each source at its weight (exact Bernoulli on 25 docs each)") {
    val kept = Sampling.mixSources(spark, dir)
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 100%-weight sources must be complete; all others strictly partial
    Sampling.SourceWeights.foreach { case (src, w) =>
      val n = kept.getOrElse(src, 0L)
      if (w == 100) assert(n === 25L, s"$src at weight 100 kept $n/25")
      else assert(n < 25L, s"$src at weight $w kept all 25")
    }
  }

  test("chunks are ChunkLen-aligned, counts match the token stream") {
    val chunks = Sampling.chunkTokens(spark, dir).collect()
    chunks.foreach { r =>
      val (chunk, n, first, last) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n <= Sampling.ChunkLen)
      assert(first >= chunk * Sampling.ChunkLen)
      assert(last < (chunk + 1) * Sampling.ChunkLen)
      assert(last - first + 1 === n, "positions within a doc are dense")
    }
    val totalFromChunks = chunks.map(_.getLong(2)).sum
    val totalTokens = TextAnalysis.tokensToIds(spark, dir).count()
    assert(totalFromChunks === totalTokens)
  }

  test("shard export: directory tree matches the manifest, nothing lost") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("shards").toString
    Sampling.writeShards(spark, dir, base)
    val manifest = Sampling.shardManifest(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    assert(manifest.size === Sampling.NumShards)
    // read back via the partition column: per-shard doc counts and
    // checksums must reproduce the manifest exactly
    val back = spark.read.parquet(base)
      .withColumn("text_h", graft.functions.Hashing.md5Prefix60(col("text")))
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(text_h)").as("ck"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(back === manifest)
    val dirs = new java.io.File(base).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs === Sampling.NumShards)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(base))
  }

  test("weighted sample: heap form equals an exhaustive window recompute; weight raises selection odds") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = Sampling.weightedSample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // exhaustive recompute: same fixed-point priority, window rank
    val w = Window.partitionBy($"source").orderBy($"wpriority", $"doc_id")
    val expect = graft.Tables.documents(spark, dir).repartition(7)
      .select($"doc_id", $"source", $"n_chars",
        Hashing.md5Hash31(concat(lit("wsample:"), $"doc_id".cast("string"))).as("h31"))
      .select($"doc_id", $"source",
        expr("h31 * 1048576L div greatest(n_chars, 1L)").as("wpriority"))
      .withColumn("wrank", row_number().over(w).cast("long"))
      .filter($"wrank" <= Sampling.WeightedK)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(got === expect)
    // longer documents must be overrepresented relative to their share:
    // the kept set's mean n_chars should exceed the corpus mean
    val kept = Sampling.weightedSample(spark, dir).select($"doc_id")
    val docs = graft.Tables.documents(spark, dir)
    val keptMean = docs.join(kept, "doc_id").agg(avg($"n_chars")).first().getDouble(0)
    val corpusMean = docs.agg(avg($"n_chars")).first().getDouble(0)
    assert(keptMean > corpusMean,
      s"length-weighted sample should skew long: kept=$keptMean corpus=$corpusMean")
  }

  private def exactSqrt(x: Long): BigInt =
    BigInt(java.math.BigInteger.valueOf(x).sqrt())

  test("isqrt is exact at perfect squares, off-by-ones, and large magnitudes") {
    // adversarial set: k^2-1 / k^2 / k^2+1 across magnitudes up to the
    // documented 2^62 probe-overflow bound, where double sqrt alone
    // misrounds
    val ks = Seq(1L, 2L, 3L, 1000L, 94906265L /* ~sqrt(2^53) */,
      1L << 31, 3037000499L /* isqrt(Long.Max) */)
    val xs = (ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)) ++
      Seq(0L, 1L, 2L, 5L, (1L << 62) - 1)).distinct.filter(_ >= 0)
    val got = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
      .select($"x", Sampling.isqrt($"x").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    xs.foreach { x =>
      val exact = exactSqrt(x).toLong
      assert(got(x) === exact, s"isqrt($x): got ${got(x)}, want $exact")
    }
  }

  test("temperature mix: rates follow sqrt mass exactly; sample stays budget-bounded") {
    import org.apache.spark.sql.functions._
    val out = Sampling.temperatureMix(spark, dir).cache()
    try {
      // replay the fixed-point rate computation driver-side from the
      // corpus stats (BigInteger sqrt, integer division)
      val per = graft.Tables.documents(spark, dir)
        .groupBy($"source").agg(count(lit(1)).as("n"), sum($"n_chars").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val wsum = per.map { case (_, _, c) => exactSqrt(c) }.sum
      val expectRates = per.map { case (s, n, c) =>
        s -> (exactSqrt(c) * Sampling.TempBudget * 1000000 / (wsum * n))
          .min(1000000).toLong
      }.toMap
      val gotRates = out.select($"source", $"rate_ppm").distinct()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      gotRates.foreach { case (s, r) => assert(r === expectRates(s), s) }
      // α=1/2 compresses the spread: a source's per-DOC rate must rise
      // as its doc count falls (the small-source boost), and the drawn
      // sample size stays near the budget, not the corpus size
      val kept = out.count()
      assert(kept > Sampling.TempBudget / 2 && kept < Sampling.TempBudget * 2,
        s"kept $kept vs budget ${Sampling.TempBudget}")
    } finally out.unpersist()
  }

  test("mix schedule: contiguous steps, per-source shares track corpus shares, smooth interleave") {
    val dir = "/root/testdata/sf0.001"
    val out = Sampling.mixSchedule(spark, dir)
      .orderBy(org.apache.spark.sql.functions.col("step")).collect()
    assert(out.map(_.getLong(0)).toSeq === (1L to Sampling.ScheduleSteps.toLong))
    val weights = graft.Tables.documents(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tw = weights.values.sum
    val served = out.map(_.getString(1)).groupBy(identity).view.mapValues(_.size).toMap
    weights.foreach { case (src, w) =>
      val expect = Sampling.ScheduleSteps.toDouble * w / tw
      assert(math.abs(served.getOrElse(src, 0) - expect) <= weights.size + 1,
        s"$src served ${served.getOrElse(src, 0)} vs quota $expect")
    }
    // occurrences of each source appear in order (k strictly increasing)
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val ks = rows.sortBy(_.getLong(0)).map(_.getLong(2))
      assert(ks.toSeq === ks.sorted.toSeq && ks.distinct.length === ks.length)
    }
  }

  test("WFQ quota margin: bounded generation matches unbounded schedule on 1200 random weight mixes") {
    // The ADVICE-r8 simulation found the pre-round-8 fixed `+2` margin
    // wrong on 187/3000 random mixes (a source's occurrence list ran
    // dry before its last in-horizon vtime, letting a wrong source
    // fill a tail step). This pins the fixed margin
    // `k <= (Steps*w) div tw + ns + 1` as a ScalaCheck property: for
    // random weight vectors, the quota-bounded occurrence set must
    // yield EXACTLY the same first-Steps schedule as the unbounded
    // one (reference: every source gets a full horizon of
    // occurrences, k = 1..Steps — enough for any source to fill every
    // step alone). Same (vtime, source, k) tie-break as mixSchedule.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val steps = Sampling.ScheduleSteps.toLong
    val genMix: Gen[Seq[Long]] = for {
      ns <- Gen.choose(1, 12)
      ws <- Gen.listOfN(ns, Gen.frequency(
        3 -> Gen.choose(1L, 20L),          // heavy skew regime
        3 -> Gen.choose(1L, 1000L),
        2 -> Gen.choose(1L, 1000000L)))
    } yield ws
    def schedule(occ: Seq[(Long, String, Long)]): Seq[(Long, String, Long)] =
      occ.sortBy { case (v, s, k) => (v, s, k) }.take(steps.toInt)
    var checked = 0
    (0 until 1200).foreach { i =>
      genMix(Gen.Parameters.default, Seed(4242L + i)).foreach { ws =>
        val sources = ws.indices.map(j => f"s$j%02d")
        val tw = ws.sum
        val ns = ws.size.toLong
        val unbounded = sources.zip(ws).flatMap { case (s, w) =>
          (1L to steps).map(k => ((k * tw) / w, s, k))
        }
        val bounded = sources.zip(ws).flatMap { case (s, w) =>
          (1L to ((steps * w) / tw + ns + 1)).map(k => ((k * tw) / w, s, k))
        }
        assert(schedule(bounded) === schedule(unbounded),
          s"mix ${ws.mkString(",")} diverges under the quota bound")
        checked += 1
      }
    }
    assert(checked >= 1000, s"only $checked mixes sampled")
  }

  test("dsir weights: hand-computed bucket-count ratios, sub-2-token docs drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    import spark.implicits._
    // bigram buckets verified collision-free for {a b, b a, b c, c c}.
    // target counts: "a b"=2, "b a"=1; raw: "a b"=3, "b a"=1, "b c"=1,
    // "c c"=2. doc1 (target): (5+1)/(7+1); doc2: (2+1)/(4+1);
    // doc3: (0+1)/(4+1); doc4 has no bigrams -> no row
    Seq(
      (1L, "a b a b", "en", "src0", 7L),
      (2L, "a b c", "en", "src9", 5L),
      (3L, "c c c", "en", "src9", 5L),
      (4L, "a", "en", "src9", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Sampling.dsirWeights(spark, dir)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      1L -> ((3L, 5L, 7L, 6.0 / 8.0)),
      2L -> ((2L, 2L, 4L, 3.0 / 5.0)),
      3L -> ((2L, 0L, 4L, 1.0 / 5.0))))
  }

  test("dsir exact stats: hand-computed per-(doc,bucket) integers; exact vs approx rankings diverge on a skewed profile") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-exact").toString
    import spark.implicits._
    // Four special bigrams, verified to land in four distinct buckets:
    //   "xa xb", "xb xc" (doc X's) — fillers set t=3, r=9 each (ratio 4/10)
    //   "ya yb"          (doc Y's) — fillers set t=7, r=8      (ratio 8/9)
    //   "yb yc"          (doc Y's) — fillers set t=0, r=8      (ratio 1/9)
    // Doc X: uniform moderate ratios; doc Y: one near-1 ratio + one tiny.
    // The summed form (arithmetic in counts) ranks Y above X
    // (8/17 > 7/19); the product form (geometric in ratios) ranks X
    // above Y (2·ln 0.4 = −1.833 > ln(8/9)+ln(1/9) = −2.315) — the
    // skewed-profile divergence dsirWeights' fidelity note concedes.
    val fillers =
      Seq.fill(3)("xa xb" -> "src0") ++ Seq.fill(5)("xa xb" -> "src9") ++
      Seq.fill(3)("xb xc" -> "src0") ++ Seq.fill(5)("xb xc" -> "src9") ++
      Seq.fill(7)("ya yb" -> "src0") ++ Seq.fill(7)("yb yc" -> "src9")
    val docs = Seq((1L, "xa xb xc", "src9"), (2L, "ya yb yc", "src9")) ++
      fillers.zipWithIndex.map { case ((t, s), i) => (10L + i, t, s) }
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    // sufficient statistics: totals T=13, R=34 ride every row
    val stats = Sampling.dsirExactStats(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val byDoc = stats.groupBy(_._1)
    assert(byDoc(1L).map(t => (t._2, t._3, t._4)).sorted.toSeq ===
      Seq((1L, 3L, 9L), (1L, 3L, 9L)))
    assert(byDoc(2L).map(t => (t._2, t._3, t._4)).sorted.toSeq ===
      Seq((1L, 0L, 8L), (1L, 7L, 8L)))
    assert(stats.forall(t => t._5 === 13L && t._6 === 34L))

    val w = Sampling.dsirExactWeights(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (xa, xe) = w(1L)
    val (ya, ye) = w(2L)
    assert(xa === 7.0 / 19.0 && ya === 8.0 / 17.0)
    // the constructed divergence: approx says Y, exact says X
    assert(ya > xa && xe > ye)
    val const = 2.0 * (math.log(34.0 + 1024.0) - math.log(13.0 + 1024.0))
    assert(math.abs(xe - (2.0 * math.log(0.4) + const)) < 1e-9)
    assert(math.abs(ye - (math.log(8.0 / 9.0) + math.log(1.0 / 9.0) + const)) < 1e-9)
  }

  test("dsir exact weights: approx column is bit-identical to dsirWeights; log fold matches first principles on real data") {
    val exact = Sampling.dsirExactWeights(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Sampling.dsirWeights(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(approx.nonEmpty && approx.length === exact.size)
    approx.foreach { case (id, nbg, wt) =>
      assert(exact(id)._1 === nbg)
      assert(exact(id)._2 === wt) // integer sums → one division: bit-identical
    }
    // recompute the log fold from the oracled integer stats in plain Scala
    val stats = Sampling.dsirExactStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val b = Sampling.DsirBuckets.toDouble
    stats.groupBy(_._1).foreach { case (id, rows) =>
      val n = rows.map(_._2).sum.toDouble
      val ratio = rows.map(t =>
        t._2 * (math.log(t._3 + 1.0) - math.log(t._4 + 1.0))).sum
      val expect = ratio +
        n * (math.log(rows.head._6 + b) - math.log(rows.head._5 + b))
      assert(math.abs(exact(id)._3 - expect) < 1e-9, s"doc $id")
    }
  }

  test("cluster-safe split: zero near-dup pairs straddle splits; singletons keep splitAssign's split") {
    import org.apache.spark.sql.functions._
    val safe = Sampling.splitClusterSafe(spark, dir)
    // leakage-free by construction: every MinHash near-dup pair lands in
    // one split — the exact predicate eval_split_leakage audits
    val splits = safe.select($"doc_id", $"split")
    val straddling = Dedup.minhashPairs(spark, dir)
      .join(splits.select($"doc_id".as("a"), $"split".as("sa")), Seq("a"))
      .join(splits.select($"doc_id".as("b"), $"split".as("sb")), Seq("b"))
      .filter($"sa" =!= $"sb")
      .count()
    assert(straddling === 0L)
    // same salt, cluster_id = doc_id for singletons → identical split
    val moved = safe.filter($"cluster_id" === $"doc_id").select($"doc_id", $"split")
      .join(Sampling.splitAssign(spark, dir)
        .select($"doc_id", $"split".as("naive")), Seq("doc_id"))
      .filter($"split" =!= $"naive")
      .count()
    assert(moved === 0L)
    // every document is assigned exactly once
    assert(safe.count() === graft.Tables.documents(spark, dir).count())
  }

  test("dsir weights: bucket histogram broadcasts; doc side never shuffles on bucket") {
    val plan = Sampling.dsirWeights(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"hist join not broadcast:\n$plan")
  }
}
