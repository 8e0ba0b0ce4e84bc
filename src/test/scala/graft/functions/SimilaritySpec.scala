package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ANN recall relationships the oracle can't express as a single-query
  * check: multi-probe must dominate single-probe recall (it probes a
  * strict superset of buckets), and recalls stay in [0, 1].
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private val dir = "/root/testdata/sf0.001"

  private def meanRecall(df: org.apache.spark.sql.DataFrame): Double =
    df.agg(avg($"recall_at_k")).head().getDouble(0)

  test("multi-probe recall dominates single-probe recall per query") {
    val single = Similarity.lshRecall(spark, dir)
      .withColumnRenamed("recall_at_k", "r1")
    val multi = Similarity.multiProbeRecall(spark, dir)
      .withColumnRenamed("recall_at_k", "rm")
    val joined = single.join(multi, "query_id")
    assert(joined.filter($"rm" < $"r1").isEmpty,
      "probing Hamming-1 neighbor buckets can only ADD candidates, so " +
        "per-query recall must not drop")
    assert(meanRecall(Similarity.multiProbeRecall(spark, dir)) >=
      meanRecall(Similarity.lshRecall(spark, dir)))
  }

  test("all recall variants produce values in [0,1] for every query") {
    Seq(Similarity.lshRecall(spark, dir),
        Similarity.multiProbeRecall(spark, dir),
        Similarity.ivfRecall(spark, dir),
        Similarity.pqRecall(spark, dir),
        Similarity.ivfPqRecall(spark, dir)).foreach { df =>
      assert(df.filter($"recall_at_k" < 0.0 || $"recall_at_k" > 1.0).isEmpty)
      assert(df.count() === Similarity.NumQueries.toLong)
    }
  }

  test("ivf+pq candidates are the IVF cell set scored with the PQ estimate") {
    // composing the two levers: the (query, neighbor) candidate pool is
    // exactly ivfTopK's probed-cell pool, and each kept neighbor's
    // est_dot equals pqTopK's estimate for that (query, neighbor) — so
    // the composition introduces no third approximation of its own
    val ivfpq = Similarity.ivfPqTopK(spark, dir).cache()
    try {
      val perQuery = ivfpq.groupBy($"query_id").agg(count(lit(1)).as("n"))
      assert(perQuery.filter($"n" > Similarity.TopK.toLong).isEmpty)
      assert(perQuery.count() === Similarity.NumQueries.toLong)
      val pqEst = Similarity.pqTopK(spark, dir)
        .select($"query_id", $"neighbor_id", $"est_dot".as("pq_dot"))
      // every ivfpq pair that ALSO survives pq's own top-k must carry
      // the identical integer estimate (same codes, same ADC sum)
      val joined = ivfpq.join(pqEst, Seq("query_id", "neighbor_id"))
      assert(joined.filter($"est_dot" =!= $"pq_dot").isEmpty)
      // every ivfpq neighbor lies in a cell the query probes (replay
      // the IVF pool via ivfTopK's unranked candidate relation: a
      // neighbor ranked by ivfpq must appear in ivfTopK's pool when
      // k covers the whole pool — checked on the exact-cosine side by
      // membership in the probed-cell corpus)
      val cells = Similarity.ivfTopK(spark, dir)
        .select($"query_id", $"neighbor_id").withColumn("in_ivf", lit(true))
      val missing = ivfpq.join(cells, Seq("query_id", "neighbor_id"), "left")
        .filter($"in_ivf".isNull)
      // ivfTopK keeps only TopK of the pool, so membership can only be
      // asserted for queries whose pool is within TopK; guard on that
      val poolSizes = ivfpq.groupBy($"query_id").agg(count(lit(1)).as("n"))
        .filter($"n" < Similarity.TopK.toLong).select($"query_id")
      assert(missing.join(poolSizes, "query_id").isEmpty,
        "a query with pool < TopK must agree with the IVF candidate set exactly")
    } finally ivfpq.unpersist()
  }

  test("multiPlanes: one plane per corpus doubling, integer-exact") {
    import Similarity.{multiPlanes, MultiPlanesBase, MultiPlanesMax, MultiN0}
    // at/below the calibration size: the base count, so the original
    // 8-plane bucketing is preserved bit-for-bit on small corpora
    assert(multiPlanes(1L) === MultiPlanesBase)
    assert(multiPlanes(MultiN0) === MultiPlanesBase)
    // +1 plane per doubling, with exact-power-of-two boundaries landing
    // where integer math says (the float-log2 formulation gets these
    // wrong depending on libm rounding)
    assert(multiPlanes(MultiN0 + 1) === MultiPlanesBase + 1)
    assert(multiPlanes(2 * MultiN0) === MultiPlanesBase + 1)
    assert(multiPlanes(2 * MultiN0 + 1) === MultiPlanesBase + 2)
    assert(multiPlanes(10 * MultiN0) === MultiPlanesBase + 4) // sf0.1
    assert(multiPlanes(100 * MultiN0) === MultiPlanesBase + 7) // sf1
    assert(multiPlanes(Long.MaxValue / 2) === MultiPlanesMax)
    // monotone non-decreasing across a doubling sweep
    val sweep = (0 to 40).map(k => multiPlanes(1L << k))
    assert(sweep === sweep.sorted)
  }

  test("pq top-k: full rank lists, estimated dots bounded by Cauchy-Schwarz") {
    val topk = Similarity.pqTopK(spark, dir).cache()
    // every query yields a full TopK list with contiguous ranks
    val perQuery = topk.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"))
    assert(perQuery.filter($"n" =!= Similarity.TopK.toLong ||
      $"mx" =!= Similarity.TopK.toLong).isEmpty)
    // recon vectors live in the quantized grid: |est_dot| can never
    // exceed max|q|² · dims (loose integer sanity bound, catches
    // overflow/garbage reconstruction)
    val bound = 64L * 1000000L * 1000000L
    assert(topk.filter(abs($"est_dot") > bound).isEmpty)
    topk.unpersist()
  }

  test("NDCG replays bit-exactly from the graph and labels; bounds and null contract hold") {
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.evalNdcg(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    val labels = graft.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "CAST(label AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val graph = Similarity.knnGraph(spark, dir)
      .selectExpr("vec_id", "rank", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    val w = Similarity.NdcgWeights
    graph.groupBy(_._1).foreach { case (q, rows) =>
      val rels = rows.sortBy(_._2).map(t => if (labels(q) == labels(t._3)) 1L else 0L)
      var dcg = 0.0
      rels.zipWithIndex.foreach { case (rel, i) => dcg += rel.toDouble * w(i) }
      val nRel = rels.sum
      val row = out(q)
      assert(row.getLong(1) === nRel && row.getDouble(2) === dcg, s"query $q")
      if (nRel == 0) assert(row.isNullAt(3) && row.isNullAt(4))
      else {
        var idcg = 0.0
        (0 until nRel.toInt).foreach(i => idcg += w(i))
        assert(row.getDouble(3) === idcg)
        assert(row.getDouble(4) === dcg / idcg)
        assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0 + 1e-12)
      }
    }
  }

  test("MMR rerank replays the greedy selection exactly and diversifies") {
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.nonEmpty)
    val cands = Similarity.knnGraph(spark, dir)
      .selectExpr("vec_id", "neighbor", "cos2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    val vecs = Dedup.quantized(spark, dir).selectExpr("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def sim2(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      var dot = 0L; var na = 0L; var nb = 0L
      x.indices.foreach { i => dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i) }
      if (dot > 0) (dot.toDouble * dot.toDouble) / (na.toDouble * nb.toDouble) else 0.0
    }
    cands.foreach { case (q, cs) =>
      var selected = Vector.empty[(Long, Double)]
      (1 to Similarity.MmrM).foreach { pos =>
        val remaining = cs.filterNot(c => selected.exists(_._1 == c._1))
        if (remaining.nonEmpty) {
          val scoredCands = remaining.map { case (cid, rel2) =>
            val pen = if (selected.isEmpty) Double.NaN
              else selected.map(s => sim2(math.min(cid, s._1), math.max(cid, s._1))).max
            val score = if (selected.isEmpty) rel2 else 0.5 * rel2 - 0.5 * pen
            (cid, score)
          }
          val best = scoredCands.minBy { case (cid, sc) => (-sc, cid) }
          assert(out((q, pos.toLong)) === best, s"query $q pos $pos")
          selected :+= best
        }
      }
    }
  }

  test("calibration bins partition the predictions and replay accuracy exactly") {
    val dir = "/root/testdata/sf0.001"
    val preds = Similarity.knnClassify(spark, dir)
      .selectExpr("votes", "correct").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = Similarity.calibrationBins(spark, dir).collect()
    assert(out.map(_.getLong(1)).sum === preds.length.toLong)
    out.foreach { r =>
      val v = r.getLong(0)
      val inBin = preds.filter(_._1 == v)
      assert(r.getLong(1) === inBin.length.toLong)
      assert(r.getLong(2) === inBin.map(_._2).sum)
      assert(r.getDouble(3) === v.toDouble / Similarity.KnnK)
      assert(r.getDouble(4) === inBin.map(_._2).sum.toDouble / inBin.length)
    }
  }

  test("diagonal whitening replays driver-side (stats, sqrt, floor) exactly") {
    val dir = "/root/testdata/sf0.001"
    val vecs = Dedup.quantized(spark, dir).selectExpr("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val n = vecs.size
    val dims = vecs.head._2.length
    val s = Array.ofDim[BigInt](dims); val ss = Array.ofDim[BigInt](dims)
    (0 until dims).foreach { i =>
      s(i) = vecs.values.map(v => BigInt(v(i))).sum
      ss(i) = vecs.values.map(v => BigInt(v(i)) * v(i)).sum
    }
    val out = Similarity.whitenDiag(spark, dir).collect()
    assert(out.length === n)
    out.foreach { r =>
      val q = vecs(r.getLong(0))
      val w = (0 until dims).map { i =>
        val varNum = BigInt(n) * ss(i) - s(i) * s(i)
        if (varNum == 0) 0L
        else math.floor(q(i).toDouble * 1000.0 * n.toDouble /
          math.sqrt(varNum.toDouble)).toLong
      }
      assert(r.getLong(1) === w.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum)
      assert(r.getLong(2) === w.min && r.getLong(3) === w.max)
    }
  }
}
