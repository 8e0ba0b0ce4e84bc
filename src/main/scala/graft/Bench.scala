package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...}}.
  *
  * Methodology: each query is executed twice against the SAME target
  * directory — the first run settles JIT, whole-stage-codegen compilation
  * and file-listing caches for the exact plan shapes being measured
  * (warming at a smaller SF would compile different plans: small tables
  * broadcast where the target SF sort-merges); the second run is timed.
  * The Spark cache is cleared between executions — operators that
  * `cache()` subplans would otherwise accumulate storage across the
  * suite — and the teardown is excluded from the timed region.
  * Materialize-pinned fixpoint artifacts are dropped ONCE, between the
  * warm and measure phases (not per query): the first measured
  * consumer pays each build exactly once — the cost a real pipeline
  * pays when it materializes the artifact — and later consumers
  * measure the shared-read path.
  *
  * Uses the `noop` sink so the whole plan (projections, sorts) executes —
  * `count()` would let Catalyst prune most of the work. A query that
  * throws reports -1 so a regression is visible instead of silently
  * timed as fast.
  *
  * Local iteration aids (the driver always runs with no args): extra
  * args restrict the run to those query names; `-explain` additionally
  * prints each selected query's formatted physical plan before timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val subset = args.filterNot(_ == "-explain").toSet
    val spark = Session.get("graft-bench")
    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        label: String): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name $label failed: ${e.getMessage}"); false
      }
    val sorted = SparkEntry.queries.toSeq
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .sortBy(_._1)
    if (explain) sorted.foreach { case (name, fn) =>
      System.err.println(s"==== $name ====")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => System.err.println(s"explain failed: ${e.getMessage}") }
    }
    sorted.foreach { case (name, fn) =>
      runOnce(name, fn, "warm")
      spark.catalog.clearCache()
    }
    // Honest fixpoint accounting: the warm pass pins the Materialize
    // artifacts (cluster map, k-NN graph), and the between-query
    // clearCache() deliberately does not evict them — so without this,
    // the measured region would charge the fixpoint builds to ZERO
    // queries. Dropping them here makes the FIRST measured consumer pay
    // each build exactly once — the cost a real pipeline pays when it
    // materializes the artifact one time — while later consumers still
    // show the shared-read cost.
    Materialize.invalidate(spark)
    val results = sorted.map { case (name, fn) =>
      // GC barrier: without it, garbage from the PREVIOUS query's
      // measurement (HLL register arrays, shuffle buffers, broadcast
      // cleanup) is collected during THIS query's timed region —
      // measured drift of up to 2.5× on whichever query follows an
      // allocation-heavy one. The barrier is outside the timed region,
      // so each query is measured from the same steady state.
      System.gc()
      Thread.sleep(200)
      val t0 = System.nanoTime()
      val ok = runOnce(name, fn, "measure")
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // teardown outside the timed region
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // The driver's BENCH_r<N>.json artifact tail-truncates the stdout
    // line, losing all but the last ~60 per-query timings — so only a
    // minority of queries were round-over-round comparable. Persist the
    // COMPLETE per-query map ourselves (one query per line, name-sorted
    // → stable diffs), round-stamped from the driver artifacts already
    // in the repo (BENCH_r05.json present ⇒ this run belongs to r6).
    // Full-suite runs only: subset runs would clobber the round's
    // artifact with a partial map.
    if (subset.isEmpty) {
      val repo = new java.io.File("/root/repo")
      val round = repo.listFiles((_, n) => n.matches("BENCH_r\\d+\\.json"))
        .map(_.getName.replaceAll("\\D", "").toInt).foldLeft(0)(math.max) + 1
      val body = results.map { case (k, v) => s"""  "$k": $v""" }
        .mkString(s"""{\n  "_sf": "$sfDir",\n  "_total_sec": $total,\n""", ",\n", "\n}\n")
      // non-driver scales (e.g. the sf1 audit runs) get their own
      // artifact name so they never clobber the round's sf0.1 record
      val sfTag = new java.io.File(sfDir).getName
      val scale = if (sfTag == "sf0.1") "" else s"_$sfTag"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/root/repo/bench_full${scale}_r$round.json"), body)
    }
    spark.stop()
  }
}
