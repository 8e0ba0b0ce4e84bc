package graft

/** Micro-bench for iteration: runMain graft.Time <query> [query...] —
  * warms each query once, then reports the best of three timed noop
  * writes (same methodology as [[Bench]], minus the full-suite sweep).
  * SPARK_GRAFT_SF_DIR selects the scale (default sf0.1).
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get("graft-time")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      spark.catalog.clearCache()
      val best = (1 to 3).map { _ =>
        val s = once(); spark.catalog.clearCache(); s
      }.min
      println(f"[time] $name%-28s $best%.3f s (best of 3)")
    }
    spark.stop()
  }
}
