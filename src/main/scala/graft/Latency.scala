package graft

/** Driver-latency breakdown of registered queries — the round-17
  * measurement aid for the fixed per-query overhead that dominates the
  * sf0.1 bench (VERDICT r16 item 2: ~0.3-0.5 s/query of non-compute wall
  * across 273 queries; the 8-core suite beats the 32-core one because
  * the wall is stage-sequencing latency, not compute).
  *
  * [[Profile]] answers "which STAGE is slow"; this answers "where does
  * the wall go when no stage is slow": DataFrame construction (file
  * listing + schema inference), analysis / optimization / physical
  * planning (from `QueryPlanningTracker` of the EXECUTED plan, captured
  * via `QueryExecutionListener`), the union of job intervals (actual
  * scheduled execution), and the remaining gap (AQE stage re-planning,
  * codegen, listener/bus latency between jobs).
  *
  * Usage: `sbt "runMain graft.Latency <query> [query...]"` with the
  * [[Bench]] env contract. Dev measurement tool only: no artifact, not
  * part of the driver contract.
  */
object Latency {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Session.sizeShuffleFor(sfDir)
    val spark = Session.get("graft-latency")
    val sel = SparkEntry.queries.toSeq.filter(q => args.contains(q._1))
      .sortBy(_._1)
    require(sel.nonEmpty, s"no matching queries in ${args.mkString(",")}")

    // job intervals + counts from the scheduler side
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val aqeUpdates = new java.util.concurrent.atomic.AtomicInteger
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStarts.put(e.jobId, e.time); ()
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStarts.remove(e.jobId)
          if (s != null) jobs.add((s.longValue, e.time)); ()
        }
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) taskCpuNs.addAndGet(m.executorCpuTime)
          tasks.incrementAndGet(); ()
        }
        override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
          if (e.getClass.getSimpleName.contains("SQLAdaptiveExecutionUpdate")) {
            aqeUpdates.incrementAndGet(); ()
          }
      })

    // planning phases of the EXECUTED write (df.write re-plans the whole
    // tree; forcing df.queryExecution first would double-plan and
    // mis-attribute the cost)
    @volatile var phases: Map[String, Long] = Map.empty
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        phases = qe.tracker.phases.map { case (k, v) => k -> (v.endTimeMs - v.startTimeMs) }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    def drain(): Unit = {
      org.apache.spark.sql.graftexpr.ListenerDrain.drain(spark.sparkContext); ()
    }
    def unionMs(iv: Seq[(Long, Long)]): Long = {
      val s = iv.sortBy(_._1)
      var tot = 0L; var curS = Long.MinValue; var curE = Long.MinValue
      s.foreach { case (a, b) =>
        if (a > curE) { tot += math.max(0L, curE - curS); curS = a; curE = b }
        else curE = math.max(curE, b)
      }
      tot + math.max(0L, curE - curS)
    }

    sel.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"latency: $name")
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      (1 to 3).foreach { rep =>
        drain(); System.gc(); Thread.sleep(200)
        jobs.clear(); jobStarts.clear(); aqeUpdates.set(0)
        taskCpuNs.set(0); tasks.set(0); phases = Map.empty
        val epoch0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tCon = (System.nanoTime() - t0) / 1e6
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e6
        drain()
        spark.catalog.clearCache()
        import scala.jdk.CollectionConverters._
        val iv = jobs.asScala.toSeq
        val jobMs = unionMs(iv)
        val firstJob = if (iv.isEmpty) -1L else iv.map(_._1).min - epoch0
        val ph = phases.map { case (k, v) => s"$k=${v}ms" }.toSeq.sorted.mkString(" ")
        println(f"$name rep$rep wall=$wall%7.1f ms con=$tCon%6.1f ms " +
          f"jobs=${iv.size}%3d jobUnion=$jobMs%5d ms gap=${wall - tCon - jobMs}%7.1f ms " +
          f"tasks=${tasks.get}%4d cpu=${taskCpuNs.get / 1e9}%6.2f s aqeUpd=${aqeUpdates.get}%3d " +
          f"firstJobDelay~${firstJob}%d ms  [$ph]")
      }
    }
    spark.stop()
  }
}
