package graft

/** Per-stage profile of registered queries — the measurement aid behind
  * the r16 optimization round (guide §1/§7: decide whether wall-clock
  * goes to scan parallelism, shuffle, or serial stages BEFORE changing
  * anything; the UI is disabled in this environment, so this prints the
  * stage table the UI would show).
  *
  * Usage: `sbt "runMain graft.Profile <query> [query...]"` with the
  * same `SPARK_GRAFT_SF_DIR` contract as [[Bench]]. Each query runs
  * once warm (JIT/codegen/file listing) and once profiled; per stage it
  * prints task count, wall of the stage (submission→completion),
  * summed task run/cpu time, GC ms, and the max single task runtime —
  * `tasks=1` on a heavy stage or `maxTask ≈ stageWall` on a wide one is
  * the straggler/parallelism signal. Dev measurement tool only: no
  * artifact, does not participate in the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Session.sizeShuffleFor(sfDir)
    val spark = Session.get("graft-profile")
    val sel = SparkEntry.queries.toSeq.filter(q => args.contains(q._1))
      .sortBy(_._1)
    require(sel.nonEmpty, s"no matching queries in ${args.mkString(",")}")
    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
        runMs: Long, cpuMs: Long, gcMs: Long, maxTaskMs: Long,
        shRead: Long, shWrite: Long, inBytes: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = if (e.taskInfo != null) e.taskInfo.duration else 0L
          maxTask.merge(e.stageId, d, (a, b) => math.max(a, b))
          ()
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          stages.add(St(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks,
            wall, m.executorRunTime, m.executorCpuTime / 1000000,
            m.jvmGCTime, maxTask.getOrDefault(si.stageId, 0L),
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead))
          ()
        }
      })
    sel.foreach { case (name, fn) =>
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(s"profile: $name")
      run(); spark.catalog.clearCache() // warm rep
      org.apache.spark.sql.graftexpr.ListenerDrain.drain(spark.sparkContext)
      stages.clear(); maxTask.clear()
      System.gc(); Thread.sleep(200)
      val wall = run()
      org.apache.spark.sql.graftexpr.ListenerDrain.drain(spark.sparkContext)
      println(f"==== $name wall=$wall%.3f s ====")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_.id).foreach { s =>
        println(f"  stage ${s.id}%4d tasks=${s.tasks}%4d wall=${s.wallMs}%6d ms " +
          f"run=${s.runMs}%7d ms cpu=${s.cpuMs}%7d ms gc=${s.gcMs}%5d ms " +
          f"maxTask=${s.maxTaskMs}%6d ms in=${s.inBytes >> 20}%4d MB " +
          f"shR=${s.shRead >> 20}%4d MB shW=${s.shWrite >> 20}%4d MB  ${s.name}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
