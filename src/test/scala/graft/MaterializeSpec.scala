package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, GraphRank, Similarity}

/** Contracts of the session-scoped shared fixpoint materialization
  * ([[Materialize]]): the second consumer of a shared artifact performs
  * ZERO of the clustering / candidate-generation work — its plan starts
  * from the checkpointed leaf — and sharing never changes values.
  */
class MaterializeSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan
    p.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(p).toString
  }

  test("repeat calls return the SAME pinned artifact (no recompute)") {
    val a = Dedup.minhashClustersShared(spark, dir)
    val b = Dedup.minhashClustersShared(spark, dir)
    assert(a eq b, "second call must return the memoized frame")
    val g1 = Similarity.knnGraphShared(spark, dir)
    val g2 = Similarity.knnGraphShared(spark, dir)
    assert(g1 eq g2)
  }

  test("second consumer of the cluster map runs zero clustering shuffles") {
    Dedup.minhashClustersShared(spark, dir) // first consumer pays
    val hist = Dedup.clusterSizeHist(spark, dir)
    val plan = finalPlan(hist)
    // the consumer's plan must start from the checkpointed leaf — none
    // of the signature kernel, the banded self-join, or the fixpoint's
    // per-round joins may reappear
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("minhash_sig"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    // two bounded aggregations = at most two keyed exchanges
    val shuffles = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(shuffles <= 2, s"$shuffles keyed exchanges:\n$plan")
  }

  test("second consumer of the k-NN graph runs zero candidate-join work") {
    Similarity.knnGraphShared(spark, dir)
    val deg = GraphRank.assortativity(spark, dir)
    val plan = finalPlan(deg)
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("lsh_bucket_pack"),
      s"LSH bucketing re-executed by a shared-graph consumer:\n$plan")
  }

  test("sharing never changes values: histogram over shared == rebuilt map") {
    val viaShared = Dedup.clusterSizeHist(spark, dir)
      .orderBy($"cluster_size").collect().toSeq
    val rebuilt = Dedup.minhashClusters(spark, dir)
      .groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy($"sz".as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_size", $"n_clusters",
        ($"cluster_size" * $"n_clusters").as("n_docs"))
      .orderBy($"cluster_size").collect().toSeq
    assert(viaShared == rebuilt)
  }

  test("second consumer of the ANN ground truth starts at the checkpointed leaf") {
    Similarity.bruteForceTopKShared(spark, dir) // first consumer pays
    val rec = Similarity.lshRecall(spark, dir)
    val plan = finalPlan(rec)
    assert(plan.contains("ExistingRDD"),
      s"recall must read the pinned brute-force table:\n$plan")
  }

  test("pipeline consumers of the pair set run zero signature work") {
    Dedup.minhashPairsShared(spark, dir) // first consumer pays
    val funnel = graft.functions.CorpusPipeline.dedupFunnel(spark, dir)
    val plan = finalPlan(funnel)
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("minhash_sig"),
      s"dedupFunnel re-ran the banded self-join:\n$plan")
  }

  test("nested shared() builds are safe (build runs outside the map op)") {
    // Shared builders nest in production (clusters ← pairs, components ←
    // undirected ← graph). ConcurrentHashMap forbids mapping functions
    // that update other keys of the same map — the old build-inside-
    // computeIfAbsent shape could throw "Recursive update" whenever
    // nested keys landed in the same bin. Many distinct key pairs so at
    // least some share a bin regardless of table layout.
    val s = spark.newSession()
    (0 until 64).foreach { i =>
      val outer = Materialize.shared(s, dir, s"nest_outer_$i") {
        Materialize.shared(s, dir, s"nest_inner_$i")(
          spark.range(3).toDF("v")).withColumn("w", lit(i))
      }
      assert(outer.count() === 3)
    }
    assert(Materialize.pinnedCount(s) === 128)
    Materialize.invalidate(s)
  }

  test("sequential sessions never alias: each gets its own artifact") {
    // identityHashCode keying could hand a new session a dead session's
    // pinned frame after GC reuse; sessionUUID keying cannot. Proxy: two
    // sequential sessions pin DIFFERENT builds under the same
    // (dir, name) and each must see its own.
    val s1 = spark.newSession()
    val a1 = Materialize.shared(s1, dir, "alias_probe")(
      spark.range(1).select(lit(1).as("tag")))
    val s2 = spark.newSession()
    val a2 = Materialize.shared(s2, dir, "alias_probe")(
      spark.range(1).select(lit(2).as("tag")))
    assert(a1.head.getInt(0) === 1)
    assert(a2.head.getInt(0) === 2, "session 2 served session 1's artifact")
    assert(!(a1 eq a2))
    Materialize.invalidate(s1); Materialize.invalidate(s2)
  }

  test("mutating the corpus dir invalidates the pinned artifact") {
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "mat-stale").toFile
    try {
      val s = spark.newSession()
      var builds = 0
      def artifact = Materialize.shared(s, tmp.getPath, "stale_probe") {
        builds += 1; spark.range(2).toDF("v")
      }
      artifact.count(); artifact.count()
      assert(builds === 1, "unchanged dir must serve the pinned frame")
      // mutate the dir: a new file with a strictly newer mtime (explicit,
      // so coarse filesystem timestamp granularity can't mask the change)
      val f = new java.io.File(tmp, "new-part.parquet")
      f.createNewFile()
      f.setLastModified(System.currentTimeMillis() + 10000)
      artifact.count()
      assert(builds === 2, "mutated dir must rebuild, not serve stale")
      artifact.count()
      assert(builds === 2, "rebuild must re-pin at the new stamp")
      Materialize.invalidate(s)
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }

  private def checkpointRddId(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.getOrElse(fail("pinned frame is not a checkpoint leaf"))

  test("invalidate eagerly unpersists the pinned checkpoint blocks") {
    val s = spark.newSession()
    val a = Materialize.shared(s, dir, "unpersist_probe")(
      spark.range(10).toDF("v"))
    val id = checkpointRddId(a)
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "localCheckpoint must register its RDD as persistent")
    Materialize.invalidate(s)
    assert(!spark.sparkContext.getPersistentRDDs.contains(id),
      "invalidate must unpersist eagerly, not wait for the ContextCleaner")
  }

  test("staleness rebuild DEFERS the old blocks; invalidate reclaims both generations") {
    // the grace contract: a consumer still executing against the old
    // frame during a mid-session corpus mutation keeps its snapshot —
    // eager unpersist of a lineage-truncated checkpoint would fail it
    // with "checkpoint block not found"
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "mat-grace").toFile
    try {
      val s = spark.newSession()
      var gen = 0
      def artifact = Materialize.shared(s, tmp.getPath, "grace_probe") {
        gen += 1; spark.range(4 + gen).toDF("v")
      }
      val first = artifact
      val firstId = checkpointRddId(first)
      val f = new java.io.File(tmp, "new-part.parquet")
      f.createNewFile()
      f.setLastModified(System.currentTimeMillis() + 10000)
      val second = artifact
      assert(gen === 2, "mutated dir must rebuild")
      assert(second.count() === 6)
      // old generation must remain fully readable until invalidate
      assert(spark.sparkContext.getPersistentRDDs.contains(firstId),
        "staleness eviction must NOT eagerly unpersist the old frame")
      assert(first.count() === 5,
        "a consumer of the pre-mutation frame keeps its snapshot")
      val secondId = checkpointRddId(second)
      Materialize.invalidate(s)
      assert(!spark.sparkContext.getPersistentRDDs.contains(firstId),
        "invalidate must drain the deferred-drop queue")
      assert(!spark.sparkContext.getPersistentRDDs.contains(secondId))
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }

  test("a dir rewrite that moves the stamp BACKWARDS still rebuilds") {
    // cp -p / tar-extract over existing files can preserve OLDER
    // mtimes; a strictly-newer staleness check served those stale
    // forever
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "mat-back").toFile
    try {
      val s = spark.newSession()
      val f = new java.io.File(tmp, "part.parquet")
      f.createNewFile()
      f.setLastModified(System.currentTimeMillis() + 60000)
      var builds = 0
      def artifact = Materialize.shared(s, tmp.getPath, "back_probe") {
        builds += 1; spark.range(2).toDF("v")
      }
      artifact.count()
      assert(builds === 1)
      // in-place rewrite with a preserved OLD timestamp: max mtime drops
      f.setLastModified(System.currentTimeMillis() - 3600000)
      tmp.setLastModified(System.currentTimeMillis() - 3600000)
      artifact.count()
      assert(builds === 2, "backwards stamp movement must invalidate too")
      Materialize.invalidate(s)
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }

  test("eviction during an in-flight build is safe (builtOpt-None path)") {
    // a holder evicted while its build thread runs has no checkpoint
    // yet — drop() must no-op (blocks stay with the build thread's
    // live frame) and the build must complete usable
    val s = spark.newSession()
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var result: org.apache.spark.sql.DataFrame = null
    @volatile var err: Throwable = null
    val t = new Thread(() => {
      try result = Materialize.shared(s, dir, "midbuild_probe") {
        started.countDown()
        release.await()
        spark.range(3).toDF("v")
      } catch { case e: Throwable => err = e }
    })
    t.start()
    assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS))
    Materialize.invalidate(s) // evicts the holder mid-build
    release.countDown()
    t.join(30000)
    assert(err == null, s"mid-build eviction broke the build: $err")
    assert(result.count() === 3, "the build thread's frame must stay usable")
    Materialize.invalidate(s)
  }

  test("artifacts are keyed per (session, dir); invalidate drops them") {
    val before = Materialize.pinnedCount(spark)
    assert(before > 0, "suite above must have pinned artifacts")
    // a fresh session must not see this session's artifacts
    val s2 = spark.newSession()
    assert(Materialize.pinnedCount(s2) === 0)
    Materialize.invalidate(spark)
    assert(Materialize.pinnedCount(spark) === 0)
    // next call rebuilds (fresh instance, same values); the cluster
    // builder itself consumes the shared pair set, so TWO artifacts pin
    val again = Dedup.minhashClustersShared(spark, dir)
    assert(Materialize.pinnedCount(spark) === 2)
    assert(again.count() > 0)
  }
}
