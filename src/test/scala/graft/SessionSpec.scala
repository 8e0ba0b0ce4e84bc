package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Pins the data-sized shuffle-width auto-default: width =
  * `max(cores, ⌈input bytes / 128 MB⌉)` — the standard per-partition
  * sizing rule, floored at the core count. An r15 A/B at sf1 measured
  * a per-scale-factor multiplier (width 96 on local[32]) at 1.84× the
  * wall of the core-count width on identical queries, so above the
  * core count extra partitions must be earned by actual data volume.
  * An explicit SPARK_GRAFT_SHUFFLE still wins over the installed
  * default.
  */
class SessionSpec extends AnyFunSuite {
  private val c = Session.cpus.toInt

  test("autoShuffleWidth floors at the core count on every local fixture") {
    // every local sf dir is well under cores × 128 MB of parquet
    assert(Session.autoShuffleWidth("/root/testdata/sf0.001") === c)
    assert(Session.autoShuffleWidth("/root/testdata/sf0.01") === c)
    assert(Session.autoShuffleWidth("/root/testdata/sf0.1") === c)
    assert(Session.autoShuffleWidth("/tmp/does-not-exist") === c)
  }

  test("autoShuffleWidth grows once data exceeds cores x 128 MB") {
    // synthetic dir with sparse files: size() reports logical length,
    // so no real disk is consumed
    val dir = java.nio.file.Files.createTempDirectory("graft-width")
    try {
      val f = dir.resolve("big.parquet")
      val ch = java.nio.channels.FileChannel.open(f,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        ch.position((c.toLong + 5) * Session.TargetPartitionBytes - 1)
        ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0)))
      } finally ch.close()
      assert(Session.autoShuffleWidth(dir.toString) === c + 5)
    } finally {
      java.nio.file.Files.deleteIfExists(dir.resolve("big.parquet"))
      java.nio.file.Files.deleteIfExists(dir)
      ()
    }
  }

  test("sizeShuffleFor installs the auto default; env override wins") {
    val before = sys.props.get("graft.shuffle.auto")
    val beforeOc = sys.props.get("graft.opencost.auto")
    try {
      val w = Session.sizeShuffleFor("/root/testdata/sf0.1")
      if (sys.env.contains("SPARK_GRAFT_SHUFFLE"))
        assert(w === sys.env("SPARK_GRAFT_SHUFFLE").toInt)
      else {
        assert(w === c)
        assert(Session.shufflePartitions === c.toString)
      }
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(s) => sys.props(k) = s; ()
        case None => sys.props.remove(k); ()
      }
      restore("graft.shuffle.auto", before)
      restore("graft.opencost.auto", beforeOc)
    }
  }

  test("autoOpenCost: single-row-group fixtures derive a whole-file stride") {
    // every sf0.1 table is ONE row group per file, so the derived
    // stride is a whole (>= 1 MB) file size — splits never subdivide
    // a row group into empty tasks, unlike a fixed small floor
    val oc = Session.autoOpenCost("/root/testdata/sf0.1")
    assert(oc >= 1L * 1024 * 1024 && oc <= 4L * 1024 * 1024, oc)
    // unreadable/absent dirs fail safe to Spark's default
    assert(Session.autoOpenCost("/tmp/does-not-exist") === 4L * 1024 * 1024)
  }

  test("autoOpenCost: multi-row-group layout derives the row-group stride") {
    // write a corpus-shaped parquet with small row groups (the sf1
    // layout): the open-cost floor must drop to ~the row-group stride
    // so scans split to the machine instead of bytes/4MB tasks (the
    // r16 profile measured 2-task corpus scans at sf1 under the fixed
    // 4 MB floor — see OPTIMIZATION_r16.md)
    val spark = TestSpark.spark
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-opencost-w")
    val dir = java.nio.file.Files.createTempDirectory("graft-opencost")
    try {
      // payload must not collapse under snappy (a constant string
      // compresses below the 1 MB small-file cutoff) — cheap hex noise
      spark.range(20000).map(i => (i,
          (1 to 40).map(k => ((i * 31 + k) * 2654435761L).toHexString)
            .mkString(" "))).toDF("id", "text")
        .coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString)
        .parquet(out.toString)
      // the driver layout is ONE bare file per table directly in the
      // dir — move the part file there under the table name
      val part = java.nio.file.Files.list(out).iterator().asScala
        .find(p => p.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, dir.resolve("docs.parquet"))
      val oc = Session.autoOpenCost(dir.toString)
      assert(oc >= 64L * 1024 && oc < 4L * 1024 * 1024,
        s"expected a sub-4MB row-group stride, got $oc")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(out.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      ()
    }
  }
}
