package graft

import org.scalatest.funsuite.AnyFunSuite

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
    try {
      val w = Session.sizeShuffleFor("/root/testdata/sf0.1")
      if (sys.env.contains("SPARK_GRAFT_SHUFFLE"))
        assert(w === sys.env("SPARK_GRAFT_SHUFFLE").toInt)
      else {
        assert(w === c)
        assert(Session.shufflePartitions === c.toString)
      }
    } finally {
      before match {
        case Some(v) => sys.props("graft.shuffle.auto") = v
        case None => sys.props.remove("graft.shuffle.auto")
      }
      ()
    }
  }
}
