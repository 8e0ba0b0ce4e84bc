package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sf-derived shuffle-width auto-default: per-task shuffle
  * state is data÷width, so the width must track the scale factor
  * (`cpus × max(1, ⌈3·sf⌉)` — the r14 sf3 basket probe's width-96
  * control demonstrated the fixed-width state growth this sizes away),
  * while an explicit SPARK_GRAFT_SHUFFLE still wins over the
  * installed default.
  */
class SessionSpec extends AnyFunSuite {
  private val c = Session.cpus.toInt

  test("sfOf parses sf-tagged directory basenames") {
    assert(Session.sfOf("/root/testdata/sf0.01") === Some(0.01))
    assert(Session.sfOf("/root/.graft/sf1") === Some(1.0))
    assert(Session.sfOf("/root/.graft/sf3") === Some(3.0))
    assert(Session.sfOf("/tmp/fixtures") === None)
    assert(Session.sfOf("/tmp/sfoo") === None) // non-numeric suffix
  }

  test("autoShuffleWidth: cpus at driver scales, 3x per sf above the baseline") {
    assert(Session.autoShuffleWidth("/root/testdata/sf0.001") === c)
    assert(Session.autoShuffleWidth("/root/testdata/sf0.01") === c)
    assert(Session.autoShuffleWidth("/root/testdata/sf0.1") === c)
    assert(Session.autoShuffleWidth("/root/.graft/sf1") === 3 * c)
    assert(Session.autoShuffleWidth("/root/.graft/sf3") === 9 * c)
    assert(Session.autoShuffleWidth("/tmp/not-sf-tagged") === c)
  }

  test("sizeShuffleFor installs the auto default; env override wins") {
    val before = sys.props.get("graft.shuffle.auto")
    try {
      val w = Session.sizeShuffleFor("/root/.graft/sf1")
      if (sys.env.contains("SPARK_GRAFT_SHUFFLE"))
        assert(w === sys.env("SPARK_GRAFT_SHUFFLE").toInt)
      else {
        assert(w === 3 * c)
        assert(Session.shufflePartitions === (3 * c).toString)
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
