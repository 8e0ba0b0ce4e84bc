package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The blocked fuzzy join must return exactly the pairs an exhaustive
  * driver-side scorer finds within blocks, with canonical orientation.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ColStr

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked pairs match an exhaustive in-block scorer at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val names = graft.Tables.part(spark, sf)
      .groupBy($"p_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- names.keys; b <- names.keys
      if a < b && a.split(" ").last == b.split(" ").last && lev(a, b) <= 3
    } yield (a, b, lev(a, b).toLong, names(a), names(b))).toSet

    val got = RelationalOps.fuzzyBlockedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty, "threshold 3 should link adjective variants of a noun")
  }
}
