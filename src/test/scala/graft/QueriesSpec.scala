package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs on sf0.001 and returns rows;
  * oracle coverage is complete; the flagship entry works. (Value-level
  * correctness is the driver's DuckDB gate, replicated locally by
  * tools/local_verify.py.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
