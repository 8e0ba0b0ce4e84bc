package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD2 history invariants that the value-level oracle cannot state
  * directly: interval tiling, single current row, run collapsing, and
  * the one-shuffle plan shape.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private lazy val hist = EventOps.scd2History(spark, sf).cache()

  test("exactly one current row per key, and it is the last version") {
    val byUser = hist.groupBy("user_id")
      .agg(
        sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"),
        max("version").as("max_v"),
        max(when(col("is_current"), col("version"))).as("current_v"))
    assert(byUser.filter("n_current <> 1 OR current_v <> max_v").isEmpty)
  }

  test("intervals tile: each version's valid_to = next version's valid_from") {
    val w = Window.partitionBy("user_id").orderBy("version")
    val gaps = hist
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    assert(gaps.isEmpty, "history intervals must tile with no gaps/overlaps")
  }

  test("runs are collapsed: consecutive versions never repeat the attr") {
    val w = Window.partitionBy("user_id").orderBy("version")
    val dups = hist
      .withColumn("prev_attr", lag(col("attr"), 1).over(w))
      .filter(col("prev_attr") === col("attr"))
    assert(dups.isEmpty, "adjacent history rows with equal attr must collapse")
  }

  test("versions are contiguous from 1") {
    val bad = hist.groupBy("user_id")
      .agg(min("version").as("lo"), max("version").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.isEmpty)
  }

  test("plan shape: one keyed exchange — both window passes share the shuffle") {
    // drop the suite cache first — cache substitution would replace the
    // whole plan with an InMemoryTableScan and make this test vacuous
    hist.unpersist(blocking = true)
    val plan = EventOps.scd2History(spark, sf).queryExecution.executedPlan
    val inner = plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(plan)
    val exchanges = inner.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if s.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => s
    }.size
    assert(exchanges == 1,
      s"scd2History should repartition the change log exactly once, saw $exchanges")
  }
}
