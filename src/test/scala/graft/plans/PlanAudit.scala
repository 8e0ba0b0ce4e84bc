package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Shared physical-plan audit helpers for the plan-contract specs. */
object PlanAudit {

  /** Every CodegenFallback expression anywhere in the physical plan
    * (recursing through AQE wrappers and subqueries) — the interpreted
    * islands the kernel wave exists to eliminate. An empty result means
    * every per-row expression in the plan participates in codegen.
    *
    * Aggregate functions are exempt: their buffers run through the
    * aggregation operator's imperative update path whatever traits they
    * mix in — the contract here is about per-ROW projection/filter
    * islands, the towers that execute once per input row.
    */
  def codegenFallbacks(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    def walk(p: SparkPlan): Seq[String] = {
      val here = unwrap(p)
      val own = here.expressions.flatMap(_.collect {
        case cf: CodegenFallback
            if !cf.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction] =>
          cf.prettyName
      })
      val subs = here.subqueries.flatMap(walk)
      own ++ subs ++ here.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
