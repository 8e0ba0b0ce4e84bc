package graft.plans

import org.apache.spark.sql.Column

/** Engine-facing aliases for the custom Catalyst array expressions (see
  * [[org.apache.spark.sql.graftexpr.LongArrayDot]] for why the
  * implementation lives under the Spark package).
  */
object ArrayOps {
  def longArrayDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.longArrayDot(a, b)

  def longArrayNormSq(a: Column): Column =
    org.apache.spark.sql.graftexpr.GraftExpressions.longArrayNormSq(a)
}
