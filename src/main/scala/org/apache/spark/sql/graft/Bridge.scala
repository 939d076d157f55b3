package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin forwarder to Spark's `private[sql]` Column↔Expression converters —
  * the supported way for an external library to wrap a custom Catalyst
  * `Expression` into a user-facing `Column` on Spark 4 (the pre-4.0
  * `new Column(expr)` constructor is gone). Lives in the
  * `org.apache.spark.sql` package tree solely for access; no Spark
  * internals are reimplemented here. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — the `Dataset.ofRows`
    * doorway custom operators need to surface a custom `LogicalPlan`
    * node through the public Column API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
