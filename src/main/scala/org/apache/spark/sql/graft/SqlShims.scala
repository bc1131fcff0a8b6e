package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Two `private[sql]` seams the DML planner strategy needs, re-exported
  * from inside the `org.apache.spark.sql` package — the standard pattern
  * for Spark-native table-format libraries (Delta ships its whole
  * codebase under `org.apache.spark.sql.delta` for the same reason):
  *
  *  - a `LogicalPlan` → `DataFrame` constructor, to hand a MERGE
  *    statement's already-analyzed SOURCE subplan to the engine verbs
  *    without re-parsing it;
  *  - the catalyst `Expression` ⇄ `Column` bridge (Spark 4's public
  *    `Column` wraps a `ColumnNode`, not an `Expression`), to carry a
  *    statement's predicates into `DataFrame.where`.
  *
  * Nothing else from the private surface is used; keep it that way.
  */
object SqlShims {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
