/* Bridge into Spark's package-private Dataset/Column internals, needed
 * to build DataFrames from custom logical plans (same pattern as public
 * extension libraries — see SNIPPETS.md [1], [3]). Kept minimal: two
 * factory methods, no behavior.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftSqlBridge {

  /** DataFrame from a custom LogicalPlan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst expression behind a Column (Spark 4 hides Column.expr). */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** The analyzed logical plan of a DataFrame. */
  def planOf(df: Dataset[_]): LogicalPlan = df.queryExecution.analyzed
}
