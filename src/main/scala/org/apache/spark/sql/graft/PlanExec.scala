package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSession}

/** The one `private[sql]` doorway the SQL front door needs: turn a Catalyst
  * [[LogicalPlan]] back into a [[DataFrame]] so a plan parsed from SQL text
  * and surgically re-pointed at lake-table reads can be handed to the normal
  * analyzer/optimizer/execution stack.
  *
  * Lives in a subpackage of `org.apache.spark.sql` because
  * `classic.Dataset.ofRows` is `private[sql]` — the same public, widely-used
  * integration pattern as Delta Lake's `org.apache.spark.sql.delta` package
  * (plan-level Spark integrations need plan-level access). This file is the
  * ONLY thing in that scope; everything else stays in `graft.*`.
  */
object PlanExec {

  /** Analyze + wrap `plan` as a DataFrame on `spark`'s session state. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Wrap a parsed (unresolved) Catalyst expression as a [[Column]] — how
    * SQL-text assignment right-hand sides re-enter the DataFrame API
    * (resolution happens against whatever frame the column is applied to). */
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
