package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 removed
  * the public `new Column(expr)` constructor when the Column API became
  * backend-agnostic). Needed to expose native Catalyst expressions — e.g.
  * [[graft.functions.CosineSimilarity]] — through the Column API. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
