package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** SESSION-CATALOG INTEGRATION (round-13 verdict item 3): plain
  * `spark.sql(...)` resolves lake tables, time travel, and the
  * `table_changes`/`table_history` TVFs — no `LakeSql.sql` wrapper
  * needed for reads — via a [[SparkSessionExtensions]] analyzer rule,
  * the same integration shape Delta uses for its SQL surface.
  *
  * Register at session build:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
  * }}}
  *
  * The injected rule is the LakeSql front door's OWN substitution block
  * ([[LakeSql.substitutions]]), so `spark.sql` and `LakeSql.sql` produce
  * the SAME plan for the same text (spec-asserted via `sameResult`).
  * Precedence is Spark's: the rule lands at the END of the analyzer's
  * resolution batch, after Spark's own relation resolution — a temp view
  * or catalog table with a lake table's name wins, and CTE references
  * are substituted before resolution ever starts. Only still-unresolved
  * relations over registered lake names are re-pointed.
  *
  * DML works through plain `spark.sql` too, the way Delta does it: the
  * rule rewrites a root `DELETE`/`UPDATE`/`MERGE`/`INSERT` against a
  * lake table into a [[LakeDmlCommand]] — a runnable command that
  * executes the SAME front-door handler (so spark.sql and LakeSql.sql
  * produce the same commit and the same metric row), deferred to
  * command run time so analysis never side-effects. Only the DDL and
  * maintenance statements (CTAS, ALTER, OPTIMIZE, VACUUM, RESTORE,
  * CLONE) remain front-door-only.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(ResolveLakeTables)
    // the version-log TVFs register as REAL session table functions —
    // an appended resolution rule cannot serve them, because Spark's own
    // ResolveFunctions raises UNRESOLVABLE_TABLE_VALUED_FUNCTION earlier
    // in the same batch. The builder reaches the session through
    // SparkSession.active (set for the resolving thread).
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName,
        "table_changes"),
      args => LakeSql.tableChangesPlan(SparkSession.active, args)))
    ext.injectTableFunction((FunctionIdentifier("table_history"),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName,
        "table_history"),
      args => LakeSql.tableHistoryPlan(SparkSession.active, args)))
  }
}

/** The analyzer-rule twin of `LakeSql.sql`'s read resolution. Nothing
  * shadows here: by the time an [[org.apache.spark.sql.catalyst.analysis.UnresolvedRelation]]
  * reaches this rule, Spark's substitution batch has consumed CTEs and
  * its own resolution rules (earlier in the same batch) have claimed
  * temp views and catalog tables. */
final case class ResolveLakeTables(spark: SparkSession)
  extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    // DML roots are claimed BEFORE relation substitution would rewrite
    // their target out from under them; everything else gets the read
    // substitutions
    LakeSql.dmlCommand(plan,
      n => spark.sessionState.catalog.isTempView(Seq(n))) match {
      case Some((names, exec)) => LakeDmlCommand(names, exec)
      case None =>
        plan.resolveOperatorsDown(LakeSql.substitutions(spark, _ => false))
    }
}

/** DML-as-command (the Delta DeleteCommand/UpdateCommand shape): carries
  * the front-door executor for one parsed DML statement; `spark.sql`
  * executes it eagerly exactly once, and the commit happens in [[run]],
  * never during analysis. Output is the front door's metric row for the
  * statement kind (declared up front — commands must know their schema
  * before running); MERGE clause shapes that report fewer metrics
  * zero-fill the rest. */
final case class LakeDmlCommand(names: Seq[String],
                                exec: SparkSession => DataFrame)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    names.map(n => AttributeReference(n, LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val metrics = exec(session)
    val have = metrics.columns.toSet
    val row = metrics.head()
    Seq(Row(names.map(n => if (have(n)) row.getAs[Long](n) else 0L): _*))
  }
}
