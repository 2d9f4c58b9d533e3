package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

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
  * command run time so analysis never side-effects. The EXTENSION
  * grammar (OPTIMIZE, VACUUM, RESTORE, SHALLOW CLONE, REPLACE WHERE,
  * CONVERT TO LAKE) reaches plain spark.sql through the injected
  * [[GraftSqlParser]] (the DeltaSqlParser shape). Only the
  * Catalyst-parsed DDL (CTAS, ALTER) remains front-door-only.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(ResolveLakeTables)
    // EXTENSION GRAMMAR through plain spark.sql — the DeltaSqlParser
    // shape: a delegating parser intercepts the statements Spark's ANTLR
    // grammar has no productions for (OPTIMIZE, VACUUM, RESTORE, SHALLOW
    // CLONE, INSERT … REPLACE WHERE, CONVERT TO LAKE) and wraps each into
    // a runnable command executing the front door's own handler — same
    // commit, same metric row, deferred to command run time. Everything
    // else delegates to Spark's parser untouched.
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
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
    // Fast path: everything this rule rewrites — unresolved relations,
    // time travel, the TVFs, claimable DML roots — keeps the tree
    // UNRESOLVED, so a resolved plan has nothing for us. The analyzer
    // re-runs its resolution batch to fixpoint over EVERY session query
    // (and every streaming micro-batch), so without this guard the
    // full-tree substitution walk taxes every non-lake query too.
    // `resolved` is a cached lazy val — the check is near-free at
    // fixpoint. (DML against a RESOLVED non-lake target, e.g. a temp
    // view, skips us and fails loudly in Spark's own v2-table check —
    // the same outcome the shadowed-target backstop produces.)
    if (plan.resolved) plan
    else LakeSql.dmlCommand(plan,
      n => spark.sessionState.catalog.isTempView(Seq(n))) match {
      case Some((names, exec)) =>
        LakeDmlCommand(LakeSql.longSchema(names), exec)
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
final case class LakeDmlCommand(outSchema: StructType,
                                exec: SparkSession => DataFrame)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    outSchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(session: SparkSession): Seq[Row] = {
    val metrics = exec(session)
    if (outSchema.fields.forall(_.dataType == LongType)) {
      // metric-row statements: ONE row, zero-filled for clause shapes
      // that report fewer metrics
      val have = metrics.columns.toSet
      val row = metrics.head()
      Seq(Row(outSchema.fieldNames.toSeq
        .map(n => if (have(n)) row.getAs[Long](n) else 0L): _*))
    } else
      // listing statements (VACUUM DRY RUN, DESCRIBE DETAIL): the
      // handler's rows verbatim — bounded by file/version counts
      metrics.collect().toSeq
  }
}

/** Delegating session parser (the DeltaSqlParser integration shape): an
  * extension-grammar statement — recognized by [[LakeSql.extendedStatement]],
  * which also declares its metric-row schema — parses to a
  * [[LakeDmlCommand]] running the front door's own dispatcher, so plain
  * `spark.sql("OPTIMIZE t ZORDER BY (c)")` and `LakeSql.sql` are the same
  * code path; every other string delegates to Spark's parser verbatim. */
final class GraftSqlParser(delegate: ParserInterface)
  extends ParserInterface {
  override def parsePlan(text: String): LogicalPlan =
    LakeSql.extendedStatement(text) match {
      case Some(schema) => LakeDmlCommand(schema, s => LakeSql.sql(s, text))
      case None => delegate.parsePlan(text)
    }
  override def parsePlanWithParameters(text: String,
                                       ctx: ParameterContext): LogicalPlan =
    LakeSql.extendedStatement(text) match {
      case Some(schema) => LakeDmlCommand(schema, s => LakeSql.sql(s, text))
      case None => delegate.parsePlanWithParameters(text, ctx)
    }
  override def parseExpression(t: String): Expression =
    delegate.parseExpression(t)
  override def parseTableIdentifier(t: String): TableIdentifier =
    delegate.parseTableIdentifier(t)
  override def parseFunctionIdentifier(t: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(t)
  override def parseMultipartIdentifier(t: String): Seq[String] =
    delegate.parseMultipartIdentifier(t)
  override def parseQuery(t: String): LogicalPlan = delegate.parseQuery(t)
  override def parseRoutineParam(t: String): StructType =
    delegate.parseRoutineParam(t)
  override def parseTableSchema(t: String): StructType =
    delegate.parseTableSchema(t)
  override def parseDataType(t: String): DataType = delegate.parseDataType(t)
}
