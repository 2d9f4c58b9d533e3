package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW QUERY REWRITE — the §2.11 extension-point piece that
  * makes gold summary tables transparent: a `Rule[LogicalPlan]` that
  * rewrites an aggregation over a registered BASE scan onto its
  * (finer-grained) SUMMARY table whenever
  *
  *  - every grouping expression is a summary dimension (the query's grain
  *    is coarser-or-equal), and
  *  - every aggregate re-aggregates from the summary's partials:
  *    `sum(x) → sum(sum_x)`, `count(*)/count(1) → sum(cnt)` — the
  *    classic partial-aggregate algebra (same types: sum of DOUBLE is
  *    DOUBLE, sum of the LONG count is LONG).
  *
  * Anything else — an unregistered column, a non-decomposable aggregate,
  * a filter between the aggregate and the scan — leaves the plan
  * UNTOUCHED (rewrite must never widen semantics). Output attributes keep
  * their original names and exprIds, so downstream operators re-resolve
  * against the rewritten aggregate transparently.
  *
  * At 100 TB this is the difference between answering a dashboard
  * aggregation from a KB-sized gold table and re-scanning the fact table:
  * the summary is usually 10⁴–10⁶× smaller than the base. FRESHNESS is
  * the caller's contract, exactly as in production systems: register a
  * summary only while it reflects the base (e.g. maintain it with
  * [[graft.ops.Ivm]] over the change feed and re-register per version).
  *
  * Registration goes through `spark.experimental.extraOptimizations`
  * (session-global): use `withRewrite` to scope it to a block — it
  * removes the rule in `finally`, so concurrently-built unrelated plans
  * can never be rewritten by a stale registration.
  */
object MatView {

  /** One registered summary: `basePath` identifies the base scan (matched
    * against the relation's root paths); `summary`'s analyzed plan serves
    * the rewrite; `dims` are the summary's grouping columns; `sums` maps
    * base column → summary partial-sum column; `cnt` is the summary's
    * row-count partial. */
  final case class SummaryDef(basePath: String, summary: DataFrame,
                              dims: Seq[String],
                              sums: Map[String, String], cnt: String,
                              mins: Map[String, String] = Map.empty,
                              maxs: Map[String, String] = Map.empty)

  /** `matchRelation` overrides the default path-substring base match —
    * the SQL materialized-view layer passes an exact (manifestRoot,
    * version) scan-tag predicate so pinned time-travel reads of OTHER
    * versions never serve from a view that reflects the head. */
  final class RewriteRule(d: SummaryDef,
                          matchRelation: Option[LogicalRelation => Boolean]
                            = None) extends Rule[LogicalPlan] {
    // lazy: rule construction must stay IO-free (the SQL serving layer
    // builds one rule per registered view per optimizer pass)
    private lazy val sumPlan = d.summary.queryExecution.analyzed
    private def sumAttr(name: String): AttributeReference =
      sumPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.getOrElse(throw new IllegalArgumentException(
        s"summary lacks column '$name' (has ${sumPlan.output.map(_.name)})"))

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(_, _, child, _) if scansBase(child) =>
        rewrite(agg).getOrElse(agg)
    }

    /** The aggregate's child must be the registered base scan — bare, or
      * under the column-pruning Project of plain attributes the optimizer
      * inserts. A Filter (or any compute) in between blocks the rewrite:
      * the summary cannot replay row-level predicates. */
    private def scansBase(p: LogicalPlan): Boolean = p match {
      case lr: LogicalRelation => isBase(lr)
      case Project(projectList, lr: LogicalRelation)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        isBase(lr)
      case _ => false
    }

    private def isBase(lr: LogicalRelation): Boolean = matchRelation match {
      case Some(m) => m(lr)
      case None => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains(d.basePath))
        case _ => false
      }
    }

    private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
      val newGroups = agg.groupingExpressions.map {
        case a: AttributeReference if d.dims.contains(a.name) => sumAttr(a.name)
        case _ => return None
      }
      // Each output expression may wrap its aggregates in further compute
      // (CollapseProject folds e.g. round(sum(x)) into the aggregate list)
      // — so rewrite decomposable AGGREGATE SUB-EXPRESSIONS wherever they
      // sit in the tree, then validate nothing base-bound survived.
      val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        // bare grouping passthrough: keep the original name AND exprId
        case a: AttributeReference if d.dims.contains(a.name) =>
          Alias(sumAttr(a.name), a.name)(exprId = a.exprId)
        case ne =>
          val t = ne.transformUp {
            case ae @ AggregateExpression(Sum(ar: AttributeReference, _),
                Complete, false, None, _) if d.sums.contains(ar.name) =>
              ae.copy(aggregateFunction = Sum(sumAttr(d.sums(ar.name))))
            case ae @ AggregateExpression(Count(Seq(Literal(_, _))),
                Complete, false, None, _) =>
              ae.copy(aggregateFunction = Sum(sumAttr(d.cnt)))
            // min/max are decomposable over partials of themselves:
            // min(x) over any coarser grain = min of the per-group mins
            case ae @ AggregateExpression(Min(ar: AttributeReference),
                Complete, false, None, _) if d.mins.contains(ar.name) =>
              ae.copy(aggregateFunction = Min(sumAttr(d.mins(ar.name))))
            case ae @ AggregateExpression(Max(ar: AttributeReference),
                Complete, false, None, _) if d.maxs.contains(ar.name) =>
              ae.copy(aggregateFunction = Max(sumAttr(d.maxs(ar.name))))
            case ar: AttributeReference if d.dims.contains(ar.name) =>
              sumAttr(ar.name)
          }
          // validity sweep: every surviving attribute must belong to the
          // summary, and every aggregate must be a rewritten partial —
          // anything else (count(col), avg, an unregistered column)
          // blocks the whole rewrite
          t.foreach {
            case ae: AggregateExpression => ae.aggregateFunction match {
              case Sum(a: AttributeReference, _)
                  if sumPlan.outputSet.contains(a) => ()
              case Min(a: AttributeReference)
                  if sumPlan.outputSet.contains(a) => ()
              case Max(a: AttributeReference)
                  if sumPlan.outputSet.contains(a) => ()
              case _ => return None
            }
            case ar: AttributeReference
                if !sumPlan.outputSet.contains(ar) => return None
            case _ => ()
          }
          t.asInstanceOf[NamedExpression]
      }
      Some(Aggregate(newGroups, newAggs, sumPlan, None))
    }

  }

  /** Run `body` with the rewrite registered; always unregisters — a
    * session-global optimizer rule must never outlive its freshness
    * window. Plans must be FORCED (e.g. `.queryExecution.executedPlan`)
    * inside the block to be rewritten. */
  def withRewrite[A](spark: SparkSession, d: SummaryDef)(body: => A): A = {
    val rule = new RewriteRule(d)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq rule)
  }
}
