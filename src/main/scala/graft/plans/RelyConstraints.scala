package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Informational RELY constraints (the Databricks/Snowflake
  * `PRIMARY KEY ... RELY` contract, public semantics): the user DECLARES
  * key integrity and the optimizer is licensed to exploit it WITHOUT
  * verification. The payoff implemented here is inner-join elimination —
  * a fact⋈dim join on a RELY fk→pk edge where the query reads only fact
  * columns is the identity on the fact side (pk unique ⇒ no fan-out;
  * fk integrity + non-null ⇒ no row drops), so the dim scan and the
  * join shuffle/broadcast vanish from the plan entirely.
  *
  * That is a SCALE feature, not a micro-optimization: BI tools generate
  * star-schema joins unconditionally (the reference's Power BI consumers,
  * `README.md:23-27`, do exactly this), and at 100 TB an eliminated join
  * is an eliminated dim broadcast per executor — or worse, an eliminated
  * shuffle.
  *
  * Declarations are keyed by the relation's file-source root paths (the
  * stable identity of a parquet table in a plan); [[declarePrimaryKey]] /
  * [[declareForeignKey]] take the DataFrame and extract the same key the
  * optimizer rule sees, so representation always matches. RELY means
  * TRUSTED: a violated declaration changes results — exactly the
  * documented contract of RELY everywhere it exists.
  */
object RelyConstraints {

  /** (tablePathKey, upper-cased column) of declared primary keys. */
  private val pks = TrieMap.empty[(String, String), Unit]

  /** (factPathKey, fkCol) → (dimPathKey, pkCol). */
  private val fks = TrieMap.empty[(String, String), (String, String)]

  /** The stable identity of a file-source relation: its sorted root paths. */
  private[plans] def pathKey(plan: LogicalPlan): Option[String] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(fs.location.rootPaths.map(_.toString).sorted.mkString(","))
    case _ => None
  }

  private def keyOf(df: DataFrame): String = {
    val leaves = df.queryExecution.analyzed.collectLeaves()
      .flatMap(pathKey)
    require(leaves.size == 1,
      s"RELY constraints: expected exactly one file-source relation, " +
        s"found ${leaves.size}")
    leaves.head
  }

  def declarePrimaryKey(table: DataFrame, col: String): Unit =
    pks.put((keyOf(table), col.toLowerCase), ())

  def declareForeignKey(fact: DataFrame, fkCol: String,
                        dim: DataFrame, pkCol: String): Unit =
    fks.put((keyOf(fact), fkCol.toLowerCase),
      (keyOf(dim), pkCol.toLowerCase))

  private[plans] def isPk(pathKey: String, col: String): Boolean =
    pks.contains((pathKey, col.toLowerCase))

  private[plans] def fkTarget(pathKey: String,
                              col: String): Option[(String, String)] =
    fks.get((pathKey, col.toLowerCase))

  /** Test hook. */
  def clear(): Unit = { pks.clear(); fks.clear() }
}

/** The optimizer rule: eliminate `Project(factCols, fact ⋈_{fk=pk} dim)`
  * when the (fk → pk) edge is a declared RELY foreign key, the pk a
  * declared RELY primary key, the dim side is the BARE keyed relation
  * (any dim-side filter could drop fact rows — blocked), and the
  * projection references only fact-side attributes.
  *
  * Runs inside the operator-optimization fixpoint (injected via
  * [[graft.sql.GraftSparkExtensions]]), after Spark's own column pruning
  * has typically narrowed the dim side to the pk column alone.
  */
final case class EliminateRelyJoins(spark: SparkSession)
  extends Rule[LogicalPlan] {

  /** The dim side qualifies if it is the relation itself or a pure
    * attribute projection of it (column pruning's leftover). */
  private def bareRelationKey(plan: LogicalPlan): Option[String] = plan match {
    case Project(es, child) if es.forall(_.isInstanceOf[AttributeReference]) =>
      RelyConstraints.pathKey(child)
    case _ => RelyConstraints.pathKey(plan)
  }

  /** The path key of the leaf relation an attribute originates from (None
    * if aliased/derived — elimination then safely declines). */
  private def originKey(side: LogicalPlan,
                        attr: AttributeReference): Option[String] =
    side.collectLeaves()
      .find(_.outputSet.contains(attr))
      .flatMap(RelyConstraints.pathKey)

  private def eliminate(proj: Seq[NamedExpression], j: Join): Option[LogicalPlan] = {
    val cond = j.condition match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        Some((a, b))
      case _ => None
    }
    cond.flatMap { case (a, b) =>
      // orient: which side is the fact carrying the fk, which the dim
      Seq((j.left, j.right, a, b), (j.left, j.right, b, a),
        (j.right, j.left, a, b), (j.right, j.left, b, a))
        .collectFirst {
          case (fact, dim, fk, pk)
            if fact.outputSet.contains(fk) && dim.outputSet.contains(pk) &&
              proj.forall(_.references.subsetOf(fact.outputSet)) &&
              bareRelationKey(dim).exists { dimKey =>
                RelyConstraints.isPk(dimKey, pk.name) &&
                  originKey(fact, fk)
                    .flatMap(RelyConstraints.fkTarget(_, fk.name))
                    .contains((dimKey, pk.name))
              } =>
            Project(proj, fact)
        }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(proj, j: Join) if j.joinType == Inner =>
      eliminate(proj, j).getOrElse(p)
  }
}
