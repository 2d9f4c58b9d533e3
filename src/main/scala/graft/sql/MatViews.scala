package graft.sql

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.ops.Ivm
import graft.plans.MatView
import graft.sinks.Snapshots
import graft.sql.LakeSql.LakeTableSpec

/** MATERIALIZED VIEWS as SQL objects over the versioned lake — the
  * Databricks `CREATE MATERIALIZED VIEW` / `REFRESH MATERIALIZED VIEW`
  * shape (public behavior), composing the two halves this engine already
  * has: change-feed incremental maintenance ([[graft.ops.Ivm]], the q116
  * discipline) and the transparent aggregate rewrite
  * ([[graft.plans.MatView]], q155). Reference motivation: the gold layer
  * exists exactly to BE a materialized summary
  * (`run_transform.py:76-92`, `README.md:60`).
  *
  *  - `CREATE MATERIALIZED VIEW mv AS SELECT dims…, sum(x) AS sx,
  *    count(*) AS cnt FROM base GROUP BY dims…` — the definition must be
  *    an ALGEBRAIC grouped aggregate over ONE registered lake table
  *    (sum/count only: the self-inverting-under-deletion family that
  *    incremental maintenance supports; MIN/MAX would need per-group
  *    recompute on delete and are rejected loudly). The view materializes
  *    as its own lake table — z-ordered on the dims, versioned,
  *    time-travelable — whose creating commit carries the definition as
  *    table properties and a `mvref_<v>` txn tag pinning the BASE version
  *    it reflects.
  *  - `REFRESH MATERIALIZED VIEW mv` — reads the base's CHANGE FEED from
  *    the last-reflected version (the tag cursor, never separate state
  *    that can desync) to its head, folds the per-group deltas into the
  *    stored view ([[Ivm.applyFeed]]: inserts +, deletes −, zero-count
  *    groups leave), and commits the folded view with the new cursor tag
  *    riding the SAME atomic commit. Crash replay is safe by
  *    construction: the fold reads the PRE-refresh view, so a replayed
  *    refresh recomputes the identical result (full-snapshot commit, not
  *    an increment — += through a non-atomic cursor would double-apply).
  *  - Transparent serving: [[ServeFromMatViews]] (injected session-wide)
  *    rewrites a coarser-or-equal aggregation over the base onto the
  *    view — but ONLY when the scanned base version EQUALS the view's
  *    cursor (freshness is checked per scan, so a stale view silently
  *    falls back to the base, and a pinned `VERSION AS OF` read of any
  *    other version is never served a head-reflecting summary).
  *
  * Scale shape at 100 TB: refresh reads the feed (bounded by the commits'
  * touch set — [[Snapshots.changesBetween]] opens only changed files,
  * never the table) plus the view itself (gold-summary-sized, usually
  * 10⁴–10⁶× smaller than the base); the base is never re-aggregated. A
  * served dashboard aggregation reads KBs from the view instead of
  * re-scanning the fact table.
  */
object MatViews {

  final case class MvMeta(name: String, base: String, dims: Seq[String],
                          sums: Seq[(String, String)], cnt: String)

  // in-JVM registry; re-attachable from the view's own table properties
  // (the definition is durable — a fresh JVM re-registers the table and
  // the first REFRESH/serve re-reads the props)
  private val mvs = TrieMap.empty[String, MvMeta]

  private[sql] def isEmpty: Boolean = mvs.isEmpty

  private def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  /** The meta for `name`: in-JVM registry first, else re-attached from
    * the view table's head properties. */
  private[sql] def metaOf(spark: SparkSession, name: String): Option[MvMeta] =
    mvs.get(lower(name)).orElse {
      LakeSql.specOf(lower(name)).flatMap { spec =>
        val head = Snapshots.latestVersion(spark, spec.manifestRoot)
        val p = Snapshots.tableProperties(spark, spec.manifestRoot, head)
        p.get("graft.mv.base").map { base =>
          val m = MvMeta(lower(name), base,
            p("graft.mv.dims").split(",").toSeq,
            p("graft.mv.sums").split(",").filter(_.nonEmpty).toSeq
              .map { kv => val Array(v, s) = kv.split(":", 2); (v, s) },
            p("graft.mv.cnt"))
          mvs.put(m.name, m)
          m
        }
      }
    }

  /** Parse the AS-query into the maintainable definition. Loud on
    * anything outside the algebraic shape: one registered lake base,
    * grouping on plain columns, aggregates limited to `sum(col) AS a`
    * and exactly one `count(*)/count(1) AS c` (the count is REQUIRED —
    * it is what lets deletions retire groups incrementally). */
  private[sql] def parseDef(spark: SparkSession, name: String,
                            queryText: String): MvMeta = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"CREATE MATERIALIZED VIEW: $why — the definition must be " +
        "SELECT <dims…>, sum(<col>) AS <a>…, count(*) AS <c> FROM " +
        s"<lake table> GROUP BY <dims…>; got: $queryText")
    val plan = spark.sessionState.sqlParser.parsePlan(queryText)
    val agg = plan match {
      case a: Aggregate => a
      case other => fail(s"not a grouped aggregate (${other.nodeName})")
    }
    val base = agg.child match {
      case UnresolvedRelation(Seq(n), _, _) => lower(n)
      case SubqueryAlias(_, UnresolvedRelation(Seq(n), _, _)) => lower(n)
      case other => fail(s"FROM must be one registered lake table, got " +
        other.nodeName)
    }
    if (LakeSql.specOf(base).isEmpty)
      fail(s"'$base' is not a registered lake table")
    val dims = agg.groupingExpressions.map {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        lower(a.nameParts.head)
      case other => fail(s"grouping on '${other.sql}' — dims must be " +
        "plain base columns")
    }
    var sums = Vector.empty[(String, String)]
    var cnt = Option.empty[String]
    agg.aggregateExpressions.foreach {
      case a: UnresolvedAttribute if a.nameParts.size == 1 &&
          dims.contains(lower(a.nameParts.head)) => ()
      case Alias(UnresolvedFunction(Seq(fn), Seq(arg), false, None, _, _, _),
          aliasName) if lower(fn) == "sum" => arg match {
        case ua: UnresolvedAttribute if ua.nameParts.size == 1 =>
          sums :+= ((lower(aliasName), lower(ua.nameParts.head)))
        case other => fail(s"sum over '${other.sql}' — sum args must be " +
          "plain base columns")
      }
      case Alias(UnresolvedFunction(Seq(fn), args, false, None, _, _, _),
          aliasName) if lower(fn) == "count" &&
          (args.isEmpty || (args.lengthCompare(1) == 0 && (args.head match {
            case Literal(_, _) => true
            case _: UnresolvedStar => true
            case _ => false
          }))) =>
        if (cnt.isDefined) fail("more than one count(*) column")
        cnt = Some(lower(aliasName))
      case other => fail(s"'${other.sql}' is not maintainable — only " +
        "dims, sum(col) AS a, and count(*) AS c are")
    }
    if (cnt.isEmpty) fail("a count(*) AS <name> column is required " +
      "(it is what retires groups whose rows are all deleted)")
    MvMeta(lower(name), base, dims, sums, cnt.get)
  }

  private def aggOf(m: MvMeta)(df: DataFrame): DataFrame = {
    val aggs = m.sums.map { case (v, s) => sum(col(s)).as(v) } :+
      count(lit(1)).as(m.cnt)
    df.groupBy(m.dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def row(spark: SparkSession, kvs: (String, Long)*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(kvs.map(_._2): _*)),
      LakeSql.longSchema(kvs.map(_._1)))

  /** CREATE: aggregate the base AT ITS HEAD, materialize as a new lake
    * table (z-ordered on the dims), one atomic commit carrying content +
    * definition properties + the `mvref_<baseHead>` cursor tag. */
  def create(spark: SparkSession, name: String, location: Option[String],
             queryText: String): DataFrame = {
    val m = parseDef(spark, name, queryText)
    val nm = m.name
    require(LakeSql.specOf(nm).isEmpty && !mvs.contains(nm),
      s"materialized view or table '$nm' already exists")
    val baseSpec = LakeSql.specOf(m.base).get
    LakeSql.requireDmlClearance(spark, baseSpec, "CREATE MATERIALIZED VIEW")
    val baseHead = Snapshots.latestVersion(spark, baseSpec.manifestRoot)
    require(Snapshots.columnMapping(spark, baseSpec.manifestRoot,
      baseHead).isEmpty,
      "CREATE MATERIALIZED VIEW over a column-mapped base is not " +
        "supported — the feed fold would mix logical and physical names")
    val root = location.orElse(LakeSql.warehouseDir.map(w => s"$w/$nm"))
      .getOrElse(throw new IllegalArgumentException(
        "CREATE MATERIALIZED VIEW needs a LOCATION clause or " +
          "LakeSql.setWarehouse(dir)"))
    val spec = LakeTableSpec(s"$root/z", s"$root/m", m.dims, nFiles = 4)
    require(Snapshots.versions(spark, spec.manifestRoot).isEmpty,
      s"'$root' already holds a versioned table")
    val content =
      aggOf(m)(Snapshots.tableAt(spark, baseSpec.manifestRoot, baseHead))
    graft.sinks.Layout.zorderWrite(content, m.dims, spec.path, spec.nFiles)
    val props = Map(
      "graft.mv.base" -> m.base,
      "graft.mv.dims" -> m.dims.mkString(","),
      "graft.mv.sums" -> m.sums.map { case (v, s) => s"$v:$s" }.mkString(","),
      "graft.mv.cnt" -> m.cnt)
    val version = Snapshots.commit(spark,
      graft.sinks.Layout.buildManifest(spark, spec.path, m.dims),
      spec.manifestRoot, tag = Some(s"mvref_$baseHead"),
      markers = Snapshots.propsMarkers(props))
    LakeSql.register(nm, spec)
    mvs.put(nm, m)
    row(spark, "version" -> version.toLong, "base_version" -> baseHead.toLong)
  }

  /** Highest base version whose `mvref_` tag is on the view's log —
    * descending stop-at-first, the [[ApplyChanges]] cursor discipline
    * (tags are monotone over view versions because every refresh both
    * advances the cursor and commits). */
  private[sql] def cursorOf(spark: SparkSession, mvRoot: String): Int = {
    val vs = Snapshots.versions(spark, mvRoot)
    val fs = new org.apache.hadoop.fs.Path(mvRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    vs.reverseIterator.map { v =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$mvRoot/v=$v"))
        .toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("_txn_mvref_") =>
          n.stripPrefix("_txn_mvref_").toInt }
        .maxOption
    }.collectFirst { case Some(c) => c }.getOrElse(0)
  }

  final case class RefreshResult(version: Int, fromVersion: Int,
                                 toVersion: Int, feedRows: Long,
                                 feedFilesRead: Long, feedFilesTotal: Long)

  /** REFRESH: fold the base feed (cursor, head] into the stored view and
    * commit with the advanced cursor tag. No-op (no commit) when already
    * at head. */
  def refresh(spark: SparkSession, name: String): RefreshResult = {
    val nm = lower(name)
    val m = metaOf(spark, nm).getOrElse(throw new IllegalArgumentException(
      s"'$nm' is not a materialized view"))
    val spec = LakeSql.specOf(nm).get
    val baseSpec = LakeSql.specOf(m.base).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view '$nm': base table '${m.base}' is not registered"))
    LakeSql.requireDmlClearance(spark, baseSpec, "REFRESH MATERIALIZED VIEW")
    val cursor = cursorOf(spark, spec.manifestRoot)
    require(cursor > 0, s"'$nm' carries no mvref cursor tag — not a " +
      "materialized view commit history")
    val head = Snapshots.latestVersion(spark, baseSpec.manifestRoot)
    require(head >= cursor, s"base '${m.base}' head $head is BEHIND the " +
      s"view cursor $cursor — was the base log truncated or re-created?")
    if (head == cursor)
      return RefreshResult(
        Snapshots.latestVersion(spark, spec.manifestRoot),
        cursor, head, 0L, 0L, 0L)
    require(Snapshots.columnMapping(spark, baseSpec.manifestRoot,
      head).isEmpty,
      "REFRESH over a column-mapped base is not supported")
    val scan = Snapshots.changesBetween(spark, baseSpec.manifestRoot,
      cursor, head)
    // localCheckpoint: the feed feeds the delta aggregation AND the row
    // count below — and exceptAll twice is the waste it exists to avoid
    val feed = scan.df.localCheckpoint()
    val current = Snapshots.tableAt(spark, spec.manifestRoot,
      Snapshots.latestVersion(spark, spec.manifestRoot))
    val folded = Ivm.applyFeed(current, feed, m.dims, m.sums, m.cnt)
    val (version, _) = Snapshots.replaceCommit(spark, folded, m.dims,
      spec.path, spec.manifestRoot, spec.nFiles,
      tag = Some(s"mvref_$head"))
    RefreshResult(version, cursor, head, feed.count(),
      scan.filesRead, scan.filesTotal)
  }

  /** DROP: unregister the view (its files stay for the dir's owner, the
    * registry discipline every other unregister here follows). */
  def drop(spark: SparkSession, name: String): Boolean = {
    val nm = lower(name)
    val was = mvs.remove(nm).isDefined || LakeSql.specOf(nm).isDefined
    LakeSql.unregister(nm)
    was
  }

  /** The serving rules for every registered view: each wraps the q155
    * rewrite with an exact scan-tag matcher — (base manifestRoot, scanned
    * version == view cursor) — so ONLY reads of the exact base version
    * the view reflects are served. Rules are built per call but the
    * summary plan is lazy inside [[MatView.RewriteRule]], so a plan with
    * no candidate base scan pays nothing beyond the match walk. */
  private[sql] def servingRules(spark: SparkSession)
      : Seq[Rule[LogicalPlan]] =
    mvs.values.toSeq.sortBy(_.name).flatMap { m =>
      for {
        mvSpec <- LakeSql.specOf(m.name)
        baseSpec <- LakeSql.specOf(m.base)
      } yield {
        lazy val cursor = cursorOf(spark, mvSpec.manifestRoot)
        lazy val summary = Snapshots.tableAt(spark, mvSpec.manifestRoot,
          Snapshots.latestVersion(spark, mvSpec.manifestRoot))
        val d = MatView.SummaryDef(baseSpec.path, summary, m.dims,
          m.sums.map(_.swap).toMap, m.cnt)
        new MatView.RewriteRule(d, matchRelation = Some(
          (lr: LogicalRelation) =>
            lr.getTagValue(LakeSql.LakeScanTag).exists {
              case (root, v, _) =>
                root == baseSpec.manifestRoot && cursor > 0 && v == cursor
            }))
      }
    }
}

/** Session-wide transparent MV serving (injected by
  * [[GraftSparkExtensions]]): applies every registered view's rewrite
  * rule. Early-outs keep the tax on non-candidate plans to one registry
  * probe + one tree walk; soundness (grain subset, decomposable
  * aggregates, no interposed compute, exact version freshness) lives in
  * [[MatView.RewriteRule]] + the scan-tag matcher. */
final case class ServeFromMatViews(spark: SparkSession)
  extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MatViews.isEmpty) return plan
    if (spark.conf.get("graft.mv.serve", "true") != "true") return plan
    if (!plan.exists { case _: Aggregate => true; case _ => false })
      return plan
    MatViews.servingRules(spark).foldLeft(plan)((p, r) => r.apply(p))
  }
}
