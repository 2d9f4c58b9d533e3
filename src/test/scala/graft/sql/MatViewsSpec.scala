package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Snapshots

/** Materialized views as SQL objects: CREATE materializes + registers,
  * REFRESH folds the change feed exactly-once off the tag cursor,
  * serving rewrites fresh coarser aggregations onto the view and NEVER
  * stale/pinned/filtered ones, DROP unregisters. */
class MatViewsSpec extends SparkSpec {

  private def fd(sql: String) = LakeSql.sql(spark, sql)

  private def fixture(tag: String): String = {
    import spark.implicits._
    val root = tmpDir(tag)
    fd("DROP MATERIALIZED VIEW mv_gold")
    LakeSql.unregister("mv_base")
    LakeSql.setWarehouse(root)
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0),
      (5L, "c", 50.0))
      .toDF("k", "g", "v").createOrReplaceTempView("mv_src")
    fd("CREATE TABLE mv_base TBLPROPERTIES('stats_cols'='k','files'='2') " +
      "AS SELECT * FROM mv_src")
    root
  }

  private def mvRows(): Map[String, (Long, Double)] =
    fd("SELECT g, cnt, sv FROM mv_gold").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("CREATE materializes the aggregate with a cursor tag; REFRESH " +
      "folds insert/delete/update feeds; zero-count groups retire; " +
      "replay is a no-op") {
    fixture("mvspec1")
    val created = fd("CREATE MATERIALIZED VIEW mv_gold AS " +
      "SELECT g, sum(v) AS sv, count(*) AS cnt FROM mv_base GROUP BY g")
      .collect()(0)
    assert(created.getLong(1) == 1L, "base_version should be 1")
    assert(mvRows() == Map("a" -> (2L, 30.0), "b" -> (2L, 70.0),
      "c" -> (1L, 50.0)))
    // refresh at head is a no-op: no new commit
    val spec = LakeSql.specOf("mv_gold").get
    val v0 = Snapshots.latestVersion(spark, spec.manifestRoot)
    val noop = fd("REFRESH MATERIALIZED VIEW mv_gold").collect()(0)
    assert(noop.getLong(3) == 0L &&
      Snapshots.latestVersion(spark, spec.manifestRoot) == v0,
      "refresh at head must not commit")
    // base DML: insert new group, delete group c entirely, update a row
    fd("INSERT INTO mv_base SELECT 6L AS k, 'd' AS g, 60.0 AS v")
    fd("DELETE FROM mv_base WHERE k = 5")
    fd("UPDATE mv_base SET v = 25.0 WHERE k = 2")
    val r = fd("REFRESH MATERIALIZED VIEW mv_gold").collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 4L,
      s"cursor should advance 1 -> 4, got ${r.toSeq}")
    assert(mvRows() == Map("a" -> (2L, 35.0), "b" -> (2L, 70.0),
      "d" -> (1L, 60.0)), "fold drifted from recompute (c must retire)")
    // exactly-once: a second refresh sees the advanced cursor
    val r2 = fd("REFRESH MATERIALIZED VIEW mv_gold").collect()(0)
    assert(r2.getLong(3) == 0L, "replayed refresh re-applied the feed")
    fd("DROP MATERIALIZED VIEW mv_gold")
    LakeSql.unregister("mv_base")
  }

  test("serving: a fresh view answers coarser aggregations (plan scans " +
      "the view, not the base); staleness, row filters between agg and " +
      "scan, pinned other versions, and non-decomposable aggs all fall " +
      "back to the base") {
    val root = fixture("mvspec2")
    fd("CREATE MATERIALIZED VIEW mv_gold AS " +
      "SELECT g, sum(v) AS sv, count(*) AS cnt FROM mv_base GROUP BY g")
    val baseSpec = LakeSql.specOf("mv_base").get
    val mvSpec = LakeSql.specOf("mv_gold").get
    def planOf(sql: String): String =
      fd(sql).queryExecution.executedPlan.toString
    val q = "SELECT g, sum(v) AS sv, count(*) AS n FROM mv_base GROUP BY g"
    val p1 = planOf(q)
    assert(p1.contains(mvSpec.path) && !p1.contains(baseSpec.path),
      s"fresh view did not serve the aggregation:\n$p1")
    // values served are the view's — equal to recompute
    val served = fd(q).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(served == Set(("a", 30.0, 2L), ("b", 70.0, 2L), ("c", 50.0, 1L)))
    // global grain (no GROUP BY) also serves — dims subset includes empty
    val g0 = "SELECT sum(v) AS sv, count(*) AS n FROM mv_base"
    // count(*) over a bare lake scan is served metadata-only by
    // ServeAggFromManifest before our rule can see it — both are
    // scans-nothing outcomes; assert the BASE path is not scanned
    assert(!planOf(g0).contains(baseSpec.path))
    // a row-level filter blocks serving (summary can't replay predicates)
    val pf = planOf("SELECT g, sum(v) AS sv FROM mv_base " +
      "WHERE v > 15 GROUP BY g")
    assert(pf.contains(baseSpec.path), s"filtered agg must scan base:\n$pf")
    // non-decomposable aggregate blocks serving
    val pm = planOf("SELECT g, min(v) AS mv FROM mv_base GROUP BY g")
    assert(pm.contains(baseSpec.path), "min() must scan the base")
    // STALE view: base DML bumps head past the cursor -> fall back
    fd("INSERT INTO mv_base SELECT 7L AS k, 'a' AS g, 5.0 AS v")
    val p2 = planOf(q)
    assert(p2.contains(baseSpec.path) && !p2.contains(mvSpec.path),
      s"stale view served an aggregation:\n$p2")
    // values now come from the base (include the new row)
    val fresh = fd(q).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(fresh.contains(("a", 35.0, 3L)))
    // REFRESH re-arms serving with the folded values
    fd("REFRESH MATERIALIZED VIEW mv_gold")
    val p3 = planOf(q)
    assert(p3.contains(mvSpec.path) && !p3.contains(baseSpec.path),
      s"refreshed view did not re-arm serving:\n$p3")
    assert(fd(q).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      == fresh)
    // a pinned read of an OLDER version is never served the head view
    val pin = planOf("SELECT g, sum(v) AS sv FROM mv_base " +
      "VERSION AS OF 1 GROUP BY g")
    assert(pin.contains(baseSpec.path) && !pin.contains(mvSpec.path),
      s"pinned v1 read was served the head-reflecting view:\n$pin")
    fd("DROP MATERIALIZED VIEW mv_gold")
    LakeSql.unregister("mv_base")
    assert(root.nonEmpty)
  }

  test("definition validation is loud: non-algebraic aggregates, missing " +
      "count, computed dims, unregistered base all refuse") {
    fixture("mvspec3")
    def rejects(q: String, why: String): Unit = {
      val e = intercept[IllegalArgumentException](fd(
        s"CREATE MATERIALIZED VIEW mv_bad AS $q"))
      assert(e.getMessage.contains("CREATE MATERIALIZED VIEW"), s"$why: $e")
    }
    rejects("SELECT g, min(v + 1.0) AS m, count(*) AS c FROM mv_base " +
      "GROUP BY g", "computed aggregate args refuse")
    rejects("SELECT g, sum(v) AS sv FROM mv_base GROUP BY g",
      "count(*) is required")
    rejects("SELECT g, avg(v) AS a, count(*) AS c FROM mv_base GROUP BY g",
      "avg is not maintainable")
    rejects("SELECT upper(g) AS ug, sum(v) AS sv, count(*) AS c " +
      "FROM mv_base GROUP BY upper(g)", "computed dims refuse")
    rejects("SELECT g, sum(v) AS sv, count(*) AS c FROM nowhere GROUP BY g",
      "unregistered base refuses")
    // and through plain spark.sql the statements work end to end
    spark.sql("CREATE MATERIALIZED VIEW mv_gold AS " +
      "SELECT g, sum(v) AS sv, count(*) AS cnt FROM mv_base GROUP BY g")
    fd("INSERT INTO mv_base SELECT 9L AS k, 'a' AS g, 1.0 AS v")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mv_gold").collect()(0)
    assert(r.getLong(3) >= 1L, s"spark.sql refresh saw no feed: ${r.toSeq}")
    assert(spark.sql("SELECT count(*) AS n FROM mv_gold").collect()(0)
      .getLong(0) == 3L)
    spark.sql("DROP MATERIALIZED VIEW mv_gold")
    LakeSql.unregister("mv_base")
  }

  test("MIN/MAX + WHERE + FULL: insert-only feeds fold extrema purely; " +
      "a delete feed recomputes ONLY the touched groups off a " +
      "stats-pruned base read; the WHERE predicate scopes create and " +
      "every feed; REFRESH FULL recomputes at head; min/max serve " +
      "transparently from an unfiltered view") {
    import spark.implicits._
    val root = tmpDir("mvspec4")
    fd("DROP MATERIALIZED VIEW mv_mm"); fd("DROP MATERIALIZED VIEW mv_mm2")
    LakeSql.unregister("mm_base")
    LakeSql.setWarehouse(root)
    // 4 bands × 25 rows, z-ordered/stats on band → each file one band,
    // so a touched-band bounding box genuinely prunes files. All v are
    // small integers-as-doubles: fold vs recompute is bit-exact.
    spark.range(0, 100)
      .select($"id".as("k"), ($"id" / 25).cast("long").as("band"),
        ($"id" % 50).cast("double").as("v"))
      .createOrReplaceTempView("mm_src")
    fd("CREATE TABLE mm_base TBLPROPERTIES('stats_cols'='band'," +
      "'files'='4') AS SELECT * FROM mm_src")
    fd("CREATE MATERIALIZED VIEW mv_mm AS SELECT band, sum(v) AS sv, " +
      "min(v) AS mn, max(v) AS mx, count(*) AS cnt FROM mm_base " +
      "WHERE k % 10 != 3 GROUP BY band")
    def driftOk(tag: String): Unit = {
      val view = fd("SELECT band, sv, mn, mx, cnt FROM mv_mm")
      val direct = fd("SELECT band, sum(v) AS sv, min(v) AS mn, " +
        "max(v) AS mx, count(*) AS cnt FROM mm_base WHERE k % 10 != 3 " +
        "GROUP BY band")
      val drift = view.exceptAll(direct).count() +
        direct.exceptAll(view).count()
      assert(drift == 0, s"$tag: view drifted from recompute on $drift rows")
    }
    driftOk("create")
    // INSERT-ONLY feed: an improving extremum + a brand-new band fold
    // purely (no recompute, no base read)
    fd("INSERT INTO mm_base SELECT 200L AS k, 0L AS band, -5.0 AS v")
    fd("INSERT INTO mm_base SELECT 201L AS k, 4L AS band, 7.0 AS v")
    val r1 = fd("REFRESH MATERIALIZED VIEW mv_mm").head()
    assert(r1.getAs[Long]("groups_recomputed") == 0L &&
      r1.getAs[Long]("base_files_read") == 0L,
      s"insert-only feed must fold, not recompute: ${r1.toSeq}")
    driftOk("insert fold")
    assert(fd("SELECT mn FROM mv_mm WHERE band = 0").head().getDouble(0)
      == -5.0, "insert-only fold missed the improving minimum")
    // DELETE feed: band 1 loses its minimum — only that group recomputes,
    // and the base read is pruned to band-1 files
    fd("DELETE FROM mm_base WHERE band = 1 AND v < 30")
    val r2 = fd("REFRESH MATERIALIZED VIEW mv_mm").head()
    assert(r2.getAs[Long]("groups_recomputed") == 1L,
      s"delete touched exactly band 1, got ${r2.toSeq}")
    assert(r2.getAs[Long]("base_files_read") >= 1L &&
      r2.getAs[Long]("base_files_read") < r2.getAs[Long]("base_files_total"),
      s"touched-group recompute read the whole base: ${r2.toSeq}")
    driftOk("delete recompute")
    assert(fd("SELECT mn FROM mv_mm WHERE band = 1").head().getDouble(0)
      == 30.0, "deleted minimum did not grow back to 30")
    // WHERE scopes the feed: an excluded row (k % 10 == 3) is invisible
    fd("INSERT INTO mm_base SELECT 303L AS k, 0L AS band, -100.0 AS v")
    val r3 = fd("REFRESH MATERIALIZED VIEW mv_mm").head()
    assert(r3.getAs[Long]("feed_rows") == 0L,
      s"WHERE-excluded insert leaked into the feed: ${r3.toSeq}")
    assert(fd("SELECT mn FROM mv_mm WHERE band = 0").head().getDouble(0)
      == -5.0, "WHERE-excluded row moved the view's minimum")
    driftOk("where-scoped feed")
    // REFRESH FULL recomputes even at head (the repair path commits)
    val spec = LakeSql.specOf("mv_mm").get
    val vPre = Snapshots.latestVersion(spark, spec.manifestRoot)
    fd("REFRESH MATERIALIZED VIEW mv_mm FULL")
    assert(Snapshots.latestVersion(spark, spec.manifestRoot) > vPre,
      "FULL refresh at head must still commit a recompute")
    driftOk("full refresh")
    // min/max SERVING from an unfiltered view: the plan must scan the
    // view path, values must match the base
    fd("CREATE MATERIALIZED VIEW mv_mm2 AS SELECT band, sum(v) AS sv, " +
      "min(v) AS mn, max(v) AS mx, count(*) AS cnt FROM mm_base " +
      "GROUP BY band")
    val served = fd("SELECT band, min(v) AS mn, max(v) AS mx " +
      "FROM mm_base GROUP BY band")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains(s"$root/mv_mm2/z") &&
      !plan.contains(LakeSql.specOf("mm_base").get.path),
      s"min/max aggregation was not served from the view:\n$plan")
    val direct2 = Snapshots.tableAt(spark,
      LakeSql.specOf("mm_base").get.manifestRoot,
      Snapshots.latestVersion(spark,
        LakeSql.specOf("mm_base").get.manifestRoot))
      .groupBy(col("band"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .select(col("band"), col("mn"), col("mx"))
    val drift2 = served.exceptAll(direct2).count() +
      direct2.exceptAll(served).count()
    assert(drift2 == 0, s"served min/max drifted on $drift2 rows")
    fd("DROP MATERIALIZED VIEW mv_mm"); fd("DROP MATERIALIZED VIEW mv_mm2")
    LakeSql.unregister("mm_base")
  }
}
