package graft.sql

import graft.SparkSpec

/** Query result cache: hit/miss mechanics, version-keyed invalidation,
  * the governance-bypass key component, uncacheable classification
  * (temp views, subquery relations, nondeterministic functions), and LRU
  * eviction dropping entries without breaking pre-eviction handles. */
class ResultCacheSpec extends SparkSpec {

  private def fd(sql: String) = LakeSql.sql(spark, sql)

  private def mkTable(name: String, tag: String): Unit = {
    import spark.implicits._
    LakeSql.unregister(name)
    LakeSql.setWarehouse(tmpDir(tag))
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("k", "g", "v").createOrReplaceTempView(s"${name}_src")
    fd(s"CREATE TABLE $name TBLPROPERTIES('stats_cols'='k','files'='1') " +
      s"AS SELECT * FROM ${name}_src")
    ()
  }

  test("repeat SELECT hits; a commit to any input invalidates; rows " +
      "served from cache equal the recomputed ones") {
    mkTable("rc_t", "rcspec")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache"))
    val q = "SELECT g, count(*) AS n, round(sum(v), 2) AS sv FROM rc_t " +
      "GROUP BY g"
    val first = ResultCache.sql(spark, q).collect().map(_.toSeq).toSet
    val second = ResultCache.sql(spark, q).collect().map(_.toSeq).toSet
    assert(ResultCache.stats.hits == 1 && second == first)
    fd("INSERT INTO rc_t SELECT 4L AS k, 'b' AS g, 5.0 AS v")
    val third = ResultCache.sql(spark, q).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ResultCache.stats.hits == 1, "post-commit read hit a stale entry")
    assert(third == Map("a" -> 2L, "b" -> 2L))
    LakeSql.unregister("rc_t")
  }

  test("the policy-bypass conf is part of the key: a privileged session " +
      "never reads the unprivileged session's cached rows (or vice versa)") {
    mkTable("rc_p", "rcspec2")
    fd("ALTER TABLE rc_p SET ROW FILTER (v < 25.0)")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache2"))
    val q = "SELECT count(*) AS n FROM rc_p"
    assert(ResultCache.sql(spark, q).head().getLong(0) == 2)
    spark.conf.set("graft.policy.bypass", "true")
    try {
      // same text, same versions — different key, full rows
      assert(ResultCache.sql(spark, q).head().getLong(0) == 3)
      assert(ResultCache.stats.hits == 0)
      // and each session's repeat is its own hit
      assert(ResultCache.sql(spark, q).head().getLong(0) == 3)
      assert(ResultCache.stats.hits == 1)
    } finally spark.conf.set("graft.policy.bypass", "false")
    LakeSql.unregister("rc_p")
  }

  test("uncacheable inputs pass through: temp views directly and inside " +
      "subqueries; non-SELECT statements") {
    import spark.implicits._
    mkTable("rc_u", "rcspec3")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache3"))
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("rc_view")
    ResultCache.sql(spark, "SELECT count(*) AS n FROM rc_view").count()
    // a temp view hidden INSIDE a subquery must classify too
    ResultCache.sql(spark, "SELECT k FROM rc_u WHERE k IN " +
      "(SELECT k FROM rc_view)").count()
    assert(ResultCache.stats.uncacheable == 2 &&
      ResultCache.stats.misses == 0)
    // CTEs over lake tables ARE cacheable
    val cte = "WITH c AS (SELECT k, v FROM rc_u WHERE k <= 2) " +
      "SELECT count(*) AS n FROM c"
    ResultCache.sql(spark, cte).count()
    ResultCache.sql(spark, cte).count()
    assert(ResultCache.stats.misses == 1 && ResultCache.stats.hits == 1)
    LakeSql.unregister("rc_u")
  }

  test("an oversize result is served but never retained: the repeat " +
      "re-executes instead of hitting") {
    mkTable("rc_o", "rcspec5")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache5"), capacity = 8, entryBytes = 1L)
    val q = "SELECT g, count(*) AS n FROM rc_o GROUP BY g"
    assert(ResultCache.sql(spark, q).count() == 2)
    assert(ResultCache.sql(spark, q).count() == 2)
    // two misses, zero hits: nothing was retained under the 1-byte cap
    assert(ResultCache.stats.misses == 2 && ResultCache.stats.hits == 0)
    LakeSql.unregister("rc_o")
  }

  test("LRU eviction at capacity drops the entry but keeps its parquet " +
      "readable — a pre-eviction DataFrame still executes; a repeat misses") {
    mkTable("rc_e", "rcspec4")
    ResultCache.reset()
    val dir = tmpDir("rccache4")
    ResultCache.enable(dir, capacity = 2)
    val first = ResultCache.sql(spark, "SELECT k FROM rc_e WHERE k = 1")
    first.count()
    ResultCache.sql(spark, "SELECT k FROM rc_e WHERE k = 2").count()
    assert(new java.io.File(dir).listFiles().length == 2)
    ResultCache.sql(spark, "SELECT k FROM rc_e WHERE k = 3").count()
    // capacity 2 evicted the eldest ENTRY, but its parquet stays on disk
    // (reclaimed with the cache dir), so the lazy handle returned before
    // eviction still executes instead of FileNotFoundException
    assert(new java.io.File(dir).listFiles().length == 3)
    assert(first.count() == 1L)
    // the entry itself is gone: a repeat of the evicted text re-executes
    val missesBefore = ResultCache.stats.misses
    ResultCache.sql(spark, "SELECT k FROM rc_e WHERE k = 1").count()
    assert(ResultCache.stats.misses == missesBefore + 1)
    LakeSql.unregister("rc_e")
    ResultCache.reset() // never leave an ambient cache behind
  }

  test("CTE names resolve scope-aware: a temp view OUTSIDE a subquery's " +
      "WITH that shares its CTE's name still classifies as uncacheable") {
    import spark.implicits._
    mkTable("rc_c", "rcspec7")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache7"))
    // temp view whose name collides with a CTE defined INSIDE a subquery
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("rc_cte_name")
    val q =
      """SELECT k FROM rc_cte_name
        |WHERE k IN (WITH rc_cte_name AS (SELECT k FROM rc_c)
        |            SELECT k FROM rc_cte_name)""".stripMargin
    ResultCache.sql(spark, q).count()
    ResultCache.sql(spark, q).count()
    // the OUTER rc_cte_name is a temp view (no version to key on): both
    // runs must pass through uncached — a scope-blind CTE collector
    // would have cached the first answer and served it stale forever
    assert(ResultCache.stats.misses == 0 && ResultCache.stats.hits == 0 &&
      ResultCache.stats.uncacheable == 2)
    // and the same name used ONLY in scope stays cacheable
    val inScope = "WITH rc_cte_name AS (SELECT k FROM rc_c) " +
      "SELECT count(*) AS n FROM rc_cte_name"
    ResultCache.sql(spark, inScope).count()
    ResultCache.sql(spark, inScope).count()
    assert(ResultCache.stats.misses == 1 && ResultCache.stats.hits == 1)
    spark.catalog.dropTempView("rc_cte_name")
    LakeSql.unregister("rc_c")
    ResultCache.reset()
  }

  test("nondeterministic queries are never cached: rand()/uuid()/" +
      "current_timestamp repeats re-execute, including inside subqueries") {
    mkTable("rc_n", "rcspec6")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache6"))
    val nondet = Seq(
      "SELECT k, rand() AS r FROM rc_n",
      "SELECT k, uuid() AS u FROM rc_n",
      "SELECT k, current_timestamp() AS ts FROM rc_n",
      "SELECT k FROM rc_n WHERE v < (SELECT max(v) * rand() FROM rc_n)")
    nondet.foreach { q =>
      ResultCache.sql(spark, q).count()
      ResultCache.sql(spark, q).count()
    }
    assert(ResultCache.stats.hits == 0,
      "a nondeterministic query was served from the cache")
    assert(ResultCache.stats.uncacheable >= nondet.size * 2L)
    // sanity: two distinct rand() answers really differ across repeats
    val rq = "SELECT sum(r) AS s FROM (SELECT k, rand() AS r FROM rc_n)"
    val a = ResultCache.sql(spark, rq).collect()(0).getDouble(0)
    val b = ResultCache.sql(spark, rq).collect()(0).getDouble(0)
    assert(a != b)
    // a deterministic query on the same table still caches
    ResultCache.sql(spark, "SELECT count(*) AS n FROM rc_n").count()
    ResultCache.sql(spark, "SELECT count(*) AS n FROM rc_n").count()
    assert(ResultCache.stats.hits == 1)
    LakeSql.unregister("rc_n")
    ResultCache.reset()
  }

  test("TABLESAMPLE is uncacheable: the sample's seed differs per parse, " +
      "so a repeat re-executes instead of serving the first sample forever") {
    mkTable("rc_s", "rcspec8")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache8"))
    val q = "SELECT k FROM rc_s TABLESAMPLE (50 PERCENT)"
    ResultCache.sql(spark, q).count()
    ResultCache.sql(spark, q).count()
    assert(ResultCache.stats.hits == 0 && ResultCache.stats.misses == 0 &&
      ResultCache.stats.uncacheable == 2,
      s"TABLESAMPLE classified cacheable: ${ResultCache.stats}")
    LakeSql.unregister("rc_s")
    ResultCache.reset()
  }

  test("re-miss of an evicted digest spills to a FRESH subpath: the " +
      "pre-eviction lazy handle still reads its own files afterwards") {
    mkTable("rc_r", "rcspec9")
    ResultCache.reset()
    ResultCache.enable(tmpDir("rccache9"), capacity = 1)
    val q = "SELECT k FROM rc_r WHERE k <= 2"
    val handle = ResultCache.sql(spark, q) // miss #1, spill A
    assert(handle.count() == 2L)
    ResultCache.sql(spark, "SELECT k FROM rc_r WHERE k = 3").count() // evicts q
    // re-miss of the SAME digest: must not overwrite spill A (the handle
    // above still points there) — a mode("overwrite") to the shared path
    // would delete A's files and fail the handle's next action
    val again = ResultCache.sql(spark, q)
    assert(again.count() == 2L)
    assert(handle.count() == 2L,
      "pre-eviction handle broke after a re-miss of its digest")
    LakeSql.unregister("rc_r")
    ResultCache.reset()
  }
}
