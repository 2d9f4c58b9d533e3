package graft.sql

import graft.SparkSpec

/** Row filters + column masks (the Databricks governance shape on the
  * lake's property commits): read-path application order, time-travel
  * non-bypass, the privileged-principal conf, DDL-time validation, and
  * the structural soundness of the metadata-only aggregate rule under a
  * policy. */
class GovernancePoliciesSpec extends SparkSpec {

  private def fd(sql: String) = LakeSql.sql(spark, sql)

  private def freshTable(name: String, tag: String): Unit = {
    import spark.implicits._
    LakeSql.unregister(name)
    LakeSql.setWarehouse(tmpDir(tag))
    Seq((1L, "alice", 10, 100.0), (2L, "bob", 25, 200.0),
      (3L, "carol", 5, -50.0), (4L, "dave", 30, 400.0))
      .toDF("k", "who", "region", "bal")
      .createOrReplaceTempView(s"${name}_src")
    fd(s"CREATE TABLE $name TBLPROPERTIES('stats_cols'='k','files'='1') " +
      s"AS SELECT * FROM ${name}_src")
    ()
  }

  test("row filter then mask, filter sees raw values, masks see raw " +
      "values of OTHER columns; DROP restores each independently") {
    freshTable("pol_t", "polspec")
    fd("ALTER TABLE pol_t SET ROW FILTER (region < 28)")
    fd("ALTER TABLE pol_t ALTER COLUMN who SET MASK " +
      "(concat(substring(who, 1, 1), '***'))")
    // dave (region 30) filtered; names masked to initial+***
    val rows = fd("SELECT k, who FROM pol_t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a***"), (2L, "b***"), (3L, "c***")))
    // a mask referencing ANOTHER column computes over its raw value
    fd("ALTER TABLE pol_t ALTER COLUMN bal SET MASK " +
      "(CASE WHEN region < 20 THEN bal ELSE CAST(NULL AS DOUBLE) END)")
    val bals = fd("SELECT k, bal FROM pol_t ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(bals.toSeq == Seq((1L, Some(100.0)), (2L, None), (3L, Some(-50.0))))
    fd("ALTER TABLE pol_t ALTER COLUMN bal DROP MASK")
    assert(fd("SELECT bal FROM pol_t WHERE k = 2").head().getDouble(0)
      == 200.0)
    fd("ALTER TABLE pol_t DROP ROW FILTER")
    assert(fd("SELECT count(*) AS n FROM pol_t").head().getLong(0) == 4)
    // the mask on who is still in force after the filter drop
    assert(fd("SELECT who FROM pol_t WHERE k = 4").head().getString(0)
      == "d***")
    LakeSql.unregister("pol_t")
  }

  test("time travel is not a policy bypass; the bypass conf is; " +
      "metadata-only count under a row filter scans (filtered count)") {
    freshTable("pol_u", "polspec2")
    // a second commit so v1 predates the policy commits
    fd("INSERT INTO pol_u SELECT 5L AS k, 'erin' AS who, 40 AS region, " +
      "9.0 AS bal")
    fd("ALTER TABLE pol_u SET ROW FILTER (region <= 25)")
    // head count: erin (40) and dave (30) filtered — and this count MUST
    // NOT be served from the manifest (the Filter breaks the rewrite)
    assert(fd("SELECT count(*) AS n FROM pol_u").head().getLong(0) == 3)
    // the pre-policy version still reads policied: v1's 4 rows minus
    // dave (region 30) = 3
    assert(fd("SELECT count(*) AS n FROM pol_u VERSION AS OF 1")
      .head().getLong(0) == 3)
    // privileged session reads raw
    spark.conf.set("graft.policy.bypass", "true")
    try {
      assert(fd("SELECT count(*) AS n FROM pol_u").head().getLong(0) == 5)
    } finally spark.conf.set("graft.policy.bypass", "false")
    LakeSql.unregister("pol_u")
  }

  test("read-dependent DML on a policy-protected table refuses without " +
      "the privileged session; INSERT stays open; clearance returns " +
      "with the policy drop") {
    freshTable("pol_d", "polspec4")
    fd("ALTER TABLE pol_d SET ROW FILTER (region < 28)")
    val before = fd("SELECT count(*) AS n FROM pol_d").head().getLong(0)
    for (stmt <- Seq("DELETE FROM pol_d WHERE k = 1",
        "UPDATE pol_d SET bal = 0.0 WHERE k = 1",
        "TRUNCATE TABLE pol_d")) {
      val e = intercept[IllegalArgumentException] { fd(stmt) }
      assert(e.getMessage.contains("policy-protected"), s"$stmt: $e")
    }
    // nothing committed, reads unchanged
    assert(fd("SELECT count(*) AS n FROM pol_d").head().getLong(0) == before)
    // INSERT reads nothing — open to everyone
    fd("INSERT INTO pol_d SELECT 9L AS k, 'zed' AS who, 1 AS region, " +
      "1.0 AS bal")
    assert(fd("SELECT count(*) AS n FROM pol_d").head().getLong(0)
      == before + 1)
    // the privileged session may run the DML
    spark.conf.set("graft.policy.bypass", "true")
    try fd("DELETE FROM pol_d WHERE k = 9")
    finally spark.conf.set("graft.policy.bypass", "false")
    assert(fd("SELECT count(*) AS n FROM pol_d").head().getLong(0) == before)
    // and dropping the policies restores unprivileged DML
    fd("ALTER TABLE pol_d DROP ROW FILTER")
    fd("DELETE FROM pol_d WHERE k = 1")
    // raw table: 4 seed rows + row 9 − deleted rows 9 and 1 = 3
    assert(fd("SELECT count(*) AS n FROM pol_d").head().getLong(0) == 3)
    LakeSql.unregister("pol_d")
  }

  test("a row filter's predicate reaches the parquet scan as a pushed " +
      "filter — the policy is not a post-scan residual") {
    freshTable("pol_s", "polspec5")
    fd("ALTER TABLE pol_s SET ROW FILTER (region < 28)")
    val p = fd("SELECT k FROM pol_s").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("LessThan(region,28)"),
      s"policy predicate not pushed:\n$p")
    LakeSql.unregister("pol_s")
  }

  test("DDL-time validation: unknown column, non-boolean filter, and " +
      "uncastable mask all reject with nothing committed") {
    freshTable("pol_v", "polspec3")
    val v0 = fd("SELECT count(*) AS n FROM pol_v").head().getLong(0)
    intercept[Exception] {
      fd("ALTER TABLE pol_v SET ROW FILTER (no_such > 1)")
    }
    intercept[Exception] {
      fd("ALTER TABLE pol_v ALTER COLUMN nope SET MASK ('x')")
    }
    // nothing landed: reads are unchanged
    assert(fd("SELECT count(*) AS n FROM pol_v").head().getLong(0) == v0)
    LakeSql.unregister("pol_v")
  }
}
