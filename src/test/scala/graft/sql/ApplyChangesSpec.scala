package graft.sql

import graft.SparkSpec
import graft.sinks.Snapshots

/** APPLY CHANGES → SCD2: interval semantics per change kind, incremental
  * cursor mechanics, replay exactly-once, and the crash window between
  * the CLOSE merge and the OPEN append. */
class ApplyChangesSpec extends SparkSpec {

  private def fd(sql: String) = LakeSql.sql(spark, sql)

  private def fixture(tag: String): String = {
    import spark.implicits._
    val root = tmpDir(tag)
    LakeSql.unregister("ac_src")
    LakeSql.unregister("ac_scd")
    LakeSql.setWarehouse(root)
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v").createOrReplaceTempView("ac_src_v")
    fd("CREATE TABLE ac_src TBLPROPERTIES('stats_cols'='k','files'='1') " +
      "AS SELECT * FROM ac_src_v")
    fd(s"""CREATE TABLE ac_scd (k BIGINT, name STRING, v DOUBLE,
      start_at BIGINT, end_at BIGINT, is_current BOOLEAN)
      USING lake LOCATION '$root/scd'
      TBLPROPERTIES ('stats_cols' = 'k,start_at', 'files' = '1')""")
    root
  }

  private def history(): Set[(Long, String, Double, Long, Option[Long], Boolean)] =
    fd("SELECT k, name, v, start_at, end_at, is_current FROM ac_scd")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5))).toSet

  test("update closes and reopens, delete closes, new-key insert opens; " +
      "incremental apply processes only unseen commits; replay is a no-op") {
    val root = fixture("acspec")
    val srcRoot = s"$root/ac_src/m"
    val r1 = ApplyChanges.scd2(spark, srcRoot, "ac_scd", "k",
      Seq("name", "v"))
    assert(r1.commitsApplied == 1 && r1.toVersion == 1)
    assert(history() == Set(
      (1L, "a", 10.0, 1L, None, true),
      (2L, "b", 20.0, 1L, None, true),
      (3L, "c", 30.0, 1L, None, true)))
    // v2 = update k=2, v3 = delete k=3, v4 = insert k=4
    fd("UPDATE ac_src SET v = 22.0 WHERE k = 2")
    fd("DELETE FROM ac_src WHERE k = 3")
    fd("INSERT INTO ac_src SELECT 4L AS k, 'd' AS name, 40.0 AS v")
    val r2 = ApplyChanges.scd2(spark, srcRoot, "ac_scd", "k",
      Seq("name", "v"))
    assert(r2.fromVersion == 1 && r2.toVersion == 4 &&
      r2.commitsApplied == 3)
    assert(history() == Set(
      (1L, "a", 10.0, 1L, None, true),
      (2L, "b", 20.0, 1L, Some(2L), false),
      (2L, "b", 22.0, 2L, None, true),
      (3L, "c", 30.0, 1L, Some(3L), false),
      (4L, "d", 40.0, 4L, None, true)))
    val r3 = ApplyChanges.scd2(spark, srcRoot, "ac_scd", "k",
      Seq("name", "v"))
    assert(r3.commitsApplied == 0 && r3.fromVersion == 4)
    LakeSql.unregister("ac_src"); LakeSql.unregister("ac_scd")
  }

  test("crash window: a CLOSE that landed without its OPEN replays " +
      "cleanly — the re-run closes nothing twice and the history ends " +
      "exactly as the uncrashed run's") {
    val root = fixture("acspec2")
    val srcRoot = s"$root/ac_src/m"
    ApplyChanges.scd2(spark, srcRoot, "ac_scd", "k", Seq("name", "v"))
    fd("UPDATE ac_src SET v = 99.0 WHERE k = 1")
    // simulate the crash: run ONLY the close half of v2's apply (what a
    // death between the two commits leaves behind — closed interval, no
    // reopened row, NO cursor tag)
    import spark.implicits._
    Seq(1L).toDF("k").createOrReplaceTempView("crash_close")
    fd("MERGE INTO ac_scd t USING crash_close s ON t.k = s.k " +
      "WHEN MATCHED AND t.is_current = true AND t.start_at < 2L " +
      "THEN UPDATE SET end_at = 2L, is_current = false")
    assert(!history().exists(h => h._1 == 1L && h._6))
    // the replayed apply completes v2: close matches nothing new, the
    // open lands, the cursor tag rides it
    val r = ApplyChanges.scd2(spark, srcRoot, "ac_scd", "k",
      Seq("name", "v"))
    assert(r.commitsApplied == 1)
    assert(history().count(_._1 == 1L) == 2 &&
      history().contains((1L, "a", 99.0, 2L, None, true)))
    // and the target log carries exactly one scd2_2 tag
    assert(Snapshots.versionForTag(spark,
      LakeSql.specOf("ac_scd").get.manifestRoot, "scd2_2").nonEmpty)
    LakeSql.unregister("ac_src"); LakeSql.unregister("ac_scd")
  }

  test("cursor scan is bounded by commits since the last apply, not log " +
      "length: a long tagged history lists ONE dir; intervening non-apply " +
      "commits add only themselves to the scan") {
    val root = fixture("acspec3")
    val srcRoot = s"$root/ac_src/m"
    ApplyChanges.scd2(spark, srcRoot, "ac_scd", "k", Seq("name", "v"))
    // grow the source log: 10 commits, each applied → the target log ends
    // with a tagged apply commit at its head
    for (i <- 1 to 10)
      fd(s"UPDATE ac_src SET v = v + 1.0 WHERE k = ${(i % 3) + 1}")
    ApplyChanges.scd2(spark, srcRoot, "ac_scd", "k", Seq("name", "v"))
    val tgtRoot = LakeSql.specOf("ac_scd").get.manifestRoot
    val total = Snapshots.versions(spark, tgtRoot).size
    assert(total >= 11, s"fixture should have a long target log, got $total")
    val (cursor1, scanned1) = ApplyChanges.cursorScan(spark, tgtRoot)
    assert(cursor1 == 11, s"cursor should be at source head 11, got $cursor1")
    assert(scanned1 == 1,
      s"descending stop-at-first-tag must list exactly 1 dir, got $scanned1")
    // non-apply commits on the TARGET (metadata-only property sets) sit
    // between the head and the last tag: the scan pays exactly for them
    for (i <- 1 to 3)
      Snapshots.setProperties(spark, tgtRoot, Map(s"note$i" -> "x"))
    val (cursor2, scanned2) = ApplyChanges.cursorScan(spark, tgtRoot)
    assert(cursor2 == 11 && scanned2 == 4,
      s"expected (11, 4), got ($cursor2, $scanned2)")
    LakeSql.unregister("ac_src"); LakeSql.unregister("ac_scd")
  }
}
