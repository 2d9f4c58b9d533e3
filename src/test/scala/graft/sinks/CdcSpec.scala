package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CDC replication: feed-sized apply, tag-derived cursor, crash-window
  * idempotence. */
class CdcSpec extends SparkSpec {

  private def data = spark.range(8000)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))

  private val cols = Seq("id", "x")

  private def freshSrc(): String = {
    val dir = tmpDir("cdc")
    Layout.zorderWrite(data.filter(col("id") % 4 =!= 0), cols,
      s"$dir/src/z", nFiles = 8)
    Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/src/z", cols), s"$dir/src/m")
    dir
  }

  private def mirrorIds(dir: String): Set[Long] =
    Snapshots.tableAt(spark, s"$dir/mir/m",
        Snapshots.latestVersion(spark, s"$dir/mir/m"))
      .select("id").collect().map(_.getLong(0)).toSet

  private def srcIds(dir: String): Set[Long] =
    Snapshots.tableAt(spark, s"$dir/src/m",
        Snapshots.latestVersion(spark, s"$dir/src/m"))
      .select("id").collect().map(_.getLong(0)).toSet

  test("bootstrap + incremental sync mirrors appends, deletes, and merges") {
    val dir = freshSrc()
    val boot = Cdc.sync(spark, s"$dir/src/m", s"$dir/mir/z", s"$dir/mir/m",
      "id", cols)
    assert(boot.commitsApplied == 1)
    assert(mirrorIds(dir) == srcIds(dir))
    // src evolves: append, band delete, and a merge (update+insert)
    Snapshots.appendCommit(spark, data.filter(col("id") % 4 === 0), cols,
      s"$dir/src/z", s"$dir/src/m", nFiles = 4)
    Snapshots.deleteWhere(spark, s"$dir/src/z", s"$dir/src/m", cols,
      Seq(("x", 100.0, 199.0)))
    val updates = data.filter(col("id").between(1000, 1499))
      .filter(!col("x").between(100, 199))
      .withColumn("y", col("y") + 50000)
    Snapshots.mergeCommit(spark, updates, "id", cols,
      s"$dir/src/z", s"$dir/src/m", nFiles = 8)
    val inc = Cdc.sync(spark, s"$dir/src/m", s"$dir/mir/z", s"$dir/mir/m",
      "id", cols)
    assert(inc.commitsApplied == 3 && inc.replaysSkipped == 0)
    assert(mirrorIds(dir) == srcIds(dir))
    // updated rows carry the NEW values on the mirror
    val mirY = Snapshots.tableAt(spark, s"$dir/mir/m",
        Snapshots.latestVersion(spark, s"$dir/mir/m"))
      .filter(col("id").between(1000, 1499) && col("y") >= 50000).count()
    assert(mirY == updates.count())
  }

  test("replayed sync is exactly-once: zero applies, zero new versions") {
    val dir = freshSrc()
    Cdc.sync(spark, s"$dir/src/m", s"$dir/mir/z", s"$dir/mir/m", "id", cols)
    Snapshots.deleteWhere(spark, s"$dir/src/z", s"$dir/src/m", cols,
      Seq(("x", 100.0, 199.0)))
    Cdc.sync(spark, s"$dir/src/m", s"$dir/mir/z", s"$dir/mir/m", "id", cols)
    val vs = Snapshots.versions(spark, s"$dir/mir/m")
    val replay = Cdc.sync(spark, s"$dir/src/m", s"$dir/mir/z", s"$dir/mir/m",
      "id", cols)
    // the tag-derived cursor already sits at the head: nothing re-applies
    assert(replay.commitsApplied == 0)
    assert(replay.fromVersion == replay.toVersion)
    assert(Snapshots.versions(spark, s"$dir/mir/m") == vs)
    assert(mirrorIds(dir) == srcIds(dir))
  }

  test("crash between the delete half and the tagged append replays cleanly") {
    val dir = freshSrc()
    Cdc.sync(spark, s"$dir/src/m", s"$dir/mir/z", s"$dir/mir/m", "id", cols)
    // src: one merge commit = deletes (old rows) + inserts (new rows)
    val updates = data.filter(col("id").between(2000, 2499) &&
      col("id") % 4 =!= 0).withColumn("y", col("y") + 50000)
    Snapshots.mergeCommit(spark, updates, "id", cols,
      s"$dir/src/z", s"$dir/src/m", nFiles = 8)
    val srcHead = Snapshots.latestVersion(spark, s"$dir/src/m")
    // simulate the crash: apply ONLY the delete half, no tag
    val feed = Snapshots.changesBetween(spark, s"$dir/src/m",
      srcHead - 1, srcHead).df.localCheckpoint()
    Dv.deleteKeysMoR(spark, s"$dir/mir/z", s"$dir/mir/m", "id",
      feed.filter(col("change_type") === "delete").select(col("id")))
    // resume: the tag is absent, so sync re-applies — the second delete
    // masks nothing (already masked), the append lands with the tag
    val resume = Cdc.sync(spark, s"$dir/src/m", s"$dir/mir/z", s"$dir/mir/m",
      "id", cols)
    assert(resume.commitsApplied == 1)
    assert(mirrorIds(dir) == srcIds(dir))
    val mirY = Snapshots.tableAt(spark, s"$dir/mir/m",
        Snapshots.latestVersion(spark, s"$dir/mir/m"))
      .filter(col("y") >= 50000).count()
    assert(mirY == updates.count()) // updates applied exactly once
  }
}
