package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {

  private def data = spark.range(10000)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))

  private def freshLayout(): (String, Int) = {
    val dir = tmpDir("snap")
    Layout.zorderWrite(data, Seq("x", "y"), s"$dir/z", nFiles = 16)
    val v1 = Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("x", "y")), s"$dir/m")
    (dir, v1)
  }

  test("commit assigns increasing versions; tableAt pins each snapshot") {
    val (dir, v1) = freshLayout()
    assert(v1 == 1)
    assert(Snapshots.versions(spark, s"$dir/m") == Seq(1))
    val res = Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m",
      Seq("x", "y"), Seq(("x", 100.0, 199.0)))
    assert(res.rowsDeleted > 0)
    assert(Snapshots.versions(spark, s"$dir/m") == Seq(1, 2))
    // v1 still serves the COMPLETE pre-delete table
    assert(Snapshots.tableAt(spark, s"$dir/m", 1).count() == 10000L)
    // v2 is exactly the survivors
    val expected = data.filter(!col("x").between(100, 199)).count()
    assert(Snapshots.tableAt(spark, s"$dir/m", 2).count() == expected)
  }

  test("readAt time-travels a pruned box read past a delete") {
    val (dir, v1) = freshLayout()
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m",
      Seq("x", "y"), Seq(("x", 100.0, 199.0)))
    val pr = Snapshots.readAt(spark, s"$dir/m", v1,
      Seq(("x", 100.0, 199.0), ("y", 300.0, 399.0)))
    val expected = data.filter(col("x").between(100, 199) &&
      col("y").between(300, 399)).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty)
    assert(pr.df.select("id").collect().map(_.getLong(0)).toSet == expected)
    assert(pr.filesRead < pr.filesTotal) // still stats-pruned, not a full scan
  }

  test("vacuum drops expired versions and exactly the superseded files") {
    val (dir, _) = freshLayout()
    val res = Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m",
      Seq("x", "y"), Seq(("x", 100.0, 199.0)))
    val vac = Snapshots.vacuum(spark, s"$dir/z", s"$dir/m", retainLast = 1)
    assert(vac.versionsDropped == 1)
    assert(vac.filesDeleted == res.filesRewritten)
    assert(Snapshots.versions(spark, s"$dir/m") == Seq(2))
    // the retained snapshot is untouched by the reclaim
    val expected = data.filter(!col("x").between(100, 199)).count()
    assert(Snapshots.tableAt(spark, s"$dir/m", 2).count() == expected)
  }

  test("vacuum retaining all versions deletes nothing") {
    val (dir, _) = freshLayout()
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m",
      Seq("x", "y"), Seq(("x", 100.0, 199.0)))
    val vac = Snapshots.vacuum(spark, s"$dir/z", s"$dir/m", retainLast = 2)
    assert(vac.versionsDropped == 0 && vac.filesDeleted == 0)
    assert(Snapshots.tableAt(spark, s"$dir/m", 1).count() == 10000L)
  }

  test("deliberate failure: vacuum must retain at least one version") {
    val (dir, _) = freshLayout()
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, s"$dir/z", s"$dir/m", retainLast = 0)
    }
  }

  test("deliberate failure: latestVersion on an empty log throws") {
    intercept[IllegalArgumentException] {
      Snapshots.latestVersion(spark, tmpDir("snap_empty") + "/m")
    }
  }
}
