package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RESTORE-to-version and SHALLOW CLONE over the version log — both are
  * metadata-only commits that re-reference existing immutable data files
  * (north-star table-format depth beyond the reference's overwrite loads,
  * run_load.py:61; Delta RESTORE / SHALLOW CLONE semantics). */
class RestoreCloneSpec extends SparkSpec {

  private def data = spark.range(8000)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))

  private def freshLayout(): (String, Int) = {
    val dir = tmpDir("rc")
    Layout.zorderWrite(data, Seq("x", "y"), s"$dir/z", nFiles = 8)
    val v1 = Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("x", "y")), s"$dir/m")
    (dir, v1)
  }

  private def dataFiles(dir: String): Set[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/z")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => (st.getPath.getName, st.getModificationTime)).toSet
  }

  test("restoreCommit rolls back a delete without touching data files") {
    val (dir, v1) = freshLayout()
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m",
      Seq("x", "y"), Seq(("x", 100.0, 199.0)))
    val v2 = Snapshots.latestVersion(spark, s"$dir/m")
    val before = dataFiles(dir)
    val v3 = Snapshots.restoreCommit(spark, s"$dir/m", v1)
    assert(v3 == v2 + 1)
    assert(dataFiles(dir) == before) // metadata-only
    // restored head serves the complete pre-delete table
    assert(Snapshots.tableAt(spark, s"$dir/m", v3).count() == 8000L)
    // history is preserved, not erased: the post-delete version still pins
    val survivors = data.filter(!col("x").between(100, 199)).count()
    assert(Snapshots.tableAt(spark, s"$dir/m", v2).count() == survivors)
    // the restore feed is the delete's inverse: pure re-inserts of the band
    val feed = Snapshots.changesBetween(spark, s"$dir/m", v2, v3)
    assert(feed.df.filter(col("change_type") =!= "insert").isEmpty)
    val band = data.filter(col("x").between(100, 199))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(feed.df.select("id").collect().map(_.getLong(0)).toSet == band)
  }

  test("restoreCommit rejects an unknown version") {
    val (dir, _) = freshLayout()
    intercept[IllegalArgumentException] {
      Snapshots.restoreCommit(spark, s"$dir/m", 99)
    }
  }

  test("restore re-asserts the column mapping in force at the target") {
    val (dir, v1) = freshLayout()
    Snapshots.renameColumn(spark, s"$dir/m", "x", "x2")
    val vHead = Snapshots.latestVersion(spark, s"$dir/m")
    assert(Snapshots.mappedTableAt(spark, s"$dir/m", vHead)
      .columns.contains("x2"))
    val vr = Snapshots.restoreCommit(spark, s"$dir/m", v1)
    // target predates the rename: restored head serves raw physical names
    val cols = Snapshots.mappedTableAt(spark, s"$dir/m", vr).columns.toSet
    assert(cols.contains("x") && !cols.contains("x2"))
  }

  test("cloneCommit aliases the source files and evolves independently") {
    val (dir, v1) = freshLayout()
    val cloneDir = tmpDir("rc_clone")
    val cv1 = Snapshots.cloneCommit(spark, s"$dir/m", s"$cloneDir/m", v1)
    assert(cv1 == 1)
    // zero copy: identical file sets by absolute path, no clone data dir
    val srcFiles = Snapshots.manifestAt(spark, s"$dir/m", v1)
      .select("file").collect().map(_.getString(0)).toSet
    val cloneFiles = Snapshots.manifestAt(spark, s"$cloneDir/m", cv1)
      .select("file").collect().map(_.getString(0)).toSet
    assert(srcFiles == cloneFiles && srcFiles.nonEmpty)
    assert(dataFiles(cloneDir).isEmpty)
    // clone-side delete: survivors land in the CLONE's data dir; source
    // log and head are untouched
    new org.apache.hadoop.fs.Path(s"$cloneDir/z")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(s"$cloneDir/z"))
    val res = Snapshots.deleteWhere(spark, s"$cloneDir/z", s"$cloneDir/m",
      Seq("x", "y"), Seq(("x", 100.0, 199.0)))
    assert(res.rowsDeleted > 0)
    assert(dataFiles(cloneDir).nonEmpty)
    assert(dataFiles(dir).size == 8) // source layout untouched
    assert(Snapshots.versions(spark, s"$dir/m") == Seq(v1))
    assert(Snapshots.tableAt(spark, s"$dir/m", v1).count() == 8000L)
    val survivors = data.filter(!col("x").between(100, 199)).count()
    assert(Snapshots.tableAt(spark, s"$cloneDir/m",
      Snapshots.latestVersion(spark, s"$cloneDir/m")).count() == survivors)
  }

  test("cloneCommit refuses a destination that already has commits") {
    val (dir, v1) = freshLayout()
    val cloneDir = tmpDir("rc_clone2")
    Snapshots.cloneCommit(spark, s"$dir/m", s"$cloneDir/m", v1)
    intercept[IllegalArgumentException] {
      Snapshots.cloneCommit(spark, s"$dir/m", s"$cloneDir/m", v1)
    }
  }
}
