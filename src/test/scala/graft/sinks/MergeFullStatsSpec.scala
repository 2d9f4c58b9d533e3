package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Three-clause MERGE (not-matched-by-source delete), metadata-only
  * aggregates, and CHECK-constraint-enforced appends over the version log
  * (north-star depth beyond the reference's two-clause staged MERGE,
  * run_load.py:82). */
class MergeFullStatsSpec extends SparkSpec {

  private def data = spark.range(10000)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))

  private def freshLayout(): (String, Int) = {
    val dir = tmpDir("mfs")
    Layout.zorderWrite(data, Seq("id", "x"), s"$dir/z", nFiles = 16)
    val v1 = Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("id", "x")), s"$dir/m")
    (dir, v1)
  }

  test("mergeCommitFull updates, inserts, and retires unmatched in-box rows") {
    val (dir, _) = freshLayout()
    // updates: ids 1000-1999 with y bumped; inserts: fresh ids above range
    val updates = data.filter(col("id").between(1000, 1999))
      .withColumn("y", col("y") + 10000)
    val inserts = spark.range(20000, 20100)
      .select(col("id"), lit(1L).as("x"), lit(2L).as("y"))
    val box = Seq(("id", 5000.0, 5999.0))
    val res = Snapshots.mergeCommitFull(spark, updates.unionByName(inserts),
      "id", Seq("id", "x"), s"$dir/z", s"$dir/m", nFiles = 16, box)
    assert(res.filesRewritten < res.filesTotal)
    assert(res.rowsUpdated == 1000L)
    assert(res.rowsInserted == 100L)
    assert(res.rowsDeleted == 1000L) // ids 5000-5999, none in source
    val head = Snapshots.tableAt(spark, s"$dir/m", res.version)
    assert(head.count() == 10000L - 1000L + 100L)
    assert(head.filter(col("id").between(5000, 5999)).isEmpty)
    assert(head.filter(col("id").between(1000, 1999) &&
      col("y") < 10000).isEmpty) // every matched row took the source value
    assert(head.filter(col("id") >= 20000).count() == 100L)
    // out-of-box unmatched rows survive untouched
    assert(head.filter(col("id").between(2000, 4999)).count() == 3000L)
  }

  test("mergeCommitFull with source keys inside the box keeps those rows") {
    val (dir, _) = freshLayout()
    val updates = data.filter(col("id").between(5000, 5499))
      .withColumn("y", col("y") + 10000)
    val box = Seq(("id", 5000.0, 5999.0))
    val res = Snapshots.mergeCommitFull(spark, updates, "id",
      Seq("id", "x"), s"$dir/z", s"$dir/m", nFiles = 8, box)
    assert(res.rowsUpdated == 500L && res.rowsDeleted == 500L)
    val head = Snapshots.tableAt(spark, s"$dir/m", res.version)
    assert(head.filter(col("id").between(5000, 5499)).count() == 500L)
    assert(head.filter(col("id").between(5500, 5999)).isEmpty)
  }

  test("statsAggAt serves count/min/max from the manifest and matches a scan") {
    val (dir, v1) = freshLayout()
    val meta = Snapshots.statsAggAt(spark, s"$dir/m", v1, Seq("id", "x"))
    assert(meta.rows == 10000L)
    assert(meta.mins("id") == 0.0 && meta.maxs("id") == 9999.0)
    val r = data.agg(min(col("x")).cast("double"),
      max(col("x")).cast("double")).collect()(0)
    assert(meta.mins("x") == r.getDouble(0) && meta.maxs("x") == r.getDouble(1))
  }

  test("statsAggAt refuses a manifest with partially-missing stats") {
    val (dir, v1) = freshLayout()
    // append a generation whose manifest rows carry stats for a DIFFERENT
    // column set: min_x/max_x exist, min_id/max_id are null on those rows
    val batch = spark.range(20000, 20500)
      .select(col("id"), lit(3L).as("x"), lit(4L).as("y"))
    val staging = s"$dir/z.partial_staging"
    batch.write.mode("overwrite").parquet(staging)
    val moved = spark.read.parquet(staging)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSeq
    val prev = Snapshots.manifestAt(spark, s"$dir/m", v1)
    val next = prev.unionByName(
      Layout.buildManifestFor(spark, moved, Seq("x")),
      allowMissingColumns = true)
    val v2 = Snapshots.commit(spark, next, s"$dir/m")
    val e = intercept[IllegalArgumentException] {
      Snapshots.statsAggAt(spark, s"$dir/m", v2, Seq("id", "x"))
    }
    assert(e.getMessage.contains("lack stats"))
    // the fully-covered column set still serves
    assert(Snapshots.statsAggAt(spark, s"$dir/m", v2, Seq("x")).rows > 0)
  }

  test("statsAggAt refuses a DV-masked manifest, serves again after purge") {
    val (dir, _) = freshLayout()
    val mor = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    assert(mor.rowsDeleted > 0)
    intercept[IllegalArgumentException] {
      Snapshots.statsAggAt(spark, s"$dir/m", mor.version, Seq("id", "x"))
    }
    val purge = Dv.purgeDv(spark, s"$dir/z", s"$dir/m", Seq("id", "x"))
    val meta = Snapshots.statsAggAt(spark, s"$dir/m", purge.version,
      Seq("id", "x"))
    assert(meta.rows == data.filter(!col("x").between(100, 199)).count())
  }

  test("appendCommitChecked rejects a violating batch atomically") {
    val (dir, v1) = freshLayout()
    val p = new org.apache.hadoop.fs.Path(s"$dir/z")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(): Set[String] =
      fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
    val before = files()
    val bad = spark.range(20000, 20100)
      .select(col("id"), lit(-5L).as("x"), lit(0L).as("y"))
    intercept[Snapshots.ConstraintViolationException] {
      Snapshots.appendCommitChecked(spark, bad, Seq("id", "x"), s"$dir/z",
        s"$dir/m", 4, col("x") >= 0, "x_nonneg")
    }
    assert(files() == before)
    assert(Snapshots.versions(spark, s"$dir/m") == Seq(v1))
    // NULL passes the check (SQL CHECK semantics) and a clean batch lands
    // (the checked column is NOT a stats column, so null stats can't leak
    // into the manifest's pruning ranges)
    val nullBatch = spark.range(20000, 20100)
      .select(col("id"), lit(5L).as("x"), lit(null).cast("long").as("y"))
    val (v2, n) = Snapshots.appendCommitChecked(spark, nullBatch,
      Seq("id", "x"), s"$dir/z", s"$dir/m", 4, col("y") >= 0, "y_nonneg")
    assert(n > 0)
    assert(Snapshots.tableAt(spark, s"$dir/m", v2).count() == 10100L)
  }
}
