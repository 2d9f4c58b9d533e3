package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Merge-on-read deletion vectors over the version log. */
class DvSpec extends SparkSpec {

  private def data = spark.range(10000)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))

  private def freshLayout(): (String, Int) = {
    val dir = tmpDir("dv")
    Layout.zorderWrite(data, Seq("x", "y"), s"$dir/z", nFiles = 16)
    val v1 = Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("x", "y")), s"$dir/m")
    (dir, v1)
  }

  private def dataFiles(dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/z")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
  }

  test("MoR delete masks rows without writing a single data file") {
    val (dir, v1) = freshLayout()
    val before = dataFiles(dir)
    val res = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    assert(res.rowsDeleted == data.filter(col("x").between(100, 199)).count())
    assert(res.dataFilesWritten == 0)
    assert(res.filesMasked > 0 && res.filesMasked < res.filesTotal)
    assert(dataFiles(dir) == before) // data file set byte-identical
    // latest read excludes exactly the band; pinned v1 still serves it
    val expected = data.filter(!col("x").between(100, 199))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(Snapshots.tableAt(spark, s"$dir/m", res.version)
      .select("id").collect().map(_.getLong(0)).toSet == expected)
    assert(Snapshots.tableAt(spark, s"$dir/m", v1).count() == 10000L)
  }

  test("second MoR delete on the same files extends the mask, not resets it") {
    val (dir, _) = freshLayout()
    val r1 = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    val r2 = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 150.0, 299.0))) // overlaps r1's files
    // [150,199] is already masked by r1 — only the still-live remainder of
    // the second band counts as newly deleted
    assert(r2.rowsDeleted == data.filter(col("x").between(200, 299)).count())
    val expected = data.filter(!col("x").between(100, 299))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(Snapshots.tableAt(spark, s"$dir/m", r2.version)
      .select("id").collect().map(_.getLong(0)).toSet == expected)
    // the intermediate version still serves exactly the first band's absence
    assert(Snapshots.tableAt(spark, s"$dir/m", r1.version).count() ==
      data.filter(!col("x").between(100, 199)).count())
  }

  test("key-targeted MoR delete masks scattered rows at O(deleted) cost") {
    // stats manifest carries id bounds too: the key planner prunes on them
    val dir = tmpDir("dvk")
    Layout.zorderWrite(data, Seq("x", "y"), s"$dir/z", nFiles = 16)
    Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("x", "y", "id")), s"$dir/m")
    val before = dataFiles(dir)
    val victims = data.filter(col("id") % 1000 === 7).select(col("id"))
    val res = Dv.deleteKeysMoR(spark, s"$dir/z", s"$dir/m", "id",
      victims.withColumnRenamed("id", "id"))
    assert(res.rowsDeleted == 10L)
    assert(res.dataFilesWritten == 0)
    assert(dataFiles(dir) == before)
    val got = Snapshots.tableAt(spark, s"$dir/m", res.version)
      .filter(col("id") % 1000 === 7).count()
    assert(got == 0L)
    assert(Snapshots.tableAt(spark, s"$dir/m", res.version).count() == 9990L)
  }

  test("change feed of a MoR delete is exactly the masked rows as deletes") {
    val (dir, v1) = freshLayout()
    val res = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    val feed = Snapshots.changesBetween(spark, s"$dir/m", v1, res.version)
    assert(feed.filesRead < feed.filesTotal) // touch-set-bounded
    val fr = feed.df.select(col("id"), col("change_type")).collect()
    assert(fr.forall(_.getString(1) == "delete"))
    val expected = data.filter(col("x").between(100, 199))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(fr.map(_.getLong(0)).toSet == expected)
  }

  test("pruned readAt subtracts the mask on the pruned slice") {
    val (dir, _) = freshLayout()
    val res = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0), ("y", 0.0, 499.0)))
    val pr = Snapshots.readAt(spark, s"$dir/m", res.version,
      Seq(("x", 100.0, 299.0)))
    assert(pr.filesRead < pr.filesTotal)
    val expected = data.filter(col("x").between(100, 299) &&
      !(col("x").between(100, 199) && col("y").between(0, 499)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pr.df.select("id").collect().map(_.getLong(0)).toSet == expected)
  }

  test("compaction folds deletion vectors: same rows, no masks, empty feed") {
    val (dir, _) = freshLayout()
    val del = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    val (v3, _, nOut) = Snapshots.compactCommit(spark, s"$dir/z", s"$dir/m",
      Seq("x", "y"), nFiles = 4)
    assert(nOut == 4)
    // no dv pointers survive the rewrite
    val m3 = Dv.ensureDv(Snapshots.manifestAt(spark, s"$dir/m", v3))
    assert(m3.filter(col("dv").isNotNull).count() == 0L)
    // rows identical to the masked read they replaced
    val expected = data.filter(!col("x").between(100, 199))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(Snapshots.tableAt(spark, s"$dir/m", v3)
      .select("id").collect().map(_.getLong(0)).toSet == expected)
    // a pure fold is invisible to CDC
    assert(Snapshots.changesBetween(spark, s"$dir/m", del.version, v3)
      .df.isEmpty)
  }

  test("copy-on-write delete and merge over masked files do not resurrect masked rows") {
    val cols = Seq("x", "y", "id") // id stats so the merge can key on id
    val dir = tmpDir("dvm")
    Layout.zorderWrite(data, Seq("x", "y"), s"$dir/z", nFiles = 16)
    Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", cols), s"$dir/m")
    Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m", Seq(("x", 100.0, 199.0)))
    // CoW delete whose touch set overlaps the masked files
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", cols,
      Seq(("x", 150.0, 249.0)))
    val afterDel = Snapshots.tableAt(spark, s"$dir/m",
      Snapshots.latestVersion(spark, s"$dir/m"))
    assert(afterDel.filter(col("x").between(100, 249)).count() == 0L)
    // merge sourcing keys that live in masked files must not revive them
    val src = data.filter(col("x").between(250, 259))
      .withColumn("y", col("y") + 5000)
    val mr = Snapshots.mergeCommit(spark, src, "id", cols,
      s"$dir/z", s"$dir/m", nFiles = 4)
    val afterMerge = Snapshots.tableAt(spark, s"$dir/m", mr.version)
    assert(afterMerge.filter(col("x").between(100, 249)).count() == 0L)
    assert(afterMerge.count() ==
      data.filter(!col("x").between(100, 249)).count())
  }

  test("vacuum reclaims sidecars no retained version references") {
    val (dir, _) = freshLayout()
    val r1 = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    // compaction folds the mask; the sidecar is now referenced only by r1's
    // version (and the manifest rows that shared it)
    Snapshots.compactCommit(spark, s"$dir/z", s"$dir/m", Seq("x", "y"), 4)
    val dvDir = new org.apache.hadoop.fs.Path(s"$dir/z/_dv")
    val fs = dvDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(dvDir).count(_.isDirectory) == 1)
    val vac = Snapshots.vacuum(spark, s"$dir/z", s"$dir/m", retainLast = 1)
    assert(vac.filesDeleted > 0)
    assert(!fs.exists(dvDir) || fs.listStatus(dvDir).isEmpty)
    // retained snapshot unharmed
    assert(Snapshots.tableAt(spark, s"$dir/m",
      Snapshots.latestVersion(spark, s"$dir/m")).count() ==
      data.filter(!col("x").between(100, 199)).count())
    // and a retained-mask vacuum keeps the sidecar a pinned read needs
    val (dir2, _) = freshLayout()
    val r2 = Dv.deleteWhereMoR(spark, s"$dir2/z", s"$dir2/m",
      Seq(("x", 100.0, 199.0)))
    Snapshots.vacuum(spark, s"$dir2/z", s"$dir2/m", retainLast = 1)
    assert(Snapshots.tableAt(spark, s"$dir2/m", r2.version).count() ==
      data.filter(!col("x").between(100, 199)).count())
  }

  test("append after a MoR delete keeps masks and serves the union") {
    val (dir, _) = freshLayout()
    val del = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    val batch = spark.range(10000, 11000)
      .select(col("id"),
        pmod(xxhash64(col("id")), lit(1000)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))
    val (v3, _) = Snapshots.appendCommit(spark, batch, Seq("x", "y"),
      s"$dir/z", s"$dir/m", nFiles = 2)
    val expected = data.filter(!col("x").between(100, 199)).count() + 1000
    assert(Snapshots.tableAt(spark, s"$dir/m", v3).count() == expected)
    // the append's feed is pure inserts — the untouched masks cancel
    val feed = Snapshots.changesBetween(spark, s"$dir/m", del.version, v3)
    assert(feed.df.filter(col("change_type") =!= "insert").isEmpty)
    assert(feed.df.count() == 1000L)
  }

  test("purgeDv rewrites only the masked files and clears every dv pointer") {
    val (dir, _) = freshLayout()
    val del = Dv.deleteWhereMoR(spark, s"$dir/z", s"$dir/m",
      Seq(("x", 100.0, 199.0)))
    val masked = Snapshots.manifestAt(spark, s"$dir/m", del.version)
      .filter(col("dv").isNotNull).select("file").collect()
      .map(r => Layout.fileName(r.getString(0))).toSet
    assert(masked.nonEmpty && masked.size < 16)
    val p = new org.apache.hadoop.fs.Path(s"$dir/z")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stamps(): Map[String, Long] =
      fs.listStatus(p).filter(_.isFile)
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
    val before = stamps()
    val res = Dv.purgeDv(spark, s"$dir/z", s"$dir/m", Seq("x", "y"))
    assert(res.filesPurged == masked.size)
    assert(res.dataFilesWritten > 0)
    // unmasked files byte-untouched (same mtime); purged head dv-free
    val after = stamps()
    assert(before.filterNot { case (n, _) => masked.contains(n) }
      .forall { case (n, ts) => after.get(n).contains(ts) })
    assert(Dv.ensureDv(Snapshots.manifestAt(spark, s"$dir/m", res.version))
      .filter(col("dv").isNotNull).isEmpty)
    // same rows as the MoR head: the purge is invisible to the feed
    val expected = data.filter(!col("x").between(100, 199))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(Snapshots.tableAt(spark, s"$dir/m", res.version)
      .select("id").collect().map(_.getLong(0)).toSet == expected)
    assert(Snapshots.changesBetween(spark, s"$dir/m",
      del.version, res.version).df.isEmpty)
    // pinned pre-purge version still masks through its sidecar
    assert(Snapshots.tableAt(spark, s"$dir/m", del.version)
      .count() == expected.size.toLong)
  }

  test("purgeDv on a mask-free table is a no-op") {
    val (dir, v1) = freshLayout()
    val res = Dv.purgeDv(spark, s"$dir/z", s"$dir/m", Seq("x", "y"))
    assert(res.version == v1 && res.filesPurged == 0 &&
      res.dataFilesWritten == 0)
  }
}
