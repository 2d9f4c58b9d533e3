package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned manifests over a [[Layout]] — snapshot isolation, time-travel
  * reads, and vacuum on plain parquet, the table-format (Delta/Iceberg)
  * metadata model re-expressed with the file-stats manifest as the commit
  * object.
  *
  * The flat-manifest flavor ([[Layout.deleteWhere]]) swaps the single
  * manifest in place and physically deletes superseded files, so only the
  * latest table state is readable. Here every commit writes a NEW manifest
  * version under `manifestRoot/v=N` and superseded data files are RETAINED:
  * a reader pinned to version N sees exactly the files N references —
  * a complete, immutable snapshot — regardless of later deletes/appends.
  * Storage is reclaimed explicitly by [[vacuum]], which drops expired
  * versions and deletes only data files no retained version references.
  *
  * Commit protocol: the next manifest is written to a hidden temp dir and
  * `rename`d to `v=N` — readers list versions and see N fully or not at
  * all (the same single-rename visibility [[Layout.deleteWhere]] uses for
  * its swap). Writers are assumed single at a time (the reference's daily
  * batch cadence); concurrent-writer arbitration would need a
  * compare-and-swap on the version number, which plain FS rename provides
  * on stores with atomic rename.
  *
  * Scale shape: a version is one file-count-bounded parquet manifest, so
  * the version log grows by O(files) per commit, never O(rows); time-travel
  * planning is a manifest read (driver work bounded by file count, like any
  * catalog); vacuum is a set-difference over file NAMES across retained
  * manifests plus per-file FS deletes — no data scan at any step.
  */
object Snapshots {

  final case class VacuumResult(filesDeleted: Long, versionsDropped: Long)

  private def hfs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VersionDir = "v=(\\d+)".r

  /** Committed version numbers, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, manifestRoot: String): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(manifestRoot)
    val fs = hfs(spark, manifestRoot)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case VersionDir(n) => Some(n.toInt)
          case _ => None
        }
    }.flatten.sorted
  }

  def latestVersion(spark: SparkSession, manifestRoot: String): Int = {
    val vs = versions(spark, manifestRoot)
    require(vs.nonEmpty, s"no committed versions under $manifestRoot")
    vs.last
  }

  /** Commit `manifest` as the next version; returns its number. The write
    * lands in a hidden temp dir first so the version becomes visible with
    * one rename. */
  def commit(spark: SparkSession, manifest: DataFrame,
             manifestRoot: String): Int = {
    val next = versions(spark, manifestRoot).lastOption.getOrElse(0) + 1
    val fs = hfs(spark, manifestRoot)
    val tmp = new org.apache.hadoop.fs.Path(s"$manifestRoot/.tmp_v$next")
    manifest.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val dest = new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$next")
    require(fs.rename(tmp, dest), s"version commit failed: $dest")
    next
  }

  def manifestAt(spark: SparkSession, manifestRoot: String,
                 version: Int): DataFrame =
    spark.read.parquet(s"$manifestRoot/v=$version")

  /** The complete table as of `version`: exactly the files that version's
    * manifest references (the snapshot read — later deletes/appends are
    * invisible because their files are not in this manifest). */
  def tableAt(spark: SparkSession, manifestRoot: String,
              version: Int): DataFrame = {
    val files = manifestAt(spark, manifestRoot, version)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    spark.read.parquet(files: _*)
  }

  /** [[Layout.prunedRead]] against a pinned version's manifest: stats-pruned
    * AND time-traveled in one plan. */
  def readAt(spark: SparkSession, manifestRoot: String, version: Int,
             ranges: Seq[(String, Double, Double)]): Layout.PrunedScan = {
    val m = manifestAt(spark, manifestRoot, version)
    val total = m.count()
    val files = m.filter(Layout.intersectsExpr(ranges)).select(col("file"))
      .collect().map(_.getString(0)).toSeq
    val df =
      if (files.isEmpty) tableAt(spark, manifestRoot, version).filter(lit(false))
      else spark.read.parquet(files: _*).filter(Layout.inBoxExpr(ranges))
    Layout.PrunedScan(df, files.size.toLong, total)
  }

  /** Targeted delete as a VERSION COMMIT: survivors of the manifest-
    * intersecting files are staged and moved in (same mechanics as
    * [[Layout.deleteWhere]]), then a new manifest version referencing
    * unaffected + survivor files is committed. The superseded files are
    * NOT deleted — prior versions still reference them, so time travel
    * keeps working until [[vacuum]] expires those versions. */
  def deleteWhere(spark: SparkSession, path: String, manifestRoot: String,
                  cols: Seq[String],
                  box: Seq[(String, Double, Double)]): Layout.DeleteResult = {
    val manifest =
      manifestAt(spark, manifestRoot, latestVersion(spark, manifestRoot))
        .localCheckpoint()
    val total = manifest.count()
    val hit = manifest.filter(Layout.intersectsExpr(box)).select(col("file"))
      .collect().map(_.getString(0)).toSeq
    if (hit.isEmpty) return Layout.DeleteResult(0, total, 0)
    val (moved, deleted) =
      Layout.stageSurvivors(spark, path, hit, Layout.inBoxExpr(box))
    val keep = manifest.filter(!col("file").isInCollection(hit))
    val next =
      if (moved.isEmpty) keep
      else keep.unionByName(Layout.buildManifestFor(spark, moved, cols))
    commit(spark, next, manifestRoot)
    Layout.DeleteResult(hit.size.toLong, total, deleted)
  }

  /** Reclaim storage: drop all but the last `retainLast` versions, then
    * delete every data file under `path` that no RETAINED version
    * references (compared by unique part-file name, like
    * [[Layout.appendWithManifest]]'s listing diff, so URI scheme
    * differences can't alias). Hidden/_-prefixed files are never touched.
    * Files referenced only by expired versions are exactly the superseded
    * delete/compaction inputs — after vacuum, time travel to an expired
    * version is gone by construction. */
  def vacuum(spark: SparkSession, path: String, manifestRoot: String,
             retainLast: Int): VacuumResult = {
    require(retainLast >= 1, "must retain at least the latest version")
    val vs = versions(spark, manifestRoot)
    require(vs.nonEmpty, s"no committed versions under $manifestRoot")
    val (drop, keep) = vs.splitAt((vs.size - retainLast).max(0))
    val referenced = keep.flatMap { v =>
      manifestAt(spark, manifestRoot, v).select(col("file"))
        .collect().map(r => Layout.fileName(r.getString(0)))
    }.toSet
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = hfs(spark, path)
    val dead = fs.listStatus(dir).toSeq.filter { st =>
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") &&
        !referenced.contains(st.getPath.getName)
    }
    dead.foreach(st => fs.delete(st.getPath, false))
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"), true)
    }
    VacuumResult(dead.size.toLong, drop.size.toLong)
  }
}
