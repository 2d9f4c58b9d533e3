package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

import graft.model.TableRef

/** Lake table maintenance — the operators a 100 TB lake needs that the
  * reference (single-blob uploads, pandas-sized batches) never grows into:
  *
  *  - '''Small-file compaction''': streaming/incremental ingestion produces
  *    many under-sized files per partition; every downstream scan then pays
  *    per-file open/footer/seek cost and the driver pays listing + task-
  *    scheduling overhead (a 1 GiB partition in 4 KiB files is ~250k tasks'
  *    worth of overhead for one scan). Compaction bin-packs each partition
  *    back to `targetBytes` files, idempotently, partition by partition.
  *
  *  - '''Sorted layout''' for data skipping: parquet keeps min/max stats per
  *    row group; writing range-partitioned + sorted by a filter column makes
  *    those ranges disjoint, so selective scans skip whole files/row groups
  *    instead of reading and discarding.
  */
object Maintenance {

  /** File-count / byte-size summary of one partition directory. */
  final case class PartitionStats(partition: String, files: Int, bytes: Long) {
    /** A partition wants compaction when it has more files than its data
      * needs at `targetBytes` per file (with one-file slack: rewriting two
      * half-full files into one is not worth a full rewrite pass). */
    def needsCompaction(targetBytes: Long): Boolean =
      files > math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt) + 1
  }

  /** List `run_date=...` partitions of a lake table with file counts/sizes —
    * driver-side FS metadata only (never reads data; the listing is one RPC
    * per directory, same cost any planner pays). */
  def partitionStats(spark: SparkSession, root: String, ref: TableRef): Seq[PartitionStats] = {
    val base = new Path(ref.path(root))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).toSeq
      // exclude the hidden .compact_tmp_*/.compact_old_* swap dirs — their
      // names embed the partition name's '=' and would otherwise surface as
      // phantom partitions during (or after a crashed) compaction
      .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith("."))
      .map { dir =>
        val files = fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        PartitionStats(dir.getPath.getName, files.size, files.map(_.getLen).sum)
      }
      .sortBy(_.partition)
  }

  /** Compact every partition that needs it: read just that partition,
    * bin-pack to ceil(bytes/targetBytes) output files, and overwrite ONLY
    * that partition directory (the K1 idempotent-partition-write shape —
    * sibling partitions are never touched, so compaction can run
    * incrementally and concurrently with ingestion of other partitions).
    *
    * Crash-safe swap: the live dir is renamed aside to a backup FIRST, then
    * the compacted tmp renamed in, then the backup deleted — so no failure
    * point loses data (the worst case is a stale backup/tmp to clean up,
    * which [[recover]] — run automatically at the start of every compact —
    * repairs). Returns the partitions rewritten. */
  def compact(spark: SparkSession, root: String, ref: TableRef,
              targetBytes: Long = 128L * 1024 * 1024): Seq[String] = {
    recover(spark, root, ref)
    val todo = partitionStats(spark, root, ref).filter(_.needsCompaction(targetBytes))
    todo.foreach { p =>
      val dir = s"${ref.path(root)}/${p.partition}"
      val nOut = math.max(1, math.ceil(p.bytes.toDouble / targetBytes).toInt)
      val df = spark.read.parquet(dir)
      // coalesce, not repartition: bin-packing needs no shuffle, just fewer
      // write tasks; rewrite to a temp sibling then swap in.
      val tmp = s"${ref.path(root)}/.compact_tmp_${p.partition}"
      df.coalesce(nOut).write.mode(SaveMode.Overwrite).parquet(tmp)
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      swapDirs(fs, new Path(dir), new Path(tmp))
    }
    todo.map(_.partition)
  }

  private def backupPath(dir: Path): Path =
    new Path(dir.getParent, s".compact_old_${dir.getName}")

  /** backup → swap-in → delete-backup. On a non-atomic-rename filesystem a
    * reader can observe a brief gap between the two renames, but a crash at
    * ANY point leaves the data recoverable (live dir, backup, or both —
    * never neither). `crashPoint` is a test seam for injecting failures at
    * the named points; production callers leave the default no-op. */
  private[sinks] def swapDirs(fs: FileSystem, dir: Path, tmp: Path,
                              crashPoint: String => Unit = _ => ()): Unit = {
    val old = backupPath(dir)
    if (fs.exists(old)) fs.delete(old, true) // stale backup from a completed swap
    require(fs.rename(dir, old), s"rename-aside failed: $dir -> $old")
    crashPoint("after-backup")
    require(fs.rename(tmp, dir), s"rename-in failed: $tmp -> $dir")
    crashPoint("after-swap")
    fs.delete(old, true)
  }

  /** Repair partitions left mid-swap by a crashed compaction:
    *  - backup exists, live dir missing (crash between the renames) →
    *    restore the backup as the live dir;
    *  - backup AND live dir exist (crash before the backup delete) → the
    *    swap completed; drop the backup;
    *  - orphan tmp dirs → delete (the rewrite is re-run idempotently).
    * Returns the partitions restored from backup. */
  def recover(spark: SparkSession, root: String, ref: TableRef): Seq[String] = {
    val base = new Path(ref.path(root))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    val entries = fs.listStatus(base).toSeq.filter(_.isDirectory)
    val restored = entries.flatMap { s =>
      val name = s.getPath.getName
      if (name.startsWith(".compact_old_")) {
        val live = new Path(base, name.stripPrefix(".compact_old_"))
        if (!fs.exists(live)) {
          require(fs.rename(s.getPath, live), s"recovery rename failed: ${s.getPath}")
          Some(live.getName)
        } else { fs.delete(s.getPath, true); None }
      } else None
    }
    entries.filter(_.getPath.getName.startsWith(".compact_tmp_"))
      .foreach(s => fs.delete(s.getPath, true))
    restored.sorted
  }

  /** Write `df` range-partitioned and sorted by `sortCols`, so each output
    * file owns a disjoint range of the sort key and parquet min/max stats
    * skip non-matching files on read. `nFiles` sizes the range partitioning
    * (pick bytes/128 MiB for a real table). */
  def writeSorted(df: DataFrame, path: String, nFiles: Int, sortCols: Column*): Unit =
    df.repartitionByRange(nFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
