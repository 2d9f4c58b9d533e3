package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.TableRef

class MaintenanceSpec extends SparkSpec {

  private val ref = TableRef("silver", "sales", "lineitem")

  test("compact bin-packs a fragmented partition and leaves healthy ones alone") {
    val root = tmpDir("compact")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // fragmented partition: 20 tiny files; healthy partition: 1 file
    li.repartition(20).write.parquet(s"${ref.path(root)}/run_date=2026-01-01")
    li.limit(100).coalesce(1).write.parquet(s"${ref.path(root)}/run_date=2026-01-02")

    val before = Maintenance.partitionStats(spark, root, ref)
    assert(before.map(_.files) == Seq(20, 1))

    val rewritten = Maintenance.compact(spark, root, ref,
      targetBytes = 1024L * 1024 * 1024)
    assert(rewritten == Seq("run_date=2026-01-01"))

    val after = Maintenance.partitionStats(spark, root, ref)
    assert(after.map(_.files) == Seq(1, 1))
    // data identical after the rewrite
    val back = spark.read.parquet(s"${ref.path(root)}/run_date=2026-01-01")
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).head.getDouble(0) ==
      li.agg(sum("l_quantity")).head.getDouble(0))
  }

  test("crash between swap renames never loses the partition: recover restores it") {
    import org.apache.hadoop.fs.Path
    val root = tmpDir("crash")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = s"${ref.path(root)}/run_date=2026-02-01"
    li.repartition(20).write.parquet(dir)
    val expected = li.count()

    // Simulate the compaction rewrite + a crash right after the rename-aside:
    // the live dir is momentarily gone, but the data survives in the backup.
    val tmp = s"${ref.path(root)}/.compact_tmp_run_date=2026-02-01"
    spark.read.parquet(dir).coalesce(1).write.parquet(tmp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    intercept[IllegalStateException] {
      Maintenance.swapDirs(fs, new Path(dir), new Path(tmp),
        crashPoint = at => if (at == "after-backup")
          throw new IllegalStateException("injected crash"))
    }
    assert(!fs.exists(new Path(dir)), "crash window: live dir absent")
    assert(fs.exists(new Path(s"${ref.path(root)}/.compact_old_run_date=2026-02-01")),
      "…but the backup holds the data")

    // The next compact() run self-heals first, then re-compacts.
    val rewritten = Maintenance.compact(spark, root, ref,
      targetBytes = 1024L * 1024 * 1024)
    assert(rewritten == Seq("run_date=2026-02-01"))
    val back = spark.read.parquet(dir)
    assert(back.count() == expected, "no rows lost across the injected crash")
    assert(Maintenance.partitionStats(spark, root, ref).map(_.files) == Seq(1))
  }

  test("crash after swap-in but before backup delete: recover drops the stale backup") {
    import org.apache.hadoop.fs.Path
    val root = tmpDir("crash2")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(200)
    val dir = s"${ref.path(root)}/run_date=2026-03-01"
    li.repartition(5).write.parquet(dir)
    val tmp = s"${ref.path(root)}/.compact_tmp_run_date=2026-03-01"
    spark.read.parquet(dir).coalesce(1).write.parquet(tmp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    intercept[IllegalStateException] {
      Maintenance.swapDirs(fs, new Path(dir), new Path(tmp),
        crashPoint = at => if (at == "after-swap")
          throw new IllegalStateException("injected crash"))
    }
    assert(fs.exists(new Path(dir)), "swap completed: live dir present")
    val restored = Maintenance.recover(spark, root, ref)
    assert(restored.isEmpty, "nothing to restore — swap had completed")
    assert(!fs.exists(new Path(s"${ref.path(root)}/.compact_old_run_date=2026-03-01")),
      "stale backup cleaned up")
    assert(spark.read.parquet(dir).count() == 200)
  }

  test("needsCompaction tolerates one file of slack") {
    import Maintenance.PartitionStats
    assert(!PartitionStats("p", 1, 100).needsCompaction(1000))
    assert(!PartitionStats("p", 2, 100).needsCompaction(1000)) // slack
    assert(PartitionStats("p", 3, 100).needsCompaction(1000))
    // big partition genuinely needing 8 files is left alone at 9
    assert(!PartitionStats("p", 9, 8000).needsCompaction(1000))
    assert(PartitionStats("p", 20, 8000).needsCompaction(1000))
  }

  test("writeSorted produces disjoint per-file key ranges (data skipping)") {
    val dir = tmpDir("sorted")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Maintenance.writeSorted(li, dir, nFiles = 4, col("l_shipdate"))

    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getAbsolutePath).sorted
    assert(parts.length == 4)
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_shipdate").cast("string"), max("l_shipdate").cast("string")).head
      (r.getString(0), r.getString(1)) // ISO strings: lexicographic = temporal
    }
    // ranges must not interleave: sort by min, each max <= next min
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
    // and the rewrite is lossless
    assert(spark.read.parquet(dir).count() == li.count())
  }
}
