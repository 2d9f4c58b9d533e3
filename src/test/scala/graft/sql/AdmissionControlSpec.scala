package graft.sql

import org.apache.spark.sql.functions.{concat, lit}
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Round-17 item 3: `maxFilesPerTrigger` admission control on the
  * row-native lake stream — one huge commit splits across micro-batches
  * with (version, fileIndex) offsets, checkpointed exactly-once. */
class AdmissionControlSpec extends SparkSpec {

  private def sql(s: String) = spark.sql(s)

  test("one 6-file commit streams in ceil(6/2)=3 bounded micro-batches; " +
      "rows exact") {
    sql("CREATE NAMESPACE IF NOT EXISTS lake.ac")
    sql("DROP TABLE IF EXISTS lake.ac.big")
    sql("""CREATE TABLE lake.ac.big (k BIGINT, v DOUBLE) USING lake
           TBLPROPERTIES ('stats_cols' = 'k', 'files' = '6')""")
    import spark.implicits._
    spark.range(0, 600).select($"id".as("k"), ($"id" * 1.5).as("v"))
      .createOrReplaceTempView("ac_src")
    sql("INSERT INTO lake.ac.big SELECT * FROM ac_src") // ONE 6-file commit
    val q = spark.readStream
      .option("maxFilesPerTrigger", "2")
      .table("lake.ac.big")
      .writeStream.format("memory").queryName("ac_sink")
      .option("checkpointLocation", tmpDir("ac_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3,
      s"expected 3 bounded batches, got ${batches.length}: " +
        batches.map(_.numInputRows).mkString(","))
    val n = spark.sql("SELECT count(*) AS n, sum(k) AS s FROM ac_sink")
      .head()
    assert(n.getLong(0) == 600L && n.getLong(1) == (0L until 600).sum)
  }

  test("maxBytesPerTrigger: fat files batch alone, thin files batch " +
      "together — bytes bound the trigger, not file counts; rows exact") {
    sql("CREATE NAMESPACE IF NOT EXISTS lake.ac")
    sql("DROP TABLE IF EXISTS lake.ac.bytes")
    sql("""CREATE TABLE lake.ac.bytes (k BIGINT, s STRING) USING lake
           TBLPROPERTIES ('stats_cols' = 'k', 'files' = '4')""")
    import spark.implicits._
    // commit 1: four FAT files (~50k rows each); commit 2: four thin ones
    spark.range(0, 200000)
      .select($"id".as("k"), concat(lit("pad-pad-pad-"),
        $"id".cast("string")).as("s"))
      .createOrReplaceTempView("acb_fat")
    sql("INSERT INTO lake.ac.bytes SELECT * FROM acb_fat")
    val fatDir = LakeSql.specOf("ac.bytes").get.path
    val hfs = new org.apache.hadoop.fs.Path(fatDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fatMax = hfs.listStatus(new org.apache.hadoop.fs.Path(fatDir))
      .filter(f => !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".")).map(_.getLen).max
    spark.range(200000, 200100)
      .select($"id".as("k"), $"id".cast("string").as("s"))
      .createOrReplaceTempView("acb_thin")
    sql("INSERT INTO lake.ac.bytes SELECT * FROM acb_thin")
    // budget = 1.5 fat files: each fat streams alone (a second never
    // fits); the whole thin commit is far below half a fat file
    val q = spark.readStream
      .option("maxBytesPerTrigger", (fatMax * 3 / 2).toString)
      .table("lake.ac.bytes")
      .writeStream.format("memory").queryName("acb_sink")
      .option("checkpointLocation", tmpDir("acb_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    // four byte-bounded batches: fat1 | fat2 | fat3 | fat4+thin — the
    // residual half-budget after the 4th fat file admits the whole thin
    // commit, but NO batch ever carries two fat files (that is the
    // byte bound; a 2-file count bound would have packed fats in pairs)
    assert(batches.length == 4,
      s"expected 4 byte-bounded batches from $fatDir, got " +
        s"${batches.length}: ${batches.map(_.numInputRows).mkString(",")}")
    assert(batches.map(_.numInputRows).max < 100000L,
      "a batch carried two fat files — bytes did not bound the trigger: " +
        batches.map(_.numInputRows).mkString(","))
    val n = spark.sql("SELECT count(*) AS n, sum(k) AS s FROM acb_sink")
      .head()
    assert(n.getLong(0) == 200100L &&
      n.getLong(1) == (0L until 200100).sum)
  }

  test("restart resumes from a MID-COMMIT (version, fileIndex) offset " +
      "exactly-once") {
    sql("CREATE NAMESPACE IF NOT EXISTS lake.ac")
    sql("DROP TABLE IF EXISTS lake.ac.cut")
    sql("""CREATE TABLE lake.ac.cut (k BIGINT) USING lake
           TBLPROPERTIES ('stats_cols' = 'k', 'files' = '5')""")
    import spark.implicits._
    spark.range(0, 500).select($"id".as("k"))
      .createOrReplaceTempView("cut_src")
    sql("INSERT INTO lake.ac.cut SELECT * FROM cut_src") // 5 files
    val ckpt = tmpDir("cut_ckpt")
    val out = tmpDir("cut_out")
    // FIRST run: paced 1-file batches, stopped after the first lands —
    // the checkpointed offset is cut INSIDE the commit
    val q1 = spark.readStream.option("maxFilesPerTrigger", "1")
      .table("lake.ac.cut")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("2 seconds")).start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q1.stop(); q1.awaitTermination(60000)
    val afterOnce = spark.read.parquet(out).count()
    assert(afterOnce > 0 && afterOnce < 500,
      s"first run should stop mid-commit, emitted $afterOnce rows")
    // a new commit lands while the stream is down
    sql("INSERT INTO lake.ac.cut SELECT id + 1000 AS k FROM range(100)")
    // SECOND run: drain everything — remainder of the cut commit + the
    // new one, never re-emitting the first batch's files
    val q2 = spark.readStream.option("maxFilesPerTrigger", "2")
      .table("lake.ac.cut")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val all = spark.read.parquet(out)
    assert(all.count() == 600L, s"got ${all.count()} rows, want 600")
    assert(all.select("k").distinct().count() == 600L,
      "restart re-emitted rows (duplicates)")
  }
}
