package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Delta `_delta_log` interop: JSON-commit replay (adds/removes/time
  * travel), partition-value injection, conversion to a lake table, and
  * the loud refusals (checkpoint-truncated logs, column mapping). */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType)))

  private def mk(dir: String, rel: String, lo: Long, hi: Long): Unit =
    DeltaInterop.landFile(
      spark.range(lo, hi).select($"id".as("k"), ($"id" * 2.0).as("v")),
      dir, rel)

  test("replay: adds accumulate, removes drop, VERSION AS OF pins") {
    val dir = tmpDir("delta1")
    mk(dir, "part-a.parquet", 0, 50)
    mk(dir, "part-b.parquet", 50, 100)
    DeltaInterop.writeCommit(spark, dir, 0, Some(schema),
      adds = Seq("part-a.parquet" -> Nil, "part-b.parquet" -> Nil))
    mk(dir, "part-c.parquet", 100, 130)
    DeltaInterop.writeCommit(spark, dir, 1, None,
      adds = Seq("part-c.parquet" -> Nil))
    DeltaInterop.writeCommit(spark, dir, 2, None,
      removes = Seq("part-b.parquet"))
    assert(DeltaInterop.versions(spark, dir) == Seq(0L, 1L, 2L))
    def ks(v: Option[Long]) = DeltaInterop.read(spark, dir, v)
      .agg(count(lit(1)), sum("k")).head()
    val head = ks(None)
    assert(head.getLong(0) == 80L &&
      head.getLong(1) == (0L until 50).sum + (100L until 130).sum)
    assert(ks(Some(0L)).getLong(0) == 100L)
    assert(ks(Some(1L)).getLong(0) == 130L)
    // schema comes from metaData, not footer merge
    assert(DeltaInterop.read(spark, dir).schema == schema)
  }

  test("partitioned table: partition values injected typed from the log " +
      "(the data files do not store the column)") {
    val dir = tmpDir("delta2")
    val data = StructType(Seq(StructField("k", LongType)))
    DeltaInterop.landFile(spark.range(0, 10).select($"id".as("k")),
      dir, "p=1/part-a.parquet")
    DeltaInterop.landFile(spark.range(10, 30).select($"id".as("k")),
      dir, "p=2/part-b.parquet")
    val full = StructType(data.fields :+ StructField("p", IntegerType))
    DeltaInterop.writeCommit(spark, dir, 0, Some(full),
      partitionCols = Seq("p"),
      adds = Seq("p=1/part-a.parquet" -> Seq("1"),
        "p=2/part-b.parquet" -> Seq("2")))
    val df = DeltaInterop.read(spark, dir)
    assert(df.schema("p").dataType == IntegerType)
    val byP = df.groupBy("p").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byP == Map(1 -> 10L, 2 -> 20L))
  }

  test("a JSON-null partition value reads as SQL NULL, not the literal " +
      "string \"null\" (Jackson NullNode.asText() trap)") {
    val dir = tmpDir("delta_nullpv")
    DeltaInterop.landFile(spark.range(0, 5).select($"id".as("k")),
      dir, "p=a/part-a.parquet")
    DeltaInterop.landFile(spark.range(5, 8).select($"id".as("k")),
      dir, "p=null/part-n.parquet")
    val full = StructType(Seq(StructField("k", LongType),
      StructField("p", StringType)))
    DeltaInterop.writeCommit(spark, dir, 0, Some(full),
      partitionCols = Seq("p"),
      adds = Seq("p=a/part-a.parquet" -> Seq("a"),
        "p=null/part-n.parquet" -> Seq(null)))
    val df = DeltaInterop.read(spark, dir)
    assert(df.filter($"p".isNull).count() == 3L,
      "null partition value did not surface as SQL NULL")
    assert(df.filter($"p" === "null").count() == 0L,
      "null partition value surfaced as the literal string \"null\"")
    assert(df.filter($"p" === "a").count() == 5L)
  }

  test("checkpoint replay: a log whose early JSON commits are gone reads " +
      "through the parquet checkpoint + JSON tail; pinned reads below " +
      "the checkpoint refuse with the gap named") {
    val dir = tmpDir("delta_ckpt")
    mk(dir, "part-a.parquet", 0, 40)
    mk(dir, "part-b.parquet", 40, 80)
    DeltaInterop.writeCommit(spark, dir, 0, Some(schema),
      adds = Seq("part-a.parquet" -> Nil, "part-b.parquet" -> Nil))
    mk(dir, "part-c.parquet", 80, 100)
    DeltaInterop.writeCommit(spark, dir, 1, None,
      adds = Seq("part-c.parquet" -> Nil),
      removes = Seq("part-a.parquet"))
    DeltaInterop.writeCheckpoint(spark, dir, 1)
    mk(dir, "part-d.parquet", 100, 110)
    DeltaInterop.writeCommit(spark, dir, 2, None,
      adds = Seq("part-d.parquet" -> Nil))
    // production truncation: JSON 0 and 1 vacuumed away
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(0L, 1L).foreach(v => assert(f.delete(
      new org.apache.hadoop.fs.Path(dir, f"_delta_log/$v%020d.json"),
      false)))
    // head = checkpoint state (b, c) + JSON tail v2 (d)
    def agg(v: Option[Long]) = DeltaInterop.read(spark, dir, v)
      .agg(count(lit(1)), sum("k")).head()
    val head = agg(None)
    assert(head.getLong(0) == 70L &&
      head.getLong(1) == (40L until 110).sum,
      s"checkpoint+tail replay wrong: ${head.toSeq}")
    // pinned AT the checkpoint serves its state exactly
    assert(agg(Some(1L)).getLong(0) == 60L)
    assert(DeltaInterop.read(spark, dir).schema == schema,
      "schema must come from the checkpoint's metaData row")
    // pinned BELOW the reconstructable state refuses loudly
    val e = intercept[IllegalArgumentException](
      DeltaInterop.read(spark, dir, Some(0L)))
    assert(e.getMessage.contains("not in the log") ||
      e.getMessage.contains("not reconstructable"), e.getMessage)
  }

  test("exportDeltaLog publishes a lake snapshot as a _delta_log that " +
      "re-reads exactly; zero data files written; refusals loud on an " +
      "existing log") {
    import graft.sinks.Snapshots
    val dir = tmpDir("delta_export")
    val data = s"$dir/z"; val mroot = s"$dir/m"
    val df0 = spark.range(0, 500)
      .select($"id".as("k"), ($"id" * 2.0).as("v"))
    Snapshots.replaceCommit(spark, df0, Seq("k"), data, mroot, 3)
    Snapshots.appendCommit(spark,
      spark.range(500, 650).select($"id".as("k"), ($"id" * 2.0).as("v")),
      Seq("k"), data, mroot, 2)
    val fsys = new org.apache.hadoop.fs.Path(data)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Set[String] =
      fsys.listStatus(new org.apache.hadoop.fs.Path(data)).toSeq
        .map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    val before = dataFiles()
    DeltaInterop.exportDeltaLog(spark, mroot, data)
    assert(dataFiles() == before, "export must copy zero data files")
    val lake = Snapshots.tableAt(spark, mroot,
      Snapshots.latestVersion(spark, mroot))
    val delta = DeltaInterop.read(spark, data)
    assert(delta.exceptAll(lake).count() == 0 &&
      lake.exceptAll(delta).count() == 0,
      "exported log does not serve the lake snapshot")
    // and a stock-shaped reader sees a complete protocol/metaData log
    assert(DeltaInterop.versions(spark, data) == Seq(0L))
    // refuse clobbering an existing log
    val e = intercept[IllegalArgumentException](
      DeltaInterop.exportDeltaLog(spark, mroot, data))
    assert(e.getMessage.contains("_delta_log"), e.getMessage)
  }

  test("refusals are loud: checkpoint-truncated log, column mapping") {
    val dir = tmpDir("delta3")
    mk(dir, "part-a.parquet", 0, 10)
    // log starting at version 2: replay would need the checkpoint
    DeltaInterop.writeCommit(spark, dir, 2, Some(schema),
      adds = Seq("part-a.parquet" -> Nil))
    val e = intercept[IllegalArgumentException](
      DeltaInterop.read(spark, dir))
    assert(e.getMessage.contains("checkpoint"), e.getMessage)
    // column mapping refused
    val dir2 = tmpDir("delta4")
    mk(dir2, "part-a.parquet", 0, 10)
    val fsys = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir2,
      "_delta_log/00000000000000000000.json")
    fsys.mkdirs(p.getParent)
    val out = fsys.create(p, false)
    out.write(("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""" +
      "\n" +
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(schema.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""" +
      "\n").getBytes("UTF-8"))
    out.close()
    val e2 = intercept[IllegalArgumentException](
      DeltaInterop.read(spark, dir2))
    assert(e2.getMessage.contains("column mapping"), e2.getMessage)
  }

  test("convertToLake adopts the head snapshot zero-copy; the lake read " +
      "equals the delta read and stats prune") {
    val dir = tmpDir("delta5")
    mk(dir, "part-a.parquet", 0, 100)
    mk(dir, "part-b.parquet", 100, 200)
    mk(dir, "part-c.parquet", 200, 300)
    DeltaInterop.writeCommit(spark, dir, 0, Some(schema),
      adds = Seq("part-a.parquet" -> Nil, "part-b.parquet" -> Nil,
        "part-c.parquet" -> Nil))
    DeltaInterop.writeCommit(spark, dir, 1, None,
      removes = Seq("part-c.parquet"))
    val mroot = tmpDir("delta5m")
    val v = DeltaInterop.convertToLake(spark, dir, "dlt5", mroot, Seq("k"))
    assert(v == 1)
    val lake = graft.sinks.Snapshots.tableAt(spark, mroot, 1)
    val delta = DeltaInterop.read(spark, dir)
    assert(lake.exceptAll(delta).isEmpty && delta.exceptAll(lake).isEmpty)
    // the adopted manifest prunes on k (files are disjoint ranges)
    val m = graft.sinks.Snapshots.manifestAt(spark, mroot, 1)
    val hit = m.filter(col("min_k") <= 50L && col("max_k") >= 0L).count()
    assert(hit < m.count(), s"no pruning: $hit of ${m.count()}")
  }
}
