package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta Lake `_delta_log` INTEROP — read an actual Delta table (the
  * format the reference's production Databricks side writes) without any
  * delta jars, from the PUBLIC log protocol alone (delta.io PROTOCOL.md):
  * the log is newline-delimited JSON actions under `_delta_log/`, one
  * `<20-digit version>.json` per commit, where
  *
  *   - `metaData.schemaString` is a Spark `StructType` JSON (so
  *     `DataType.fromJson` parses it directly),
  *   - `add.path` / `remove.path` are table-relative (URL-encoded) data
  *     file paths, with `add.partitionValues` carrying the Hive-style
  *     partition column values the files themselves do NOT store,
  *   - the snapshot at version V is the replay of adds minus removes over
  *     commits ≤ V — exactly our own manifest-log discipline, different
  *     serialization.
  *
  * Scope (documented, loud otherwise): JSON commits only — a log whose
  * tail requires a parquet `checkpoint` to reconstruct (10k+ commit
  * production logs) is refused with the checkpoint named; column-mapping
  * and deletion-vector tables are refused (their reads need physical-name
  * / DV semantics this reader does not re-implement).
  *
  * [[read]] serves the snapshot as a DataFrame (time travel via
  * `version`); [[convertToLake]] adopts the CURRENT snapshot as a lake
  * table IN PLACE — a footer-stats manifest over the live files, zero
  * data copied — after which the whole engine surface (typed DML,
  * OPTIMIZE, MVs, streaming) applies. Scale shape: log replay is
  * commit-count-bounded driver JSON parsing; the read itself plans one
  * scan per partition-value group (bounded by distinct partition tuples,
  * the same shape Hive-style listing produces); conversion is the
  * file-count-bounded manifest build.
  */
object DeltaInterop {

  final case class Snapshot(version: Long, schema: StructType,
                            partitionCols: Seq[String],
                            // live file → partition values (in
                            // partitionCols order, raw strings)
                            files: Map[String, Seq[String]])

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Commit versions present in the log, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    val f = fs(spark, dir)
    if (!f.exists(logDir)) Seq.empty
    else f.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.length == 25 &&
        n.dropRight(5).forall(_.isDigit))
      .map(_.dropRight(5).toLong).sorted
  }

  /** Replay the log to `version` (default: head). */
  def snapshotAt(spark: SparkSession, dir: String,
                 version: Option[Long] = None): Snapshot = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no _delta_log JSON commits under $dir")
    val target = version.getOrElse(vs.last)
    require(vs.contains(target),
      s"version $target is not in the log (have ${vs.mkString(", ")})")
    // a checkpointed log may have dropped its early JSON commits — replay
    // is only sound when the chain starts at 0
    require(vs.head == 0L,
      s"log starts at ${vs.head}, not 0 — reconstructing this snapshot " +
        "needs the parquet checkpoint, which this JSON-only reader does " +
        "not consume")
    val f = fs(spark, dir)
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Seq.empty
    val live = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[String]]
    for (v <- vs.filter(_ <= target)) {
      val p = new org.apache.hadoop.fs.Path(dir,
        f"_delta_log/$v%020d.json")
      val in = f.open(p)
      val body = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      body.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("metaData")) {
          val md = node.get("metaData")
          val conf = Option(md.get("configuration"))
          val cm = conf.flatMap(c =>
            Option(c.get("delta.columnMapping.mode")))
            .map(_.asText()).filterNot(_ == "none")
          require(cm.isEmpty,
            s"delta table $dir uses column mapping '${cm.get}' — " +
              "physical-name reads are out of this reader's scope")
          schema = Some(DataType.fromJson(md.get("schemaString").asText())
            .asInstanceOf[StructType])
          partCols = Option(md.get("partitionColumns")).toSeq
            .flatMap(a => (0 until a.size()).map(a.get(_).asText()))
        }
        if (node.has("add")) {
          val add = node.get("add")
          require(!add.has("deletionVector") ||
            add.get("deletionVector").isNull,
            s"delta table $dir carries deletion vectors — MoR reads are " +
              "out of this reader's scope (PURGE it from Delta first)")
          val path = java.net.URLDecoder.decode(
            add.get("path").asText(), "UTF-8")
          val pv = Option(add.get("partitionValues"))
          // Delta encodes a null partition value as JSON null; Jackson
          // hands that back as a NON-null NullNode whose asText() is the
          // string "null" — filter explicit nulls so string-typed
          // partition columns get SQL NULL, not the literal text "null"
          live.put(path, partCols.map(c =>
            pv.flatMap(m => Option(m.get(c))).filterNot(_.isNull)
              .map(_.asText()).orNull))
        }
        if (node.has("remove")) {
          val path = java.net.URLDecoder.decode(
            node.get("remove").get("path").asText(), "UTF-8")
          live.remove(path)
        }
      }
    }
    Snapshot(target,
      schema.getOrElse(throw new IllegalStateException(
        s"log under $dir carries no metaData action")),
      partCols, live.toMap)
  }

  /** The snapshot's rows. Partitioned tables group files by partition
    * tuple and inject the (typed) partition values per group — the data
    * files do not store those columns. */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val snap = snapshotAt(spark, dir, version)
    val dataSchema = StructType(snap.schema.fields
      .filterNot(f => snap.partitionCols.contains(f.name)))
    val byName = snap.schema.fields.map(f => f.name -> f.dataType).toMap
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), snap.schema)
    val groups = snap.files.toSeq.groupBy(_._2)
    groups.toSeq.map { case (pvals, members) =>
      val paths = members.map { case (rel, _) => s"$dir/$rel" }
      val base = spark.read.schema(dataSchema).parquet(paths: _*)
      snap.partitionCols.zip(pvals).foldLeft(base) {
        case (df, (c, v)) =>
          df.withColumn(c,
            (if (v == null) lit(null) else lit(v)).cast(byName(c)))
      }.select(snap.schema.fieldNames.toIndexedSeq.map(col): _*)
    }.reduce(_.unionByName(_))
  }

  /** Write ONE Delta JSON commit (the minimal single-writer side of the
    * interop: protocol 1/2, no checkpoints — enough that stock Delta
    * readers, and [[read]], replay it). `adds` are table-relative data
    * file paths with their partition values (empty seq for
    * unpartitioned); `removes` are relative paths leaving the snapshot.
    * Version 0 must carry the schema; later commits may omit it. */
  def writeCommit(spark: SparkSession, dir: String, version: Long,
                  schema: Option[StructType],
                  partitionCols: Seq[String] = Seq.empty,
                  adds: Seq[(String, Seq[String])] = Seq.empty,
                  removes: Seq[String] = Seq.empty): Unit = {
    require(version > 0 || schema.isDefined,
      "delta commit 0 must carry the table schema")
    val f = fs(spark, dir)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    if (version == 0L)
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    schema.foreach { sch =>
      val md = mapper.createObjectNode()
      val m = md.putObject("metaData")
      m.put("id", java.util.UUID.randomUUID().toString)
      val fmt = m.putObject("format")
      fmt.put("provider", "parquet"); fmt.putObject("options")
      m.put("schemaString", sch.json)
      val pc = m.putArray("partitionColumns")
      partitionCols.foreach(pc.add)
      m.putObject("configuration")
      m.put("createdTime", 0L)
      lines += mapper.writeValueAsString(md)
    }
    adds.foreach { case (rel, pvals) =>
      val st = f.getFileStatus(new org.apache.hadoop.fs.Path(dir, rel))
      val an = mapper.createObjectNode()
      val a = an.putObject("add")
      a.put("path", rel)
      val pv = a.putObject("partitionValues")
      partitionCols.zip(pvals).foreach { case (c, v) => pv.put(c, v) }
      a.put("size", st.getLen)
      a.put("modificationTime", st.getModificationTime)
      a.put("dataChange", true)
      lines += mapper.writeValueAsString(an)
    }
    removes.foreach { rel =>
      val rn = mapper.createObjectNode()
      val r = rn.putObject("remove")
      r.put("path", rel)
      r.put("deletionTimestamp", 0L)
      r.put("dataChange", true)
      lines += mapper.writeValueAsString(rn)
    }
    val p = new org.apache.hadoop.fs.Path(dir,
      f"_delta_log/$version%020d.json")
    require(!f.exists(p), s"delta commit $version already exists under $dir")
    val out = f.create(p, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Land `df` as ONE parquet data file at `dir/rel` (staging write +
    * rename — the helper a writeCommit caller uses to produce the file a
    * commit then references). */
  def landFile(df: DataFrame, dir: String, rel: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val staging = new org.apache.hadoop.fs.Path(
      dir, s".delta_stage_${java.util.UUID.randomUUID()}")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = f.listStatus(staging).map(_.getPath)
      .find(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"no part file staged under $staging"))
    val dest = new org.apache.hadoop.fs.Path(dir, rel)
    f.mkdirs(dest.getParent)
    require(f.rename(part, dest), s"rename $part -> $dest failed")
    f.delete(staging, true) : Unit
  }

  /** Adopt the head snapshot as a registered lake table IN PLACE: one
    * footer-stats manifest commit over the live files, zero data copied
    * (the `CONVERT TO DELTA` shape, pointed the other way). Partitioned
    * delta tables are refused — the lake manifest stores per-file stats
    * of PHYSICAL columns, and partition values live only in the log. */
  def convertToLake(spark: SparkSession, dir: String, name: String,
                    manifestRoot: String, statsCols: Seq[String],
                    nFiles: Int = 8): Int = {
    val snap = snapshotAt(spark, dir, None)
    require(snap.partitionCols.isEmpty,
      "CONVERT of a PARTITIONED delta table is not supported — partition " +
        "values are log-only; read it via DeltaInterop.read and CTAS")
    require(graft.sinks.Snapshots.versions(spark, manifestRoot).isEmpty,
      s"$manifestRoot already has versions")
    val paths = snap.files.keys.toSeq.sorted.map(rel => s"$dir/$rel")
    val manifest =
      graft.sinks.Layout.buildManifestFor(spark, paths, statsCols)
    graft.sinks.Snapshots.commit(spark, manifest, manifestRoot)
  }
}
