package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sql.{LakeSql, ResultCache}

/** Round-15 SQL-catalog surface: the DSv2 [[graft.sql.LakeCatalog]] —
  * namespaced `catalog.schema.table` addressing through Spark's own
  * catalog plumbing (the shape every warehouse consumer of the reference
  * uses, reference `README.md:23-27`), plain `CREATE TABLE` of empty
  * declared-schema tables, DML against namespaced targets, and
  * `spark.readStream.table` — the row-native streaming read over the
  * version log.
  *
  * Every query drives the surface through PLAIN `spark.sql` /
  * `readStream.table` — no front-door wrapper — and emits rows the
  * DuckDB oracle recomputes from the raw tables.
  */
object CatalogQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tmp(name: String): String = QueryTmp.dir(name)

  /** One catalog per JVM (catalog plugins initialize once per session):
    * registered lazily via runtime conf, warehouse under a reaped tmp
    * dir. Returns the catalog name. */
  private def catalog(s: SparkSession): String = {
    val key = "spark.sql.catalog.lakecat"
    if (s.conf.getOption(key).isEmpty) {
      s.conf.set(key, "graft.sql.LakeCatalog")
      s.conf.set(s"$key.warehouse", QueryTmp.dir("lakecat_wh"))
    }
    "lakecat"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // NAMESPACED CREATE TABLE + INSERT + DML + time travel, all through
    // plain spark.sql (round-15 verdict lead item). Gates: the table is
    // EMPTY at birth with the declared schema; INSERT is schema-on-write;
    // DELETE against the three-part name commits through the same typed
    // predicate compiler as the front door; VERSION AS OF through the
    // catalog pins the pre-delete snapshot; SHOW CREATE TABLE output is
    // VALID DDL (parses back through the front door). Emits the final
    // table — band minus the deleted sub-band — plus gate columns.
    "q218_sql_catalog_table" -> ((s, dir) => {
      val cat = catalog(s)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
      s.sql(s"DROP TABLE IF EXISTS $cat.gold.ord218")
      s.sql(s"""CREATE TABLE $cat.gold.ord218
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        USING lake
        TBLPROPERTIES ('stats_cols' = 'o_orderkey,o_custkey',
                       'files' = '8')""")
      val bornEmpty = {
        val e = s.sql(s"SELECT * FROM $cat.gold.ord218")
        e.columns.toSeq ==
          Seq("o_orderkey", "o_custkey", "o_totalprice") && e.count() == 0
      }
      require(bornEmpty, "q218 CREATE TABLE did not yield an empty " +
        "declared-schema table")
      t(s, dir, "orders").createOrReplaceTempView("orders_src218")
      s.sql(s"""INSERT INTO $cat.gold.ord218
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_src218 WHERE o_custkey BETWEEN 20 AND 130""")
      val vAfterInsert = graft.sinks.Snapshots.latestVersion(s,
        s.sql(s"SHOW TBLPROPERTIES $cat.gold.ord218").collect()
          .find(_.getString(0) == "manifest_dir").get.getString(1))
      val del = s.sql(
        s"DELETE FROM $cat.gold.ord218 WHERE o_custkey BETWEEN 55 AND 95")
        .head()
      require(del.getAs[Long]("rows_deleted") > 0, "q218 delete vacuous")
      // time travel through the catalog: the pre-delete version holds the
      // full band
      val full = s.sql(s"SELECT count(*) AS n FROM $cat.gold.ord218 " +
        s"VERSION AS OF $vAfterInsert").head().getLong(0)
      val now = s.sql(s"SELECT count(*) AS n FROM $cat.gold.ord218")
        .head().getLong(0)
      val travelOk = full == now + del.getAs[Long]("rows_deleted")
      require(travelOk, "q218 time travel lost rows")
      // the printed DDL round-trips through the front door (fresh name,
      // fresh location — schema and stats domain survive the trip)
      val stmt = s.sql(s"SHOW CREATE TABLE $cat.gold.ord218")
        .head().getString(0)
      val rt = tmp("q218rt")
      LakeSql.unregister("ord218_rt")
      val stmt2 = stmt.replace("gold.ord218", "ord218_rt")
        .replaceAll("'[^']*/z'", s"'$rt/z'")
        .replaceAll("'[^']*/m'", s"'$rt/m'")
      val created = LakeSql.sql(s, stmt2).head().getAs[Long]("version") == 1L
      val rtOk = created && {
        val e = LakeSql.sql(s, "SELECT * FROM ord218_rt")
        e.columns.toSeq ==
          Seq("o_orderkey", "o_custkey", "o_totalprice") && e.count() == 0
      }
      require(rtOk, "q218 SHOW CREATE output did not round-trip")
      LakeSql.unregister("ord218_rt")
      s.sql(s"SELECT o_orderkey, o_custkey, o_totalprice " +
          s"FROM $cat.gold.ord218")
        .withColumn("born_empty_ok", lit(bornEmpty))
        .withColumn("travel_ok", lit(travelOk))
        .withColumn("roundtrip_ok", lit(rtOk))
    }),

    // ROW-NATIVE readStream.table over a namespaced lake table (round-15
    // verdict item 2, upgraded past the q144 file bridge: the stream
    // emits the table's ROWS, the Delta streaming UX). Offsets are
    // version numbers; each micro-batch reads exactly the files its
    // commits appended — one input partition per file, per-trigger cost
    // bounded by the new data, never the history. Gates: the first run
    // lands exactly the three committed slices; a CHECKPOINTED RESTART
    // after one more commit emits ONLY the new slice (exactly-once);
    // final content equals the union. Emits the streamed table.
    "q219_stream_table_rows" -> ((s, dir) => {
      val cat = catalog(s)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
      s.sql(s"DROP TABLE IF EXISTS $cat.gold.ev219")
      s.sql(s"""CREATE TABLE $cat.gold.ev219
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        USING lake
        TBLPROPERTIES ('stats_cols' = 'o_orderkey', 'files' = '2')""")
      t(s, dir, "orders").createOrReplaceTempView("orders_src219")
      def slice(lo: Int, hi: Int): Unit = {
        s.sql(s"""INSERT INTO $cat.gold.ev219
          SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
          FROM orders_src219 WHERE o_custkey BETWEEN $lo AND $hi""") : Unit
      }
      slice(20, 50); slice(51, 80); slice(81, 110)
      val ckpt = tmp("q219ckpt")
      val out = tmp("q219out")
      def runOnce(): Unit = {
        val q = s.readStream.table(s"$cat.gold.ev219")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000); ()
      }
      runOnce()
      val firstRows = s.read.parquet(out).count()
      val want3 = s.sql(s"SELECT count(*) AS n FROM $cat.gold.ev219")
        .head().getLong(0)
      require(firstRows == want3,
        s"q219 first pass streamed $firstRows of $want3 rows")
      // one more commit while the stream is down; the restart reads ONLY
      // the unstreamed commit (offset = checkpointed version)
      slice(111, 130)
      runOnce()
      val allRows = s.read.parquet(out).count()
      val want4 = s.sql(s"SELECT count(*) AS n FROM $cat.gold.ev219")
        .head().getLong(0)
      val exactlyOnce = allRows == want4 && allRows > firstRows
      require(exactlyOnce,
        s"q219 restart emitted $allRows (want $want4, had $firstRows)")
      s.read.parquet(out)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("exactly_once_ok", lit(exactlyOnce))
    }),
    // STREAMING ADMISSION CONTROL (q279, round-17 verdict item 3):
    // `maxFilesPerTrigger` on the row-native lake stream — ONE large
    // commit (6 z-ordered files) splits across micro-batches with
    // (version, fileIndex) offsets instead of arriving as a trigger-
    // sized spike; a checkpointed restart after one more commit resumes
    // exactly-once. At 100 TB this is the first knob a production
    // streaming user touches: a backfill commit of thousands of files
    // must not become one multi-hour micro-batch. Gates: the one-commit
    // table drains in ≥ 3 bounded batches (cap 2 of 6 files), rows
    // exact, restart emits only the unstreamed commit.
    "q279_stream_admission" -> ((s, dir) => {
      val cat = catalog(s)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
      s.sql(s"DROP TABLE IF EXISTS $cat.gold.adm279")
      s.sql(s"""CREATE TABLE $cat.gold.adm279
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        USING lake
        TBLPROPERTIES ('stats_cols' = 'o_orderkey', 'files' = '6')""")
      t(s, dir, "orders").createOrReplaceTempView("orders_src279")
      s.sql(s"""INSERT INTO $cat.gold.adm279
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_src279 WHERE o_custkey BETWEEN 20 AND 110""")
      val ckpt = tmp("q279ckpt")
      val out = tmp("q279out")
      def runOnce(): Int = {
        val q = s.readStream.option("maxFilesPerTrigger", "2")
          .table(s"$cat.gold.adm279")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
        q.recentProgress.count(_.numInputRows > 0)
      }
      val batches = runOnce()
      val boundedOk = batches >= 3
      require(boundedOk,
        s"q279 one 6-file commit drained in $batches batches, want >= 3")
      val firstRows = s.read.parquet(out).count()
      val want = s.sql(s"SELECT count(*) AS n FROM $cat.gold.adm279")
        .head().getLong(0)
      require(firstRows == want,
        s"q279 bounded drain emitted $firstRows of $want rows")
      // one more commit while the stream is down: the restart resumes
      // from the checkpointed (version, fileIndex) offset exactly-once
      s.sql(s"""INSERT INTO $cat.gold.adm279
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_src279 WHERE o_custkey BETWEEN 111 AND 130""")
      runOnce() : Unit
      val allRows = s.read.parquet(out).count()
      val want2 = s.sql(s"SELECT count(*) AS n FROM $cat.gold.adm279")
        .head().getLong(0)
      val exactlyOnce = allRows == want2 && allRows > firstRows
      require(exactlyOnce,
        s"q279 restart emitted $allRows (want $want2, had $firstRows)")
      s.read.parquet(out)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("bounded_batches_ok", lit(boundedOk))
        .withColumn("exactly_once_ok", lit(exactlyOnce))
    }),

    // BYTE-BASED STREAM ADMISSION (q285, round-18 verdict item 3):
    // `maxBytesPerTrigger` — the knob that actually bounds executor
    // memory when compaction changes file sizes; file counts are a proxy
    // that breaks exactly then. The fixture lands one FAT 4-file commit
    // and one THIN 4-file commit; the byte budget is derived from the
    // measured fattest file (1.5×), so at EVERY scale factor each fat
    // file streams alone while the thin commit rides a residual budget.
    // Gates in-query: (a) the drain takes one batch per fat file (+
    // at most one for the thin tail) and NO batch ever carries two fat
    // files — the byte bound, where a 2-file count bound would pack
    // fats in pairs; (b) a restart after one more commit resumes
    // exactly-once from the checkpointed (version, fileIndex) offset.
    "q285_bytes_admission" -> ((s, dir) => {
      val cat = catalog(s)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
      s.sql(s"DROP TABLE IF EXISTS $cat.gold.adm285")
      s.sql(s"""CREATE TABLE $cat.gold.adm285
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        USING lake
        TBLPROPERTIES ('stats_cols' = 'o_orderkey', 'files' = '4')""")
      t(s, dir, "orders").createOrReplaceTempView("orders_src285")
      s.sql(s"""INSERT INTO $cat.gold.adm285
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_src285 WHERE o_custkey BETWEEN 1 AND 100""")
      // catalog convention: <warehouse>/<db>/<t> with data under z/
      val dataDir = s"${s.conf.get(
        s"spark.sql.catalog.$cat.warehouse")}/gold/adm285/z"
      val hfs = new org.apache.hadoop.fs.Path(dataDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val fatStats = hfs.listStatus(
        new org.apache.hadoop.fs.Path(dataDir))
        .filter(f => !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      val fatMaxBytes = fatStats.map(_.getLen).max
      val fatRows = s.sql(s"SELECT count(*) AS n FROM $cat.gold.adm285")
        .head().getLong(0)
      s.sql(s"""INSERT INTO $cat.gold.adm285
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_src285 WHERE o_custkey BETWEEN 101 AND 104""")
      val ckpt = tmp("q285ckpt")
      val out = tmp("q285out")
      def runOnce(): Seq[Long] = {
        val q = s.readStream
          .option("maxBytesPerTrigger", (fatMaxBytes * 3 / 2).toString)
          .table(s"$cat.gold.adm285")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
        q.recentProgress.filter(_.numInputRows > 0)
          .map(_.numInputRows).toSeq
      }
      val batches = runOnce()
      val boundedOk = batches.size >= 4 && batches.size <= 5 &&
        batches.max < fatRows / 2
      require(boundedOk, s"q285 byte budget did not bound the drain: " +
        s"batches ${batches.mkString(",")} (fat commit $fatRows rows)")
      val firstRows = s.read.parquet(out).count()
      val want = s.sql(s"SELECT count(*) AS n FROM $cat.gold.adm285")
        .head().getLong(0)
      require(firstRows == want,
        s"q285 bounded drain emitted $firstRows of $want rows")
      s.sql(s"""INSERT INTO $cat.gold.adm285
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_src285 WHERE o_custkey BETWEEN 105 AND 110""")
      runOnce() : Unit
      val allRows = s.read.parquet(out).count()
      val want2 = s.sql(s"SELECT count(*) AS n FROM $cat.gold.adm285")
        .head().getLong(0)
      val exactlyOnce = allRows == want2 && allRows > firstRows
      require(exactlyOnce,
        s"q285 restart emitted $allRows (want $want2, had $firstRows)")
      s.read.parquet(out)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("byte_bounded_ok", lit(boundedOk))
        .withColumn("exactly_once_ok", lit(exactlyOnce))
    }),

    // DELTA _delta_log INTEROP (q282, the round-16 "missing" list's last
    // ring): read an ACTUAL Delta table — JSON log actions, the format
    // the reference's production Databricks side writes — with no delta
    // jars, from the public protocol alone; then adopt it as a lake
    // table ZERO-COPY (footer-stats manifest over the live files) so the
    // whole engine surface applies. The fixture is written through the
    // interop's own minimal Delta WRITER (protocol 1/2 JSON commits), so
    // both directions of the interop are exercised. Gates in-query:
    // replay counts per version (adds accumulate, removes drop, time
    // travel pins), lake-vs-delta read parity after conversion, and the
    // adopted manifest PRUNES a key band. Oracle replays the slices.
    "q282_delta_interop" -> ((s, dir) => {
      import graft.sources.DeltaInterop
      val root = tmp("q282")
      val dt = s"$root/dt"
      LakeSql.unregister("dlake282")
      val orders = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      def slice(lo: Int, hi: Int) =
        orders.filter(col("o_custkey").between(lo, hi))
      DeltaInterop.landFile(slice(1, 60), dt, "part-a.parquet")
      DeltaInterop.landFile(slice(61, 120), dt, "part-b.parquet")
      DeltaInterop.writeCommit(s, dt, 0, Some(orders.schema),
        adds = Seq("part-a.parquet" -> Nil, "part-b.parquet" -> Nil))
      DeltaInterop.landFile(slice(121, 180), dt, "part-c.parquet")
      DeltaInterop.writeCommit(s, dt, 1, None,
        adds = Seq("part-c.parquet" -> Nil))
      DeltaInterop.writeCommit(s, dt, 2, None,
        removes = Seq("part-b.parquet"))
      val nA = slice(1, 60).count(); val nB = slice(61, 120).count()
      val nC = slice(121, 180).count()
      val replayOk =
        DeltaInterop.read(s, dt, Some(0L)).count() == nA + nB &&
        DeltaInterop.read(s, dt, Some(1L)).count() == nA + nB + nC &&
        DeltaInterop.read(s, dt).count() == nA + nC
      require(replayOk, "q282 log replay / time travel miscounted")
      // zero-copy adoption: manifest over the live files, lake surface on
      val v = DeltaInterop.convertToLake(s, dt, "dlake282",
        s"$root/m", Seq("o_custkey"))
      LakeSql.register("dlake282",
        graft.sql.LakeSql.LakeTableSpec(dt, s"$root/m", Seq("o_custkey"), 8))
      val lake = LakeSql.sql(s,
        "SELECT o_orderkey, o_custkey, o_totalprice FROM dlake282")
      val delta = DeltaInterop.read(s, dt)
      val parityOk = v == 1 && lake.exceptAll(delta).isEmpty &&
        delta.exceptAll(lake).isEmpty
      require(parityOk, "q282 adopted lake read diverged from delta read")
      // the adopted manifest prunes: a band over one slice's custkeys
      // must not plan every file
      val m = graft.sinks.Snapshots.manifestAt(s, s"$root/m", 1)
      val total = m.count()
      val hit = m.filter(col("min_o_custkey") <= 60L &&
        col("max_o_custkey") >= 1L).count()
      val prunedOk = hit < total
      require(prunedOk, s"q282 adopted manifest pruned nothing: $hit/$total")
      LakeSql.sql(s, "SELECT o_orderkey, o_custkey, o_totalprice " +
          "FROM dlake282 WHERE o_custkey BETWEEN 1 AND 60")
        .withColumn("replay_ok", lit(replayOk))
        .withColumn("parity_ok", lit(parityOk))
        .withColumn("pruned_ok", lit(prunedOk))
    }),

    // DELTA CHECKPOINT REPLAY + LOG EXPORT (q284, round-18 verdict
    // item 2 — the two halves q282 documented as out of scope): (1) a
    // PRODUCTION-shaped log whose early JSON commits were vacuumed away
    // reads through the parquet checkpoint (`_last_checkpoint` +
    // one-action-per-row state) plus the JSON tail — 10k+-commit Delta
    // tables are exactly this shape; (2) the REVERSE publish: a lake
    // snapshot's live files become a fresh `_delta_log` (zero data
    // copied) that the same reader — and any stock Delta reader —
    // serves. Gates in-query: (a) checkpoint+tail replay counts per
    // version and a pinned read below the reconstructable state refuses,
    // (b) the exported log re-reads exactly equal to the lake head after
    // real DML (delete + insert), with zero data files written by the
    // export. Oracle replays the lake DML over raw orders.
    "q284_delta_ckpt_export" -> ((s, dir) => {
      import graft.sources.DeltaInterop
      import graft.sinks.Snapshots
      val root = tmp("q284")
      val dt = s"$root/dt"
      LakeSql.unregister("exp284")
      val orders = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      def slice(lo: Int, hi: Int) =
        orders.filter(col("o_custkey").between(lo, hi))
      // checkpoint half: v0 adds a+b, v1 adds c / removes a, CHECKPOINT
      // at 1, v2 adds d, then JSON 0 and 1 are vacuumed (truncated log)
      DeltaInterop.landFile(slice(1, 60), dt, "part-a.parquet")
      DeltaInterop.landFile(slice(61, 120), dt, "part-b.parquet")
      DeltaInterop.writeCommit(s, dt, 0, Some(orders.schema),
        adds = Seq("part-a.parquet" -> Nil, "part-b.parquet" -> Nil))
      DeltaInterop.landFile(slice(121, 180), dt, "part-c.parquet")
      DeltaInterop.writeCommit(s, dt, 1, None,
        adds = Seq("part-c.parquet" -> Nil),
        removes = Seq("part-a.parquet"))
      DeltaInterop.writeCheckpoint(s, dt, 1)
      DeltaInterop.landFile(slice(181, 200), dt, "part-d.parquet")
      DeltaInterop.writeCommit(s, dt, 2, None,
        adds = Seq("part-d.parquet" -> Nil))
      val hfs = new org.apache.hadoop.fs.Path(dt)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(0L, 1L).foreach(v => require(hfs.delete(
        new org.apache.hadoop.fs.Path(dt, f"_delta_log/$v%020d.json"),
        false), s"q284 could not truncate JSON $v"))
      val nB = slice(61, 120).count(); val nC = slice(121, 180).count()
      val nD = slice(181, 200).count()
      val belowRefused = scala.util.Try(
        DeltaInterop.read(s, dt, Some(0L)).count()).isFailure
      val ckptOk =
        DeltaInterop.read(s, dt).count() == nB + nC + nD &&
        DeltaInterop.read(s, dt, Some(1L)).count() == nB + nC &&
        belowRefused
      require(ckptOk, "q284 checkpoint+tail replay miscounted or a " +
        "below-checkpoint pin did not refuse")
      // export half: lake table with real DML, then publish its head as
      // a _delta_log over its own data dir — zero copy
      val vexp = s"q284_src_${java.util.UUID.randomUUID.toString.take(8)}"
      slice(1, 120).createOrReplaceTempView(vexp)
      LakeSql.sql(s, s"CREATE TABLE exp284 TBLPROPERTIES(" +
        s"'stats_cols'='o_custkey','files'='4') LOCATION '$root/lake' " +
        s"AS SELECT * FROM $vexp")
      LakeSql.sql(s,
        "DELETE FROM exp284 WHERE o_custkey BETWEEN 30 AND 50")
      val vins = s"q284_ins_${java.util.UUID.randomUUID.toString.take(8)}"
      slice(121, 140).createOrReplaceTempView(vins)
      LakeSql.sql(s, s"INSERT INTO exp284 SELECT * FROM $vins")
      val dataDir = s"$root/lake/z"
      def dataFiles(): Set[String] =
        hfs.listStatus(new org.apache.hadoop.fs.Path(dataDir)).toSeq
          .map(_.getPath.getName)
          .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
      val before = dataFiles()
      DeltaInterop.exportDeltaLog(s, s"$root/lake/m", dataDir)
      val zeroCopy = dataFiles() == before
      val lake = Snapshots.tableAt(s, s"$root/lake/m",
        Snapshots.latestVersion(s, s"$root/lake/m"))
      val exported = DeltaInterop.read(s, dataDir)
      val exportOk = zeroCopy &&
        exported.exceptAll(lake).isEmpty && lake.exceptAll(exported).isEmpty
      require(exportOk, s"q284 exported log diverged (zeroCopy=$zeroCopy)")
      exported
        .withColumn("ckpt_ok", lit(ckptOk))
        .withColumn("export_ok", lit(exportOk))
    }),

    // IDENTITY + NOT NULL (round-15 verdict item 3): the gold star
    // schema's surrogate-key dim (reference `run_load.py:113-124`) built
    // PURELY by INSERTs into a `GENERATED ALWAYS AS IDENTITY` column.
    // Assignment is the deterministic partition-offset prefix sum
    // (rank under a range-partitioned sort on the batch's columns), so
    // the oracle recomputes the EXACT ids with row_number() — never
    // monotonically_increasing_id's scheduling-dependent values. Gates:
    // two batches continue the high-water mark across commits; an
    // explicit id is rejected (GENERATED ALWAYS); a NULL name is
    // rejected BEFORE staging (NOT NULL), leaving the table unchanged.
    "q220_sql_identity_dim" -> ((s, dir) => {
      val root = tmp("q220")
      LakeSql.unregister("cust_dim220")
      s.sql(s"""CREATE TABLE cust_dim220 (
        ck BIGINT GENERATED ALWAYS AS IDENTITY,
        c_custkey BIGINT NOT NULL, c_name STRING)
        USING lake LOCATION '$root'
        TBLPROPERTIES ('stats_cols' = 'ck,c_custkey', 'files' = '4')""")
      t(s, dir, "customer").createOrReplaceTempView("cust_src220")
      s.sql("""INSERT INTO cust_dim220
        SELECT c_custkey, c_name FROM cust_src220 WHERE c_custkey <= 500""")
      s.sql("""INSERT INTO cust_dim220
        SELECT c_custkey, c_name FROM cust_src220
        WHERE c_custkey > 500 AND c_custkey <= 1000""")
      val explicitRejected =
        try { s.sql("INSERT INTO cust_dim220 VALUES (1, 2, 'x')")
          false } catch { case _: Exception => true }
      val before = s.sql("SELECT count(*) AS n FROM cust_dim220")
        .head().getLong(0)
      val nullRejected =
        try { s.sql(
          "INSERT INTO cust_dim220 SELECT CAST(NULL AS BIGINT), 'x'")
          false } catch { case _: Exception => true }
      val unchanged = s.sql("SELECT count(*) AS n FROM cust_dim220")
        .head().getLong(0) == before
      require(explicitRejected && nullRejected && unchanged,
        "q220 contract gates failed")
      // ids are dense 1..n with batch-2 stacked after batch-1 — assert
      // in-query so a high-water bug cannot hide behind the oracle sort
      val dense = s.sql("SELECT max(ck) AS hi, count(*) AS n, " +
        "count(DISTINCT ck) AS d FROM cust_dim220").head()
      require(dense.getLong(0) == dense.getLong(1) &&
        dense.getLong(1) == dense.getLong(2), s"q220 ids not dense: $dense")
      s.sql("SELECT ck, c_custkey, c_name FROM cust_dim220")
        .withColumn("explicit_rejected", lit(explicitRejected))
        .withColumn("null_rejected", lit(nullRejected))
    }),

    // DEFAULT column values (the last column contract after NOT NULL /
    // identity / generated / CHECK / PK-FK): `CREATE TABLE … DEFAULT
    // <const>`, INSERT with a COLUMN LIST filling omitted columns from
    // their defaults, `ALTER COLUMN … SET DEFAULT` re-declaring the
    // WRITE default (existing rows untouched — the Delta contract), and
    // `DROP DEFAULT` reverting omission to typed NULL. Gates: omitting a
    // NOT NULL column with no default is rejected BEFORE staging; a
    // column-referencing default is rejected at DDL time (that is
    // GENERATED ALWAYS AS, not DEFAULT); SHOW CREATE TABLE prints the
    // live default (contract round-trip).
    "q250_sql_default_columns" -> ((s, dir) => {
      val root = tmp("q250")
      LakeSql.unregister("ord250")
      s.sql(s"""CREATE TABLE ord250 (
        o_orderkey BIGINT NOT NULL,
        o_totalprice DOUBLE,
        status STRING DEFAULT 'new',
        priority INT DEFAULT 3)
        USING lake LOCATION '$root'
        TBLPROPERTIES ('stats_cols' = 'o_orderkey', 'files' = '4')""")
      t(s, dir, "orders").createOrReplaceTempView("orders_src250")
      s.sql("""INSERT INTO ord250 (o_orderkey, o_totalprice)
        SELECT o_orderkey, round(o_totalprice, 2)
        FROM orders_src250 WHERE o_custkey BETWEEN 20 AND 60""")
      LakeSql.sql(s,
        "ALTER TABLE ord250 ALTER COLUMN status SET DEFAULT 'held'")
      s.sql("""INSERT INTO ord250 (o_orderkey, o_totalprice)
        SELECT o_orderkey, round(o_totalprice, 2)
        FROM orders_src250 WHERE o_custkey BETWEEN 61 AND 100""")
      LakeSql.sql(s, "ALTER TABLE ord250 ALTER COLUMN priority DROP DEFAULT")
      s.sql("""INSERT INTO ord250 (o_orderkey, status, o_totalprice)
        SELECT o_orderkey, 'manual', round(o_totalprice, 2)
        FROM orders_src250 WHERE o_custkey BETWEEN 101 AND 130""")
      val before = s.sql("SELECT count(*) AS n FROM ord250").head().getLong(0)
      val notNullRejected =
        try { s.sql("INSERT INTO ord250 (o_totalprice) VALUES (1.0)")
          false } catch { case _: Exception => true }
      val columnRefRejected =
        try { LakeSql.sql(s, "ALTER TABLE ord250 ALTER COLUMN status " +
          "SET DEFAULT concat('x', status)")
          false } catch { case _: Exception => true }
      val unchanged = s.sql("SELECT count(*) AS n FROM ord250")
        .head().getLong(0) == before
      val showsDefault = LakeSql.sql(s, "SHOW CREATE TABLE ord250")
        .head().getString(0).contains("DEFAULT 'held'")
      require(notNullRejected && columnRefRejected && unchanged &&
        showsDefault, "q250 contract gates failed")
      s.sql("SELECT o_orderkey, o_totalprice, status, priority FROM ord250")
        .withColumn("not_null_rejected", lit(notNullRejected))
        .withColumn("column_ref_rejected", lit(columnRefRejected))
        .withColumn("shows_default", lit(showsDefault))
    }),

    // ROW FILTERS + COLUMN MASKS (the Databricks governance shape): a
    // row filter and a column mask attach to the table as property
    // commits and apply to EVERY read through the SQL surface — plain
    // spark.sql included, masks computed over raw values, row filter
    // first. Gates: a time-travel read is NOT a policy bypass (the
    // pre-policy version still reads filtered); the bypass session conf
    // (privileged principal) reads raw; DROP MASK restores a column
    // while the filter stays; a policy over an unknown column is
    // rejected at DDL time. Emits the policied table.
    "q251_sql_row_filter_mask" -> ((s, dir) => {
      val root = tmp("q251")
      LakeSql.unregister("cust251")
      s.conf.set("graft.policy.bypass", "false")
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
        .filter(col("c_custkey") <= 800)
        .createOrReplaceTempView("q251_src")
      LakeSql.setWarehouse(root)
      LakeSql.sql(s, "CREATE TABLE cust251 TBLPROPERTIES(" +
        "'stats_cols'='c_custkey','files'='4') AS SELECT * FROM q251_src")
      val rawCount = s.sql("SELECT count(*) AS n FROM cust251")
        .head().getLong(0)
      LakeSql.sql(s,
        "ALTER TABLE cust251 SET ROW FILTER (c_nationkey < 20)")
      LakeSql.sql(s, "ALTER TABLE cust251 ALTER COLUMN c_name " +
        "SET MASK (concat('***', substring(c_name, 10)))")
      LakeSql.sql(s,
        "ALTER TABLE cust251 ALTER COLUMN c_acctbal SET MASK (NULL)")
      val policied = s.sql("SELECT count(*) AS n FROM cust251")
        .head().getLong(0)
      // time travel to the PRE-POLICY version still reads policied
      val travelPolicied = s.sql(
        "SELECT count(*) AS n FROM cust251 VERSION AS OF 1")
        .head().getLong(0) == policied
      // the privileged session reads raw
      s.conf.set("graft.policy.bypass", "true")
      val bypassRaw = s.sql("SELECT count(*) AS n FROM cust251")
        .head().getLong(0) == rawCount &&
        !s.sql("SELECT c_name FROM cust251 WHERE c_custkey = 1")
          .head().getString(0).startsWith("***")
      s.conf.set("graft.policy.bypass", "false")
      val maskApplied = s.sql(
        "SELECT c_name FROM cust251 WHERE c_custkey = 1")
        .head().getString(0).startsWith("***")
      // unknown column → DDL-time rejection, nothing committed
      val badPolicyRejected = scala.util.Try(LakeSql.sql(s,
        "ALTER TABLE cust251 SET ROW FILTER (no_such_col > 0)")).isFailure
      // DROP MASK restores the column; the row filter stays in force
      LakeSql.sql(s, "ALTER TABLE cust251 ALTER COLUMN c_acctbal DROP MASK")
      require(policied < rawCount && travelPolicied && bypassRaw &&
        maskApplied && badPolicyRejected, "q251 policy gates failed")
      s.sql("SELECT c_custkey, c_name, c_acctbal FROM cust251")
        .withColumn("travel_policied", lit(travelPolicied))
        .withColumn("bypass_raw", lit(bypassRaw))
        .withColumn("bad_policy_rejected", lit(badPolicyRejected))
    }),

    // QUERY RESULT CACHE (the Databricks SQL result-cache behavior): a
    // repeated SELECT over version-unchanged lake inputs is served from
    // its spilled parquet result — zero re-execution — and ANY commit to
    // an input invalidates by construction (head versions are in the
    // key). Gates: the repeat is a HIT with identical cardinality; an
    // INSERT flips the next run to a MISS that sees the new rows; a
    // temp-view input is refused as uncacheable (no version to key on).
    // Emits the post-insert aggregate.
    "q255_sql_result_cache" -> ((s, dir) => {
      val root = tmp("q255")
      LakeSql.unregister("ord255")
      LakeSql.setWarehouse(root)
      ResultCache.reset()
      ResultCache.enable(QueryTmp.dir("q255cache"))
      def band(lo: Int, hi: Int, view: String): Unit = {
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice"), 2).as("o_totalprice"))
          .filter(col("o_custkey").between(lo, hi))
          .createOrReplaceTempView(view)
        ()
      }
      band(1, 80, "q255_src")
      LakeSql.sql(s, "CREATE TABLE ord255 TBLPROPERTIES(" +
        "'stats_cols'='o_custkey','files'='4') AS SELECT * FROM q255_src")
      val q = "SELECT o_custkey, count(*) AS n, " +
        "round(sum(o_totalprice), 2) AS spend FROM ord255 " +
        "GROUP BY o_custkey"
      val c1 = ResultCache.sql(s, q).count()
      val s0 = ResultCache.stats
      val c2 = ResultCache.sql(s, q).count()
      val s1 = ResultCache.stats
      val hitOk = s1.hits == s0.hits + 1 && s1.misses == s0.misses &&
        c2 == c1
      band(81, 120, "q255_more")
      LakeSql.sql(s, "INSERT INTO ord255 SELECT * FROM q255_more")
      val r3 = ResultCache.sql(s, q)
      val s2 = ResultCache.stats
      val invalidateOk = s2.misses == s1.misses + 1 && r3.count() > c1
      ResultCache.sql(s, "SELECT count(*) AS n FROM q255_src").count()
      val s3 = ResultCache.stats
      val uncacheableOk = s3.uncacheable == s2.uncacheable + 1
      ResultCache.reset() // the cache is per-fixture, never ambient
      require(hitOk && invalidateOk && uncacheableOk,
        s"q255 cache gates failed: hit=$hitOk invalidate=$invalidateOk " +
          s"uncacheable=$uncacheableOk")
      r3.withColumn("hit_ok", lit(hitOk))
        .withColumn("invalidate_ok", lit(invalidateOk))
        .withColumn("uncacheable_ok", lit(uncacheableOk))
    }),

    // APPLY CHANGES → SCD TYPE 2 (the DLT `APPLY CHANGES INTO … STORED AS
    // SCD TYPE 2` shape): the change feed of a source lake table — one
    // CTAS, one UPDATE, one DELETE — maintains a full-history target with
    // version-bounded validity intervals, applied INCREMENTALLY (per-poll
    // cost tracks each commit's feed, the q141 replication property, but
    // the target keeps history instead of mirroring). Gates: the three
    // source versions apply as three cursor-tagged applies; a REPLAY
    // applies zero (exactly-once via the target's own txn tags); exactly
    // one open interval per live key. Emits the full history table.
    "q256_apply_changes_scd2" -> ((s, dir) => {
      val root = tmp("q256")
      LakeSql.unregister("ord256src")
      LakeSql.unregister("ord256scd")
      LakeSql.setWarehouse(root)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .filter(col("o_custkey").between(1, 100))
        .createOrReplaceTempView("q256_src")
      LakeSql.sql(s, "CREATE TABLE ord256src TBLPROPERTIES(" +
        "'stats_cols'='o_custkey,o_orderkey','files'='6') " +
        "AS SELECT * FROM q256_src")
      LakeSql.sql(s, "UPDATE ord256src SET o_totalprice = " +
        "round(o_totalprice * 2, 2) WHERE o_custkey BETWEEN 10 AND 30")
      LakeSql.sql(s,
        "DELETE FROM ord256src WHERE o_custkey BETWEEN 40 AND 50")
      s.sql(s"""CREATE TABLE ord256scd (
        o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
        start_at BIGINT, end_at BIGINT, is_current BOOLEAN)
        USING lake LOCATION '$root/scd'
        TBLPROPERTIES ('stats_cols' = 'o_orderkey,start_at',
                       'files' = '4')""")
      val srcRoot = s"$root/ord256src/m"
      val r1 = graft.sql.ApplyChanges.scd2(s, srcRoot, "ord256scd",
        "o_orderkey", Seq("o_custkey", "o_totalprice"))
      val appliedOk = r1.commitsApplied == 3 && r1.toVersion == 3
      val r2 = graft.sql.ApplyChanges.scd2(s, srcRoot, "ord256scd",
        "o_orderkey", Seq("o_custkey", "o_totalprice"))
      val replayOk = r2.commitsApplied == 0 && r2.fromVersion == 3
      // exactly one OPEN interval per live source key, none for deleted
      val openPerKey = LakeSql.sql(s, "SELECT max(c) AS hi FROM (" +
        "SELECT o_orderkey, count(*) AS c FROM ord256scd " +
        "WHERE is_current = true GROUP BY o_orderkey)").head().getLong(0)
      val liveOk = openPerKey == 1 &&
        LakeSql.sql(s, "SELECT count(*) AS n FROM ord256scd " +
          "WHERE is_current = true").head().getLong(0) ==
        LakeSql.sql(s, "SELECT count(*) AS n FROM ord256src")
          .head().getLong(0)
      require(appliedOk && replayOk && liveOk,
        s"q256 gates failed: applied=$r1 replay=$r2 open=$openPerKey")
      LakeSql.sql(s, "SELECT o_orderkey, o_custkey, o_totalprice, " +
          "start_at, end_at, is_current FROM ord256scd")
        .withColumn("applied_ok", lit(appliedOk))
        .withColumn("replay_ok", lit(replayOk))
        .withColumn("live_ok", lit(liveOk))
    }),

    // SQL UDFs (the Spark-4 / Databricks `CREATE FUNCTION … RETURN`
    // surface): a scalar SQL function — declared once, resolved by the
    // analyzer, INLINED into the calling plan (codegen-friendly, no
    // black-box UDF boundary: the optimizer still sees the arithmetic) —
    // plus a SQL TABLE function consumed in a lateral position. Gates:
    // both declarations round-trip through plain spark.sql; the scalar
    // composes with aggregation; dropping the function removes it.
    "q262_sql_udf" -> ((s, dir) => {
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS disc262")
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS tiers262")
      s.sql("""CREATE TEMPORARY FUNCTION disc262(p DOUBLE, d DOUBLE)
        RETURNS BIGINT RETURN CAST(floor(p * (1 - d) * 100) AS BIGINT)""")
      s.sql("""CREATE TEMPORARY FUNCTION tiers262(q DOUBLE)
        RETURNS TABLE (tier STRING)
        RETURN SELECT CASE WHEN q >= 30 THEN 'bulk'
                           WHEN q >= 10 THEN 'mid'
                           ELSE 'small' END AS tier""")
      t(s, dir, "lineitem").createOrReplaceTempView("li262")
      val out = s.sql("""
        SELECT t.tier,
          count(*) AS n,
          sum(disc262(l_extendedprice, l_discount)) AS net_cents
        FROM li262, LATERAL tiers262(l_quantity) t
        GROUP BY t.tier""")
      // the scalar INLINES: the aggregate's plan carries the arithmetic,
      // not an opaque function call boundary
      val plan = out.queryExecution.optimizedPlan.toString
      val inlined = !plan.toLowerCase(java.util.Locale.ROOT)
        .contains("disc262")
      val dropped = {
        s.sql("DROP TEMPORARY FUNCTION disc262")
        scala.util.Try(
          s.sql("SELECT disc262(1.0D, 0.1D)").collect()).isFailure
      }
      require(inlined && dropped, s"q262 gates: inlined=$inlined " +
        s"dropped=$dropped\n$plan")
      out.withColumn("inlined_ok", lit(inlined))
        .withColumn("dropped_ok", lit(dropped))
    }),
  )

  val oracle: Map[String, String] = Map(
    // q218 emits the inserted band minus the deleted sub-band.
    "q218_sql_catalog_table" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS born_empty_ok, TRUE AS travel_ok, TRUE AS roundtrip_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 20 AND 130
        |  AND o_custkey NOT BETWEEN 55 AND 95""".stripMargin,
    // q219 emits the four streamed slices = the full band.
    "q219_stream_table_rows" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS exactly_once_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 20 AND 130""".stripMargin,
    // q282: the head snapshot = slice A (custkey 1..60) + slice C
    // (121..180) — B was removed at v2; the emitted band is A; replay/
    // parity/prune gates are literal true (require'd in-query).
    "q282_delta_interop" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS replay_ok, TRUE AS parity_ok, TRUE AS pruned_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 1 AND 60""".stripMargin,
    // q285: the drained stream carries the three committed slices;
    // byte-batching gates are literal true (require'd in-query).
    "q285_bytes_admission" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS byte_bounded_ok, TRUE AS exactly_once_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 1 AND 110""".stripMargin,
    // q284: the exported log serves the lake head = the 1..120 slice
    // minus the 30..50 delete band plus the 121..140 insert; checkpoint
    // and export gates are literal true (require'd in-query).
    "q284_delta_ckpt_export" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS ckpt_ok, TRUE AS export_ok
        |FROM orders
        |WHERE (o_custkey BETWEEN 1 AND 120
        |       AND o_custkey NOT BETWEEN 30 AND 50)
        |   OR o_custkey BETWEEN 121 AND 140""".stripMargin,
    // q279: the drained stream carries exactly the two committed slices;
    // batching gates are literal true (require'd in-query).
    "q279_stream_admission" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS bounded_batches_ok, TRUE AS exactly_once_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 20 AND 130""".stripMargin,
    // q220: identity = rank under (c_custkey, c_name) within each batch,
    // batch 2 offset by batch 1's row count — row_number recomputes it.
    "q220_sql_identity_dim" ->
      """WITH b1 AS (SELECT c_custkey, c_name FROM customer
        |            WHERE c_custkey <= 500),
        |     b2 AS (SELECT c_custkey, c_name FROM customer
        |            WHERE c_custkey > 500 AND c_custkey <= 1000)
        |SELECT row_number() OVER (ORDER BY c_custkey, c_name) AS ck,
        |       c_custkey, c_name,
        |       TRUE AS explicit_rejected, TRUE AS null_rejected
        |FROM b1
        |UNION ALL
        |SELECT (SELECT count(*) FROM b1) +
        |       row_number() OVER (ORDER BY c_custkey, c_name) AS ck,
        |       c_custkey, c_name, TRUE, TRUE
        |FROM b2""".stripMargin,
    // q250: three INSERT batches — defaults at the time of each write
    // ('new'/3, then 'held'/3, then explicit 'manual' with priority
    // dropped to NULL).
    "q250_sql_default_columns" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |       'new' AS status, CAST(3 AS INTEGER) AS priority,
        |       TRUE AS not_null_rejected, TRUE AS column_ref_rejected,
        |       TRUE AS shows_default
        |FROM orders WHERE o_custkey BETWEEN 20 AND 60
        |UNION ALL
        |SELECT o_orderkey, round(o_totalprice, 2), 'held',
        |       CAST(3 AS INTEGER), TRUE, TRUE, TRUE
        |FROM orders WHERE o_custkey BETWEEN 61 AND 100
        |UNION ALL
        |SELECT o_orderkey, round(o_totalprice, 2), 'manual',
        |       CAST(NULL AS INTEGER), TRUE, TRUE, TRUE
        |FROM orders WHERE o_custkey BETWEEN 101 AND 130""".stripMargin,
    // q251: the policied read — row filter keeps c_nationkey < 20, the
    // name mask leaves '***' + the numeric tail, the acctbal mask was
    // dropped again before the emit.
    "q251_sql_row_filter_mask" ->
      """SELECT c_custkey,
        |       concat('***', substring(c_name, 10)) AS c_name,
        |       c_acctbal,
        |       TRUE AS travel_policied, TRUE AS bypass_raw,
        |       TRUE AS bad_policy_rejected
        |FROM customer
        |WHERE c_custkey <= 800 AND c_nationkey < 20""".stripMargin,
    // q255: the post-insert aggregate over both bands (values stored
    // pre-rounded by the CTAS).
    "q255_sql_result_cache" ->
      """SELECT o_custkey, count(*) AS n,
        |  round(sum(round(o_totalprice, 2)), 2) AS spend,
        |  TRUE AS hit_ok, TRUE AS invalidate_ok, TRUE AS uncacheable_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 1 AND 120
        |GROUP BY o_custkey""".stripMargin,
    // q256: the SCD2 history recomputed from the deterministic change
    // script — untouched keys stay open from v1; updated keys (10–30)
    // close at v2 and reopen doubled; deleted keys (40–50) close at v3.
    "q256_apply_changes_scd2" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS p
        |  FROM orders WHERE o_custkey BETWEEN 1 AND 100)
        |SELECT o_orderkey, o_custkey, p AS o_totalprice,
        |  CAST(1 AS BIGINT) AS start_at, CAST(NULL AS BIGINT) AS end_at,
        |  TRUE AS is_current,
        |  TRUE AS applied_ok, TRUE AS replay_ok, TRUE AS live_ok
        |FROM base
        |WHERE o_custkey NOT BETWEEN 10 AND 30
        |  AND o_custkey NOT BETWEEN 40 AND 50
        |UNION ALL
        |SELECT o_orderkey, o_custkey, p, 1, 2, FALSE, TRUE, TRUE, TRUE
        |FROM base WHERE o_custkey BETWEEN 10 AND 30
        |UNION ALL
        |SELECT o_orderkey, o_custkey, round(p * 2, 2), 2, NULL, TRUE,
        |  TRUE, TRUE, TRUE
        |FROM base WHERE o_custkey BETWEEN 10 AND 30
        |UNION ALL
        |SELECT o_orderkey, o_custkey, p, 1, 3, FALSE, TRUE, TRUE, TRUE
        |FROM base WHERE o_custkey BETWEEN 40 AND 50""".stripMargin,
    // q262: the SQL functions inlined by hand.
    "q262_sql_udf" ->
      """SELECT CASE WHEN l_quantity >= 30 THEN 'bulk'
        |            WHEN l_quantity >= 10 THEN 'mid'
        |            ELSE 'small' END AS tier,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS net_cents,
        |  TRUE AS inlined_ok, TRUE AS dropped_ok
        |FROM lineitem
        |GROUP BY 1""".stripMargin,
  )
}
