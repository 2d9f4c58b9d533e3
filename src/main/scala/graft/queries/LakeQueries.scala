package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{TableRef, Tables}
import graft.ops.Ivm
import graft.pipeline.{Catalog, Pipeline}
import graft.plans.PlanGuard
import graft.qc.RecallGate
import graft.sinks.{Bucketing, Layout, Maintenance, RowTracking, Sinks, Snapshots}
import graft.sources.{EndpointSpec, IncrementalConfig, Json, PagePagination, RestSource}

/** Sink/source round-trips under the driver's DuckDB gate (SURVEY §2.1/§2.2):
  * each query pushes real data THROUGH a sink or source operator and returns
  * what comes back out, so the oracle checks fidelity end-to-end — a sink
  * that drops, duplicates, or corrupts rows cannot stay green. These were
  * previously unit-spec-only (round-2 verdict coverage table).
  */
object LakeQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tmp(name: String): String = QueryTmp.dir(name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K2 + S1: JSONL sink → JSONL scan round-trip. JSON re-infers integer
    // columns as long — the explicit cast back is part of the contract a
    // schema-tolerant bronze layer needs.
    "q64_jsonl_roundtrip" -> ((s, dir) => {
      val out = tmp("q64")
      val cust = t(s, dir, "customer")
        .filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
      Sinks.writeJsonl(cust, s"$out/jsonl")
      Json.readJsonl(s, s"$out/jsonl")
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("int").as("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
    }),

    // K1: hive-layout write + DYNAMIC partition overwrite. One month of
    // orders is rewritten with bumped totals; every other partition must
    // survive untouched (static overwrite mode would drop them — the
    // 100 TB-fatal failure this guards against).
    "q65_partition_overwrite" -> ((s, dir) => {
      val root = tmp("q65")
      val ref = TableRef("silver", "sales", "orders")
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .withColumn("run_date", date_format(col("o_orderdate"), "yyyy-MM"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"),
          col("run_date"))
      Sinks.writePartitionedByRunDate(base, root, ref)
      val updated = base.filter(col("run_date") === "1995-03")
        .withColumn("o_totalprice", round(col("o_totalprice") + 1000, 2))
      Sinks.writePartitionedByRunDate(updated, root, ref)
      Sinks.readLakeTable(s, root, ref)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("run_date").cast("string").as("run_date"))
    }),

    // Lake maintenance: small-file compaction must be invisible to readers —
    // same rows out, far fewer files. The file-count drop is asserted loudly
    // inside the query (a no-op compact would still be row-correct).
    "q66_compaction" -> ((s, dir) => {
      val root = tmp("q66")
      val ref = TableRef("bronze", "activity", "events")
      val ev = t(s, dir, "events").filter(col("event_id") % 5 === 0)
      ev.repartition(40).write.mode("overwrite")
        .parquet(ref.path(root, "2026-01-01"))
      val before = Maintenance.partitionStats(s, root, ref).head.files
      val done = Maintenance.compact(s, root, ref) // 128 MiB target → 1 file
      val after = Maintenance.partitionStats(s, root, ref).head.files
      require(done.nonEmpty && after < before,
        s"compaction did not reduce files: $before -> $after")
      s.read.parquet(ref.path(root, "2026-01-01"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
    }),

    // Z-ORDER layout + file-stats-manifest pruning, SELF-GATING: orders is
    // laid out z-ordered on (o_custkey, o_totalprice) into 64 files, a
    // min/max manifest is built (one column-pruned scan), and a 2-D range
    // box is answered by scanning ONLY the manifest-surviving files.
    // Gates: the pruning must actually bite (≤ half the files opened —
    // measured, in-query) and the pruned scan must EXACTLY equal the full
    // scan under the same predicate (stats can only over-include; a missing
    // row means the layout or manifest broke). Emits the box's rows — plain
    // SQL over orders — with both verdicts riding.
    "q106_zorder_pruned_scan" -> ((s, dir) => {
      val root = tmp("q106")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      Layout.zorderWrite(orders, zcols, s"$root/z", nFiles = 64)
      val manifest = Layout.buildManifest(s, s"$root/z", zcols).localCheckpoint()
      val pr = Layout.prunedRead(s, s"$root/z", manifest,
        Seq(("o_custkey", 100.0, 400.0), ("o_totalprice", 50000.0, 150000.0)))
      val prunedOk = pr.filesRead * 2 <= pr.filesTotal
      require(prunedOk,
        s"stats pruning did not bite: ${pr.filesRead} of ${pr.filesTotal} files read")
      val full = orders.filter(col("o_custkey").between(100, 400) &&
        col("o_totalprice").between(50000.0, 150000.0))
      val completeOk = RecallGate.equivalent(
        pr.df.select(col("o_orderkey")), full.select(col("o_orderkey")),
        Seq("o_orderkey"), "q106 pruned scan vs full scan")
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("pruned_ok", lit(prunedOk))
        .withColumn("complete_ok", lit(completeOk))
    }),

    // q106's DAILY-CADENCE twin: half of orders is laid out z-ordered, the
    // other half arrives as an appended batch — z-ordered by its own
    // bounds, manifest extended with ONLY the new files' stats (existing
    // data never rewritten or rescanned; the manifest is the record of
    // known files). Gates: the manifest grew by exactly the appended file
    // count, pruning still bites across the combined layout, and the
    // pruned scan equals the full scan over base ∪ batch.
    "q107_incremental_layout" -> ((s, dir) => {
      val root = tmp("q107")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      Layout.zorderWrite(orders.filter(col("o_orderkey") % 2 === 0),
        zcols, s"$root/z", nFiles = 16)
      Layout.buildManifest(s, s"$root/z", zcols)
        .write.mode("overwrite").parquet(s"$root/m")
      val before = s.read.parquet(s"$root/m").count()
      val appended = Layout.appendWithManifest(s,
        orders.filter(col("o_orderkey") % 2 === 1),
        zcols, s"$root/z", s"$root/m", nFiles = 16)
      val after = s.read.parquet(s"$root/m").count()
      val incrementalOk = appended > 0 && after == before + appended
      require(incrementalOk,
        s"manifest did not grow incrementally: $before + $appended != $after")
      val pr = Layout.prunedRead(s, s"$root/z",
        s.read.parquet(s"$root/m").localCheckpoint(),
        Seq(("o_custkey", 100.0, 400.0), ("o_totalprice", 50000.0, 150000.0)))
      val prunedOk = pr.filesRead * 2 <= pr.filesTotal
      require(prunedOk,
        s"stats pruning did not bite: ${pr.filesRead} of ${pr.filesTotal} files read")
      val full = orders.filter(col("o_custkey").between(100, 400) &&
        col("o_totalprice").between(50000.0, 150000.0))
      val completeOk = RecallGate.equivalent(
        pr.df.select(col("o_orderkey")), full.select(col("o_orderkey")),
        Seq("o_orderkey"), "q107 pruned scan over appended layout vs full scan")
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("incremental_ok", lit(incrementalOk))
        .withColumn("pruned_ok", lit(prunedOk))
        .withColumn("complete_ok", lit(completeOk))
    }),

    // TARGETED DELETE over the clustered layout (retention / right-to-
    // erasure): rows in a custkey band (60–90 — inside every sf's custkey
    // range) are deleted by rewriting ONLY the
    // manifest-intersecting files (z-order clusters the band into few
    // files); the manifest is atomically swapped so pruned readers see
    // pre- or post-delete, never half. Gates: the rewrite touched ≤ half
    // the files (targeted, not a table rewrite), rows were actually
    // deleted, and the surviving table ≡ orders minus the band (full-key
    // equivalence — no collateral loss from the rewritten files). Emits a
    // post-delete manifest-pruned box read.
    "q109_targeted_delete" -> ((s, dir) => {
      val root = tmp("q109")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      FixtureCache.layout(s, s"q109:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      Layout.buildManifest(s, s"$root/z", zcols)
        .write.mode("overwrite").parquet(s"$root/m")
      val res = Layout.deleteWhere(s, s"$root/z", s"$root/m", zcols,
        Seq(("o_custkey", 60.0, 90.0)))
      val targetedOk = res.rowsDeleted > 0 &&
        res.filesRewritten * 2 <= res.filesTotal
      require(targetedOk,
        s"delete not targeted: ${res.filesRewritten} of ${res.filesTotal} " +
          s"files rewritten, ${res.rowsDeleted} rows deleted")
      val manifest = s.read.parquet(s"$root/m").localCheckpoint()
      val expectedSurvivors = orders.filter(
        !col("o_custkey").between(60, 90))
      val completeOk = RecallGate.equivalentFingerprint(Seq(
        (s.read.parquet(s"$root/z").select(col("o_orderkey")),
          expectedSurvivors.select(col("o_orderkey")),
          "q109 post-delete table vs orders minus band")),
        Seq("o_orderkey"))
      val pr = Layout.prunedRead(s, s"$root/z", manifest,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("targeted_ok", lit(targetedOk))
        .withColumn("complete_ok", lit(completeOk))
    }),

    // TIME TRAVEL + VACUUM (the table-format snapshot model on plain
    // parquet): the layout's manifest becomes a VERSION LOG — the targeted
    // delete commits a new manifest version and RETAINS superseded files,
    // so a reader pinned to v1 still serves the complete pre-delete table.
    // The emitted rows ARE the time-traveled evidence: a v1-pinned pruned
    // box read executed AFTER the delete, which must still contain the
    // deleted band (the oracle checks it against un-deleted orders).
    // Gates: latest read ≡ orders minus the band (the delete committed
    // correctly), and vacuum(retain=1) drops exactly v1 and exactly the
    // superseded files while leaving the latest read intact (reclaim is
    // safe and complete).
    "q111_time_travel" -> ((s, dir) => {
      val root = tmp("q111")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      FixtureCache.layout(s, s"q111:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val res = Snapshots.deleteWhere(s, s"$root/z", s"$root/m", zcols,
        Seq(("o_custkey", 60.0, 90.0)))
      require(res.rowsDeleted > 0, "q111 delete removed nothing — gate vacuous")
      val v2 = Snapshots.latestVersion(s, s"$root/m")
      // the time-traveled read: v1 snapshot, post-delete, pre-vacuum —
      // materialized before vacuum reclaims v1's files (bounded: box rows)
      val asOfV1 = Snapshots.readAt(s, s"$root/m", v1,
        Seq(("o_custkey", 30.0, 120.0))).df.localCheckpoint()
      val survivors = orders.filter(!col("o_custkey").between(60, 90))
      // two separate fingerprint jobs (not batched): this one must run
      // BEFORE vacuum reclaims v1's files, the post-vacuum one after
      val postDeleteOk = RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/m", v2).select(col("o_orderkey")),
          survivors.select(col("o_orderkey")),
          "q111 latest read vs orders minus band")),
        Seq("o_orderkey"))
      val vac = Snapshots.vacuum(s, s"$root/z", s"$root/m", retainLast = 1)
      val vacuumOk = vac.versionsDropped == 1 &&
        vac.filesDeleted == res.filesRewritten &&
        Snapshots.versions(s, s"$root/m") == Seq(v2)
      require(vacuumOk,
        s"vacuum reclaim wrong: dropped ${vac.versionsDropped} versions, " +
          s"deleted ${vac.filesDeleted} files (expected ${res.filesRewritten})")
      val postVacuumOk = RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/m", v2).select(col("o_orderkey")),
          survivors.select(col("o_orderkey")),
          "q111 post-vacuum latest read vs survivors")),
        Seq("o_orderkey"))
      asOfV1.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("post_delete_ok", lit(postDeleteOk))
        .withColumn("vacuum_ok", lit(vacuumOk && postVacuumOk))
    }),

    // COLUMN RENAME/DROP via manifest column mapping (the Iceberg/Delta
    // column-mapping indirection on the version log): a rename commit
    // rewrites ONLY the logical→physical mapping marker — zero data
    // files — while pinned reads below it serve the old name, appends
    // after it route through toPhysical so every file keeps one physical
    // schema, stats keep pruning on the renamed logical column, and CDF
    // across the rename stays key-correct (the rename contributes no row
    // changes). A drop then hides a column at the head while the pinned
    // version keeps serving it. Emits a mapped pruned box read at the
    // post-append version under the NEW name.
    "q129_column_rename" -> ((s, dir) => {
      val root = tmp("q129")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 3 === 0)
        .withColumnRenamed("o_totalprice", "price") // the logical batch
      FixtureCache.layout(s, s"q129:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      def files(): Set[(String, Long, Long)] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(st => st.isFile &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
          .toSet
      }
      val before = files()
      val v2 = Snapshots.renameColumn(s, s"$root/m", "o_totalprice", "price")
      val zeroRewriteOk = files() == before
      require(zeroRewriteOk, "q129 rename touched data files")
      val mapping = Snapshots.columnMapping(s, s"$root/m", v2).get
      val (v3, _) = Snapshots.appendCommit(s,
        Snapshots.toPhysical(batch, mapping), zcols,
        s"$root/z", s"$root/m", nFiles = 8)
      val pinnedCols = Snapshots.mappedTableAt(s, s"$root/m", v1).columns.toSet
      val headCols = Snapshots.mappedTableAt(s, s"$root/m", v3).columns.toSet
      val pinnedOk = pinnedCols.contains("o_totalprice") &&
        !pinnedCols.contains("price") &&
        headCols.contains("price") && !headCols.contains("o_totalprice")
      require(pinnedOk, s"q129 name visibility wrong: $pinnedCols / $headCols")
      val feed = Snapshots.mappedChangesBetween(s, s"$root/m", v1, v3)
      val cdfCleanOk =
        feed.df.filter(col("change_type") === "delete").count() == 0
      val pr = Snapshots.mappedReadAt(s, s"$root/m", v3,
        Seq(("o_custkey", 30.0, 120.0)))
      val gatesOk = RecallGate.equivalentFingerprint(Seq(
          (feed.df.filter(col("change_type") === "insert")
            .select(col("o_orderkey")),
            batch.select(col("o_orderkey")),
            "q129 CDF-across-rename inserts vs appended batch"),
          (pr.df.select(col("o_orderkey")),
            orders.filter(col("o_custkey").between(30, 120))
              .select(col("o_orderkey")),
            "q129 mapped pruned box vs orders box")),
        Seq("o_orderkey"))
      val beforeDrop = files() // post-append baseline: drop must not touch it
      val v4 = Snapshots.dropColumn(s, s"$root/m", "o_custkey")
      val dropOk =
        !Snapshots.mappedTableAt(s, s"$root/m", v4).columns.contains("o_custkey") &&
          Snapshots.mappedTableAt(s, s"$root/m", v3).columns.contains("o_custkey") &&
          files() == beforeDrop
      require(dropOk, "q129 drop semantics wrong")
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("price"), 2).as("price"))
        .withColumn("zero_rewrite_ok", lit(zeroRewriteOk))
        .withColumn("pinned_ok", lit(pinnedOk))
        .withColumn("cdf_ok", lit(cdfCleanOk && gatesOk))
        .withColumn("drop_ok", lit(dropOk))
    }),

    // TIME TRAVEL BY TIMESTAMP (`AS OF <timestamp>`): every commit stamps
    // a strictly-monotonic wall-clock marker inside the atomically-renamed
    // version dir (the Delta in-commit-timestamp model); resolution is
    // last-version-at-or-before. The emitted rows are a pruned box read
    // of the version resolved from the PRE-DELETE commit's stamp —
    // executed after the delete, so they must still contain the deleted
    // band (q111's version-pinned oracle, reached through a timestamp).
    "q130_time_travel_ts" -> ((s, dir) => {
      val root = tmp("q130")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      FixtureCache.layout(s, s"q130:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val res = Snapshots.deleteWhere(s, s"$root/z", s"$root/m", zcols,
        Seq(("o_custkey", 60.0, 90.0)))
      require(res.rowsDeleted > 0, "q130 delete removed nothing — gate vacuous")
      val v2 = Snapshots.latestVersion(s, s"$root/m")
      val ts1 = Snapshots.commitTimestamp(s, s"$root/m", v1).get
      val ts2 = Snapshots.commitTimestamp(s, s"$root/m", v2).get
      val monotonicOk = ts2 > ts1
      val resolveOk =
        Snapshots.versionAtTimestamp(s, s"$root/m", ts1) == v1 &&
          Snapshots.versionAtTimestamp(s, s"$root/m", ts2 - 1) == v1 &&
          Snapshots.versionAtTimestamp(s, s"$root/m", ts2) == v2 &&
          Snapshots.versionAtTimestamp(s, s"$root/m", ts2 + 3600000L) == v2
      require(monotonicOk && resolveOk,
        s"q130 timestamp resolution broken: ts1=$ts1 ts2=$ts2")
      val asOf = Snapshots.readAt(s, s"$root/m",
        Snapshots.versionAtTimestamp(s, s"$root/m", ts1),
        Seq(("o_custkey", 30.0, 120.0)))
      asOf.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("monotonic_ok", lit(monotonicOk))
        .withColumn("resolve_ok", lit(resolveOk))
    }),

    // VERSIONED APPEND + COMPACTION (r9 verdict item: close the {append,
    // delete, compact} × versioned matrix — q111 covered only delete).
    // Base (¬%4 orders) commits as v1; the %4 batch lands via
    // Snapshots.appendCommit (staged z-ordered files + commit, base never
    // rescanned) as v2; compactCommit rewrites the snapshot into fewer
    // freshly z-ordered files as v3; vacuum(retain=1) reclaims exactly the
    // superseded v1/v2 inputs. Gates: a v1-pinned read EXCLUDES the batch
    // (append atomicity/isolation), v2 ≡ all orders, v3 ≡ all orders off
    // fewer files (pure re-layout), vacuum drops exactly 2 versions and
    // exactly the pre-compaction file set while the latest pruned read
    // still serves the complete box.
    "q113_versioned_append_compact" -> ((s, dir) => {
      val root = tmp("q113")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
      FixtureCache.layout(s, s"q113:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val (v2, nApp) = Snapshots.appendCommit(s, batch, zcols,
        s"$root/z", s"$root/m", nFiles = 8)
      require(nApp > 0, "q113 append landed no files — gate vacuous")
      val (v3, nIn, nOut) = Snapshots.compactCommit(s, s"$root/z", s"$root/m",
        zcols, nFiles = 8)
      require(nOut < nIn,
        s"q113 compaction did not shrink the layout: $nIn -> $nOut files")
      // all three snapshot-equivalence gates in ONE batched job, at FULL
      // coverage via multiset fingerprints (v1/v2 files are still on disk
      // here — the vacuum below is what reclaims them, so the pinned
      // probes must run first)
      val gatesOk = RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/m", v1).select(col("o_orderkey")),
          base.select(col("o_orderkey")),
          "q113 v1-pinned read must exclude the appended batch"),
        (Snapshots.tableAt(s, s"$root/m", v2).select(col("o_orderkey")),
          orders.select(col("o_orderkey")),
          "q113 post-append read vs all orders"),
        (Snapshots.tableAt(s, s"$root/m", v3).select(col("o_orderkey")),
          orders.select(col("o_orderkey")),
          "q113 post-compaction read vs all orders")),
        Seq("o_orderkey"))
      val pinnedOk = gatesOk; val appendOk = gatesOk; val compactOk = gatesOk
      val vac = Snapshots.vacuum(s, s"$root/z", s"$root/m", retainLast = 1)
      val vacuumOk = vac.versionsDropped == 2 && vac.filesDeleted == nIn &&
        Snapshots.versions(s, s"$root/m") == Seq(v3)
      require(vacuumOk,
        s"q113 vacuum reclaim wrong: dropped ${vac.versionsDropped} versions, " +
          s"deleted ${vac.filesDeleted} files (expected $nIn)")
      val pr = Snapshots.readAt(s, s"$root/m", v3,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("append_ok", lit(pinnedOk && appendOk))
        .withColumn("compact_ok", lit(compactOk))
        .withColumn("vacuum_ok", lit(vacuumOk))
    }),

    // CHANGE DATA FEED over the version log (the table-format "read the
    // diff, not the table" consumer shape): v1 = base layout (¬%4 orders),
    // v2 = versioned append of the %4 batch, v3 = targeted band delete,
    // v4 = compaction. The feed reads ONLY files that differ between the
    // two manifests (immutable data files ⇒ shared files cancel), so its
    // cost tracks the commit's touch set, not table size — gated in-query
    // (the delete feed read fewer files than the union). Gates: v1→v2 ≡
    // batch as pure inserts; v3→v4 EMPTY (compaction is invisible to CDC —
    // the pure-re-layout claim proven through the row diff); emitted rows =
    // the v2→v3 feed, whose delete set the oracle pins to the band over
    // ALL orders (plus the survivor-rewrite insert/delete pairs cancel —
    // row-identical survivors annihilate in the multiset diff).
    "q114_version_changes" -> ((s, dir) => {
      val root = tmp("q114")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
      FixtureCache.layout(s, s"q114:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val (v2, _) = Snapshots.appendCommit(s, batch, zcols,
        s"$root/z", s"$root/m", nFiles = 8)
      val res = Snapshots.deleteWhere(s, s"$root/z", s"$root/m", zcols,
        Seq(("o_custkey", 60.0, 90.0)))
      require(res.rowsDeleted > 0, "q114 delete removed nothing — gate vacuous")
      val v3 = Snapshots.latestVersion(s, s"$root/m")
      val (v4, _, _) = Snapshots.compactCommit(s, s"$root/z", s"$root/m",
        zcols, nFiles = 8)
      val appendFeed = Snapshots.changesBetween(s, s"$root/m", v1, v2)
      val insertOk = appendFeed.df.filter(col("change_type") =!= "insert")
        .isEmpty &&
        RecallGate.equivalentFingerprint(Seq(
          (appendFeed.df.select(col("o_orderkey")),
            batch.select(col("o_orderkey")),
            "q114 append feed vs the appended batch")),
          Seq("o_orderkey"))
      // invisibility proven by multiset fingerprints of the removed vs
      // added file sets — no exceptAll materialization of an empty diff
      val compactInvisibleOk =
        Snapshots.relayoutInvisible(s, s"$root/m", v3, v4)
      require(compactInvisibleOk,
        "q114 compaction leaked into the change feed — not a pure re-layout")
      val deleteFeed = Snapshots.changesBetween(s, s"$root/m", v2, v3)
      val prunedOk = deleteFeed.filesRead < deleteFeed.filesTotal
      require(prunedOk,
        s"q114 delete feed read ${deleteFeed.filesRead} of " +
          s"${deleteFeed.filesTotal} files — not bounded by the touch set")
      deleteFeed.df
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("change_type"))
        .withColumn("insert_ok", lit(insertOk))
        .withColumn("compact_invisible_ok", lit(compactInvisibleOk))
        .withColumn("pruned_ok", lit(prunedOk))
    }),

    // COPY-ON-WRITE MERGE as a version commit (q115): the Delta-style
    // upsert over the versioned layout. v1 = all orders z-ordered on
    // (o_orderkey, o_custkey); the source batch UPDATES a contiguous
    // orderkey band (price doubled) and INSERTS fresh rows above the key
    // space. Gates in-query: the touch set is stats-pruned (rewrote fewer
    // files than the manifest lists — key locality in z-space is what a
    // MERGE buys from clustering); matched/inserted counts equal the
    // source's actual split; a v1-pinned read still serves pre-merge
    // prices (snapshot isolation across DML); and the commit's change
    // feed is exactly the updated keys as delete(old)+insert(new) pairs
    // plus the fresh rows as inserts. Emits the post-merge state of the
    // updated band and the inserted rows.
    "q115_merge_commit" -> ((s, dir) => {
      val root = tmp("q115")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      val zcols = Seq("o_orderkey", "o_custkey")
      FixtureCache.layout(s, s"q115:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val updates = orders.filter(col("o_orderkey").between(1000, 4000))
        .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
      val inserts = orders.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      val res = Snapshots.mergeCommit(s, updates.unionByName(inserts),
        "o_orderkey", zcols, s"$root/z", s"$root/m", nFiles = 16)
      val prunedOk = res.filesRewritten < res.filesTotal
      require(prunedOk, s"q115 merge rewrote ${res.filesRewritten} of " +
        s"${res.filesTotal} files — stats pruning bought nothing")
      val (nUpd, nIns) = (updates.count(), inserts.count())
      val countsOk = res.rowsUpdated == nUpd && res.rowsInserted == nIns
      require(countsOk, s"q115 matched/inserted counts off: $res")
      val feed = Snapshots.changesBetween(s, s"$root/m", v1, res.version)
      val feedDf = feed.df.localCheckpoint() // exceptAll diff: compute once
      // snapshot-isolation probe + feed-delete identity in ONE batched
      // full-coverage fingerprint job
      val isolationOk = RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/m", v1)
          .filter(col("o_orderkey").between(1000, 4000))
          .select(col("o_orderkey"), col("o_totalprice")),
          orders.filter(col("o_orderkey").between(1000, 4000))
            .select(col("o_orderkey"), col("o_totalprice")),
          "q115 v1 pinned read vs pre-merge"),
        (feedDf.filter(col("change_type") === "delete")
          .select(col("o_orderkey"), col("o_totalprice")),
          updates.select(col("o_orderkey"),
            (col("o_totalprice") / 2).as("o_totalprice")),
          "q115 feed deletes vs updated keys (pre-merge prices)")),
        Seq("o_orderkey", "o_totalprice"))
      val feedOk = isolationOk &&
        feedDf.filter(col("change_type") === "insert").count() == nUpd + nIns
      Snapshots.tableAt(s, s"$root/m", res.version)
        .filter(col("o_orderkey").between(1000, 4000) ||
          col("o_orderkey") >= 10000000L) // orderkey 0 exists: >= keeps its insert
        .withColumn("merge_pruned_ok", lit(prunedOk))
        .withColumn("counts_ok", lit(countsOk))
        .withColumn("isolation_ok", lit(isolationOk))
        .withColumn("feed_ok", lit(feedOk))
    }),

    // INCREMENTAL VIEW MAINTENANCE over the change feed (q116): a gold
    // sum/count rollup is aggregated ONCE over v1, then maintained purely
    // from the commits' change feeds — an append (v2) and a targeted band
    // delete (v3) — without ever re-aggregating the table. Each
    // maintenance step costs the commit's touch set: the feed reads only
    // changed files (gated — the delete feed read fewer files than the
    // manifest union), the delta is one feed-sized aggregation, the merge
    // one join on the view's grain. Gate: the maintained view matches a
    // from-scratch recompute of v3 (counts exact, sums to 1e-4 — the
    // incremental path reassociates float addition). Emits the maintained
    // view; the oracle recomputes it from the final state, so a sign
    // error, a missed group, or a tombstone leak all hash-mismatch.
    "q116_incremental_view" -> ((s, dir) => {
      val root = tmp("q116")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      def gold(df: DataFrame): DataFrame =
        df.groupBy(pmod(col("o_custkey"), lit(8)).as("bucket"))
          .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
      def withBucket(scan: Snapshots.ChangeScan): DataFrame =
        scan.df.withColumn("bucket", pmod(col("o_custkey"), lit(8)))
      val base = orders.filter(col("o_orderkey") % 5 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 5 === 0)
      FixtureCache.layout(s, s"q116:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val view1 = gold(Snapshots.tableAt(s, s"$root/m", v1)).localCheckpoint()
      val (v2, _) = Snapshots.appendCommit(s, batch, zcols, s"$root/z",
        s"$root/m", nFiles = 8)
      val view2 = Ivm.applyFeed(view1,
        withBucket(Snapshots.changesBetween(s, s"$root/m", v1, v2)),
        Seq("bucket"), Seq("total" -> "o_totalprice"), "cnt").localCheckpoint()
      Snapshots.deleteWhere(s, s"$root/z", s"$root/m", zcols,
        Seq(("o_custkey", 40.0, 110.0)))
      val v3 = Snapshots.latestVersion(s, s"$root/m")
      val feed23 = Snapshots.changesBetween(s, s"$root/m", v2, v3)
      val prunedOk = feed23.filesRead < feed23.filesTotal
      require(prunedOk, "q116 delete feed read the whole manifest union")
      val view3 = Ivm.applyFeed(view2, withBucket(feed23),
        Seq("bucket"), Seq("total" -> "o_totalprice"), "cnt").localCheckpoint()
      val drift = view3.as("i")
        .join(gold(Snapshots.tableAt(s, s"$root/m", v3)).as("r"),
          Seq("bucket"), "full_outer")
        .filter(col("i.cnt").isNull || col("r.cnt").isNull ||
          col("i.cnt") =!= col("r.cnt") ||
          abs(col("i.total") - col("r.total")) > 1e-4)
        .count()
      require(drift == 0,
        s"q116 maintained view drifts from recompute on $drift groups")
      view3.select(col("bucket"), col("cnt"),
          round(col("total"), 2).as("total"))
        .withColumn("ivm_ok", lit(true))
        .withColumn("feed_pruned_ok", lit(prunedOk))
    }),

    // SCHEMA EVOLUTION over the version log (q118): a column is added by
    // APPENDING post-evolution files — no rewrite, no migration job, the
    // mechanism every serious table format uses (columns arrive with new
    // data; history keeps its shape). Gates: a v1-pinned read does NOT
    // show the column (old snapshots keep the old schema); the latest
    // read serves the MERGED schema with nulls for pre-evolution rows;
    // and the evolution commit's change feed carries the new column and
    // is pure inserts (an append has no removed side to collide with).
    // Emits the evolved table: o_score = o_custkey × 1.5 on post-
    // evolution rows, NULL before — the oracle pins exactly which rows
    // predate the column.
    "q118_schema_evolution" -> ((s, dir) => {
      val root = tmp("q118")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
        .withColumn("o_score", col("o_custkey").cast("double") * lit(1.5))
      FixtureCache.layout(s, s"q118:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val (v2, _) = Snapshots.appendCommit(s, batch, zcols, s"$root/z",
        s"$root/m", nFiles = 4)
      val oldSchemaOk =
        !Snapshots.tableAt(s, s"$root/m", v1).columns.contains("o_score")
      require(oldSchemaOk, "q118 pinned pre-evolution read leaked the column")
      val evolved = Snapshots.tableAt(s, s"$root/m", v2)
      val newSchemaOk = evolved.columns.contains("o_score") &&
        evolved.filter(col("o_score").isNull).count() == base.count()
      require(newSchemaOk, "q118 merged read wrong: column or null set off")
      val feed = Snapshots.changesBetween(s, s"$root/m", v1, v2)
      val feedOk = feed.df.columns.contains("o_score") &&
        feed.df.filter(col("change_type") =!= "insert").isEmpty &&
        feed.df.filter(col("o_score").isNull).isEmpty
      require(feedOk, "q118 evolution feed malformed")
      evolved
        .withColumn("old_schema_ok", lit(oldSchemaOk))
        .withColumn("new_schema_ok", lit(newSchemaOk))
        .withColumn("feed_ok", lit(feedOk))
    }),

    // MERGE-ON-READ DELETE via positional deletion vectors (q119) — the
    // Delta DV / Iceberg positional-delete model: a delete commit writes
    // an O(deleted-rows) sidecar of (file, parquet row ordinal) pairs and
    // flips the touched manifest rows' dv pointer; data files are never
    // rewritten (the copy-on-write twin q109 pays the rewrite up front;
    // MoR defers it to compaction, once, batched). Two delete shapes run:
    // a stats-planned band delete, then a KEY delete whose victims scatter
    // across files — the case where CoW would rewrite half the table for
    // a few thousand rows. Gates in-query: (1) the data-file set is
    // byte-identical across both deletes (zero files written — the number
    // the whole design exists to produce); (2) both touch sets are
    // stats-bounded; (3) a v1-pinned read STILL serves the band (masks
    // are versioned metadata, not mutations); (4) the band delete's
    // change feed is exactly the band as deletes (the (file, dv) pair is
    // the snapshot identity — a moved pointer contributes its newly
    // masked rows and nothing else); (5) compaction FOLDS the masks: no
    // dv pointers survive, and its feed is empty (a pure re-layout).
    // Emits the post-everything table; the oracle recomputes orders minus
    // band minus keys, so a mask leak, resurrection, or fold error all
    // hash-mismatch.
    "q119_mor_delete" -> ((s, dir) => {
      import graft.sinks.Dv
      val root = tmp("q119")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val statsCols = zcols :+ "o_orderkey" // key stats for the key planner
      FixtureCache.layout(s, s"q119:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", statsCols), s"$root/m")
      def files(): Set[String] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
      }
      val before = files()
      val band = Dv.deleteWhereMoR(s, s"$root/z", s"$root/m",
        Seq(("o_custkey", 60.0, 90.0)))
      val keys = orders.filter(col("o_orderkey") % 400 === 0)
        .select(col("o_orderkey"))
      val keyDel = Dv.deleteKeysMoR(s, s"$root/z", s"$root/m",
        "o_orderkey", keys)
      val zeroRewriteOk = band.dataFilesWritten == 0 &&
        keyDel.dataFilesWritten == 0 && files() == before &&
        band.rowsDeleted > 0 && keyDel.rowsDeleted > 0
      require(zeroRewriteOk, s"q119 MoR delete wrote data files: $band $keyDel")
      val targetedOk = band.filesMasked < band.filesTotal
      require(targetedOk,
        s"q119 band mask untargeted: ${band.filesMasked}/${band.filesTotal}")
      val feed = Snapshots.changesBetween(s, s"$root/m", v1, band.version)
      val feedDf = feed.df.localCheckpoint() // exceptAll diff: compute once
      // pinned-band probe + feed-band identity in ONE batched
      // full-coverage fingerprint job
      val pinnedOk = RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/m", v1)
          .filter(col("o_custkey").between(60, 90)).select(col("o_orderkey")),
          orders.filter(col("o_custkey").between(60, 90))
            .select(col("o_orderkey")),
          "q119 v1 pinned read vs pre-delete band"),
        (feedDf.select(col("o_orderkey")),
          orders.filter(col("o_custkey").between(60, 90))
            .select(col("o_orderkey")),
          "q119 band feed vs the band")),
        Seq("o_orderkey"))
      val feedOk = pinnedOk && feed.filesRead < feed.filesTotal &&
        feedDf.filter(col("change_type") =!= "delete").isEmpty
      val (vc, _, _) = Snapshots.compactCommit(s, s"$root/z", s"$root/m",
        statsCols, nFiles = 8)
      val foldOk = Dv.ensureDv(Snapshots.manifestAt(s, s"$root/m", vc))
        .filter(col("dv").isNotNull).isEmpty &&
        Snapshots.relayoutInvisible(s, s"$root/m", keyDel.version, vc)
      require(foldOk, "q119 compaction failed to fold the masks silently")
      Snapshots.tableAt(s, s"$root/m", vc)
        .withColumn("zero_rewrite_ok", lit(zeroRewriteOk))
        .withColumn("targeted_ok", lit(targetedOk))
        .withColumn("pinned_ok", lit(pinnedOk))
        .withColumn("feed_ok", lit(feedOk))
        .withColumn("fold_ok", lit(foldOk))
    }),

    // OPTIMISTIC CONCURRENCY over the version log (q120): three writers
    // plan MoR deletes against the SAME v1 snapshot, then commit
    // interleaved — the serializable-writers story a single CAS slot
    // cannot give (a CAS loser could land a manifest computed against a
    // stale parent, silently undoing the winner). `Snapshots.commitTxn`
    // re-diffs every commit that landed since the txn's snapshot:
    // disjoint touch sets REBASE (B lands v2; A, planned before B, lands
    // v3 composing both — Delta/Iceberg's disjoint-files rule), while a
    // txn whose read set was invalidated (C's band overlaps A's files)
    // raises CommitConflictException instead of resurrecting A's masked
    // rows — C re-plans against the fresh snapshot and commits the
    // remainder. Bands are FRACTIONS of the orderkey domain (5–20%,
    // 60–75%, 10–25% — far-apart bands on a range layout are disjoint at
    // any SF; the oracle recomputes identical bounds via a scalar
    // subquery). Gates: A rebased over exactly one commit with zero data
    // files written; C's stale commit threw; the final table is orders
    // minus all three bands (the oracle's WHERE — a lost update, double
    // mask, or bad rebase all hash-mismatch).
    "q120_txn_commit" -> ((s, dir) => {
      import graft.sinks.Dv
      val root = tmp("q120")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      FixtureCache.layout(s, s"q120:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, Seq("o_orderkey"), d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", Seq("o_orderkey")), s"$root/m")
      val Seq(lo, hi) = orders.agg(min("o_orderkey"), max("o_orderkey"))
        .collect().head.toSeq.map(_.toString.toDouble)
      val span = hi - lo
      def band(a: Double, b: Double) =
        Seq(("o_orderkey", lo + a * span, lo + b * span))
      def files(): Set[String] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
      }
      val before = files()
      // all three writers plan against v1
      val Some((txnA, _)) = Dv.planDeleteMoR(s, s"$root/z", s"$root/m",
        band(0.05, 0.20))
      val Some((txnB, _)) = Dv.planDeleteMoR(s, s"$root/z", s"$root/m",
        band(0.60, 0.75))
      val Some((txnC, _)) = Dv.planDeleteMoR(s, s"$root/z", s"$root/m",
        band(0.10, 0.25))
      val rb = Snapshots.commitTxn(s, s"$root/m", txnB) // B wins the race
      val ra = Snapshots.commitTxn(s, s"$root/m", txnA) // A rebases over B
      val rebaseOk = rb.version == v1 + 1 && ra.version == v1 + 2 &&
        ra.rebasedOver == 1 && files() == before
      require(rebaseOk, s"q120 disjoint rebase broken: $rb $ra")
      val conflictCaught =
        try { Snapshots.commitTxn(s, s"$root/m", txnC); false }
        catch { case _: Snapshots.CommitConflictException => true }
      require(conflictCaught, "q120 stale overlapping txn was NOT detected")
      // C re-plans from the fresh snapshot and commits the remainder
      val rc = Dv.planDeleteMoR(s, s"$root/z", s"$root/m", band(0.10, 0.25))
        .map { case (txn, _) => Snapshots.commitTxn(s, s"$root/m", txn) }
      val replanOk = rc.exists(_.version == v1 + 3) && files() == before
      require(replanOk, s"q120 replanned commit broken: $rc")
      Snapshots.tableAt(s, s"$root/m",
          Snapshots.latestVersion(s, s"$root/m"))
        .withColumn("rebase_ok", lit(rebaseOk))
        .withColumn("conflict_caught", lit(conflictCaught))
        .withColumn("replan_ok", lit(replanOk))
    }),

    // FILE-LEVEL BLOOM SKIPPING (q121): point lookups on a column the
    // layout is NOT clustered on — the axis where min/max stats die
    // (every file's orderkey interval spans ~the whole domain once the
    // table is z-ordered on custkey/totalprice, so the stats planner
    // reads everything for one key). The manifest carries one extra
    // column per file: the sorted distinct set of k xxhash64 positions of
    // the file's orderkeys (`sinks/BloomSkip.scala`); membership is
    // driver-side planner work like every stats decision. The probes are
    // the 8 smallest orderkeys ABOVE the domain midpoint — INTERIOR
    // values every file's interval contains (extreme keys would let
    // min/max prune too, which is not the regime blooms exist for), and
    // SQL-expressible at any SF. The bloom plan must read STRICTLY fewer
    // files than the interval-stats control while the residual IN-filter
    // keeps the result exact — the oracle recomputes the same 8 keys by
    // subquery, so a dropped or phantom row hash-mismatches.
    "q121_bloom_skip" -> ((s, dir) => {
      import graft.sinks.BloomSkip
      val root = tmp("q121")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      FixtureCache.layout(s, s"q121:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"), d, nFiles = 16))
      val files = s.read.parquet(s"$root/z")
        .select(col("_metadata.file_path")).distinct()
        .collect().map(_.getString(0)).toSeq
      val manifest = BloomSkip.manifestWithBloom(s, files,
        Seq("o_custkey", "o_totalprice", "o_orderkey"), "o_orderkey")
        .localCheckpoint()
      val Seq(kLo, kHi) = orders.agg(min("o_orderkey"), max("o_orderkey"))
        .collect().head.toSeq.map(_.toString.toLong)
      val mid = (kLo + kHi) / 2
      val keys = orders.filter(col("o_orderkey") >= mid)
        .orderBy(col("o_orderkey")).limit(8)
        .select(col("o_orderkey")).localCheckpoint()
      val pr = BloomSkip.pointRead(s, manifest, "o_orderkey", keys)
      val statsN = BloomSkip.statsCandidates(manifest, "o_orderkey", keys)
      val prunedOk = pr.filesRead < statsN && pr.filesRead < pr.filesTotal
      require(prunedOk,
        s"q121 bloom read ${pr.filesRead} files vs stats $statsN " +
          s"of ${pr.filesTotal} — skipping bought nothing")
      pr.df.withColumn("bloom_pruned_ok", lit(prunedOk))
    }),

    // INCREMENTAL BLOOM MAINTENANCE (q127): the q107 daily-cadence story
    // on the bloom-skipping axis — the batch's files get stats+bloom rows
    // computed over ONLY themselves (per-file blooms are immutable
    // properties, so the base layout is never rescanned or re-hashed; the
    // call below takes the fresh file list, structurally incapable of
    // touching the base) and the manifest is extended by union. Gates:
    // the manifest grew by exactly the appended file count, and a point
    // lookup probing keys from BOTH generations (4 even = base, 4 odd =
    // batch, interior values where min/max stats cannot prune) reads
    // strictly fewer files than the interval-stats control while the
    // residual IN-filter keeps the result exact across generations.
    "q127_incremental_bloom" -> ((s, dir) => {
      import graft.sinks.BloomSkip
      val root = tmp("q127")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val statsCols = zcols :+ "o_orderkey"
      def listFiles(p: String): Seq[String] = s.read.parquet(p)
        .select(col("_metadata.file_path")).distinct()
        .collect().map(_.getString(0)).toSeq
      Layout.zorderWrite(orders.filter(col("o_orderkey") % 2 === 0),
        zcols, s"$root/z", nFiles = 16)
      val baseFiles = listFiles(s"$root/z")
      val m1 = BloomSkip.manifestWithBloom(s, baseFiles, statsCols,
        "o_orderkey").localCheckpoint()
      Layout.zorderWrite(orders.filter(col("o_orderkey") % 2 === 1),
        zcols, s"$root/z2", nFiles = 16)
      val batchFiles = listFiles(s"$root/z2")
      val m2 = m1.unionByName(
          BloomSkip.manifestWithBloom(s, batchFiles, statsCols, "o_orderkey"))
        .localCheckpoint()
      val incrementalOk =
        m2.count() == baseFiles.size + batchFiles.size && batchFiles.nonEmpty
      require(incrementalOk,
        s"q127 manifest did not grow by the appended files: " +
          s"${baseFiles.size}+${batchFiles.size} != ${m2.count()}")
      val Seq(kLo, kHi) = orders.agg(min("o_orderkey"), max("o_orderkey"))
        .collect().head.toSeq.map(_.toString.toLong)
      val mid = (kLo + kHi) / 2
      def probe(parity: Int) = orders
        .filter(col("o_orderkey") >= mid && col("o_orderkey") % 2 === parity)
        .orderBy(col("o_orderkey")).limit(4).select(col("o_orderkey"))
      val keys = probe(0).unionByName(probe(1)).localCheckpoint()
      val pr = BloomSkip.pointRead(s, m2, "o_orderkey", keys)
      val statsN = BloomSkip.statsCandidates(m2, "o_orderkey", keys)
      val prunedOk = pr.filesRead < statsN && pr.filesRead < pr.filesTotal
      require(prunedOk,
        s"q127 bloom read ${pr.filesRead} files vs stats $statsN of " +
          s"${pr.filesTotal} — incremental blooms bought nothing")
      pr.df.withColumn("incremental_ok", lit(incrementalOk))
        .withColumn("bloom_pruned_ok", lit(prunedOk))
    }),

    // S4: the distributed paginated REST read. The 25-row nation table
    // plays the remote config endpoint (a bounded driver-side fixture — it
    // models the SERVER; the engine-side page-range parallel fetch and JSON
    // parse are the operator under test).
    "q67_rest_source" -> ((s, dir) => {
      val records: Array[String] = t(s, dir, "nation").toJSON.collect()
      val pageSize = 4
      val fetch: Map[String, String] => Seq[String] = { params =>
        val page = params("page").toInt
        records.slice((page - 1) * pageSize, page * pageSize).toSeq
      }
      val src = new RestSource(
        EndpointSpec("nation", PagePagination(pageSize = pageSize)), fetch)
      src.toDF(s, pageCount = records.length / pageSize + 1, parallelism = 3)
        .select(col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"))
    }),

    // S6: the QBO-style authed query source, end to end — token exchange,
    // retry-once-on-401, QueryResponse entity extraction (reference
    // `quickbooks.py:43-59,70-81`). The fixture server (customer rows as a
    // canned QueryResponse document) accepts ONLY the second issued token:
    // the first request 401s, the policy refreshes once and retries, and
    // the gate requires exactly two token exchanges — a transport that
    // skips the refresh, retries forever, or never retries cannot pass.
    "q122_qbo_source" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
      val payload =
        cust.toJSON.collect().sorted
          .mkString("""{"QueryResponse":{"Customer":[""", ",", """]},"time":"2024-01-01T00:00:00Z"}""")
      val issued = new java.util.concurrent.atomic.AtomicInteger(0)
      val policy = new graft.sources.AuthRetryPolicy(
        () => s"tok${issued.incrementAndGet()}")
      val raw: (String, Map[String, String]) => Seq[String] = { (tok, _) =>
        if (tok != "tok2")
          throw new graft.sources.UnauthorizedException(s"401 for $tok")
        Seq(payload)
      }
      val fetched = new graft.sources.AuthedFetch(policy, raw)(
        Map("query" -> "select * from Customer"))
      val authOk = issued.get() == 2
      require(authOk, s"q122 expected refresh+retry (2 exchanges), got ${issued.get()}")
      import s.implicits._
      val doc = s.read.json(s.createDataset(fetched))
      Json.extractQueryResponse(doc, "Customer")
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_nationkey").cast("int").as("c_nationkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .withColumn("auth_retry_ok", lit(authOk))
    }),

    // DecimalType money extension (SURVEY §1.2): the reference computes
    // money in doubles (`run_transform.py:68`); the engine also supports
    // exact DECIMAL arithmetic — TPC-H Q1-style revenue in DECIMAL(18,4),
    // multiplied at scale 8, summed exactly, and surfaced as the decimal's
    // canonical string so the oracle compare is exact-to-the-last-digit
    // (no float ulp tolerance needed: that's the point of decimal money).
    "q123_decimal_money" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_extendedprice").cast("decimal(18,4)").as("ep"),
          col("l_discount").cast("decimal(18,4)").as("dc"))
      li.groupBy(col("l_returnflag"))
        .agg(
          sum(col("ep") * (lit(1).cast("decimal(18,4)") - col("dc")))
            .as("rev"),
          count(lit(1)).as("n_items"))
        .select(col("l_returnflag"),
          col("rev").cast("decimal(38,8)").cast("string").as("revenue"),
          col("n_items"))
    }),

    // K3 + S2/S7: single-JSON-document sink → multi-line document scan
    // round-trip (the QuickBooks-style bronze landing shape). One task
    // streams the array out; readItems probes the bare-array shape back in.
    "q73_json_doc_roundtrip" -> ((s, dir) => {
      val out = tmp("q73")
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
      Sinks.writeJsonDocument(supp, s"$out/doc")
      Json.readItems(s, s"$out/doc")
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("int").as("s_nationkey"),
          col("s_acctbal"))
    }),

    // S5: incremental updated_since pull. The fixture server holds dated
    // order records and filters by the engine-sent updated_since param —
    // wrong or missing param plumbing returns the wrong row set and fails
    // the oracle. today is pinned so sinceDate is deterministic.
    "q74_incremental_scan" -> ((s, dir) => {
      val dated: Array[(String, String)] = t(s, dir, "orders")
        .filter(col("o_orderkey") % 37 === 0)
        .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          to_json(struct(
            col("o_orderkey"),
            col("o_totalprice"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date")))
            .as("j"))
        .orderBy(col("j"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      val pageSize = 50
      val fetch: Map[String, String] => Seq[String] = { params =>
        val since = params("updated_since")
        val page = params("page").toInt
        val live = dated.collect { case (d, j) if d >= since => j }
        live.slice((page - 1) * pageSize, page * pageSize).toSeq
      }
      val src = new RestSource(
        EndpointSpec("orders", PagePagination(pageSize = pageSize),
          incremental = Some(IncrementalConfig(fromDaysAgo = 30))),
        fetch, today = java.time.LocalDate.parse("1995-04-08"))
      src.toDF(s, pageCount = dated.length / pageSize + 1, parallelism = 4)
        .select(col("o_orderkey"), col("o_totalprice"), col("order_date"))
    }),

    // P4/P5: partition-pruned lake read. The table lands hive-partitioned
    // by run_date; the month filter must resolve from DIRECTORY LISTING, so
    // only that partition's files are read (asserted via inputFiles — at
    // 100 TB this is the difference between one partition and a full scan).
    "q81_partition_pruned_read" -> ((s, dir) => {
      val root = tmp("q81")
      val ref = TableRef("silver", "sales", "orders")
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") % 4 === 0 && year(col("o_orderdate")) === 1995)
        .withColumn("run_date", date_format(col("o_orderdate"), "yyyy-MM"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("run_date"))
      Sinks.writePartitionedByRunDate(base, root, ref)
      // the month filter must plan as a PARTITION filter (directory
      // pruning), not a post-scan data filter
      val pruned = PlanGuard.requirePlanMatches(
        Sinks.readLakeTable(s, root, ref)
          .filter(col("run_date") === "1995-06"),
        "PartitionFilters: \\[[^\\]]*run_date#\\d+ = 1995-06".r,
        "run_date filter did not reach partition pruning")
      pruned.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("run_date").cast("string").as("run_date"))
    }),

    // Bucketed co-located join under the gate: both sides land as catalog
    // tables bucketed+sorted on the join key, so the sort-merge join plans
    // with ZERO shuffle exchanges (asserted in-query) — at 100 TB this
    // turns the recurring fact↔dim join from the dominant shuffle into
    // pure scan work. The merge hint only pins the join strategy; the
    // exchange elision comes from the bucket layout.
    "q88_bucketed_join" -> ((s, dir) => {
      Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "q88_cust", "c_custkey", buckets = 8)
      Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_custkey").as("c_custkey"),
          col("o_totalprice")),
        "q88_ord", "c_custkey", buckets = 8)
      val j = s.table("q88_cust")
        .join(s.table("q88_ord").hint("merge"), "c_custkey")
      val plan = j.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      j.groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("seg_total"),
          count(lit(1)).as("n_orders"))
    }),

    // Source-format breadth: CSV sink → schema'd CSV scan round-trip (the
    // interchange format every warehouse export still speaks).
    "q89_csv_roundtrip" -> ((s, dir) => {
      val out = tmp("q89")
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 11 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
      li.write.mode("overwrite").option("header", "true").csv(s"$out/csv")
      s.read
        .schema("l_orderkey LONG, l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING")
        .option("header", "true")
        .csv(s"$out/csv")
    }),

    // The reference's WHOLE pipeline in one gated query: bronze JSONL
    // (dup-injected, mixed-validity amounts) → silver clean (dedup,
    // try_cast, timestamp parse) → gold star write → dim⋈fact report read
    // back FROM THE GOLD FILES. A fault anywhere in the medallion —
    // landing, clean, routing, write, read — surfaces as an oracle diff.
    "q86_medallion_e2e" -> ((s, dir) => {
      val root = tmp("q86")
      val cfg = Pipeline.LakeConfig(root, "2026-01-01")
      val rawCust = t(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        lit("2024-02-01 00:00:00").as("created_at"),
        concat(col("c_name"), lit("@example.com")).as("email"))
      val rawPay = t(s, dir, "orders").select(
        col("o_orderkey").as("payment_id"), col("o_custkey").as("customer_id"),
        when(col("o_orderkey") % 13 === 0, lit("n/a"))
          .otherwise(col("o_totalprice").cast("string")).as("amount"),
        lit("2024-02-01 00:00:00").as("created_at"),
        lit("2024-02-02 12:00:00").as("paid_at"))
      Sinks.writeJsonl(rawCust.unionAll(rawCust.filter(col("id") % 4 === 0)),
        Pipeline.bronzeRef("superoperator", "customers").path(root, cfg.runDate))
      Sinks.writeJsonl(rawPay.unionAll(rawPay.filter(col("payment_id") % 6 === 0)),
        Pipeline.bronzeRef("superoperator", "payments").path(root, cfg.runDate))
      Pipeline.transformStage(s, cfg)
      val dim = s.read.parquet(
        Pipeline.goldRef("dim_customers").path(root, cfg.runDate))
      val fact = s.read.parquet(
        Pipeline.goldRef("fact_payments").path(root, cfg.runDate))
      fact.join(dim, fact("customer_id") === dim("id"))
        .groupBy(col("name"))
        .agg(count(col("payment_id")).as("n_payments"),
          round(sum(col("amount")), 2).as("total_paid"))
    }),

    // CONFIG-DRIVEN PIPELINE ASSEMBLY (q173, round-12 verdict item 4):
    // the whole run is assembled from a DECLARATIVE catalog + env/secret
    // seam, nothing hardcoded — a real-YAML endpoints catalog (the
    // reference's endpoints.yml shape) is parsed into typed EndpointSpecs
    // (pagination, incremental, api-key auth resolved through the
    // two-level env→secret indirection), the extract stage lands bronze
    // JSONL per the parsed config (the fixture transport REJECTS requests
    // whose auth header or updated_since param was mis-resolved — a
    // config-plumbing bug kills the query), and the medallion transform
    // runs over what the config landed. Emits the gold dim⋈fact report;
    // the oracle recomputes it from the raw tables, so a dropped
    // endpoint, a wrong page size, or a mis-parsed amount all surface.
    "q173_config_pipeline" -> ((s, dir) => {
      val root = tmp("q173")
      val yamlCatalog =
        """superoperator:
          |  base_url_env: SO_BASE_URL
          |  auth:
          |    type: api_key_header
          |    header_name: Authorization
          |    header_template: "Bearer {api_key}"
          |    api_key_secret_env: SO_API_KEY_SECRET_NAME
          |  endpoints:
          |    - name: customers
          |      path: /customers
          |      pagination:
          |        type: page
          |        page_param: page
          |        page_size_param: per_page
          |        page_size: 500
          |    - name: payments
          |      path: /payments
          |      pagination:
          |        type: page
          |        page_size: 500
          |      incremental:
          |        type: updated_since
          |        param: updated_since
          |        from_days_ago: 7
          |""".stripMargin
      val env = Map(
        "SO_BASE_URL" -> "https://api.example.invalid",
        "SO_API_KEY_SECRET_NAME" -> "so-api-key",
        "RUN_DATE" -> "2026-01-01", "LAKE_ROOT" -> root)
      val secrets = Map("so-api-key" -> "sk-q173")
      val rc = Catalog.runConfig(env)
      val cfg = Pipeline.LakeConfig(rc.lakeRoot, rc.runDate)
      val specs = Catalog.parse(yamlCatalog, env, secrets)
      val so = specs.head
      val configOk = specs.map(_.name) == Seq("superoperator") &&
        so.endpoints.map(_.spec.name) == Seq("customers", "payments") &&
        so.endpoints.last.spec.incremental.exists(_.fromDaysAgo == 7) &&
        so.auth == Catalog.HeaderAuth("Authorization", "Bearer sk-q173")
      require(configOk, s"q173 catalog parse wrong: $specs")
      // fixture API: the raw shapes the reference's endpoints serve,
      // derived from the test tables (driver-held mock of the remote API)
      val custRows = t(s, dir, "customer").select(
          col("c_custkey").as("id"), col("c_name").as("name"),
          lit("2024-02-01 00:00:00").as("created_at"),
          concat(col("c_name"), lit("@example.com")).as("email"))
        .toJSON.collect()
      val payRows = t(s, dir, "orders").select(
          col("o_orderkey").as("payment_id"),
          col("o_custkey").as("customer_id"),
          when(col("o_orderkey") % 17 === 0, lit("n/a"))
            .otherwise(col("o_totalprice").cast("string")).as("amount"),
          lit("2024-02-01 00:00:00").as("created_at"),
          lit("2024-02-02 12:00:00").as("paid_at"))
        .toJSON.collect()
      val today = java.time.LocalDate.of(2026, 1, 8)
      val transport: Catalog.Transport = (path, headers, params) => {
        require(headers.get("Authorization").contains("Bearer sk-q173"),
          s"q173 auth header mis-resolved: $headers")
        val rows = path match {
          case "/customers" => custRows
          case "/payments" =>
            require(params.get("updated_since").contains("2026-01-01"),
              s"q173 incremental param mis-resolved: $params")
            payRows
          case other => throw new IllegalArgumentException(
            s"q173 transport got unconfigured path $other")
        }
        val per = params("per_page").toInt
        val page = params("page").toInt
        rows.slice((page - 1) * per, page * per).toSeq
      }
      val landed = Catalog.extractRest(s, cfg, so, transport, today)
      require(landed.map(_._1) == Seq("customers", "payments"),
        s"q173 extract landed the wrong endpoints: $landed")
      Pipeline.transformStage(s, cfg)
      val dim = s.read.parquet(
        Pipeline.goldRef("dim_customers").path(root, cfg.runDate))
      val fact = s.read.parquet(
        Pipeline.goldRef("fact_payments").path(root, cfg.runDate))
      fact.join(dim, fact("customer_id") === dim("id"))
        .groupBy(col("name"))
        .agg(count(col("payment_id")).as("n_payments"),
          round(sum(col("amount")), 2).as("total_paid"))
        .withColumn("config_ok", lit(configOk))
    }),

    // S4 via the TRUE DataSource V2 path: page ranges become Spark
    // InputPartitions, each executor instantiates its own fetcher
    // (configure seam carries the connection config), rows land as raw
    // strings and are parsed downstream with from_json — the bronze
    // schema-free landing shape end-to-end.
    "q75_dsv2_source" -> ((s, dir) => {
      val out = tmp("q75")
      val parts = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_size"),
          col("p_retailprice"))
      Sinks.writeJsonl(parts, s"$out/jsonl")
      // plan pages from the actual row count: over-planning costs a full
      // fixture re-read per idle partition reader (each reader loads the
      // directory before discovering its range is empty)
      val pages = (parts.count() / 100 + 1).toString
      s.read.format("graft.sources.v2.RestDataSource")
        .option("fetcher", classOf[graft.sources.v2.JsonlFilePageFetcher].getName)
        .option("fixturePath", s"$out/jsonl")
        .option("pageSize", "100")
        .option("pages", pages)
        .option("pagesPerPartition", "4")
        .load()
        .select(from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "p_partkey LONG, p_name STRING, p_size INT, p_retailprice DOUBLE"))
          .as("r"))
        .select(col("r.p_partkey").as("p_partkey"), col("r.p_name").as("p_name"),
          col("r.p_size").as("p_size"), col("r.p_retailprice").as("p_retailprice"))
    }),

    // RESTORE TO VERSION (q133): rolling a table back from a bad commit
    // the way production formats do — a NEW head whose manifest is the
    // target version's, re-referencing files every prior version already
    // references. Gates in-query: the restore wrote/moved/deleted ZERO
    // data files (metadata-only, like the q129 rename); history is
    // preserved, not erased (a pinned read of the post-delete version
    // still excludes the band — roll-forward semantics); and the restore
    // commit's change feed is exactly the bad delete's INVERSE — pure
    // re-inserts of the deleted band, survivor rewrites annihilating in
    // the multiset diff. Emits a pruned box read of the restored head:
    // the band is back, so the oracle is the full box over all orders.
    "q133_restore" -> ((s, dir) => {
      val root = tmp("q133")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
      FixtureCache.layout(s, s"q133:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val (v2, _) = Snapshots.appendCommit(s, batch, zcols, s"$root/z",
        s"$root/m", nFiles = 8)
      val res = Snapshots.deleteWhere(s, s"$root/z", s"$root/m", zcols,
        Seq(("o_custkey", 60.0, 90.0)))
      require(res.rowsDeleted > 0, "q133 delete removed nothing — gate vacuous")
      val v3 = Snapshots.latestVersion(s, s"$root/m")
      def files(): Set[(String, Long, Long)] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(st => st.isFile &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
          .toSet
      }
      val before = files()
      val v4 = Snapshots.restoreCommit(s, s"$root/m", v2)
      val zeroWriteOk = files() == before
      require(zeroWriteOk, "q133 restore touched data files")
      val historyOk = Snapshots.readAt(s, s"$root/m", v3,
        Seq(("o_custkey", 60.0, 90.0))).df.isEmpty
      require(historyOk, "q133 pinned post-delete version resurrected the band")
      val feed = Snapshots.changesBetween(s, s"$root/m", v3, v4)
      val insertsOnly =
        feed.df.filter(col("change_type") =!= "insert").isEmpty
      // feed-inverse + restored-head equivalence in ONE batched job
      val gatesOk = RecallGate.equivalentFingerprint(Seq(
          (feed.df.select(col("o_orderkey")),
            orders.filter(col("o_custkey").between(60, 90))
              .select(col("o_orderkey")),
            "q133 restore feed vs the deleted band (delete's inverse)"),
          (Snapshots.tableAt(s, s"$root/m", v4).select(col("o_orderkey")),
            orders.select(col("o_orderkey")),
            "q133 restored head vs all orders")),
        Seq("o_orderkey"))
      val pr = Snapshots.readAt(s, s"$root/m", v4,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("zero_write_ok", lit(zeroWriteOk))
        .withColumn("history_ok", lit(historyOk))
        .withColumn("feed_ok", lit(insertsOnly && gatesOk))
    }),

    // SHALLOW CLONE (q134): a zero-copy table fork — the clone's v=1 is
    // the source's pinned manifest committed under a FRESH log root,
    // referencing the source's data files by the same absolute paths.
    // Gates in-query: the clone manifest's file set is EXACTLY the
    // source's (nothing copied — compared by path, file-count-bounded);
    // a delete on the clone stages survivors into the CLONE's own data
    // dir and leaves the source log and head untouched (isolation both
    // ways: src still one version, src head still serves the band); and
    // the two heads diverge to their expected states in one batched
    // equivalence job. Emits a pruned box read of the clone head —
    // orders minus the clone-side deleted band.
    "q134_shallow_clone" -> ((s, dir) => {
      val root = tmp("q134")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      FixtureCache.layout(s, s"q134:$dir", s"$root/src/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      val sv1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/src/z", zcols), s"$root/src/m")
      val cv1 = Snapshots.cloneCommit(s, s"$root/src/m", s"$root/clone/m", sv1)
      val srcFiles = Snapshots.manifestAt(s, s"$root/src/m", sv1)
        .select(col("file")).collect().map(_.getString(0)).toSet
      val cloneFiles = Snapshots.manifestAt(s, s"$root/clone/m", cv1)
        .select(col("file")).collect().map(_.getString(0)).toSet
      val zeroCopyOk = srcFiles == cloneFiles && srcFiles.nonEmpty
      require(zeroCopyOk, "q134 clone does not alias the source file set")
      // the clone's own data dir: survivors of clone-side DML land here
      new org.apache.hadoop.fs.Path(s"$root/clone/z")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .mkdirs(new org.apache.hadoop.fs.Path(s"$root/clone/z"))
      val res = Snapshots.deleteWhere(s, s"$root/clone/z", s"$root/clone/m",
        zcols, Seq(("o_custkey", 60.0, 90.0)))
      require(res.rowsDeleted > 0, "q134 clone delete removed nothing")
      val cv2 = Snapshots.latestVersion(s, s"$root/clone/m")
      val srcIsolatedOk =
        Snapshots.versions(s, s"$root/src/m") == Seq(sv1) &&
          !Snapshots.readAt(s, s"$root/src/m", sv1,
            Seq(("o_custkey", 60.0, 90.0))).df.isEmpty
      require(srcIsolatedOk, "q134 clone DML leaked into the source")
      val divergedOk = RecallGate.equivalentFingerprint(Seq(
          (Snapshots.tableAt(s, s"$root/clone/m", cv2)
            .select(col("o_orderkey")),
            orders.filter(!col("o_custkey").between(60, 90))
              .select(col("o_orderkey")),
            "q134 clone head vs orders minus the band"),
          (Snapshots.tableAt(s, s"$root/src/m", sv1)
            .select(col("o_orderkey")),
            orders.select(col("o_orderkey")),
            "q134 source head vs all orders")),
        Seq("o_orderkey"))
      val pr = Snapshots.readAt(s, s"$root/clone/m", cv2,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("zero_copy_ok", lit(zeroCopyOk))
        .withColumn("src_isolated_ok", lit(srcIsolatedOk))
        .withColumn("diverged_ok", lit(divergedOk))
    }),

    // DV PURGE (q136, the Delta `REORG ... APPLY (PURGE)` shape): after a
    // MoR band delete leaves deletion-vector debt, the purge rewrites
    // ONLY the masked files' live rows into clean files — converting
    // cheap-write debt back into clean-read files. Gates in-query: the
    // purge touched strictly fewer files than the manifest lists AND left
    // every unmasked data file byte-untouched on disk (cost tracks the
    // MASKED set, not table size); the purged manifest carries zero dv
    // pointers; the purge commit is INVISIBLE to the change feed (row-
    // identical rewrite — the compaction contract); and a pinned read of
    // the pre-purge MoR version still masks the band through its sidecar.
    // Emits a pruned box read of the purged head — orders minus the band.
    "q136_dv_purge" -> ((s, dir) => {
      import graft.sinks.Dv
      val root = tmp("q136")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      FixtureCache.layout(s, s"q136:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      def files(): Map[String, Long] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(st => st.isFile &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st => st.getPath.getName -> st.getModificationTime).toMap
      }
      val mor = Dv.deleteWhereMoR(s, s"$root/z", s"$root/m",
        Seq(("o_custkey", 60.0, 90.0)))
      require(mor.rowsDeleted > 0 && mor.dataFilesWritten == 0,
        s"q136 MoR setup wrong: $mor")
      val maskedFiles = Snapshots.manifestAt(s, s"$root/m", mor.version)
        .filter(col("dv").isNotNull)
        .select(col("file")).collect()
        .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
      val before = files()
      val purge = Dv.purgeDv(s, s"$root/z", s"$root/m", zcols)
      val after = files()
      val untouched = before.filterNot { case (n, _) => maskedFiles.contains(n) }
      val targetedOk = purge.filesPurged < purge.filesTotal &&
        purge.filesPurged == maskedFiles.size &&
        untouched.forall { case (n, ts) => after.get(n).contains(ts) }
      require(targetedOk, s"q136 purge not masked-set-bounded: $purge")
      val cleanOk = Dv.ensureDv(
          Snapshots.manifestAt(s, s"$root/m", purge.version))
        .filter(col("dv").isNotNull).isEmpty
      require(cleanOk, "q136 purged manifest still carries dv pointers")
      val invisibleOk = Snapshots.changesBetween(s, s"$root/m",
        mor.version, purge.version).df.isEmpty
      require(invisibleOk, "q136 purge leaked into the change feed")
      // pinned pre-purge MoR read still masks the band through its sidecar
      val pinnedOk = Snapshots.readAt(s, s"$root/m", mor.version,
        Seq(("o_custkey", 60.0, 90.0))).df.isEmpty
      require(pinnedOk, "q136 pinned MoR version resurrected the band")
      val pr = Snapshots.readAt(s, s"$root/m", purge.version,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("targeted_ok", lit(targetedOk))
        .withColumn("clean_ok", lit(cleanOk))
        .withColumn("invisible_ok", lit(invisibleOk && pinnedOk))
    }),

    // FULL THREE-CLAUSE MERGE (q137): WHEN MATCHED UPDATE + WHEN NOT
    // MATCHED INSERT + WHEN NOT MATCHED BY SOURCE DELETE — the clause
    // that retires target rows an authoritative feed stopped sending,
    // SCOPED to a stats box (the only 100 TB-honest form: unscoped, the
    // clause must touch every file by definition). Source = the 200–600
    // orderkey band with doubled prices (updates) + %97 keys shifted
    // above the key space (inserts); delete box = orderkey 800–1200, so
    // unmatched rows there are retired. Gates in-query: the touch set is
    // stats-pruned; updated/inserted/deleted counts equal the exact
    // splits; and the merged head matches the expected key set in one
    // sampled job. Emits the touched slices of the post-merge state:
    // updated band, untouched gap, emptied delete box, inserts.
    "q137_merge_full" -> ((s, dir) => {
      val root = tmp("q137")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      // cluster on the MERGE KEY alone: a key-scoped three-clause merge
      // prunes by key ranges, and single-column clustering keeps each
      // file a disjoint key slice — so the touch set is band-proportional
      // at every sf (2-D interleave would smear key ranges across files)
      val zcols = Seq("o_orderkey")
      FixtureCache.layout(s, s"q137:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val updates = orders.filter(col("o_orderkey").between(200, 600))
        .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
      val inserts = orders.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      // bands sized to the SMALLEST sf's dense key space (0..1499) so the
      // clause is non-vacuous at every scale the driver runs
      val box = Seq(("o_orderkey", 800.0, 1200.0))
      val res = Snapshots.mergeCommitFull(s, updates.unionByName(inserts),
        "o_orderkey", zcols, s"$root/z", s"$root/m", nFiles = 16, box)
      val prunedOk = res.filesRewritten < res.filesTotal
      require(prunedOk, s"q137 merge rewrote ${res.filesRewritten} of " +
        s"${res.filesTotal} files — stats pruning bought nothing")
      val nDel = orders.filter(col("o_orderkey").between(800, 1200)).count()
      require(nDel > 0, "q137 delete box empty — clause untested")
      val countsOk = res.rowsUpdated == updates.count() &&
        res.rowsInserted == inserts.count() && res.rowsDeleted == nDel
      require(countsOk, s"q137 clause counts off: $res (expected del=$nDel)")
      val expectedKeys = orders
        .filter(!col("o_orderkey").between(800, 1200))
        .select(col("o_orderkey"))
        .unionByName(inserts.select(col("o_orderkey")))
      val headOk = RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/m", res.version)
          .select(col("o_orderkey")),
          expectedKeys, "q137 merged head key set vs expected")),
        Seq("o_orderkey"))
      Snapshots.tableAt(s, s"$root/m", res.version)
        .filter(col("o_orderkey").between(200, 1200) ||
          col("o_orderkey") >= 10000000L)
        .withColumn("merge_pruned_ok", lit(prunedOk))
        .withColumn("counts_ok", lit(countsOk))
        .withColumn("head_ok", lit(headOk))
    }),

    // METADATA-ONLY AGGREGATES (q138): COUNT(*)/MIN/MAX answered from the
    // manifest with zero data files opened — the planner fast path every
    // table format serves, and at 100 TB the difference between a
    // sub-second answer and a full scan. Gates in-query: the metadata
    // answer equals a one-scan exact twin; a DV-masked manifest REFUSES
    // loudly (footer row counts include masked rows — answering would be
    // wrong); and after a purge the metadata path serves again, matching
    // the post-delete scan count. Emits one row of the metadata-served
    // aggregates; the oracle recomputes them all from the raw table.
    "q138_stats_agg" -> ((s, dir) => {
      import graft.sinks.Dv
      val root = tmp("q138")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      FixtureCache.layout(s, s"q138:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val meta = Snapshots.statsAggAt(s, s"$root/m", v1, zcols)
      val scan = Snapshots.tableAt(s, s"$root/m", v1)
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).cast("double").as("loc"),
          max(col("o_custkey")).cast("double").as("hic"),
          min(col("o_totalprice")).cast("double").as("lop"),
          max(col("o_totalprice")).cast("double").as("hip"))
        .collect()(0)
      val matchesScanOk = meta.rows == scan.getLong(0) &&
        meta.mins("o_custkey") == scan.getDouble(1) &&
        meta.maxs("o_custkey") == scan.getDouble(2) &&
        meta.mins("o_totalprice") == scan.getDouble(3) &&
        meta.maxs("o_totalprice") == scan.getDouble(4)
      require(matchesScanOk, s"q138 metadata disagrees with scan: $meta")
      val mor = Dv.deleteWhereMoR(s, s"$root/z", s"$root/m",
        Seq(("o_custkey", 60.0, 90.0)))
      require(mor.rowsDeleted > 0, "q138 MoR delete removed nothing")
      val maskedRefusedOk =
        try { Snapshots.statsAggAt(s, s"$root/m", mor.version, zcols); false }
        catch { case _: IllegalArgumentException => true }
      require(maskedRefusedOk, "q138 metadata count served over masked files")
      val purge = Dv.purgeDv(s, s"$root/z", s"$root/m", zcols)
      val meta2 = Snapshots.statsAggAt(s, s"$root/m", purge.version, zcols)
      val purgedOk = meta2.rows ==
        Snapshots.tableAt(s, s"$root/m", purge.version).count()
      require(purgedOk, "q138 post-purge metadata count drifted from scan")
      s.range(1).select(
        lit(meta.rows).as("n_rows"),
        lit(meta.mins("o_custkey")).as("min_cust"),
        lit(meta.maxs("o_custkey")).as("max_cust"),
        round(lit(meta.mins("o_totalprice")), 2).as("min_price"),
        round(lit(meta.maxs("o_totalprice")), 2).as("max_price"),
        lit(meta2.rows).as("rows_after_purge"),
        lit(matchesScanOk).as("matches_scan_ok"),
        lit(maskedRefusedOk).as("masked_refused_ok"),
        lit(purgedOk).as("purged_ok"))
    }),

    // CHECK CONSTRAINT ON COMMIT (q139): the append path validates the
    // batch BEFORE any staging — a violating batch raises and leaves the
    // table byte-identical (no files, no version), the enforcement-point
    // atomicity `ALTER TABLE ADD CONSTRAINT` systems guarantee. Gates
    // in-query: the bad batch (negated prices) is rejected AND the data
    // dir + version log are unchanged; the good batch then commits and
    // the head serves base ∪ batch. Emits a pruned box read of the head
    // — all orders — plus the rejection/atomicity booleans.
    "q139_check_constraint" -> ((s, dir) => {
      val root = tmp("q139")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 3 === 0)
      FixtureCache.layout(s, s"q139:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      def files(): Set[String] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
      }
      val constraint = col("o_totalprice") >= 0
      val before = files()
      val bad = batch.withColumn("o_totalprice", -col("o_totalprice") - 1)
      val rejectedOk =
        try {
          Snapshots.appendCommitChecked(s, bad, zcols, s"$root/z",
            s"$root/m", 8, constraint, "price_nonneg")
          false
        } catch { case _: Snapshots.ConstraintViolationException => true }
      val atomicOk = files() == before &&
        Snapshots.versions(s, s"$root/m") == Seq(v1)
      require(rejectedOk && atomicOk,
        "q139 violating batch was not rejected atomically")
      val (v2, nApp) = Snapshots.appendCommitChecked(s, batch, zcols,
        s"$root/z", s"$root/m", 8, constraint, "price_nonneg")
      require(nApp > 0, "q139 good batch landed no files")
      val pr = Snapshots.readAt(s, s"$root/m", v2,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("rejected_ok", lit(rejectedOk))
        .withColumn("atomic_ok", lit(atomicOk))
    }),

    // CDC REPLICATION (q141): mirror a versioned table into another table
    // by applying each commit's change feed as feed-sized DML — deletes
    // as zero-data-file MoR masks, inserts as appends — never re-copying
    // the table (the property that makes replication viable at 100 TB).
    // The consumer cursor is DERIVED from cdc_<v> txn tags on the
    // mirror's own log, so exactly-once resume falls out of tag
    // resolution instead of separate state that can desync. Flow: mirror
    // bootstraps from src v1 (full snapshot, tagged); src then takes an
    // append and a band delete; an incremental sync applies both; a
    // replayed sync (the crash/restart case) skips both without a single
    // new mirror version. Gates in-query: incremental feed reads were
    // touch-set-bounded; the replay applied nothing and committed
    // nothing; the mirror head equals the source head in one sampled
    // job. Emits a box read of the mirror head — orders minus the band.
    "q141_cdc_replication" -> ((s, dir) => {
      import graft.sinks.Cdc
      val root = tmp("q141")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val statsCols = zcols :+ "o_orderkey" // key stats for the MoR planner
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
      FixtureCache.layout(s, s"q141:$dir", s"$root/src/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/src/z", statsCols), s"$root/src/m")
      val boot = Cdc.sync(s, s"$root/src/m", s"$root/mir/z", s"$root/mir/m",
        "o_orderkey", statsCols)
      require(boot.commitsApplied == 1 && boot.replaysSkipped == 0,
        s"q141 bootstrap wrong: $boot")
      Snapshots.appendCommit(s, batch, statsCols, s"$root/src/z",
        s"$root/src/m", nFiles = 8)
      Snapshots.deleteWhere(s, s"$root/src/z", s"$root/src/m", statsCols,
        Seq(("o_custkey", 60.0, 90.0)))
      val inc = Cdc.sync(s, s"$root/src/m", s"$root/mir/z", s"$root/mir/m",
        "o_orderkey", statsCols)
      val boundedOk = inc.commitsApplied == 2 &&
        inc.feedFilesRead < inc.feedFilesTotal
      require(boundedOk, s"q141 incremental sync unbounded: $inc")
      val mirrorVersions = Snapshots.versions(s, s"$root/mir/m")
      val replay = Cdc.sync(s, s"$root/src/m", s"$root/mir/z", s"$root/mir/m",
        "o_orderkey", statsCols)
      // the tag-derived cursor is already at the source head: a replayed
      // sync applies nothing and commits nothing
      val replayOk = replay.commitsApplied == 0 &&
        replay.fromVersion == replay.toVersion &&
        Snapshots.versions(s, s"$root/mir/m") == mirrorVersions
      require(replayOk, s"q141 replay was not exactly-once: $replay")
      val srcHead = Snapshots.latestVersion(s, s"$root/src/m")
      val mirHead = Snapshots.latestVersion(s, s"$root/mir/m")
      val syncedOk = RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/mir/m", mirHead)
          .select(col("o_orderkey")),
          Snapshots.tableAt(s, s"$root/src/m", srcHead)
            .select(col("o_orderkey")),
          "q141 mirror head vs source head")),
        Seq("o_orderkey"))
      val pr = Snapshots.readAt(s, s"$root/mir/m", mirHead,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("bounded_ok", lit(boundedOk))
        .withColumn("replay_ok", lit(replayOk))
        .withColumn("synced_ok", lit(syncedOk))
    }),

    // VACUUM BY RETENTION PERIOD (q142, the `VACUUM ... RETAIN n HOURS`
    // form): versions older than a wall-clock cutoff expire; the oldest
    // version at-or-before the cutoff SURVIVES so `AS OF <cutoff>` time
    // travel keeps resolving — the retention contract users rely on.
    // Script: v1 = base layout, v2 = compaction (supersedes every v1
    // file), v3 = append; cutoff = v2's commit stamp. Gates in-query:
    // exactly v1 dropped (v2/v3 retained); the reclaim deleted exactly
    // v1's file count (v2 rewrote them all, so they die with v1); AS OF
    // the cutoff still resolves to v2 and serves the base rows. Emits
    // the head box read — all orders.
    "q142_vacuum_retention" -> ((s, dir) => {
      val root = tmp("q142")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
      FixtureCache.layout(s, s"q142:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val (v2, nIn, _) = Snapshots.compactCommit(s, s"$root/z", s"$root/m",
        zcols, nFiles = 8)
      val (v3, _) = Snapshots.appendCommit(s, batch, zcols, s"$root/z",
        s"$root/m", nFiles = 8)
      val cutoff = Snapshots.commitTimestamp(s, s"$root/m", v2).get
      val res = Snapshots.vacuumRetention(s, s"$root/z", s"$root/m", cutoff)
      val retainOk = res.versionsDropped == 1 &&
        Snapshots.versions(s, s"$root/m") == Seq(v2, v3)
      require(retainOk, s"q142 retention dropped the wrong versions: $res")
      val reclaimOk = res.filesDeleted == nIn
      require(reclaimOk,
        s"q142 reclaim wrong: ${res.filesDeleted} files (expected $nIn)")
      val asOfV = Snapshots.versionAtTimestamp(s, s"$root/m", cutoff)
      val asOfOk = asOfV == v2 && RecallGate.equivalentFingerprint(Seq(
        (Snapshots.tableAt(s, s"$root/m", asOfV).select(col("o_orderkey")),
          base.select(col("o_orderkey")),
          "q142 AS OF cutoff vs base rows")), Seq("o_orderkey"))
      val pr = Snapshots.readAt(s, s"$root/m", v3,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("retain_ok", lit(retainOk))
        .withColumn("reclaim_ok", lit(reclaimOk))
        .withColumn("asof_ok", lit(asOfOk))
    }),

    // DESCRIBE HISTORY (q143): the audit surface every table format
    // serves — one row per commit with the OPERATION inferred from the
    // log itself (markers for restore/schema commits; the (file, dv)
    // pair diff + manifest row counts for everything else), so no writer
    // cooperation or side state is needed and the listing is
    // version × file-count-bounded planner work. The script exercises
    // every classification branch: create, append, delete, relayout
    // (compaction), restore, schema (rename). The oracle recomputes each
    // row's expected operation and row count from the raw table — a
    // misclassified commit or a wrong count hash-mismatches.
    "q143_describe_history" -> ((s, dir) => {
      val root = tmp("q143")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
      FixtureCache.layout(s, s"q143:$dir", s"$root/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      Snapshots.appendCommit(s, batch, zcols, s"$root/z", s"$root/m",
        nFiles = 8)
      Snapshots.deleteWhere(s, s"$root/z", s"$root/m", zcols,
        Seq(("o_custkey", 60.0, 90.0)))
      val v3 = Snapshots.latestVersion(s, s"$root/m")
      Snapshots.compactCommit(s, s"$root/z", s"$root/m", zcols, nFiles = 8)
      Snapshots.restoreCommit(s, s"$root/m", v3)
      Snapshots.renameColumn(s, s"$root/m", "o_totalprice", "price")
      val h = Snapshots.history(s, s"$root/m")
      import s.implicits._
      h.map(e => (e.version, e.operation, e.rows))
        .toDF("version", "operation", "n_rows")
    }),

    // STRING-STATS FILE SKIPPING (q153): data skipping on a CATEGORICAL
    // column — the manifest's native lexical min/max (the scan-built
    // stats path collects them; the parquet-footer fast path declines
    // non-numerics and falls back to exactly that build) prunes a
    // range-partitioned layout sorted on the string key, so a point
    // lookup `o_orderpriority = '1-URGENT'` opens only the files whose
    // lexical [min,max] straddles the value. Gates in-query: the point
    // read opened strictly fewer files than the manifest lists, and its
    // rows equal the direct filter in one fingerprint job. Emits the
    // matching rows.
    "q153_string_stats_skip" -> ((s, dir) => {
      val root = tmp("q153")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      FixtureCache.layout(s, s"q153:$dir", s"$root/z")(d =>
        Maintenance.writeSorted(orders, d, nFiles = 10,
          col("o_orderpriority"), col("o_orderkey")))
      val manifest = Layout.buildManifest(s, s"$root/z",
        Seq("o_orderpriority")).localCheckpoint()
      val pr = Layout.prunedReadStr(s, s"$root/z", manifest,
        Seq(("o_orderpriority", "1-URGENT", "1-URGENT")))
      val prunedOk = pr.filesRead < pr.filesTotal && pr.filesRead > 0
      require(prunedOk,
        s"q153 string stats pruned nothing: ${pr.filesRead}/${pr.filesTotal}")
      val completeOk = RecallGate.equivalentFingerprint(Seq(
          (pr.df.select(col("o_orderkey")),
            orders.filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_orderkey")),
            "q153 pruned point read vs direct filter")),
        Seq("o_orderkey"))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority"))
        .withColumn("pruned_ok", lit(prunedOk))
        .withColumn("complete_ok", lit(completeOk))
    }),

    // ORC ROUND-TRIP (q157): the other columnar format Spark serves
    // natively — a lineitem slice written as ORC, read back, and filtered
    // with the predicate REACHING the ORC scan (plan-gated PushedFilters,
    // same vectorized-reader economics as parquet). The oracle pins
    // row-fidelity end-to-end.
    "q157_orc_roundtrip" -> ((s, dir) => {
      val root = tmp("q157")
      t(s, dir, "lineitem").filter(col("l_orderkey") % 13 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .write.mode("overwrite").orc(s"$root/orc")
      val q = s.read.orc(s"$root/orc")
        .filter(col("l_returnflag") === "R")
      val plan = q.queryExecution.executedPlan.toString
      val pushedOk = plan.contains("ORC") &&
        plan.contains("EqualTo(l_returnflag,R)")
      require(pushedOk, s"q157 predicate did not reach the ORC scan:\n$plan")
      q.withColumn("pushed_ok", lit(pushedOk))
    }),

    // AVRO ROUND-TRIP (q172, round-12 verdict item: the format matrix's
    // last gap next to parquet/ORC/CSV/JSON). The distribution ships the
    // Avro libraries but not the spark-avro module, so this drives the
    // engine's own container-file source/sink (sources/Avro.scala):
    // executor-parallel write, sync-block-splittable Hadoop input format,
    // and PROJECTED-READER-SCHEMA pruning — Avro's schema resolution
    // decode-skips unrequested fields, the row-major analog of parquet
    // column pruning. Gates: the reader schema is actually thinner than
    // the writer's, and the projected read ≡ the full read's projection
    // (full-coverage fingerprint) — a field-skew or resolution bug cannot
    // slip through. The oracle pins end-to-end row fidelity, timestamp
    // micros included.
    "q172_avro_roundtrip" -> ((s, dir) => {
      val root = tmp("q172")
      val orders = t(s, dir, "orders").filter(col("o_orderkey") % 6 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"))
      graft.sources.Avro.write(orders, s"$root/avro")
      val proj = graft.sources.Avro.read(s, s"$root/avro",
        Some(Seq("o_orderkey", "o_totalprice", "o_orderdate")))
      val prunedOk = proj.schema.fields.length == 3 &&
        graft.sources.Avro.writerSchema(s, s"$root/avro").getFields.size == 5
      require(prunedOk, "q172 projected reader schema did not prune")
      val cols = Seq("o_orderkey", "o_totalprice", "o_orderdate")
      val roundtripOk = RecallGate.equivalentFingerprint(Seq(
        (proj,
          graft.sources.Avro.read(s, s"$root/avro")
            .select(cols.map(col): _*),
          "q172 projected read vs full read's projection")),
        cols)
      proj.select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          unix_micros(col("o_orderdate")).as("od_us"))
        .withColumn("pruned_ok", lit(prunedOk))
        .withColumn("roundtrip_ok", lit(roundtripOk))
    }),

    // SIZE-POLICY COMPACTION (q159, the production OPTIMIZE shape): six
    // tiny streaming-style appends fragment a healthy 4-file base;
    // compactSmallCommit bin-packs ONLY the tail under half the largest
    // file's size — the base files stay byte-untouched (mtime-gated), so
    // the rewrite tracks the small-file DEBT, not table size. Gates
    // in-query: exactly the tiny files compacted into one; the head
    // equals all rows in one fingerprint job; the commit is invisible to
    // the change feed (row-identical re-layout). Emits the head box read.
    "q159_compact_small" -> ((s, dir) => {
      val root = tmp("q159")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 8 =!= 0)
      Layout.zorderWrite(base, zcols, s"$root/z", nFiles = 4)
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      (0 to 5).foreach { i =>
        Snapshots.appendCommit(s,
          orders.filter(col("o_orderkey") % 8 === 0 &&
            col("o_orderkey") % 6 === i),
          zcols, s"$root/z", s"$root/m", nFiles = 1)
      }
      val vPre = Snapshots.latestVersion(s, s"$root/m")
      def stamps(): Map[String, Long] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(st => st.isFile &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st => st.getPath.getName -> st.getModificationTime).toMap
      }
      val sizes = {
        val p = new org.apache.hadoop.fs.Path(s"$root/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        Snapshots.manifestAt(s, s"$root/m", vPre).select(col("file"))
          .collect().map { r =>
            val fp = new org.apache.hadoop.fs.Path(r.getString(0))
            fp.getName -> fs.getFileStatus(fp).getLen
          }.toMap
      }
      val threshold = sizes.values.max / 2 // SF-robust: tiny ≪ base
      val bigNames = sizes.filter(_._2 >= threshold).keySet
      val before = stamps()
      val res = Snapshots.compactSmallCommit(s, s"$root/z", s"$root/m",
        zcols, smallBytes = threshold, nFiles = 1)
      val after = stamps()
      val policyOk = res.filesCompacted == sizes.size - bigNames.size &&
        res.filesSkipped == bigNames.size && res.filesOut == 1 &&
        bigNames.forall(n => after.get(n) == before.get(n))
      require(policyOk, s"q159 size policy misfired: $res " +
        s"(expected ${sizes.size - bigNames.size} small, ${bigNames.size} big)")
      val invisibleOk =
        Snapshots.relayoutInvisible(s, s"$root/m", vPre, res.version)
      require(invisibleOk, "q159 bin-pack changed rows — not a re-layout")
      val completeOk = RecallGate.equivalentFingerprint(Seq(
          (Snapshots.tableAt(s, s"$root/m", res.version)
            .select(col("o_orderkey")),
            orders.select(col("o_orderkey")),
            "q159 post-compaction head vs all orders")),
        Seq("o_orderkey"))
      val pr = Snapshots.readAt(s, s"$root/m", res.version,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("policy_ok", lit(policyOk))
        .withColumn("invisible_ok", lit(invisibleOk))
        .withColumn("complete_ok", lit(completeOk))
    }),

    // MERGE WITH SCHEMA EVOLUTION (q160): the source batch carries a
    // column the target lacks (`o_flag`); the merge commit extends the
    // schema the q118 way — rewritten/inserted files carry the column,
    // untouched files serve it as NULL through the footer-merge read,
    // and a v1-pinned read never shows it. Gates in-query: pinned-schema
    // isolation; the null set is EXACTLY the non-source rows. Emits the
    // touched slices (updated band flagged 'upd', inserts flagged 'ins').
    "q160_merge_schema_evolution" -> ((s, dir) => {
      val root = tmp("q160")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      val zcols = Seq("o_orderkey", "o_custkey")
      FixtureCache.layout(s, s"q160:$dir", s"$root/z")(d =>
        Layout.zorderWrite(orders, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      val updates = orders.filter(col("o_orderkey").between(200, 600))
        .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
        .withColumn("o_flag", lit("upd"))
      val inserts = orders.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"), lit("ins").as("o_flag"))
      val res = Snapshots.mergeCommit(s, updates.unionByName(inserts),
        "o_orderkey", zcols, s"$root/z", s"$root/m", nFiles = 16)
      val head = Snapshots.tableAt(s, s"$root/m", res.version)
      val pinnedOk =
        !Snapshots.tableAt(s, s"$root/m", v1).columns.contains("o_flag")
      require(pinnedOk, "q160 pinned pre-evolution read leaked the column")
      val (nUpd, nIns) = (updates.count(), inserts.count())
      val nullsOk = head.columns.contains("o_flag") &&
        head.filter(col("o_flag").isNull).count() == orders.count() - nUpd &&
        head.filter(col("o_flag").isNotNull).count() == nUpd + nIns
      require(nullsOk, "q160 evolved null set wrong")
      head.filter(col("o_flag").isNotNull)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_flag"))
        .withColumn("pinned_ok", lit(pinnedOk))
        .withColumn("nulls_ok", lit(nullsOk))
    }),

    // WRITE–AUDIT–PUBLISH (q166, the Iceberg WAP / audit-branch
    // governance workflow, composed from clone + commit): a batch lands
    // on a SHALLOW CLONE of the main table (zero copy), quality checks
    // run against the staged snapshot, and only a passing audit is
    // PUBLISHED — one metadata commit adopting the audited manifest
    // (the clone's data files by absolute path; nothing moves). A
    // failing audit is simply abandoned: the main log never saw it.
    // Gates in-query: the bad batch's audit fails AND main is
    // byte-and-version untouched; the good batch's publish adds ONE
    // main version whose head equals base ∪ batch (fingerprint); the
    // publish wrote nothing under main's data dir.
    "q166_write_audit_publish" -> ((s, dir) => {
      val root = tmp("q166")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      val base = orders.filter(col("o_orderkey") % 4 =!= 0)
      val batch = orders.filter(col("o_orderkey") % 4 === 0)
      FixtureCache.layout(s, s"q166:$dir", s"$root/main/z")(d =>
        Layout.zorderWrite(base, zcols, d, nFiles = 16))
      val v1 = Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/main/z", zcols), s"$root/main/m")
      def mainFiles(): Set[String] = {
        val p = new org.apache.hadoop.fs.Path(s"$root/main/z")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
      }
      val before = mainFiles()
      def stage(name: String, b: DataFrame): (String, Int) = {
        Snapshots.cloneCommit(s, s"$root/main/m", s"$root/$name/m", v1)
        new org.apache.hadoop.fs.Path(s"$root/$name/z")
          .getFileSystem(s.sparkContext.hadoopConfiguration)
          .mkdirs(new org.apache.hadoop.fs.Path(s"$root/$name/z"))
        val (v, _) = Snapshots.appendCommit(s, b, zcols, s"$root/$name/z",
          s"$root/$name/m", nFiles = 8)
        (s"$root/$name/m", v)
      }
      def audit(mRoot: String, v: Int): Boolean =
        Snapshots.tableAt(s, mRoot, v)
          .filter(col("o_totalprice") < 0).isEmpty
      // attempt 1: corrupted batch — audit must block it
      val bad = batch.withColumn("o_totalprice", -col("o_totalprice") - 1)
      val (m1, s1) = stage("audit1", bad)
      val blockedOk = !audit(m1, s1)
      require(blockedOk, "q166 audit passed a corrupted batch")
      val isolatedOk =
        Snapshots.versions(s, s"$root/main/m") == Seq(v1) &&
          mainFiles() == before
      require(isolatedOk, "q166 failed audit leaked into main")
      // attempt 2: clean batch — audit passes, publish adopts it
      val (m2, s2) = stage("audit2", batch)
      require(audit(m2, s2), "q166 audit rejected the clean batch")
      val vPub = Snapshots.commit(s, Snapshots.manifestAt(s, m2, s2),
        s"$root/main/m", markers = Seq("_wap_published"))
      val publishedOk = mainFiles() == before && // metadata-only adoption
        Snapshots.versions(s, s"$root/main/m") == Seq(v1, vPub) &&
        RecallGate.equivalentFingerprint(Seq(
          (Snapshots.tableAt(s, s"$root/main/m", vPub)
            .select(col("o_orderkey")),
            orders.select(col("o_orderkey")),
            "q166 published head vs base ∪ batch")),
          Seq("o_orderkey"))
      val pr = Snapshots.readAt(s, s"$root/main/m", vPub,
        Seq(("o_custkey", 30.0, 120.0)))
      pr.df.select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("blocked_ok", lit(blockedOk))
        .withColumn("isolated_ok", lit(isolatedOk))
        .withColumn("published_ok", lit(publishedOk))
    }),

    // ROW TRACKING (q239, round 15): stable row identities that survive
    // re-layout — the Delta row-tracking contract. Two appends assign
    // virtual ids (file base + position, zero write amplification), a
    // compaction MATERIALIZES them into a physical column while rows move
    // across files, and a post-compaction append allocates above the
    // monotone high-water mark. Gates in-query: (a) the (orderkey →
    // row_id) map is IDENTICAL before and after compaction — a pure
    // re-layout renumbers nothing; (b) ids are globally unique across all
    // three commits (the high-water survived the compaction that dropped
    // every base-id-carrying file); (c) pinned v1 serves only batch 1.
    // Emits a pruned band of the business rows (id VALUES are
    // engine-internal layout artifacts, like every hash-dependent op
    // here); the booleans are what the oracle expects TRUE.
    "q239_row_tracking" -> ((s, dir) => {
      val root = tmp("q239")
      val orders = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      val b1 = orders.filter(col("o_orderkey") % 3 === 0)
      val b2 = orders.filter(col("o_orderkey") % 3 =!= 0)
      val (v1, _) = RowTracking.appendTracked(s, b1, Seq("o_orderkey"),
        s"$root/t", s"$root/m", nFiles = 4)
      val (v2, _) = RowTracking.appendTracked(s, b2, Seq("o_orderkey"),
        s"$root/t", s"$root/m", nFiles = 4)
      val before = RowTracking.readTracked(s, s"$root/m", v2)
        .select(col("o_orderkey"), col("_row_id")).localCheckpoint()
      val (v3, _, _) = RowTracking.compactTracked(s, s"$root/t",
        s"$root/m", Seq("o_orderkey"), nFiles = 3)
      val after = RowTracking.readTracked(s, s"$root/m", v3)
        .localCheckpoint()
      val stableOk = RecallGate.equivalentFingerprint(Seq(
        (before, after.select(col("o_orderkey"), col("_row_id")),
          "q239 (key → row id) across compaction")),
        Seq("o_orderkey", "_row_id"))
      require(stableOk, "q239 compaction renumbered rows")
      val Array(nTotal, nIds, maxId) = after.agg(
        count(lit(1)), countDistinct(col("_row_id")), max(col("_row_id")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val uniqueOk = nIds == nTotal
      require(uniqueOk, s"q239 duplicate row ids: $nIds of $nTotal")
      require(maxId < nTotal + 16 * nTotal, "q239 id space ran away")
      val pinnedOk = RowTracking.readTracked(s, s"$root/m", v1)
        .agg(count(lit(1))).head().getLong(0) == b1.count()
      require(pinnedOk, "q239 pinned v1 read is not batch 1")
      after.filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .withColumn("stable_ok", lit(stableOk))
        .withColumn("unique_ok", lit(uniqueOk))
        .withColumn("pinned_ok", lit(pinnedOk))
    })
  )

  val oracle: Map[String, String] = Map(
    "q64_jsonl_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey % 7 = 0""".stripMargin,
    "q65_partition_overwrite" ->
      """SELECT o_orderkey,
        |  round(CASE WHEN strftime(o_orderdate, '%Y-%m') = '1995-03'
        |             THEN o_totalprice + 1000 ELSE o_totalprice END, 2) AS o_totalprice,
        |  strftime(o_orderdate, '%Y-%m') AS run_date
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin,
    "q66_compaction" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  user_id, event_type, value
        |FROM events WHERE event_id % 5 = 0""".stripMargin,
    // q106 emits the 2-D box's rows; the booleans assert measured file
    // pruning (≤ 50 % of files opened) and pruned ≡ full-scan equivalence.
    "q106_zorder_pruned_scan" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS pruned_ok, TRUE AS complete_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 400
        |  AND o_totalprice BETWEEN 50000 AND 150000""".stripMargin,
    // q107 emits the same box over base ∪ batch = all orders; the booleans
    // assert incremental manifest growth, measured pruning, and pruned ≡
    // full equivalence.
    "q107_incremental_layout" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS incremental_ok, TRUE AS pruned_ok, TRUE AS complete_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 400
        |  AND o_totalprice BETWEEN 50000 AND 150000""".stripMargin,
    // q109 emits the custkey 30–120 box AFTER deleting the 60–90 band
    // (bands chosen inside every sf's custkey range); the booleans assert
    // the rewrite was file-targeted and loss-free.
    "q109_targeted_delete" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS targeted_ok, TRUE AS complete_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120
        |  AND NOT (o_custkey BETWEEN 60 AND 90)""".stripMargin,
    // q111 emits a V1-PINNED box read executed AFTER the band delete: time
    // travel is exact iff the deleted 60–90 band is still present, so the
    // oracle is the box over UN-deleted orders. The booleans assert the
    // latest-version delete and the vacuum reclaim.
    "q111_time_travel" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS post_delete_ok, TRUE AS vacuum_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q129 emits the post-append box under the RENAMED column: all orders
    // (base ∪ batch) with o_totalprice visible as `price`; the booleans
    // assert the zero-rewrite rename, pinned-name visibility, the
    // key-correct cross-rename CDF, and drop semantics.
    "q129_column_rename" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
        |  TRUE AS zero_rewrite_ok, TRUE AS pinned_ok, TRUE AS cdf_ok,
        |  TRUE AS drop_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q130 emits a box read of the version RESOLVED FROM the pre-delete
    // commit's timestamp, executed after the delete — the un-deleted
    // orders box, q111's oracle reached through `AS OF <timestamp>`.
    "q130_time_travel_ts" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS monotonic_ok, TRUE AS resolve_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q113 emits a latest-version pruned box read AFTER append + compact +
    // vacuum — the full table must survive all three commits, so the
    // oracle is the box over ALL orders; the booleans assert the pinned
    // append exclusion, the pure re-layout, and the exact reclaim.
    "q113_versioned_append_compact" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS append_ok, TRUE AS compact_ok, TRUE AS vacuum_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q114 emits the v2→v3 change feed of a band delete over the full
    // (base ∪ appended-batch = all) orders: exactly the band rows as
    // deletes — survivor rewrites annihilate in the multiset diff. The
    // booleans assert the append feed (batch as pure inserts), the empty
    // compaction feed, and the changed-files-only read.
    "q114_version_changes" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  'delete' AS change_type, TRUE AS insert_ok,
        |  TRUE AS compact_invisible_ok, TRUE AS pruned_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 60 AND 90""".stripMargin,
    // q115 emits the post-merge state of the touched slices: the updated
    // band (price doubled) plus the inserted rows (orderkey shifted above
    // the key space). The booleans assert stats-pruned rewrite, count
    // fidelity, v1 snapshot isolation, and the merge's change feed.
    "q115_merge_commit" ->
      """SELECT o_orderkey, o_custkey,
        |  round(round(o_totalprice, 2) * 2, 2) AS o_totalprice,
        |  TRUE AS merge_pruned_ok, TRUE AS counts_ok,
        |  TRUE AS isolation_ok, TRUE AS feed_ok
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 4000
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey, round(o_totalprice, 2),
        |  TRUE, TRUE, TRUE, TRUE
        |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin,
    // q116's maintained view must equal the aggregate of the final state:
    // all orders (base ∪ appended batch) minus the deleted custkey band.
    "q116_incremental_view" ->
      """SELECT o_custkey % 8 AS bucket, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total,
        |  TRUE AS ivm_ok, TRUE AS feed_pruned_ok
        |FROM orders WHERE o_custkey NOT BETWEEN 40 AND 110
        |GROUP BY 1""".stripMargin,
    // q118: the evolved table — post-evolution rows (%4) carry the new
    // column, pre-evolution rows serve NULL through the merged schema.
    "q118_schema_evolution" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  CASE WHEN o_orderkey % 4 = 0 THEN o_custkey * 1.5 END AS o_score,
        |  TRUE AS old_schema_ok, TRUE AS new_schema_ok, TRUE AS feed_ok
        |FROM orders""".stripMargin,
    // q121: the 8 smallest orderkeys above the domain midpoint (interior
    // values — the regime where interval stats cannot prune) fetched
    // through the bloom-planned point read; the boolean asserts the bloom
    // beat the interval-stats control.
    "q121_bloom_skip" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS bloom_pruned_ok
        |FROM orders
        |WHERE o_orderkey IN
        |  (SELECT o_orderkey FROM orders
        |   WHERE o_orderkey >= (SELECT (min(o_orderkey) + max(o_orderkey)) // 2
        |                        FROM orders)
        |   ORDER BY o_orderkey LIMIT 8)""".stripMargin,
    // q120: orders minus the three writers' bands, bounds recomputed by
    // the oracle from the same min/max-fraction arithmetic (identical
    // IEEE double ops in both engines); booleans assert the rebase, the
    // detected conflict, and the replanned commit.
    "q120_txn_commit" ->
      """WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi
        |           FROM orders)
        |SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS rebase_ok, TRUE AS conflict_caught, TRUE AS replan_ok
        |FROM orders, b
        |WHERE NOT (o_orderkey BETWEEN lo + 0.05 * (hi - lo)
        |                          AND lo + 0.25 * (hi - lo))
        |  AND NOT (o_orderkey BETWEEN lo + 0.60 * (hi - lo)
        |                          AND lo + 0.75 * (hi - lo))""".stripMargin,
    // q119: the table after a MoR band delete + key delete + folding
    // compaction — the oracle is orders minus both delete sets; the
    // booleans assert zero data-file writes, stats targeting, snapshot
    // pinning, the exact change feed, and the silent fold.
    "q119_mor_delete" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS zero_rewrite_ok, TRUE AS targeted_ok, TRUE AS pinned_ok,
        |  TRUE AS feed_ok, TRUE AS fold_ok
        |FROM orders
        |WHERE NOT (o_custkey BETWEEN 60 AND 90)
        |  AND o_orderkey % 400 <> 0""".stripMargin,
    "q67_rest_source" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // q127: 4 even (base-generation) + 4 odd (appended-generation) interior
    // keys above the domain midpoint, fetched through the incrementally
    // maintained bloom manifest; booleans assert the manifest grew by
    // exactly the appended files and the bloom beat the stats control.
    "q127_incremental_bloom" ->
      """WITH mid AS (SELECT (min(o_orderkey) + max(o_orderkey)) // 2 AS m
        |            FROM orders),
        |k AS (
        |  (SELECT o_orderkey FROM orders, mid
        |   WHERE o_orderkey >= m AND o_orderkey % 2 = 0
        |   ORDER BY o_orderkey LIMIT 4)
        |  UNION ALL
        |  (SELECT o_orderkey FROM orders, mid
        |   WHERE o_orderkey >= m AND o_orderkey % 2 = 1
        |   ORDER BY o_orderkey LIMIT 4))
        |SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS incremental_ok, TRUE AS bloom_pruned_ok
        |FROM orders WHERE o_orderkey IN (SELECT o_orderkey FROM k)""".stripMargin,
    // q122: the canned QueryResponse carries every 10th customer; the gate
    // boolean asserts the token refresh + retry actually happened.
    "q122_qbo_source" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  round(c_acctbal, 2) AS c_acctbal, TRUE AS auth_retry_ok
        |FROM customer WHERE c_custkey % 10 = 0""".stripMargin,
    // q123: exact decimal revenue — both engines multiply at scale 8 and
    // sum exactly; the canonical string compare is digit-exact.
    "q123_decimal_money" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |      AS DECIMAL(38,8)) AS VARCHAR) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q73_json_doc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    "q74_incremental_scan" ->
      """SELECT o_orderkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |WHERE o_orderkey % 37 = 0
        |  AND strftime(o_orderdate, '%Y-%m-%d') >= '1995-03-09'""".stripMargin,
    "q75_dsv2_source" ->
      "SELECT p_partkey, p_name, p_size, p_retailprice FROM part",
    "q81_partition_pruned_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m') AS run_date
        |FROM orders
        |WHERE o_orderkey % 4 = 0 AND year(o_orderdate) = 1995
        |  AND strftime(o_orderdate, '%Y-%m') = '1995-06'""".stripMargin,
    "q88_bucketed_join" ->
      """SELECT c.c_mktsegment,
        |  round(sum(o.o_totalprice), 2) AS seg_total,
        |  count(*) AS n_orders
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1""".stripMargin,
    "q89_csv_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_orderkey % 11 = 0""".stripMargin,
    "q86_medallion_e2e" ->
      """SELECT c.c_name AS name, count(*) AS n_payments,
        |  round(sum(CASE WHEN o.o_orderkey % 13 = 0 THEN NULL
        |                 ELSE o.o_totalprice END), 2) AS total_paid
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    // q133 emits a box read of the RESTORED head, executed after a band
    // delete was rolled back: the band is present again, so the oracle is
    // the full box over all orders. The booleans assert the metadata-only
    // commit, preserved (pinnable) history, and the feed-is-inverse gate.
    "q133_restore" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS zero_write_ok, TRUE AS history_ok, TRUE AS feed_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q134 emits a box read of the CLONE head after a clone-side band
    // delete — orders minus the band; the booleans assert the zero-copy
    // aliasing, both-ways isolation, and the diverged-heads equivalences.
    "q134_shallow_clone" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS zero_copy_ok, TRUE AS src_isolated_ok, TRUE AS diverged_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120
        |  AND NOT (o_custkey BETWEEN 60 AND 90)""".stripMargin,
    // q136 emits a box read of the PURGED head: the MoR-deleted band is
    // gone (now physically, not just masked), so the oracle is orders
    // minus the band. The booleans assert the masked-set-bounded rewrite,
    // the dv-free manifest, feed invisibility, and the pinned MoR read.
    "q136_dv_purge" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS targeted_ok, TRUE AS clean_ok, TRUE AS invisible_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120
        |  AND NOT (o_custkey BETWEEN 60 AND 90)""".stripMargin,
    // q137 emits the touched slices of the three-clause merge: the
    // updated 200–600 band (price doubled), the untouched 600–800
    // gap, the EMPTIED 800–1200 delete box (no rows — unmatched-by-
    // source retired), and the shifted inserts. Booleans assert pruning,
    // clause counts, and the head key-set equivalence.
    "q137_merge_full" ->
      """SELECT o_orderkey, o_custkey,
        |  round(round(o_totalprice, 2) * 2, 2) AS o_totalprice,
        |  TRUE AS merge_pruned_ok, TRUE AS counts_ok, TRUE AS head_ok
        |FROM orders WHERE o_orderkey BETWEEN 200 AND 600
        |UNION ALL
        |SELECT o_orderkey, o_custkey, round(o_totalprice, 2),
        |  TRUE, TRUE, TRUE
        |FROM orders WHERE o_orderkey > 600 AND o_orderkey < 800
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey, round(o_totalprice, 2),
        |  TRUE, TRUE, TRUE
        |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin,
    // q138 emits ONE row of manifest-served aggregates; the oracle
    // recomputes every value from the raw table (the post-purge count is
    // the table minus the MoR-deleted custkey band).
    "q138_stats_agg" ->
      """SELECT count(*) AS n_rows,
        |  CAST(min(o_custkey) AS DOUBLE) AS min_cust,
        |  CAST(max(o_custkey) AS DOUBLE) AS max_cust,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  (SELECT count(*) FROM orders
        |     WHERE NOT (o_custkey BETWEEN 60 AND 90)) AS rows_after_purge,
        |  TRUE AS matches_scan_ok, TRUE AS masked_refused_ok,
        |  TRUE AS purged_ok
        |FROM orders""".stripMargin,
    // q139 emits the full custkey box over ALL orders — the violating
    // batch must have been rejected without a trace and the clean batch
    // committed, so base ∪ batch = the whole table.
    "q139_check_constraint" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS rejected_ok, TRUE AS atomic_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q141 emits a box read of the MIRROR head after replicating a
    // bootstrap + append + band delete through the change feed — the
    // mirror must equal the source: all orders minus the band. Booleans
    // assert touch-set-bounded feeds, exactly-once replay, and the
    // sampled head equivalence.
    "q141_cdc_replication" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS bounded_ok, TRUE AS replay_ok, TRUE AS synced_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120
        |  AND NOT (o_custkey BETWEEN 60 AND 90)""".stripMargin,
    // q142 emits the head box read after a retention vacuum (base ∪
    // batch = all orders); booleans assert the exact version drop, exact
    // file reclaim, and surviving AS-OF resolution.
    "q142_vacuum_retention" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS retain_ok, TRUE AS reclaim_ok, TRUE AS asof_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q143 emits the whole inferred history; the oracle pins every
    // commit's operation and row count from the raw table.
    "q143_describe_history" ->
      """SELECT CAST(1 AS INT) AS version, 'create' AS operation,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 4 <> 0) AS n_rows
        |UNION ALL SELECT 2, 'append', (SELECT count(*) FROM orders)
        |UNION ALL SELECT 3, 'delete', (SELECT count(*) FROM orders
        |  WHERE NOT (o_custkey BETWEEN 60 AND 90))
        |UNION ALL SELECT 4, 'relayout', (SELECT count(*) FROM orders
        |  WHERE NOT (o_custkey BETWEEN 60 AND 90))
        |UNION ALL SELECT 5, 'restore', (SELECT count(*) FROM orders
        |  WHERE NOT (o_custkey BETWEEN 60 AND 90))
        |UNION ALL SELECT 6, 'schema', (SELECT count(*) FROM orders
        |  WHERE NOT (o_custkey BETWEEN 60 AND 90))""".stripMargin,
    // q153 emits the rows the string-stats point read served; the
    // booleans assert files were actually skipped and the read was
    // loss-free.
    "q153_string_stats_skip" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority,
        |  TRUE AS pruned_ok, TRUE AS complete_ok
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q157_orc_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
        |  TRUE AS pushed_ok
        |FROM lineitem
        |WHERE l_orderkey % 13 = 0 AND l_returnflag = 'R'""".stripMargin,
    // q173 emits the gold dim⋈fact report of the CONFIG-ASSEMBLED run:
    // every payment joined to its customer, invalid (%17) amounts nulled
    // by the silver try_cast; config_ok asserts the parsed catalog.
    "q173_config_pipeline" ->
      """SELECT c.c_name AS name, count(*) AS n_payments,
        |  round(sum(CASE WHEN o.o_orderkey % 17 = 0 THEN NULL
        |                 ELSE o.o_totalprice END), 2) AS total_paid,
        |  TRUE AS config_ok
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    // q172 emits the projected Avro read — the %6 orders slice with
    // timestamps as exact micros; the booleans assert reader-schema
    // pruning and projected≡full fidelity.
    "q172_avro_roundtrip" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS od_us,
        |  TRUE AS pruned_ok, TRUE AS roundtrip_ok
        |FROM orders
        |WHERE o_orderkey % 6 = 0""".stripMargin,
    // q159 emits the head box read after the size-policy bin-pack — all
    // orders survive; booleans assert the policy targeted only the small
    // tail, the re-layout's feed invisibility, and head completeness.
    "q159_compact_small" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS policy_ok, TRUE AS invisible_ok, TRUE AS complete_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q160 emits the flagged slices of the evolving merge: the updated
    // 200-600 band (doubled price, 'upd') and the shifted inserts
    // ('ins'); booleans assert pinned-schema isolation and the exact
    // null set on the evolved head.
    "q160_merge_schema_evolution" ->
      """SELECT o_orderkey, o_custkey,
        |  round(round(o_totalprice, 2) * 2, 2) AS o_totalprice,
        |  'upd' AS o_flag, TRUE AS pinned_ok, TRUE AS nulls_ok
        |FROM orders WHERE o_orderkey BETWEEN 200 AND 600
        |UNION ALL
        |SELECT o_orderkey + 10000000, o_custkey, round(o_totalprice, 2),
        |  'ins', TRUE, TRUE
        |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin,
    // q166 emits the published head's box read — base ∪ the audited
    // batch = all orders; booleans assert the blocked bad batch, main's
    // isolation during the audit, and the metadata-only publish.
    "q166_write_audit_publish" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS blocked_ok, TRUE AS isolated_ok, TRUE AS published_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q239 emits the post-compaction business rows of the band; row-id
    // stability/uniqueness/pinned-read are the in-query gates the oracle
    // expects TRUE (id values are layout artifacts, not data).
    "q239_row_tracking" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS stable_ok, TRUE AS unique_ok, TRUE AS pinned_ok
        |FROM orders
        |WHERE o_orderkey <= 2000""".stripMargin
  )
}
