package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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
  * Commit protocol: the next manifest is written to a hidden uniquely-named
  * temp dir and `rename`d to `v=N` — readers list versions and see N fully
  * or not at all (the same single-rename visibility [[Layout.deleteWhere]]
  * uses for its swap). Concurrent writers are arbitrated by the rename
  * itself as a compare-and-swap on the version number: on a store with
  * atomic rename, renaming onto an existing (non-empty) `v=N` fails, and
  * the loser retries with the next free version — its already-staged
  * manifest, re-targeted. Losing a race never loses an update; it can at
  * worst commit a manifest computed against a stale parent (write-write
  * conflicts between concurrent delete/compact jobs need real conflict
  * detection, which daily batch cadence doesn't — see [[commit]]).
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
  private val CkptDir = "ckpt=(\\d+)".r
  private val DeltaMarker = "_delta"
  private val ActionCol = "action"
  private val TsPrefix = "_ts_"
  private val CmapPrefix = "_cmap_"
  private val AddColPrefix = "_addcol_"
  private val CkPrefix = "_ck_"
  private val CopyPrefix = "_copy_"

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
    // CROSS-TABLE TXN visibility: a version staged by [[graft.sql.LakeTxn]]
    // carries a pending marker and is INVISIBLE until its transaction's
    // single commit file exists — that file creation is the one atomic
    // instant at which every table's staged version appears together.
    // Pending stages can only occupy the log TAIL (commitStaged refuses
    // to build past an unresolved one), so this walk is O(1) amortized:
    // resolved states memoize, an unresolved head re-checks one file.
    vs.reverseIterator.find(v => txnVisible(spark, manifestRoot, v))
      .getOrElse(throw new IllegalStateException(
        s"every version under $manifestRoot is an unresolved or aborted " +
          "transaction stage — nothing visible to read"))
  }

  /** Content-marker filename a cross-table txn stage travels in (body =
    * txn dir + txn id, newline-separated). */
  private[graft] val TxnPendingMarker = "_txn_pending.txt"

  /** The (txnDir, txnId) of a pending-staged version, if any. */
  private[graft] def pendingInfo(spark: SparkSession, manifestRoot: String,
                                 v: Int): Option[(String, String)] = {
    val fs = hfs(spark, manifestRoot)
    val p = new org.apache.hadoop.fs.Path(
      s"$manifestRoot/v=$v", TxnPendingMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      val Array(dir, id) = body.split("\n", 2)
      Some((dir, id))
    }
  }

  // (root, v) → resolved visibility. Only RESOLVED states memoize
  // (plain version → true; txn committed → true; txn aborted → false);
  // an unresolved pending stage re-checks its txn file every call
  // because the commit file can appear at any moment.
  private val txnVisMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Boolean]

  private[graft] def clearTxnVisMemo(manifestRoot: String): Unit =
    txnVisMemo.keys.filter(_._1 == manifestRoot).foreach(txnVisMemo.remove)

  private[graft] def txnVisible(spark: SparkSession, manifestRoot: String,
                                v: Int): Boolean =
    txnVisMemo.getOrElse((manifestRoot, v), {
      pendingInfo(spark, manifestRoot, v) match {
        case None =>
          txnVisMemo.put((manifestRoot, v), true); true
        case Some((dir, id)) =>
          val fs = hfs(spark, dir)
          if (fs.exists(new org.apache.hadoop.fs.Path(dir, s"commit_$id"))) {
            txnVisMemo.put((manifestRoot, v), true); true
          } else if (fs.exists(
              new org.apache.hadoop.fs.Path(dir, s"abort_$id"))) {
            txnVisMemo.put((manifestRoot, v), false); false
          } else false // unresolved: re-check next call, never memoize
      }
    })

  /** True when version `v` is a txn stage whose transaction is neither
    * committed nor aborted — the one state a concurrent committer must
    * never build past (landing a manifest above it silently buries the
    * staged content when its txn later commits). */
  private def unresolvedStage(spark: SparkSession, manifestRoot: String,
                              v: Int): Boolean =
    pendingInfo(spark, manifestRoot, v).exists { case (dir, id) =>
      val f = hfs(spark, dir)
      !f.exists(new org.apache.hadoop.fs.Path(dir, s"commit_$id")) &&
        !f.exists(new org.apache.hadoop.fs.Path(dir, s"abort_$id"))
    }

  /** Committed AND txn-visible versions, ascending — the version set
    * every READER (batch pin, stream discovery, delta fold) must walk:
    * pending/aborted txn stages occupy version slots in the raw log but
    * are not part of table history (an unresolved stage becomes history
    * only at its txn's commit instant; an aborted one never does). */
  private[graft] def visibleVersions(spark: SparkSession,
                                     manifestRoot: String): Seq[Int] =
    versions(spark, manifestRoot)
      .filter(v => txnVisible(spark, manifestRoot, v))

  /** True when the log's RAW tail is an unresolved txn stage — the
    * write-write conflict a new commit must refuse (building past the
    * stage would silently discard it when its txn commits). */
  private def tailUnresolved(spark: SparkSession,
                             manifestRoot: String): Boolean =
    versions(spark, manifestRoot).lastOption.exists { last =>
      !txnVisible(spark, manifestRoot, last) &&
        unresolvedStage(spark, manifestRoot, last)
    }

  /** Commit `manifest` as the next version; returns the number it actually
    * landed at. The write stages once into a hidden uniquely-named temp dir
    * (two racing committers must never share a staging path), then loops
    * the rename as a compare-and-swap: if `v=N` already exists — or the
    * rename fails because another writer won it between the existence check
    * and the rename — the committer retries the SAME staged manifest at the
    * next version number. Bounded retries so a broken store surfaces as an
    * error, not a spin. */
  def commit(spark: SparkSession, manifest: DataFrame,
             manifestRoot: String, tag: Option[String] = None,
             markers: Seq[String] = Seq.empty,
             contentFiles: Seq[(String, String)] = Seq.empty): Int =
    commitStaged(spark, manifest, manifestRoot, tag, delta = false, markers,
      contentFiles)

  /** Shared staging + CAS-rename loop behind [[commit]] (full manifests)
    * and [[commitDelta]] (log-structured commits). A delta version carries
    * an underscore-prefixed `_delta` marker file inside the staged dir, so
    * the marker becomes visible in the same atomic rename as the content —
    * a version is never observable in a half-classified state. */
  private def commitStaged(spark: SparkSession, content: DataFrame,
                           manifestRoot: String, tag: Option[String],
                           delta: Boolean,
                           markers: Seq[String] = Seq.empty,
                           contentFiles: Seq[(String, String)] = Seq.empty)
      : Int = {
    val fs = hfs(spark, manifestRoot)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$manifestRoot/.tmp_${java.util.UUID.randomUUID()}")
    // DRIVER-SIDE manifest write when the content is cache-bounded and
    // simply-typed: a manifest is file-count-bounded planner metadata
    // (the Delta commit-log shape — Delta writes its JSON commit from the
    // driver too), and paying a full Spark write job per commit was the
    // single largest fixed cost of every DML version commit. The collected
    // rows double as the new version's manifest-cache entry, so the first
    // post-commit read costs no job either. Oversized or exotically-typed
    // manifests keep the distributed write.
    val localRows = stageManifestLocal(spark, content, tmp)
    if (localRows.isEmpty)
      content.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // the txn tag travels INSIDE the staged dir: tag and manifest become
    // visible in the same atomic rename — no window where the version
    // exists untagged (underscore-prefixed, so parquet readers skip it)
    tag.foreach { t =>
      fs.create(new org.apache.hadoop.fs.Path(tmp, s"_txn_$t"), true).close()
    }
    if (delta)
      fs.create(new org.apache.hadoop.fs.Path(tmp, DeltaMarker), true).close()
    // the commit TIMESTAMP rides the same atomic rename (the Delta
    // in-commit-timestamp model): stamped strictly after the latest
    // existing stamp so single-writer logs resolve `AS OF <timestamp>`
    // unambiguously even when two commits land within one clock tick.
    // (Racing writers can still interleave stamps out of version order —
    // resolution is max-version-at-or-below-timestamp, matching Delta.)
    val ts = math.max(System.currentTimeMillis(),
      latestCommitTs(spark, manifestRoot) + 1)
    fs.create(new org.apache.hadoop.fs.Path(tmp, s"$TsPrefix$ts"), true).close()
    markers.foreach { m =>
      require(m.startsWith("_"), s"marker must be underscore-prefixed: $m")
      fs.create(new org.apache.hadoop.fs.Path(tmp, m), true).close()
    }
    // CONTENT-bearing markers (e.g. the declared schema JSON, which does
    // not fit a filename): written inside the staged dir, so content and
    // manifest become visible in the same atomic rename like every other
    // marker
    contentFiles.foreach { case (name, body) =>
      require(name.startsWith("_"),
        s"content marker must be underscore-prefixed: $name")
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, name), true)
      out.write(body.getBytes("UTF-8")); out.close()
    }
    // write-write conflict with an in-flight cross-table transaction:
    // committing past an unresolved stage would silently bury it when
    // its txn commits — refuse loudly; the txn owner resolves first.
    require(!tailUnresolved(spark, manifestRoot),
      s"$manifestRoot head is an unresolved cross-table transaction " +
        "stage — concurrent write refused (commit or abort the " +
        "transaction first)")
    var next = versions(spark, manifestRoot).lastOption.getOrElse(0) + 1
    var attempts = 0
    while (attempts < 100) {
      attempts += 1
      // tailUnresolved was checked once BEFORE the loop — a concurrent
      // txn stage can take a version slot between that check and any
      // rename attempt here (lost CAS or stale versions() read), and
      // landing our manifest past it would silently bury the staged
      // content when its txn commits. Pending stages are tail-only, so
      // re-checking the slot directly below the one we are about to take
      // closes every such path.
      require(next <= 1 ||
        !unresolvedStage(spark, manifestRoot, next - 1),
        s"$manifestRoot v=${next - 1} is an unresolved cross-table " +
          "transaction stage that landed mid-commit — concurrent write " +
          "refused (commit or abort the transaction first)")
      val dest = new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$next")
      if (fs.exists(dest)) next += 1 // lost before trying: take the next slot
      else if (fs.rename(tmp, dest)) {
        // some local FSes "succeed" a rename onto an existing dir by moving
        // the source INSIDE it — that is a lost race, not a commit: undo
        // the nesting and retry at the next version
        val nested = new org.apache.hadoop.fs.Path(dest, tmp.getName)
        if (fs.exists(nested)) {
          require(fs.rename(nested, tmp), s"un-nest failed: $nested")
          next += 1
        } else {
          // a commit landing at v=1 is a root BEGINNING — fresh, or
          // re-created at a path whose old life left memoized property
          // maps behind (version numbers restart, so stale (root, v)
          // entries would otherwise be served): drop them here, where
          // every initialization path converges, not only in the SQL
          // registry
          if (next == 1) invalidateProperties(manifestRoot)
          // the rows staged driver-side ARE the committed version's raw
          // parquet content — warm the manifest cache so the first
          // post-commit planner read is job-free (after the v=1
          // invalidation above, never before it)
          localRows.foreach { case (schema, rows) =>
            // asNullable: lit()-built staging columns are non-nullable but
            // a fresh parquet read of the committed version serves an
            // all-nullable schema — cached and uncached readers of one
            // version must observe the identical schema
            val relaxed = StructType(schema.fields.map(_.copy(nullable = true)))
            manifestCache.synchronized(
              manifestCachePut((manifestRoot, next), (relaxed, rows)))
          }
          return next
        }
      } else next += 1 // rename refused: another writer took v=N
    }
    throw new IllegalStateException(
      s"version commit gave up after $attempts attempts under $manifestRoot")
  }

  /** The version whose commit carried `tag`, if any — the idempotence
    * lookup for exactly-once writers (the Delta txnAppId/txnVersion
    * contract re-expressed on the version log): an at-least-once appender
    * tags each commit with its batch id, and a replay that finds the tag
    * already committed skips the append instead of double-writing. Driver
    * work is one existence probe per version — version-count-bounded,
    * like every other planner read here. */
  def versionForTag(spark: SparkSession, manifestRoot: String,
                    tag: String): Option[Int] = {
    val fs = hfs(spark, manifestRoot)
    versions(spark, manifestRoot).find { v =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v/_txn_$tag"))
    }
  }

  /** The wall-clock commit stamp (epoch millis) of `version`, if stamped —
    * the `_ts_<millis>` marker that rode the commit's atomic rename.
    * Versions committed before timestamping existed return None and are
    * invisible to timestamp resolution. One listing per call —
    * version-count-bounded planner work. */
  def commitTimestamp(spark: SparkSession, manifestRoot: String,
                      version: Int): Option[Long] = {
    val fs = hfs(spark, manifestRoot)
    val dir = new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$version")
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collectFirst { case n if n.startsWith(TsPrefix) =>
        n.stripPrefix(TsPrefix).toLong }
  }

  private def latestCommitTs(spark: SparkSession, manifestRoot: String): Long =
    versions(spark, manifestRoot)
      .flatMap(commitTimestamp(spark, manifestRoot, _))
      .maxOption.getOrElse(0L)

  /** `AS OF <timestamp>` resolution: the LAST committed version whose stamp
    * is at or below `tsMillis` (the Delta/Iceberg timestamp-travel
    * contract). Rejects a timestamp earlier than every stamped commit —
    * "before the table existed" must be an error, not an empty table. Pass
    * the result to [[manifestAt]]/[[tableAt]]/[[readAt]]; timestamp travel
    * is a resolution step, not a second read path. */
  def versionAtTimestamp(spark: SparkSession, manifestRoot: String,
                         tsMillis: Long): Int = {
    val stamped = versions(spark, manifestRoot)
      .flatMap(v => commitTimestamp(spark, manifestRoot, v).map(v -> _))
    require(stamped.nonEmpty, s"no timestamped versions under $manifestRoot")
    val atOrBefore = stamped.filter(_._2 <= tsMillis)
    require(atOrBefore.nonEmpty,
      s"timestamp $tsMillis predates the first commit " +
        s"(${stamped.map(_._2).min}) under $manifestRoot")
    atOrBefore.map(_._1).max
  }

  /** True when `v=N` is a log-structured delta commit (adds/removes) rather
    * than a full manifest — classified by the `_delta` marker that rode the
    * commit's atomic rename. */
  def isDelta(spark: SparkSession, manifestRoot: String, version: Int): Boolean =
    hfs(spark, manifestRoot).exists(new org.apache.hadoop.fs.Path(
      s"$manifestRoot/v=$version/$DeltaMarker"))

  /** LOG-STRUCTURED COMMIT — the Delta-log model: instead of writing the
    * whole manifest every commit (O(table files) write volume, which a
    * frequent writer on a wide table cannot afford), commit only the CHANGE:
    * `adds` as manifest rows (an add for a file already in the table is an
    * UPSERT — how a MoR delete re-points a `dv` without touching the rest)
    * and `removes` as bare file names. Readers reconstruct any version by
    * folding deltas over the nearest full manifest or [[writeCheckpoint]]
    * at or below it — transparently, inside [[manifestAt]], so time travel,
    * CDC, pruning, and vacuum all work unchanged over delta commits.
    *
    * Scale shape: commit cost is O(commit delta) in both write volume and
    * planner work — the previous manifest is never read. Read-side fold
    * cost is bounded by checkpoint cadence (every K commits a checkpoint
    * re-bases the log), the same amortization Delta's `_last_checkpoint`
    * buys. A fresh root must start with a FULL commit (or carry a
    * checkpoint): a delta chain with no base is unreadable by construction
    * and [[manifestAt]] rejects it. */
  def commitDelta(spark: SparkSession, manifestRoot: String,
                  adds: Option[DataFrame], removes: Seq[String] = Seq.empty,
                  tag: Option[String] = None): Int = {
    require(adds.nonEmpty || removes.nonEmpty, "empty delta commit")
    import spark.implicits._
    val addRows = adds.map(a =>
      Dv.ensureDv(a).withColumn(ActionCol, lit("add")))
    val removeRows =
      if (removes.isEmpty) None
      else Some(removes.toDF("file").withColumn(ActionCol, lit("remove")))
    val delta = (addRows.toSeq ++ removeRows.toSeq)
      .reduce(_.unionByName(_, allowMissingColumns = true))
    commitStaged(spark, delta, manifestRoot, tag, delta = true)
  }

  /** Checkpoint versions present under the root, ascending. A checkpoint
    * `ckpt=N` is the MATERIALIZED full manifest of version N — a derived
    * cache object, not a commit: writing one never creates a version, and
    * any reader folding to a version ≥ N may start from it instead of
    * walking the delta chain below. */
  def checkpoints(spark: SparkSession, manifestRoot: String): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(manifestRoot)
    val fs = hfs(spark, manifestRoot)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case CkptDir(n) => Some(n.toInt)
          case _ => None
        }
    }.flatten.sorted
  }

  /** Materialize the full manifest of `version` as `ckpt=version`.
    * Idempotent and race-safe without coordination: the content is a pure
    * function of the (immutable) log prefix, so two writers racing to the
    * same checkpoint stage identical bytes and the rename loser simply
    * discards its copy. */
  def writeCheckpoint(spark: SparkSession, manifestRoot: String,
                      version: Int): Unit = {
    val fs = hfs(spark, manifestRoot)
    val dest = new org.apache.hadoop.fs.Path(s"$manifestRoot/ckpt=$version")
    if (fs.exists(dest)) return
    val tmp = new org.apache.hadoop.fs.Path(
      s"$manifestRoot/.tmp_${java.util.UUID.randomUUID()}")
    val folded = manifestAt(spark, manifestRoot, version)
    if (stageManifestLocal(spark, folded, tmp).isEmpty)
      folded.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, dest)) fs.delete(tmp, true) // lost a benign race
    else {
      val nested = new org.apache.hadoop.fs.Path(dest, tmp.getName)
      if (fs.exists(nested)) fs.delete(nested, true) // local-FS rename-into
    }
  }

  /** How [[manifestAt]] would reconstruct `version`: the base it folds from
    * (a full version or a checkpoint) and how many delta commits sit on
    * top. The gate-visible evidence that checkpoints actually re-base the
    * log (`deltasFolded` drops back to the post-checkpoint tail). */
  // ------------------------------------------------------------------
  // MANIFEST CACHE — a committed version dir is IMMUTABLE (the CAS rename
  // is the last write a v-dir ever sees), so the collected manifest rows
  // of a (root, version) — and the delta FOLD over an explicit visible
  // version set — can be served from driver memory instead of re-running
  // a parquet scan job per planner read. This is the Delta/Iceberg
  // snapshot-state cache re-expressed on the version log: every DML
  // query reads its table's manifest dozens of times (touch-set
  // planning, gates, change feeds, stream admission), and each read was
  // a full Spark job (schema inference + scan + collect + a broadcast
  // hadoop-conf per job). Bounded two ways: an entry larger than
  // [[manifestCacheMaxRows]] rows is never cached (a 100 TB table's
  // manifest stays a distributed read; the cap is env-tunable), and the
  // map is LRU past 1024 entries. Invalidation: root re-creation
  // ([[invalidateProperties]], already hooked at every v=1 commit and
  // SQL re-registration), [[vacuum]] (drops version dirs), plus a
  // per-serve existence probe so a DROPped-but-not-recreated root fails
  // exactly like the uncached read did.
  // ------------------------------------------------------------------

  private[graft] val manifestCacheMaxRows: Int =
    sys.env.get("SPARK_GRAFT_MANIFEST_CACHE_ROWS").map { v =>
      try v.trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_MANIFEST_CACHE_ROWS must be an integer, got '$v'")
      }
    }.getOrElse(65536)

  // SINGLE-WRITER-JVM TRUST MODEL (shared with propsCache/schemaMemo/
  // txnVisMemo): invalidation is in-process. The per-serve dir-existence
  // probe catches a DROP/vacuum from any process, but a SECOND process
  // that re-creates the same root (version numbers restart) could be
  // served the old life's rows once its new log reaches a cached version
  // number. Delta's DeltaLog snapshot cache makes the same assumption;
  // coordinating writers across JVMs is the catalog's job, not this
  // cache's.
  private val manifestCache =
    new java.util.LinkedHashMap[Product, (StructType, Array[Row])](
        16, 0.75f, true)

  // Aggregate row budget across all cached entries: per-entry row caps
  // alone let 1024 × 65536-row wide-stats manifests pin multi-GB of
  // driver memory. Eviction is LRU until both bounds hold.
  private val manifestCacheMaxTotalRows: Long =
    sys.env.get("SPARK_GRAFT_MANIFEST_CACHE_TOTAL_ROWS").map(_.trim.toLong)
      .getOrElse(1L << 22)
  private var manifestCacheTotalRows: Long = 0L

  // callers hold manifestCache's monitor
  private def manifestCachePut(key: Product,
                               value: (StructType, Array[Row])): Unit = {
    Option(manifestCache.put(key, value))
      .foreach(old => manifestCacheTotalRows -= old._2.length)
    manifestCacheTotalRows += value._2.length
    val it = manifestCache.entrySet().iterator()
    while ((manifestCache.size() > 1024 ||
        manifestCacheTotalRows > manifestCacheMaxTotalRows) && it.hasNext) {
      val e = it.next()
      if (e.getKey != key) { // never evict the entry just added
        manifestCacheTotalRows -= e.getValue._2.length
        it.remove()
      }
    }
  }

  // Pre-collect byte gate: the fill must be ONE straight collect() job.
  // r18 filled with limit(cap+1).collect(), and CollectLimitExec runs
  // executeTake's incremental partition waves (1 partition, then 4×
  // more …) — SEVERAL jobs per miss, which is what the read-once version
  // walks (q111_time_travel ×0.60, q114_version_changes ×0.67 in the r18
  // driver bench) paid for nothing. Instead the on-disk size of the
  // manifest's input dirs decides cacheability up front (file-count-
  // bounded listing, same cost class as the per-serve existence probe);
  // a 100 TB table's manifest stays a distributed read.
  private[graft] val manifestCacheMaxBytes: Long =
    sys.env.get("SPARK_GRAFT_MANIFEST_CACHE_BYTES").map(_.trim.toLong)
      .getOrElse(16L << 20)

  private[graft] def clearManifestCache(manifestRoot: String): Unit =
    manifestCache.synchronized {
      val it = manifestCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.productElement(0) == manifestRoot) {
          manifestCacheTotalRows -= e.getValue._2.length
          it.remove()
        }
      }
    }

  /** Stage `content` into `tmpDir` as ONE parquet part file written from
    * the DRIVER (parquet-mr Group writer — no Spark job), when every
    * column is a simple primitive and the row count is cache-bounded.
    * Returns the (schema, rows) staged so the committer can warm the
    * manifest cache, or None when the caller must fall back to the
    * distributed write. Types written match Spark's own parquet writer
    * for these primitives (BINARY+STRING / INT64 / INT32 / DOUBLE /
    * FLOAT / BOOLEAN, all optional), so a reader cannot tell the two
    * staging paths apart. */
  private def stageManifestLocal(spark: SparkSession, content: DataFrame,
                                 tmpDir: org.apache.hadoop.fs.Path)
      : Option[(StructType, Array[Row])] = {
    import org.apache.spark.sql.types._
    val schema = content.schema
    val simple = schema.fields.forall(_.dataType match {
      case StringType | LongType | IntegerType | DoubleType | FloatType |
           BooleanType => true
      case _ => false
    })
    if (!simple || schema.isEmpty) return None
    // only when the OPTIMIZED plan is local-composed (LocalRelation leaves
    // under Union/Project/Filter — the shape cached manifests and footer
    // manifest builds produce): collecting it is a driver-side or
    // trivially-small job. A distributed content plan (scan-fallback stats
    // build, un-cached fold) keeps the parallel write — collecting it
    // first would serialize the computation through one partition.
    def localOnly(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean = p match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
        u.children.forall(localOnly)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        localOnly(pr.child)
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        localOnly(f.child)
      case _ => false
    }
    if (!localOnly(content.queryExecution.optimizedPlan)) return None
    val rows =
      try content.limit(manifestCacheMaxRows + 1).collect()
      catch { case scala.util.control.NonFatal(_) => return None }
    if (rows.length > manifestCacheMaxRows) return None
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types => PTypes}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val builder = PTypes.buildMessage()
    schema.fields.foreach { f =>
      val leaf = f.dataType match {
        case StringType =>
          PTypes.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case LongType => PTypes.optional(INT64)
        case IntegerType => PTypes.optional(INT32)
        case DoubleType => PTypes.optional(DOUBLE)
        case FloatType => PTypes.optional(FLOAT)
        case BooleanType => PTypes.optional(BOOLEAN)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      builder.addField(leaf.named(f.name))
    }
    val msg = builder.named("spark_schema")
    val conf = spark.sparkContext.hadoopConfiguration
    val file = new org.apache.hadoop.fs.Path(tmpDir,
      s"part-00000-${java.util.UUID.randomUUID()}.snappy.parquet")
    hfs(spark, tmpDir.toString).mkdirs(tmpDir)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(file, conf))
      .withType(msg)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { r =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(msg)
      var i = 0
      while (i < schema.length) {
        if (!r.isNullAt(i)) schema(i).dataType match {
          case StringType => g.add(i, r.getString(i))
          case LongType => g.add(i, r.getLong(i))
          case IntegerType => g.add(i, r.getInt(i))
          case DoubleType => g.add(i, r.getDouble(i))
          case FloatType => g.add(i, r.getFloat(i))
          case BooleanType => g.add(i, r.getBoolean(i))
          case _ => ()
        }
        i += 1
      }
      writer.write(g)
    } finally writer.close()
    Some((schema, rows))
  }

  /** Serve `build`'s rows from the cache under `key`, populating it on
    * miss with ONE straight collect job (pre-gated by the on-disk bytes
    * of `probeDir` + `inputDirs`) — or pass `build` through untouched
    * when the inputs are too large to cache or `probeDir` no longer
    * exists. */
  private def cachedManifestDf(spark: SparkSession, key: Product,
                               probeDir: String,
                               inputDirs: Seq[String] = Seq.empty)
                              (build: => DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    val fs = hfs(spark, probeDir)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(probeDir))
    if (exists)
      manifestCache.synchronized(Option(manifestCache.get(key))).foreach {
        case (schema, rows) =>
          return spark.createDataFrame(rows.toSeq.asJava, schema)
      }
    val df = build
    if (!exists) return df // let build's own missing-dir semantics apply
    val bytes =
      try (probeDir +: inputDirs).distinct.map { d =>
        fs.listStatus(new org.apache.hadoop.fs.Path(d)).toSeq
          .filter(_.isFile).map(_.getLen).sum
      }.sum
      catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    if (bytes > manifestCacheMaxBytes) return df
    val rows = df.collect()
    if (rows.length > manifestCacheMaxRows) df
    else {
      manifestCache.synchronized(
        manifestCachePut(key, (df.schema, rows)))
      spark.createDataFrame(rows.toSeq.asJava, df.schema)
    }
  }

  /** `localCheckpoint()` unless the frame is already driver-local (a
    * cached manifest serve folds to a LocalRelation): checkpointing local
    * rows pays a Spark job + a partition copy for rows that already sit
    * in driver memory, and both forms are equally immutable pins. The
    * DML planners pin every manifest before the commit starts moving the
    * table under it — this keeps that pin while making it job-free on
    * the cache-hit path. */
  private[graft] def pinLocal(df: DataFrame): DataFrame =
    df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => df
      case _ => df.localCheckpoint()
    }

  /** Row count without a Spark job when the frame is driver-local (the
    * manifest `count()`s every DML planner opens with). */
  private[graft] def localCount(df: DataFrame): Long =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.length.toLong
      case _ => df.count()
    }

  /** Σ of a non-null long column without a Spark job when the frame is
    * driver-local (footer-built manifests are LocalRelations). */
  private[graft] def localLongSum(df: DataFrame, c: String): Long = {
    val proj = df.select(col(c))
    proj.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        var s = 0L
        l.data.foreach(r => if (!r.isNullAt(0)) s += r.getLong(0))
        s
      case _ =>
        val r = proj.agg(sum(col(c))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
    }
  }

  final case class FoldInfo(base: Int, baseIsCheckpoint: Boolean,
                            deltasFolded: Int)

  def foldInfo(spark: SparkSession, manifestRoot: String,
               version: Int): FoldInfo = {
    // visible versions only: an ABORTED txn stage occupies a version slot
    // with a full manifest that was never table history — choosing it as
    // the fold base (or counting it in the delta tail) would serve the
    // aborted content to every read of a later delta commit
    val vs = visibleVersions(spark, manifestRoot).filter(_ <= version)
    require(vs.contains(version), s"version $version not committed")
    val fulls = vs.filterNot(isDelta(spark, manifestRoot, _))
    val ckpts = checkpoints(spark, manifestRoot).filter(_ <= version)
    require(fulls.nonEmpty || ckpts.nonEmpty,
      s"version $version is an unreadable delta chain: no full manifest or " +
        s"checkpoint at or below it under $manifestRoot — a fresh root must " +
        "start with a full commit")
    val base = (fulls ++ ckpts).max
    FoldInfo(base, baseIsCheckpoint = !fulls.contains(base),
      vs.count(v => v > base))
  }

  /** The manifest of `version`. A full commit reads directly; a delta
    * commit folds: nearest base (full version or checkpoint) ≤ N, then
    * last-action-wins per file across the delta tail — an `add` upserts
    * the file's row, a `remove` drops it. Sound because data files are
    * immutable and never re-added under the same name after a remove. All
    * inputs are file-count-bounded manifests; the fold is one window over
    * their union. */
  def manifestAt(spark: SparkSession, manifestRoot: String,
                 version: Int): DataFrame = {
    // TXN VISIBILITY for pinned reads: a version staged by an unresolved
    // or aborted cross-table txn is not table history — an explicit
    // `VERSION AS OF` of it must refuse loudly, not leak pre-publish (or
    // never-published) content
    require(txnVisible(spark, manifestRoot, version),
      s"version $version of $manifestRoot is a cross-table transaction " +
        "stage that is not (or never became) visible — reads serve only " +
        "committed history")
    if (!isDelta(spark, manifestRoot, version))
      return cachedManifestDf(spark, (manifestRoot, version),
        s"$manifestRoot/v=$version")(
        spark.read.parquet(s"$manifestRoot/v=$version"))
    val info = foldInfo(spark, manifestRoot, version)
    val deltaVs = visibleVersions(spark, manifestRoot)
      .filter(v => v > info.base && v <= version)
    // the fold is keyed on its COMPLETE input set (base + visible delta
    // versions): visibility changes (a txn stage resolving) change the
    // set and therefore the key, so a cached fold can never serve a
    // different-visibility answer
    cachedManifestDf(spark,
      (manifestRoot, version, info.base, info.baseIsCheckpoint,
        deltaVs.toList),
      s"$manifestRoot/v=$version",
      inputDirs = (if (info.baseIsCheckpoint) s"$manifestRoot/ckpt=${info.base}"
        else s"$manifestRoot/v=${info.base}") +:
        deltaVs.map(v => s"$manifestRoot/v=$v")) {
      val baseDf = (if (info.baseIsCheckpoint)
          spark.read.parquet(s"$manifestRoot/ckpt=${info.base}")
        else cachedManifestDf(spark, (manifestRoot, info.base),
          s"$manifestRoot/v=${info.base}")(
          spark.read.parquet(s"$manifestRoot/v=${info.base}")))
        .withColumn(ActionCol, lit("add")).withColumn("_v", lit(info.base))
      val deltas = deltaVs
        .map(v => cachedManifestDf(spark, (manifestRoot, v),
          s"$manifestRoot/v=$v")(
          spark.read.parquet(s"$manifestRoot/v=$v"))
          .withColumn("_v", lit(v)))
      val all = (baseDf +: deltas)
        .reduce(_.unionByName(_, allowMissingColumns = true))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("file").orderBy(col("_v").desc)
      all.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1 && col(ActionCol) === "add")
        .drop(ActionCol, "_v", "_rn")
    }
  }

  /** The complete table as of `version`: exactly the files that version's
    * manifest references (the snapshot read — later deletes/appends are
    * invisible because their files are not in this manifest). Schemas are
    * MERGED across the version's files (footer union — file-count-bounded
    * planner work), so a version that mixes pre- and post-evolution files
    * serves the superset schema with nulls for the rows that predate a
    * column, while a version pinned before the evolution never shows the
    * column at all — schema evolution rides the same snapshot mechanics
    * as data DML, no rewrite. */
  def tableAt(spark: SparkSession, manifestRoot: String,
              version: Int): DataFrame = {
    val entries = Dv.entries(manifestAt(spark, manifestRoot, version))
    if (entries.nonEmpty)
      Dv.readLive(spark, entries, declaredAt(spark, manifestRoot, version))
    else {
      // EMPTY version — reachable once a covering DELETE can drop every
      // file, or from birth via CREATE TABLE ([[createEmptyTable]]). The
      // manifest stores stats, not schema, so serve a zero-row frame with
      // the schema of the nearest EARLIER non-empty version (its files
      // are the last schema authority; limit(0) folds to an empty
      // LocalRelation — footers only, no data read). A declared-schema
      // table that has never held data serves its DECLARED schema (the
      // `graft.schema` table property CREATE TABLE commits); a table with
      // neither has no schema to serve and fails loudly.
      visibleVersions(spark, manifestRoot).filter(_ < version)
        .sorted.reverse.view
        .map(v => Dv.entries(manifestAt(spark, manifestRoot, v)))
        .find(_.nonEmpty) match {
        case Some(prior) =>
          Dv.readLive(spark, prior,
            declaredAt(spark, manifestRoot, version)).limit(0)
        case None =>
          val declared = declaredSchemaAt(spark, manifestRoot, version)
            .getOrElse(throw new IllegalStateException(
              s"version $version of $manifestRoot references no files, no " +
                "prior version does either, and no declared schema is " +
                "recorded — empty table with unknowable schema"))
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), declared)
      }
    }
  }

  /** [[Layout.prunedRead]] against a pinned version's manifest: stats-pruned
    * AND time-traveled in one plan. */
  def readAt(spark: SparkSession, manifestRoot: String, version: Int,
             ranges: Seq[(String, Double, Double)]): Layout.PrunedScan = {
    val m = manifestAt(spark, manifestRoot, version)
    val total = localCount(m)
    val hit = Dv.entries(m.filter(Layout.intersectsExpr(ranges)))
    val df =
      if (hit.isEmpty) tableAt(spark, manifestRoot, version).filter(lit(false))
      else Dv.readLive(spark, hit,
        declaredAt(spark, manifestRoot, version)).filter(Layout.inBoxExpr(ranges))
    Layout.PrunedScan(df, hit.size.toLong, total)
  }

  /** Targeted delete as a VERSION COMMIT: survivors of the manifest-
    * intersecting files are staged and moved in (same mechanics as
    * [[Layout.deleteWhere]]), then a new manifest version referencing
    * unaffected + survivor files is committed. The superseded files are
    * NOT deleted — prior versions still reference them, so time travel
    * keeps working until [[vacuum]] expires those versions. */
  def deleteWhere(spark: SparkSession, path: String, manifestRoot: String,
                  cols: Seq[String],
                  box: Seq[(String, Double, Double)]): Layout.DeleteResult =
    deleteWherePred(spark, path, manifestRoot, cols,
      Layout.intersectsExpr(box), Layout.inBoxExpr(box))

  /** [[deleteWhere]] generalized from the numeric box to an arbitrary
    * (prune, predicate) pair — the shape the SQL front door's TYPED
    * predicate compiler targets (string equality, date ranges, IN lists):
    * `prune` is a manifest-side expression over the `min_`/`max_` stats
    * columns that must select a SUPERSET of the files containing matching
    * rows (stats can only over-include; correctness never depends on
    * them), and `pred` is the exact row predicate deciding which rows die.
    * Same commit mechanics as the box form: touched files' LIVE rows are
    * read (DV-masked rows stay dead and the mask folds away), survivors
    * staged and moved in, vN+1 = (manifest − touched) ∪ survivor stats.
    *
    * `cover` is the optional WHOLE-FILE DROP proof (the retention-delete
    * fast path — at 100 TB a date-keyed `DELETE … WHERE d < cutoff` on a
    * date-clustered table should DROP the interior files metadata-only
    * and rewrite only the boundary): a manifest-side expression proving
    * every NON-null row of a file satisfies `pred`, plus the stats
    * columns whose null-freedom completes the proof (checked against the
    * parquet footers' null counts — file-count-bounded, no data read). A
    * file passing both proofs leaves the manifest without being opened:
    * its deleted-row count is served from the manifest `rows` column.
    * DV-masked files never whole-drop (their manifest stats include dead
    * rows the proof must not lean on) and take the rewrite as before;
    * files failing either proof likewise — the cover only ever REMOVES
    * work, never changes which rows die. */
  def deleteWherePred(spark: SparkSession, path: String, manifestRoot: String,
                      cols: Seq[String], prune: org.apache.spark.sql.Column,
                      pred: org.apache.spark.sql.Column,
                      cover: Option[(org.apache.spark.sql.Column, Seq[String])] = None)
      : Layout.DeleteResult = {
    val manifest =
      pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot,
        latestVersion(spark, manifestRoot))))
    val total = localCount(manifest)
    val hit = Dv.entries(manifest.filter(prune))
    if (hit.isEmpty) return Layout.DeleteResult(0, total, 0)
    val dropped = wholeFileDrops(spark, manifest, prune, cover)
    val rewrite = hit.filterNot(e => dropped.contains(e.file))
    // survivors come from the LIVE rows (existing deletion vectors
    // applied — a copy-on-write rewrite of a masked file must not
    // resurrect its masked rows); the rewrite also FOLDS the DV away: the
    // new files carry no mask
    if (rewrite.nonEmpty) {
      val live = Dv.readLive(spark, rewrite,
        declaredAt(spark, manifestRoot, latestVersion(spark, manifestRoot)))
      val staging = path + ".delete_staging"
      // survivors = NOT(pred), with null-match rows kept: a WHERE that
      // evaluates to null on a row must not delete it (SQL three-valued
      // logic — DELETE removes rows where the predicate is TRUE)
      live.filter(!coalesce(pred, lit(false)))
        .write.mode("overwrite").parquet(staging)
    }
    val moved =
      if (rewrite.isEmpty) Seq.empty[String]
      else Layout.moveStagedIn(spark, path + ".delete_staging", path)
    val keep = manifest.filter(!col("file").isInCollection(hit.map(_.file)))
    val survivorStats =
      if (moved.isEmpty) None
      else Some(Layout.buildManifestFor(spark, moved, cols))
    val next = survivorStats match {
      case None => keep
      case Some(s) => keep.unionByName(s, allowMissingColumns = true)
    }
    // deleted = live(rewrite set) − survivors, by ARITHMETIC, not a second
    // data scan: every live row is either pred-TRUE (deleted) or not
    // (written out), so the counts close the books. Live rows of an
    // UNMASKED file are its manifest `rows`; a DV-masked file's live count
    // needs its mask size, so that (rare post-purge) shape keeps the
    // counting scan. Survivor rows come from the new files' manifest stats
    // (footer reads — no job). This halves the data read of every
    // copy-on-write DELETE: one pass instead of count-then-rewrite.
    val deleted =
      if (rewrite.isEmpty) 0L
      else if (rewrite.forall(_.dv.isEmpty)) {
        val rewriteFiles = rewrite.map(_.file).toSet
        val liveRows = localLongSum(manifest
          .filter(col("file").isInCollection(rewriteFiles.toSeq)), "rows")
        val survivorRows =
          survivorStats.map(localLongSum(_, "rows")).getOrElse(0L)
        liveRows - survivorRows
      } else {
        val live = Dv.readLive(spark, rewrite,
          declaredAt(spark, manifestRoot, latestVersion(spark, manifestRoot)))
        live.filter(pred).count()
      }
    commit(spark, next, manifestRoot)
    Layout.DeleteResult(rewrite.size.toLong, total,
      deleted + dropped.values.sum, dropped.size.toLong)
  }

  final case class TruncateResult(version: Int, rowsDeleted: Long,
                                  filesDropped: Long)

  /** TRUNCATE — remove EVERY live row as one metadata-only commit: the
    * next version simply references no files. No predicate means no
    * coverage proof is needed (nulls included, every row dies), so
    * nothing is read or rewritten — sidecars are opened only to report
    * the live-row count (mask-size-bounded, never data). Dropped files
    * and their sidecars stay on disk for pinned readers until [[vacuum]];
    * reads of the empty version serve a zero-row frame with the prior
    * version's schema ([[tableAt]]), and later INSERTs refill normally. */
  def truncateCommit(spark: SparkSession, manifestRoot: String)
      : TruncateResult = {
    val m = pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot,
      latestVersion(spark, manifestRoot))))
    val files = localCount(m)
    if (files == 0)
      return TruncateResult(latestVersion(spark, manifestRoot), 0, 0)
    val phys = m.agg(sum(col("rows"))).head().getLong(0)
    // masked rows are already dead — subtract each touched sidecar's
    // entries for the files that still point at it
    val masked = Dv.entries(m).collect { case Dv.Entry(f, Some(d)) => (f, d) }
      .groupBy(_._2).toSeq.map { case (dvPath, group) =>
        spark.read.parquet(dvPath)
          .filter(col(Dv.FileCol).isInCollection(group.map(_._1)))
          .count()
      }.sum
    val v = commit(spark, m.filter(lit(false)), manifestRoot)
    TruncateResult(v, phys - masked, files)
  }

  final case class FsckResult(version: Int, filesMissing: Long,
                              filesTotal: Long, rowsLost: Long)

  /** FSCK — repair a table whose manifest references data files that no
    * longer exist on disk (an external delete, a crashed manual cleanup,
    * a partial restore): status-probe every manifest entry (driver-side,
    * file-count-bounded — the listing cost any planner already pays) and
    * commit a new HEAD referencing only the files still present. Pure
    * metadata: nothing is read or written besides the manifest. The lost
    * LIVE rows (manifest counts minus any deletion-vector masks on the
    * missing files) are reported as `rowsLost` so the caller knows the
    * blast radius before re-ingesting. Prior versions keep referencing
    * the missing files and stay broken if pinned — repair moves the HEAD
    * forward; history keeps the truth and [[vacuum]] eventually expires
    * it. `dryRun` runs the same probe and returns the would-be result
    * plus the missing-file list WITHOUT committing. */
  def fsckCommit(spark: SparkSession, manifestRoot: String,
                 dryRun: Boolean = false): (FsckResult, Seq[String]) = {
    val v = latestVersion(spark, manifestRoot)
    val m = pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot, v)))
    val total = localCount(m)
    val conf = spark.sparkContext.hadoopConfiguration
    val missing = m.select(col("file"), col("rows"), col("dv")).collect()
      .filterNot { r =>
        val p = new org.apache.hadoop.fs.Path(r.getString(0))
        p.getFileSystem(conf).exists(p)
      }
    if (missing.isEmpty) return (FsckResult(v, 0, total, 0), Seq.empty)
    val files = missing.map(_.getString(0)).toSeq
    val masked = missing.filter(!_.isNullAt(2)).map(r =>
      (r.getString(0), r.getString(2))).groupBy(_._2).toSeq
      .map { case (dvPath, group) =>
        spark.read.parquet(dvPath)
          .filter(col(Dv.FileCol).isInCollection(group.map(_._1).toSeq))
          .count()
      }.sum
    val lost = missing.map(_.getLong(1)).sum - masked
    if (dryRun)
      return (FsckResult(v, files.size.toLong, total, lost), files)
    val nv = commit(spark, m.filter(!col("file").isInCollection(files)),
      manifestRoot)
    (FsckResult(nv, files.size.toLong, total, lost), files)
  }

  /** The whole-file drop set for a DML touch set: manifest rows matching
    * `prune && cover`, unmasked (a DV'd file's stats include dead rows
    * the proof must not lean on), whose parquet footers prove the
    * cover's stats columns null-free — as file → row count (all live,
    * all provably matching, so the whole count is the file's deleted-row
    * contribution). See [[deleteWherePred]] for the proof contract. */
  private[sinks] def wholeFileDrops(spark: SparkSession, manifest: DataFrame,
                                    prune: org.apache.spark.sql.Column,
                                    cover: Option[(org.apache.spark.sql.Column, Seq[String])])
      : Map[String, Long] = cover match {
    case Some((cov, needCols)) =>
      val cand = manifest.filter(prune && cov && col("dv").isNull)
        .select(col("file"), col("rows")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val proven = Layout.nullFreeFiles(spark, cand.keys.toSeq, needCols)
      cand.view.filterKeys(proven).toMap
    case None => Map.empty
  }

  final case class UpdateResult(filesRewritten: Long, filesTotal: Long,
                                rowsUpdated: Long)

  /** Targeted UPDATE as a version commit — the Delta `UPDATE … WHERE`
    * shape completing the DML matrix next to [[deleteWhere]]/
    * [[mergeCommit]]: the touch set is the manifest-∩-box files (stats
    * pruning, never a table rewrite), their LIVE rows are rewritten with
    * `assignments` applied to in-box rows — every right-hand side
    * evaluates against the PRE-update row (one simultaneous projection,
    * never sequential column mutation, the SQL UPDATE contract) — rows
    * outside the box in touched files pass through unchanged, and
    * vN+1 = (manifest − touched) ∪ new-file stats. A DV-masked touched
    * file is rewritten from its live rows only (the mask folds away, no
    * resurrection). Superseded files stay for pinned readers until
    * [[vacuum]]. Stats columns MAY be assigned: the new files' manifest
    * stats are recomputed from the rewritten rows. */
  def updateWhere(spark: SparkSession, path: String, manifestRoot: String,
                  cols: Seq[String], box: Seq[(String, Double, Double)],
                  assignments: Map[String, org.apache.spark.sql.Column]): UpdateResult =
    updateWherePred(spark, path, manifestRoot, cols,
      Layout.intersectsExpr(box), Layout.inBoxExpr(box), assignments)

  /** [[updateWhere]] generalized to a (prune, predicate) pair — see
    * [[deleteWherePred]] for the contract: `prune` over-selects touched
    * files from manifest stats, `pred` is the exact row predicate gating
    * each assignment (null-predicate rows pass through unchanged, the SQL
    * three-valued UPDATE contract). */
  def updateWherePred(spark: SparkSession, path: String, manifestRoot: String,
                      cols: Seq[String], prune: org.apache.spark.sql.Column,
                      pred: org.apache.spark.sql.Column,
                      assignments: Map[String, org.apache.spark.sql.Column]): UpdateResult = {
    require(assignments.nonEmpty, "UPDATE with no assignments")
    val manifest =
      pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot,
        latestVersion(spark, manifestRoot))))
    val total = localCount(manifest)
    val hit = Dv.entries(manifest.filter(prune))
    if (hit.isEmpty) return UpdateResult(0, total, 0)
    val live = Dv.readLive(spark, hit,
      declaredAt(spark, manifestRoot, latestVersion(spark, manifestRoot)))
    val lower = assignments.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    val unknown = lower.keySet.diff(
      live.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
    require(unknown.isEmpty,
      s"UPDATE assigns unknown column(s) ${unknown.mkString(", ")} " +
        s"(table has ${live.columns.mkString(", ")})")
    val updated = live.filter(pred).count()
    val rewritten = live.select(live.columns.toIndexedSeq.map { c =>
      lower.get(c.toLowerCase(java.util.Locale.ROOT))
        .map(rhs => when(coalesce(pred, lit(false)), rhs).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*)
    val staging = path + ".update_staging_" + java.util.UUID.randomUUID()
    rewritten.write.mode("overwrite").parquet(staging)
    enforceStagedConstraints(spark, manifestRoot, staging)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val keep = manifest.filter(!col("file").isInCollection(hit.map(_.file)))
    val next = keep.unionByName(Layout.buildManifestFor(spark, moved, cols),
      allowMissingColumns = true)
    commit(spark, next, manifestRoot)
    UpdateResult(hit.size.toLong, total, updated)
  }

  final case class MoRUpdateResult(version: Int, filesMasked: Long,
                                   filesTotal: Long, rowsUpdated: Long,
                                   filesAppended: Long)

  /** MERGE-ON-READ targeted UPDATE — the write-heavy twin of
    * [[updateWherePred]] (the Delta DV-mode UPDATE shape): instead of
    * rewriting every touched file, ONE commit (a) masks the matched rows
    * via a deletion-vector sidecar and (b) appends ONLY their updated
    * versions as new z-ordered files. Cost tracks O(matched rows), never
    * O(touched-file bytes) — at 100 TB an UPDATE matching 1 % of the
    * rows in every file stops being a table rewrite. Assignments
    * evaluate against the PRE-update row in one simultaneous projection
    * (every row here matched, so no per-row `when` gate is needed);
    * unmatched rows in touched files are never rewritten. The staged
    * update files pass the same CHECK-constraint validation as every
    * other write path BEFORE the sidecar or manifest move anything;
    * files with no matched rows keep their existing mask pointer
    * untouched. `REORG … APPLY (PURGE)` repays the mask debt later. */
  def updateWhereMoRPred(spark: SparkSession, path: String,
                         manifestRoot: String, cols: Seq[String],
                         prune: org.apache.spark.sql.Column,
                         pred: org.apache.spark.sql.Column,
                         assignments: Map[String, org.apache.spark.sql.Column],
                         nFiles: Int): MoRUpdateResult = {
    require(assignments.nonEmpty, "UPDATE with no assignments")
    val v = latestVersion(spark, manifestRoot)
    val manifest = pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot, v)))
    val total = localCount(manifest)
    val hit = Dv.entries(manifest.filter(prune))
    if (hit.isEmpty) return MoRUpdateResult(v, 0, total, 0, 0)
    val live = Dv.readLiveWithPos(spark, hit,
      declaredAt(spark, manifestRoot, v))
    val dataCols = live.columns.toIndexedSeq
      .filterNot(c => c == "_dv_f" || c == "_dv_p")
    val lower = assignments.map { case (k, a) =>
      k.toLowerCase(java.util.Locale.ROOT) -> a }
    val unknown = lower.keySet.diff(
      dataCols.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
    require(unknown.isEmpty,
      s"UPDATE assigns unknown column(s) ${unknown.mkString(", ")} " +
        s"(table has ${dataCols.mkString(", ")})")
    // pin: the matched set feeds the count, the staged payload, AND the
    // sidecar — it must not recompute after the manifest starts moving
    val matched = live.filter(coalesce(pred, lit(false))).localCheckpoint()
    val rowsUpdated = matched.count()
    if (rowsUpdated == 0) return MoRUpdateResult(v, 0, total, 0, 0)
    // (b) the updated payload, staged and constraint-checked FIRST — a
    // violating update aborts before anything becomes visible
    val updatedRows = matched.select(dataCols.map(c =>
      lower.get(c.toLowerCase(java.util.Locale.ROOT))
        .map(_.as(c)).getOrElse(col(c))): _*)
    val staging = path + ".morupd_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(updatedRows, cols, staging, nFiles)
    enforceStagedConstraints(spark, manifestRoot, staging)
    val moved = Layout.moveStagedIn(spark, staging, path)
    // (a) mask exactly the matched rows' files; carried-forward prior
    // masks of THOSE files ride into the replacing sidecar
    val maskFiles = matched.select(col("_dv_f")).distinct()
      .collect().map(_.getString(0)).toSeq
    val freshMask = matched.select(col("_dv_f").as(Dv.FileCol),
      col("_dv_p").cast("long").as(Dv.PosCol))
    val prior = hit
      .collect { case Dv.Entry(f, Some(d)) if maskFiles.contains(f) => (f, d) }
      .groupBy(_._2).toSeq.map { case (dvPath, group) =>
        spark.read.parquet(dvPath)
          .filter(col(Dv.FileCol).isInCollection(group.map(_._1)))
      }
    val sidecar = Dv.writeSidecar(spark, path,
      (prior :+ freshMask).reduce(_.unionByName(_)))
    val next = manifest
      .withColumn("dv",
        when(col("file").isInCollection(maskFiles), lit(sidecar))
          .otherwise(col("dv")))
      .unionByName(Layout.buildManifestFor(spark, moved, cols),
        allowMissingColumns = true)
    MoRUpdateResult(commit(spark, next, manifestRoot),
      maskFiles.size.toLong, total, rowsUpdated, moved.size.toLong)
  }

  /** Z-ordered batch APPEND as a version commit — the versioned twin of
    * [[Layout.appendWithManifest]], closing the {append, delete, compact}
    * × versioned matrix. The batch is z-ordered by its own quantile bounds
    * and staged OUTSIDE the table dir, the staged part files are moved in,
    * and vN+1 = vN ∪ the new files' stats is committed; base files are
    * never touched or rescanned. Staging-then-move (rather than a direct
    * `mode("append")` write + listing diff) is what makes the append
    * ATOMIC under versioning: a crash before the commit leaves data files
    * that NO manifest references — invisible to every pinned read and
    * reclaimed by [[vacuum]] — instead of files a later listing diff would
    * silently adopt into someone else's commit. Returns (version,
    * appended file count). */
  def appendCommit(spark: SparkSession, batch: DataFrame, cols: Seq[String],
                   path: String, manifestRoot: String, nFiles: Int,
                   tag: Option[String] = None,
                   markers: Seq[String] = Seq.empty,
                   contentFiles: Seq[(String, String)] = Seq.empty)
      : (Int, Int) = {
    val prev =
      pinLocal(manifestAt(spark, manifestRoot,
        latestVersion(spark, manifestRoot)))
    val moved = stageDataFiles(spark, batch, cols, path, manifestRoot, nFiles)
    val next = prev.unionByName(Layout.buildManifestFor(spark, moved, cols),
      allowMissingColumns = true)
    (commit(spark, next, manifestRoot, tag, markers, contentFiles),
      moved.size)
  }

  /** Land `batch` into the table's DATA dir without committing any
    * manifest: z-ordered staging write, constraint enforcement, atomic
    * move-in. Returns the landed file paths. A crash after this leaves
    * only unreferenced files (invisible to every read, reclaimed by
    * [[vacuum]]) — the half every committing append shares, exposed for
    * optimistic transactions that defer the manifest commit. */
  private[graft] def stageDataFiles(spark: SparkSession, batch: DataFrame,
                                    cols: Seq[String], path: String,
                                    manifestRoot: String,
                                    nFiles: Int): Seq[String] = {
    val staging = path + ".append_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(batch, cols, staging, nFiles)
    enforceStagedConstraints(spark, manifestRoot, staging)
    Layout.moveStagedIn(spark, staging, path)
  }

  /** [[appendCommit]] in LOG-STRUCTURED form: the batch is staged and moved
    * in identically, but the commit is a [[commitDelta]] of ONLY the new
    * files' stats — the previous manifest is never read, so both planner
    * work and commit write volume are O(batch), independent of how many
    * files the table has accumulated. This is the shape a frequent
    * (streaming) writer needs: [[appendCommit]] re-writes an O(table-files)
    * manifest every trigger and re-reads it first.
    *
    * `checkpointEvery > 0` amortizes the read side: once the delta tail
    * since the last base (full version or checkpoint) reaches that many
    * commits, the just-committed version is checkpointed — an O(table)
    * materialization every K commits instead of per commit, after which
    * readers fold from the new checkpoint. */
  def appendCommitDelta(spark: SparkSession, batch: DataFrame,
                        cols: Seq[String], path: String, manifestRoot: String,
                        nFiles: Int, tag: Option[String] = None,
                        checkpointEvery: Int = 0): (Int, Int) = {
    val staging = path + ".append_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(batch, cols, staging, nFiles)
    enforceStagedConstraints(spark, manifestRoot, staging)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val v = commitDelta(spark, manifestRoot,
      Some(Layout.buildManifestFor(spark, moved, cols)), tag = tag)
    if (checkpointEvery > 0 &&
        foldInfo(spark, manifestRoot, v).deltasFolded >= checkpointEvery)
      writeCheckpoint(spark, manifestRoot, v)
    (v, moved.size)
  }

  /** REPLACE-table commit: the next version references ONLY the fresh
    * z-ordered batch — the whole previous content is superseded in one
    * atomic commit, while every pinned pre-replace version stays readable
    * until vacuum (the Delta `CREATE OR REPLACE` contract: replace is a
    * history event, not a wipe). Staging-then-move keeps the append-path
    * crash discipline: a crash pre-commit leaves only unreferenced files.
    * Returns (version, files written). */
  def replaceCommit(spark: SparkSession, df: DataFrame, cols: Seq[String],
                    path: String, manifestRoot: String,
                    nFiles: Int, tag: Option[String] = None): (Int, Int) = {
    val staging = path + ".replace_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(df, cols, staging, nFiles)
    val moved = Layout.moveStagedIn(spark, staging, path)
    (commit(spark, Layout.buildManifestFor(spark, moved, cols),
      manifestRoot, tag = tag), moved.size)
  }

  /** COMPACTION as a version commit: the latest snapshot's files are
    * rewritten into `nFiles` freshly z-ordered files (quantile sketch +
    * one range shuffle over exactly the referenced files — per-batch
    * appends degrade the global interleave over time; this restores it),
    * staged outside the table dir, moved in, and committed as a manifest
    * referencing ONLY the compacted files. The superseded inputs stay on
    * disk for older pinned readers and are reclaimed by [[vacuum]] once
    * their versions expire — compaction under versioning is a pure
    * re-layout, never a destructive swap (contrast
    * [[Maintenance]]'s flat-table compaction, which deletes its inputs).
    * Returns (version, input file count, output file count).
    *
    * `zorderCols` re-clusters on a DIFFERENT column set than the manifest
    * stats (the `OPTIMIZE … ZORDER BY (…)` statement): the interleave —
    * and therefore which files a range predicate can prune — follows the
    * named columns, while the manifest keeps stats for every `cols` column
    * so existing pruned-read paths stay valid (stats are sound bounds
    * under ANY row order; clustering only changes how TIGHT they are). */
  def compactCommit(spark: SparkSession, path: String, manifestRoot: String,
                    cols: Seq[String], nFiles: Int,
                    zorderCols: Option[Seq[String]] = None): (Int, Int, Int) = {
    val v = latestVersion(spark, manifestRoot)
    val entries = Dv.entries(manifestAt(spark, manifestRoot, v))
    val staging = path + ".compact_staging_" + java.util.UUID.randomUUID()
    // compaction reads LIVE rows: it is also the fold point for deletion
    // vectors — the rewritten files carry no mask, and the superseded
    // sidecars expire with the versions that referenced them
    Layout.zorderWrite(
      Dv.readLive(spark, entries, declaredAt(spark, manifestRoot, v)),
      zorderCols.getOrElse(cols), staging, nFiles)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val next = Layout.buildManifestFor(spark, moved, cols)
    (commit(spark, next, manifestRoot), entries.size, moved.size)
  }

  final case class CompactSmallResult(version: Int, filesCompacted: Long,
                                      filesSkipped: Long, filesOut: Long)

  /** SIZE-POLICY COMPACTION — the production `OPTIMIZE` shape: bin-pack
    * ONLY the files under `smallBytes` into `nFiles` fresh outputs and
    * leave already-healthy files byte-untouched, so the rewrite cost
    * tracks the SMALL-FILE DEBT, not table size (a full-rewrite
    * [[compactCommit]] on a 100 TB table is a 100 TB job; this is a
    * job over the tail the streaming appends actually fragmented).
    * Reads the small files' LIVE rows (masks fold away exactly as in
    * [[compactCommit]]); row-identical rewrite ⇒ invisible to the change
    * feed. Returns the latest version unchanged when fewer than two
    * small files exist (nothing to pack). File sizes come from the
    * filesystem — one status call per file, file-count-bounded planner
    * work like every manifest operation here. */
  def compactSmallCommit(spark: SparkSession, path: String,
                         manifestRoot: String, cols: Seq[String],
                         smallBytes: Long, nFiles: Int): CompactSmallResult = {
    val v = latestVersion(spark, manifestRoot)
    val entries = Dv.entries(manifestAt(spark, manifestRoot, v))
    val fs = hfs(spark, path)
    val (small, big) = entries.partition { e =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(e.file)).getLen < smallBytes
    }
    if (small.size < 2)
      return CompactSmallResult(v, 0, entries.size.toLong, 0)
    val staging = path + ".compact_small_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(
      Dv.readLive(spark, small, declaredAt(spark, manifestRoot, v)),
      cols, staging, nFiles)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val keep = manifestAt(spark, manifestRoot, v)
      .filter(col("file").isInCollection(big.map(_.file)))
    val next = keep.unionByName(Layout.buildManifestFor(spark, moved, cols),
      allowMissingColumns = true)
    CompactSmallResult(commit(spark, next, manifestRoot),
      small.size.toLong, big.size.toLong, moved.size.toLong)
  }

  final case class CompactScopedResult(version: Int, filesRewritten: Long,
                                       filesSkipped: Long, filesOut: Long)

  /** PREDICATE-SCOPED COMPACTION — the `OPTIMIZE <t> WHERE <cond>` shape
    * (Delta's partition-scoped OPTIMIZE, generalized from partition
    * predicates to the manifest's stats boxes): rewrite ONLY the files
    * whose [min,max] stats box intersects `scope`, leaving every other
    * file byte-untouched — so a daily re-layout over yesterday's ingest
    * scope costs yesterday's bytes, not the table's. The condition
    * selects FILES, never rows: the rewrite carries EVERY live row of a
    * selected file (rows outside the WHERE included, exactly Delta's
    * OPTIMIZE WHERE contract), so the statement is a pure re-layout —
    * logical contents identical, change feed empty. Selected files'
    * deletion vectors fold away in the rewrite ([[Dv.readLive]], as in
    * [[compactCommit]]); a SINGLE in-scope file still rewrites when it
    * carries a DV (folding is the point), otherwise <2 selected files is
    * a commit-free no-op. */
  def compactScopedCommit(spark: SparkSession, path: String,
                          manifestRoot: String, cols: Seq[String],
                          scope: Column, nFiles: Int,
                          zorderCols: Option[Seq[String]] = None): CompactScopedResult = {
    val v = latestVersion(spark, manifestRoot)
    val manifest = pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot, v)))
    val total = localCount(manifest)
    val selected = Dv.entries(manifest.filter(scope))
    if (selected.size < 2 && !selected.exists(_.dv.isDefined))
      return CompactScopedResult(v, 0, total, 0)
    val staging = path + ".compact_scoped_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(
      Dv.readLive(spark, selected, declaredAt(spark, manifestRoot, v)),
      zorderCols.getOrElse(cols), staging, nFiles)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val keep =
      manifest.filter(!col("file").isInCollection(selected.map(_.file)))
    val next = keep.unionByName(
      Layout.buildManifestFor(spark, moved, cols),
      allowMissingColumns = true)
    CompactScopedResult(commit(spark, next, manifestRoot),
      selected.size.toLong, total - selected.size, moved.size.toLong)
  }

  /** Manifest column marking a data file as belonging to a CLUSTERED
    * generation (the Delta liquid-clustering per-file tag shape): set
    * true on files written by [[clusterIncrementalCommit]]; every other
    * writer's rows join manifests without it (null ⇒ unclustered), so an
    * append/MERGE automatically queues its files for the next OPTIMIZE. */
  val ClusteredCol = "clustered"

  final case class ClusterResult(version: Int, filesReclustered: Long,
                                 filesPreserved: Long, filesOut: Long)

  /** INCREMENTAL CLUSTERING — the `OPTIMIZE` shape for a table with
    * clustering keys as a TABLE PROPERTY (the Databricks liquid-
    * clustering successor to static z-order): re-cluster ONLY the files
    * not already marked [[ClusteredCol]], leaving the clustered base
    * byte-untouched. Cost therefore tracks the UNCLUSTERED INCREMENT
    * (yesterday's appends), never table size — the property that makes a
    * daily OPTIMIZE affordable at 100 TB where a full re-layout is a
    * 100 TB job.
    *
    * A clustered file that has since acquired a deletion vector is
    * re-clustered too (the rewrite folds the mask away, as in
    * [[compactCommit]]). Output file count scales with the increment's
    * share of the table, so a small append produces a small rewrite.
    * Zero unclustered files ⇒ commit-free no-op. Clustering uses the
    * same z-order layout as [[Layout.zorderWrite]] — multi-key tight
    * stats boxes, pruning parity with the static path. */
  def clusterIncrementalCommit(spark: SparkSession, path: String,
                               manifestRoot: String, cols: Seq[String],
                               clusterCols: Seq[String],
                               nFiles: Int,
                               full: Boolean = false): ClusterResult = {
    require(clusterCols.nonEmpty, "incremental clustering needs keys")
    val v = latestVersion(spark, manifestRoot)
    val manifest0 = Dv.ensureDv(manifestAt(spark, manifestRoot, v))
    val manifest = pinLocal(
      if (manifest0.columns.contains(ClusteredCol)) manifest0
      else manifest0.withColumn(ClusteredCol, lit(null).cast("boolean")))
    val flagged = manifest
      .select(col("file"), col("dv"), col(ClusteredCol)).collect().toSeq
      .map(r => (Dv.Entry(r.getString(0), Option(r.getString(1))),
        !r.isNullAt(2) && r.getBoolean(2)))
    // `full` forces every live file into the rewrite set (OPTIMIZE FULL:
    // re-establish the incremental baseline after key changes)
    val (keep, rewrite) = flagged.partition { case (e, isClustered) =>
      !full && isClustered && e.dv.isEmpty
    }
    if (rewrite.isEmpty)
      return ClusterResult(v, 0, keep.size.toLong, 0)
    // increment-proportional output width: a 1-file append re-clusters
    // into ~1 file, a first-time OPTIMIZE into the table's full width
    val nOut = math.max(1, math.ceil(
      nFiles.toDouble * rewrite.size / flagged.size).toInt)
    val staging = path + ".cluster_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(
      Dv.readLive(spark, rewrite.map(_._1),
        declaredAt(spark, manifestRoot, v)),
      clusterCols, staging, nOut)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val keepM =
      if (keep.isEmpty) manifest.filter(lit(false))
      else manifest.filter(col("file").isInCollection(keep.map(_._1.file)))
    val next = keepM.unionByName(
      Layout.buildManifestFor(spark, moved, cols)
        .withColumn(ClusteredCol, lit(true)),
      allowMissingColumns = true)
    ClusterResult(commit(spark, next, manifestRoot),
      rewrite.size.toLong, keep.size.toLong, moved.size.toLong)
  }

  final case class MergeResult(version: Int, filesRewritten: Long,
                               filesTotal: Long, rowsUpdated: Long,
                               rowsInserted: Long)

  /** COPY-ON-WRITE MERGE (upsert) as a version commit — the Delta-style
    * `MERGE INTO t USING s ON t.key = s.key WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT *` shape, closing the {append, delete,
    * merge, compact} DML matrix over the version log. `key` must be one of
    * the manifest stats columns: the touch set is the files whose
    * `[min_key, max_key]` interval contains at least one source key, found
    * by joining the source's distinct keys against the BROADCAST manifest
    * (file-count-bounded — the join is keys × manifest, never keys ×
    * table). Touch-set completeness is what makes the not-matched
    * classification sound: any table row sharing a key with the source
    * lives in a file whose stats interval contains that key, so a source
    * row that matches nothing in the touched files matches nothing
    * anywhere. The rewrite is `(touched rows whose key is NOT in the
    * source) ∪ source` — matched rows take the source row wholesale,
    * unmatched source rows are inserts — z-ordered, staged outside the
    * table, moved in, and committed as vN+1 = (manifest − touched files) ∪
    * new-file stats. Superseded files stay for pinned readers (vacuum
    * reclaims them); the commit's change feed is therefore the old row
    * images as deletes plus updated+inserted rows as inserts, with
    * untouched cohabitants cancelling. */
  def mergeCommit(spark: SparkSession, source: DataFrame, key: String,
                  cols: Seq[String], path: String, manifestRoot: String,
                  nFiles: Int): MergeResult = {
    require(cols.contains(key),
      s"merge key $key needs manifest stats — not in ${cols.mkString(",")}")
    val manifest =
      pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot,
        latestVersion(spark, manifestRoot))))
    val total = localCount(manifest)
    val hit = source.select(col(key).cast("double").as("k")).distinct()
      .join(broadcast(manifest.select(col("file"),
          col(s"min_$key").cast("double").as("lo"),
          col(s"max_$key").cast("double").as("hi"))),
        col("k") >= col("lo") && col("k") <= col("hi"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq
    val srcKeys = source.select(col(key)).distinct()
    val (newData, updated, matchedSrc, srcTotal) =
      if (hit.isEmpty) (source, 0L, 0L, source.count())
      else {
        // live rows only: a merge rewriting a DV-masked file must not
        // resurrect its masked rows (the rewrite folds the mask away)
        val hitRows = Dv.readLive(spark,
          Dv.entries(manifest.filter(col("file").isInCollection(hit))),
          declaredAt(spark, manifestRoot, latestVersion(spark, manifestRoot)))
        // ONE aggregate job yields all three metric scalars (rows
        // updated = touched-target rows sharing a key with the source;
        // matched source rows; source total): per-key counts on each
        // side, full-outer joined — replaces three separate count jobs
        // (two of which re-scanned the touched files / the source)
        val hitCnt = hitRows.groupBy(col(key))
          .agg(count(lit(1)).as("_tc"))
        val srcCnt = source.groupBy(col(key))
          .agg(count(lit(1)).as("_sc"))
        val m = hitCnt.join(srcCnt, Seq(key), "full_outer").agg(
          sum(when(col("_sc").isNotNull, col("_tc"))).as("u"),
          sum(when(col("_tc").isNotNull, col("_sc"))).as("m"),
          sum(col("_sc")).as("t")).head()
        def at(i: Int) = if (m.isNullAt(i)) 0L else m.getLong(i)
        val survivors = hitRows.join(srcKeys, Seq(key), "left_anti")
        // allowMissingColumns = MERGE WITH SCHEMA EVOLUTION: a source
        // column the target lacks null-fills the survivors (and the
        // untouched files serve it as null through the footer-merge read,
        // the q118 mechanics); a target column absent from the source
        // null-fills the source rows
        (survivors.unionByName(source, allowMissingColumns = true),
          at(0), at(1), at(2))
      }
    val inserted = srcTotal - matchedSrc
    val staging = path + ".merge_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(newData, cols, staging, nFiles)
    enforceStagedConstraints(spark, manifestRoot, staging)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val keep =
      if (hit.isEmpty) manifest
      else manifest.filter(!col("file").isInCollection(hit))
    val next = keep.unionByName(Layout.buildManifestFor(spark, moved, cols),
      allowMissingColumns = true)
    MergeResult(commit(spark, next, manifestRoot), hit.size.toLong, total,
      updated, inserted)
  }

  final case class MergeFullResult(version: Int, filesRewritten: Long,
                                   filesTotal: Long, rowsUpdated: Long,
                                   rowsInserted: Long, rowsDeleted: Long)

  /** One `WHEN MATCHED` clause of the general MERGE matrix. Expressions
    * (conditions, assignment right-hand sides) evaluate over the joined
    * (target, source) pair: target columns under their own names, source
    * columns under the [[Snapshots.srcCol]] `_s_` prefix. `cond = None`
    * means unconditional. */
  sealed trait WhenMatched { def cond: Option[org.apache.spark.sql.Column] }
  /** `UPDATE SET col = expr, …` — unassigned target columns keep their
    * target value. */
  final case class MatchedUpdateSet(cond: Option[org.apache.spark.sql.Column],
                                    set: Map[String, org.apache.spark.sql.Column])
    extends WhenMatched
  /** `UPDATE SET *` — the source row replaces the target row by name. */
  final case class MatchedUpdateStar(cond: Option[org.apache.spark.sql.Column])
    extends WhenMatched
  /** `DELETE` — the matched target row is dropped. */
  final case class MatchedDelete(cond: Option[org.apache.spark.sql.Column])
    extends WhenMatched

  /** One `WHEN NOT MATCHED` clause: expressions evaluate over the SOURCE
    * row alone (plain source column names — there is no target side). */
  sealed trait WhenNotMatched { def cond: Option[org.apache.spark.sql.Column] }
  /** `INSERT *` — the source row inserts by name. */
  final case class InsertStar(cond: Option[org.apache.spark.sql.Column])
    extends WhenNotMatched
  /** `INSERT (cols) VALUES (exprs)` — unassigned target columns null. */
  final case class InsertValues(cond: Option[org.apache.spark.sql.Column],
                                values: Map[String, org.apache.spark.sql.Column])
    extends WhenNotMatched

  /** Source-column reference inside a [[WhenMatched]] expression — the
    * joined pair carries source columns under this prefix so `t.x` and
    * `s.x` stay distinguishable after the join. */
  def srcCol(name: String): org.apache.spark.sql.Column = col(s"_s_$name")

  /** One `WHEN NOT MATCHED BY SOURCE` clause: expressions evaluate over
    * the TARGET row alone (there is no source side — the row's key is
    * absent from the source). Because "key absent from the source" is a
    * predicate no file stats can prune, every clause must be SCOPED: the
    * caller passes the manifest-prune expression covering all clause
    * conditions (`bySourcePrune`), and each clause's `cond` must imply it
    * row-wise — the same 100 TB honesty contract as [[mergeCommitFull]]. */
  sealed trait WhenNotMatchedBySource {
    def cond: Option[org.apache.spark.sql.Column]
  }
  /** `UPDATE SET col = expr, …` over the target row (Delta's
    * sync-from-authoritative-feed "mark retired rows" clause). */
  final case class BySourceUpdateSet(cond: Option[org.apache.spark.sql.Column],
                                     set: Map[String, org.apache.spark.sql.Column])
    extends WhenNotMatchedBySource
  /** `DELETE` — the unmatched target row is dropped. */
  final case class BySourceDelete(cond: Option[org.apache.spark.sql.Column])
    extends WhenNotMatchedBySource

  /** The FULL MERGE clause matrix over a composite equi-key — explicit
    * `SET col = expr` assignments, conditional `WHEN MATCHED AND cond`
    * clauses (first applicable clause wins, the SQL MERGE contract),
    * matched DELETE, conditional/explicit inserts, any number of key
    * columns. Generalizes [[mergeCommit]] (which stays as the lean
    * star-clause fast path).
    *
    * Scale shape is unchanged from [[mergeCommit]]: the touch set is the
    * files whose per-key stats boxes admit at least one source key TUPLE
    * (distinct source tuples × BROADCAST manifest, file-count-bounded),
    * matched pairs come from ONE shuffle join of touched live rows ×
    * source on the composite key, and the clause cascade compiles to a
    * single codegen'd CASE projection — never a per-clause pass. The
    * rewrite is (unmatched touched rows) ∪ (clause-projected matched
    * rows minus deletes) ∪ (clause-projected unmatched source rows),
    * z-ordered, staged outside the table, committed as vN+1.
    *
    * Source keys must be UNIQUE on the composite key: a target row
    * matched by two source rows has no deterministic outcome (the SQL
    * cardinality-violation error, checked here with one count). */
  def mergeCommitClauses(spark: SparkSession, source: DataFrame,
                         keys: Seq[String], cols: Seq[String], path: String,
                         manifestRoot: String, nFiles: Int,
                         matched: Seq[WhenMatched],
                         notMatched: Seq[WhenNotMatched],
                         bySource: Seq[WhenNotMatchedBySource] = Seq.empty,
                         bySourcePrune: Option[org.apache.spark.sql.Column] = None,
                         targetSchemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : MergeFullResult = {
    require(keys.nonEmpty, "MERGE needs at least one key column")
    keys.foreach(k => require(cols.contains(k),
      s"merge key $k needs manifest stats — not in ${cols.mkString(",")}"))
    require(bySource.isEmpty || bySourcePrune.isDefined,
      "NOT MATCHED BY SOURCE clauses need a manifest-prune scope — " +
        "unscoped, 'rows whose key is absent from the source' touches " +
        "every file of the table")
    val dup = source.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"MERGE source has duplicate key tuples (e.g. ${dup.headOption}) — " +
        "a target row matched twice has no deterministic outcome")
    val manifest =
      pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot,
        latestVersion(spark, manifestRoot))))
    val total = localCount(manifest)
    // touch set: distinct source key tuples × broadcast manifest, file
    // hit iff the tuple sits inside the file's stats box on EVERY key
    val keyTuples = source.select(keys.map(k => col(k).as(s"_k_$k")): _*)
      .distinct()
    val keyHit = keyTuples
      .join(broadcast(manifest.select(col("file") +:
          keys.flatMap(k => Seq(col(s"min_$k"), col(s"max_$k"))): _*)),
        keys.map(k => col(s"_k_$k") >= col(s"min_$k") &&
          col(s"_k_$k") <= col(s"max_$k")).reduce(_ && _))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq
    // by-source clauses widen the touch set by their stats scope: a row
    // they may act on lives in a scope-hit file (pred ⊆ prune), so files
    // outside both hit sets are provably untouched
    val bsHit = bySourcePrune match {
      case Some(p) if bySource.nonEmpty =>
        manifest.filter(p).select(col("file"))
          .collect().map(_.getString(0)).toSeq
      case _ => Seq.empty[String]
    }
    val hit = (keyHit ++ bsHit).distinct
    val srcKeys = source.select(keys.map(col): _*).distinct()
    // the target schema: the caller's hint (the head VISIBLE schema in
    // physical names — carries declared-but-unmaterialized ADD COLUMN /
    // schema-evolution columns the raw files lack), else the read schema
    val rawHitRows =
      if (hit.isEmpty) None
      else Some(Dv.readLive(spark,
          Dv.entries(manifest.filter(col("file").isInCollection(hit))),
          declaredAt(spark, manifestRoot, latestVersion(spark, manifestRoot))))
    val targetSchema = targetSchemaHint.getOrElse(
      rawHitRows.map(_.schema).getOrElse(
        tableAt(spark, manifestRoot,
          latestVersion(spark, manifestRoot)).schema))
    // align touched rows to the target schema: declared columns the data
    // files don't carry yet serve as typed nulls (the footer-merge
    // null-fill, applied to the rewrite input)
    val hitRows = rawHitRows.map { rows =>
      targetSchema.fields.foldLeft(rows) { (df, f) =>
        if (df.columns.exists(_.equalsIgnoreCase(f.name))) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }.localCheckpoint()
    }
    val targetCols = targetSchema.fieldNames.toSeq
    // clause cascade → one integer action column: first applicable wins
    def actionOf(conds: Seq[Option[org.apache.spark.sql.Column]]) =
      conds.zipWithIndex.foldRight(lit(-1): org.apache.spark.sql.Column) {
        case ((c, i), els) => when(c.getOrElse(lit(true)), lit(i)).otherwise(els)
      }
    val delIdx = matched.zipWithIndex.collect {
      case (_: MatchedDelete, i) => i }
    val (matchedKept, updated, deleted, matchedSrcKeys) = hitRows match {
      case None => (None, 0L, 0L, srcKeys.limit(0))
      case Some(rows) =>
        val srcRenamed = source.select(
          source.columns.toIndexedSeq.map(c => col(c).as(s"_s_$c")): _*)
        val withAction = rows.join(srcRenamed,
            keys.map(k => col(k) === col(s"_s_$k")).reduce(_ && _), "inner")
          .withColumn("__action", actionOf(matched.map(_.cond)))
          .localCheckpoint()
        val isDel =
          if (delIdx.isEmpty) lit(false)
          else col("__action").isInCollection(delIdx)
        val counts = withAction.agg(
          sum(when(col("__action") >= 0 && !isDel, 1L).otherwise(0L)).as("upd"),
          sum(when(isDel, 1L).otherwise(0L)).as("del")).head()
        // projected matched rows: per target column, a CASE over the
        // action index picking that clause's value (codegen'd, one pass)
        val projected = withAction.filter(!isDel).select(targetCols.map { c =>
          matched.zipWithIndex.foldRight(col(c)) {
            case ((MatchedUpdateSet(_, set), i), els) =>
              set.get(c).map(v => when(col("__action") === i, v)
                .otherwise(els)).getOrElse(els)
            case ((MatchedUpdateStar(_), i), els) =>
              when(col("__action") === i, col(s"_s_$c")).otherwise(els)
            case ((_: MatchedDelete, _), els) => els
          }.as(c)
        }: _*)
        (Some(projected),
          if (counts.isNullAt(0)) 0L else counts.getLong(0),
          if (counts.isNullAt(1)) 0L else counts.getLong(1),
          withAction.select(keys.map(k => col(s"_s_$k").as(k)): _*).distinct())
    }
    // inserts: source rows whose key tuple matched no touched row —
    // complete because any table row sharing a tuple lives in a touched
    // file (the stats-interval argument, per key column)
    val unmatchedSrc = source.join(matchedSrcKeys, keys, "left_anti")
    val insActioned = unmatchedSrc
      .withColumn("__action", actionOf(notMatched.map(_.cond)))
      .filter(col("__action") >= 0)
      .localCheckpoint()
    val insRows = insActioned.select(targetCols.map { c =>
      val absent: org.apache.spark.sql.Column =
        lit(null).cast(targetSchema(c).dataType)
      notMatched.zipWithIndex.foldRight(absent) {
        case ((InsertStar(_), i), els) =>
          if (unmatchedSrc.columns.contains(c))
            when(col("__action") === i, col(c)).otherwise(els)
          else els
        case ((InsertValues(_, values), i), els) =>
          values.get(c).map(v => when(col("__action") === i, v)
            .otherwise(els)).getOrElse(els)
      }.as(c)
    }: _*)
    val inserted = insActioned.count()
    // unmatched touched target rows: by default they survive unchanged;
    // with BY SOURCE clauses they run their own cascade (same codegen'd
    // CASE shape as the matched side, over the bare target frame)
    val rawSurvivors = hitRows.map(_.join(srcKeys, keys, "left_anti"))
    val bsDelIdx = bySource.zipWithIndex.collect {
      case (_: BySourceDelete, i) => i }
    val (survivors, bsUpdated, bsDeleted) = rawSurvivors match {
      case Some(rows) if bySource.nonEmpty =>
        val withBs = rows
          .withColumn("__action", actionOf(bySource.map(_.cond)))
          .localCheckpoint()
        val isDel =
          if (bsDelIdx.isEmpty) lit(false)
          else col("__action").isInCollection(bsDelIdx)
        val counts = withBs.agg(
          sum(when(col("__action") >= 0 && !isDel, 1L).otherwise(0L)).as("upd"),
          sum(when(isDel, 1L).otherwise(0L)).as("del")).head()
        val projected = withBs.filter(!isDel).select(targetCols.map { c =>
          bySource.zipWithIndex.foldRight(col(c)) {
            case ((BySourceUpdateSet(_, set), i), els) =>
              set.get(c).map(v => when(col("__action") === i, v)
                .otherwise(els)).getOrElse(els)
            case ((_: BySourceDelete, _), els) => els
          }.as(c)
        }: _*)
        (Some(projected),
          if (counts.isNullAt(0)) 0L else counts.getLong(0),
          if (counts.isNullAt(1)) 0L else counts.getLong(1))
      case other => (other, 0L, 0L)
    }
    val pieces = survivors.toSeq ++ matchedKept.toSeq ++ Seq(insRows)
    val newData = pieces.reduce(
      _.unionByName(_, allowMissingColumns = true))
    val staging = path + ".merge_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(newData, cols, staging, nFiles)
    enforceStagedConstraints(spark, manifestRoot, staging)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val keep =
      if (hit.isEmpty) manifest
      else manifest.filter(!col("file").isInCollection(hit))
    val next = keep.unionByName(Layout.buildManifestFor(spark, moved, cols),
      allowMissingColumns = true)
    MergeFullResult(commit(spark, next, manifestRoot), hit.size.toLong,
      total, updated + bsUpdated, inserted, deleted + bsDeleted)
  }

  /** The COMPLETE three-clause MERGE matrix: WHEN MATCHED UPDATE (source
    * row replaces the target row), WHEN NOT MATCHED INSERT, and WHEN NOT
    * MATCHED BY SOURCE DELETE — the clause [[mergeCommit]] lacks, which is
    * what sync-from-authoritative-feed pipelines use to retire rows the
    * source stopped sending. The delete clause is SCOPED to `deleteBox`
    * (stats ranges): an unscoped not-matched-by-source delete must touch
    * every file of the table by definition — no stats can prune "rows
    * whose key is absent from the source" — so the API makes the
    * 100 TB-honest form (bound the clause to the slice the feed is
    * authoritative for, the Delta guidance for the same clause) the only
    * form. Touch set = key-range-hit files ∪ box-hit files; everything
    * else is untouched. Within the touch set, live rows matched by source
    * keys are replaced, unmatched rows inside the box are dropped, and
    * unmatched rows outside it survive the rewrite. */
  def mergeCommitFull(spark: SparkSession, source: DataFrame, key: String,
                      cols: Seq[String], path: String, manifestRoot: String,
                      nFiles: Int,
                      deleteBox: Seq[(String, Double, Double)]): MergeFullResult =
    mergeCommitFullPred(spark, source, key, cols, path, manifestRoot, nFiles,
      Layout.intersectsExpr(deleteBox), Layout.inBoxExpr(deleteBox))

  /** [[mergeCommitFull]] with the delete scope as a (prune, predicate)
    * pair instead of the numeric box — see [[deleteWherePred]] for the
    * contract. The SQL front door's typed WHERE compiler targets this
    * form (string/date-scoped NOT MATCHED BY SOURCE DELETE). */
  def mergeCommitFullPred(spark: SparkSession, source: DataFrame, key: String,
                          cols: Seq[String], path: String, manifestRoot: String,
                          nFiles: Int, deletePrune: org.apache.spark.sql.Column,
                          deletePred: org.apache.spark.sql.Column): MergeFullResult = {
    require(cols.contains(key),
      s"merge key $key needs manifest stats — not in ${cols.mkString(",")}")
    val manifest =
      pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot,
        latestVersion(spark, manifestRoot))))
    val total = localCount(manifest)
    val keyHit = source.select(col(key).cast("double").as("k")).distinct()
      .join(broadcast(manifest.select(col("file"),
          col(s"min_$key").cast("double").as("lo"),
          col(s"max_$key").cast("double").as("hi"))),
        col("k") >= col("lo") && col("k") <= col("hi"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    val boxHit = manifest.filter(deletePrune)
      .select(col("file")).collect().map(_.getString(0)).toSet
    val hit = (keyHit ++ boxHit).toSeq
    val srcKeys = source.select(col(key)).distinct()
    val (survivors, updated, matchedSrc, deleted) =
      if (hit.isEmpty) (None, 0L, 0L, 0L)
      else {
        val hitRows = Dv.readLive(spark,
          Dv.entries(manifest.filter(col("file").isInCollection(hit))),
          declaredAt(spark, manifestRoot, latestVersion(spark, manifestRoot)))
          .localCheckpoint()
        val hitKeys = hitRows.select(col(key)).distinct().localCheckpoint()
        val unmatched = hitRows.join(srcKeys, Seq(key), "left_anti")
        val kept = unmatched.filter(!coalesce(deletePred, lit(false)))
        (Some(kept),
          hitRows.join(srcKeys, Seq(key), "left_semi").count(),
          source.join(hitKeys, Seq(key), "left_semi").count(),
          unmatched.filter(deletePred).count())
      }
    val newData = survivors // schema evolution: see mergeCommit's note
      .map(_.unionByName(source, allowMissingColumns = true))
      .getOrElse(source)
    val inserted = source.count() - matchedSrc
    val staging = path + ".merge_staging_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(newData, cols, staging, nFiles)
    enforceStagedConstraints(spark, manifestRoot, staging)
    val moved = Layout.moveStagedIn(spark, staging, path)
    val keep =
      if (hit.isEmpty) manifest
      else manifest.filter(!col("file").isInCollection(hit))
    val next = keep.unionByName(Layout.buildManifestFor(spark, moved, cols),
      allowMissingColumns = true)
    MergeFullResult(commit(spark, next, manifestRoot), hit.size.toLong,
      total, updated, inserted, deleted)
  }

  /** Thrown when an optimistic transaction's read set was invalidated by a
    * commit that landed between its snapshot and its commit attempt — the
    * caller must re-plan against the current snapshot and retry. */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** What an optimistic transaction did, expressed in manifest terms:
    * computed against snapshot `readVersion`, it wants to REMOVE the
    * manifest rows for `removes` (files it rewrote or re-pointed) and add
    * `adds` (manifest rows for files it wrote; empty for pure removals).
    * `readSet` is every file whose CONTENT the outcome depends on — for a
    * delete/merge that is the touched files it read; for a blind append,
    * nothing. */
  final case class Txn(readVersion: Int, removes: Set[String],
                       adds: Option[DataFrame], readSet: Set[String])

  final case class TxnResult(version: Int, rebasedOver: Int)

  /** OPTIMISTIC COMMIT with conflict detection — the layer ABOVE the CAS
    * slot arbitration (which only guarantees two committers never clobber
    * the same `v=N`; a loser could still land a manifest computed against
    * a stale parent, silently undoing the winner). Protocol, per attempt:
    *
    *  1. read the CURRENT latest version L. If L > readVersion, diff every
    *     intermediate commit: the (file, dv) pairs it removed. If any
    *     removed pair names a file in this txn's `readSet` or `removes`,
    *     the snapshot this txn planned against is gone — throw
    *     [[CommitConflictException]] (the caller re-plans; blind retry
    *     would resurrect the winner's deletes or double-apply its merge).
    *  2. otherwise REBASE: next = manifestAt(L) − removes + adds. The
    *     intermediate commits touched only files this txn never read, so
    *     the rebased manifest composes both outcomes (Delta/Iceberg's
    *     disjoint-files rule).
    *  3. CAS-commit at the next slot. Losing the slot is not a conflict —
    *     loop back to 1 and re-diff against the new winner.
    *
    * Scale: conflict checking is manifest-pair set algebra — file-count-
    * bounded driver work per intermediate commit, no data reads. */
  def commitTxn(spark: SparkSession, manifestRoot: String, txn: Txn,
                contentFiles: Seq[(String, String)] = Seq.empty)
      : TxnResult = {
    var attempts = 0
    while (attempts < 100) {
      attempts += 1
      val latest = latestVersion(spark, manifestRoot)
      if (latest > txn.readVersion) {
        val mine = txn.readSet ++ txn.removes
        var prev = Dv.entries(manifestAt(spark, manifestRoot,
          txn.readVersion)).toSet
        for (v <- (txn.readVersion + 1) to latest) {
          // a delta commit IS the change — apply it to the running pair set
          // instead of folding the whole chain again for every v
          val cur: Set[Dv.Entry] =
            if (!isDelta(spark, manifestRoot, v))
              Dv.entries(manifestAt(spark, manifestRoot, v)).toSet
            else {
              val rows = Dv.ensureDv(
                  spark.read.parquet(s"$manifestRoot/v=$v"))
                .select(col("file"), col("dv"), col(ActionCol)).collect()
              val touched = rows.map(_.getString(0)).toSet
              prev.filterNot(e => touched.contains(e.file)) ++
                rows.toSeq.filter(_.getString(2) == "add")
                  .map(r => Dv.Entry(r.getString(0), Option(r.getString(1))))
            }
          val removedPairs = prev -- cur
          val clash = removedPairs.map(_.file).intersect(mine)
          if (clash.nonEmpty)
            throw new CommitConflictException(
              s"commit v$v invalidated ${clash.size} file(s) this txn read " +
                s"(snapshot v${txn.readVersion}): ${clash.take(3).mkString(", ")} …")
          prev = cur
        }
      }
      val base = pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot, latest)))
      val keep =
        if (txn.removes.isEmpty) base
        else base.filter(!col("file").isInCollection(txn.removes.toSeq))
      val next = txn.adds match {
        case Some(a) => keep.unionByName(Dv.ensureDv(a),
          allowMissingColumns = true)
        case None => keep
      }
      // CAS at exactly latest+1: if another writer takes the slot first we
      // must NOT slide to the next free one (that would skip re-diffing
      // its commit) — re-enter the loop and re-check instead.
      val fs = hfs(spark, manifestRoot)
      val tmp = new org.apache.hadoop.fs.Path(
        s"$manifestRoot/.tmp_${java.util.UUID.randomUUID()}")
      next.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      // content markers (e.g. a cross-table txn's pending marker) become
      // visible in the same atomic rename as the manifest
      contentFiles.foreach { case (name, body) =>
        require(name.startsWith("_"),
          s"content marker must be underscore-prefixed: $name")
        val out = fs.create(new org.apache.hadoop.fs.Path(tmp, name), true)
        out.write(body.getBytes("UTF-8")); out.close()
      }
      val dest = new org.apache.hadoop.fs.Path(s"$manifestRoot/v=${latest + 1}")
      // the slot above the visible head may be held by ANOTHER txn's
      // unresolved stage — that is a held write lock, not a lost race:
      // spinning would never free it, so refuse loudly like every other
      // writer does
      if (fs.exists(dest) &&
          unresolvedStage(spark, manifestRoot, latest + 1)) {
        fs.delete(tmp, true)
        throw new IllegalStateException(
          s"$manifestRoot v=${latest + 1} is an unresolved cross-table " +
            "transaction stage — concurrent write refused (commit or " +
            "abort the transaction first)")
      }
      val won =
        if (fs.exists(dest)) false
        else if (fs.rename(tmp, dest)) {
          val nested = new org.apache.hadoop.fs.Path(dest, tmp.getName)
          if (fs.exists(nested)) { // local-FS rename-into semantics: lost
            require(fs.rename(nested, tmp), s"un-nest failed: $nested")
            false
          } else true
        } else false
      if (won) return TxnResult(latest + 1, latest - txn.readVersion)
      fs.delete(tmp, true)
    }
    throw new IllegalStateException(
      s"optimistic commit gave up after $attempts attempts under $manifestRoot")
  }

  /** A row-level change feed between two versions plus its pruning
    * evidence: how many files the diff actually read vs the union of both
    * manifests. */
  final case class ChangeScan(df: DataFrame, filesRead: Long,
                              filesTotal: Long)

  /** CHANGE DATA FEED between two committed versions — the row-level diff
    * `vFrom → vTo`, emitted as the snapshot rows plus a `change_type`
    * column (`insert` = present at vTo, absent at vFrom; `delete` = the
    * reverse). The 100 TB shape comes from the manifests: a file present
    * in BOTH versions contributes no changes by construction (versioned
    * data files are immutable — commits add/remove file references, never
    * rewrite contents in place), so only the files REMOVED and ADDED
    * between the manifests are read, and the row diff (`exceptAll`, both
    * directions — multiset semantics, so duplicate identical rows diff
    * correctly) runs over that bounded slice, never the table. Follows
    * directly: an append's feed is exactly its batch as inserts, a
    * targeted delete's is the band as deletes (its survivor rewrites
    * cancel between removed and added files), and a compaction's is EMPTY
    * — a pure re-layout moves every row from removed to added files, the
    * diff annihilates, and CDC consumers correctly see nothing. */
  def changesBetween(spark: SparkSession, manifestRoot: String,
                     vFrom: Int, vTo: Int): ChangeScan = {
    // the snapshot identity of a file is the (file, dv) PAIR: a MoR delete
    // leaves the data file in place but moves its dv pointer, and that
    // pair change is exactly what makes the file contribute its newly
    // masked rows to the feed (old live rows minus new live rows). A pair
    // present in both versions is immutable on both axes and contributes
    // nothing, exactly as before.
    def pairs(v: Int): Set[Dv.Entry] =
      Dv.entries(manifestAt(spark, manifestRoot, v)).toSet
    val from = pairs(vFrom)
    val to = pairs(vTo)
    val removed = (from -- to).toSeq
    val added = (to -- from).toSeq
    val total = (from ++ to).map(_.file).size.toLong
    val read = (removed.map(_.file) ++ added.map(_.file)).distinct.size.toLong
    // mergeSchema (inside readLive) so a feed whose side spans a schema
    // evolution serves the superset schema; a diff whose removed AND added
    // sides have drifted apart (delete/compact across an evolution) would
    // need explicit column alignment before exceptAll — evolution here
    // arrives by append, whose feed has no removed side to clash with
    def rows(es: Seq[Dv.Entry]): Option[DataFrame] =
      if (es.isEmpty) None
      else Some(Dv.readLive(spark, es, declaredAt(spark, manifestRoot, vTo)))
    val df = (rows(removed), rows(added)) match {
      case (None, None) =>
        // no file-level change at all: an empty feed with the table schema
        tableAt(spark, manifestRoot, vTo).filter(lit(false))
          .withColumn("change_type", lit(""))
      case (Some(r), None) => r.withColumn("change_type", lit("delete"))
      case (None, Some(a)) => a.withColumn("change_type", lit("insert"))
      case (Some(r), Some(a)) =>
        r.exceptAll(a).withColumn("change_type", lit("delete"))
          .unionByName(a.exceptAll(r).withColumn("change_type", lit("insert")))
    }
    ChangeScan(df, read, total)
  }

  /** Prove a commit was a PURE RE-LAYOUT (compaction/purge: same rows,
    * different files) without materializing the exceptAll diff: the
    * removed and added file sets' live rows are each reduced to an
    * order-invariant multiset fingerprint — (count, Σ xxhash64(row),
    * Σ xxhash64(7, row)) with exact decimal accumulation, columns aligned
    * by sorted name — and compared. One scan + one scalar aggregate per
    * side, NO shuffle of rows, vs [[changesBetween]]'s two full exceptAll
    * shuffles; equality is multiset equality up to a ~2⁻¹²⁸ two-hash
    * collision, the driver's own hash-compare epistemics. Use for
    * invisibility GATES; use [[changesBetween]] when a consumer needs the
    * actual diff rows. */
  def relayoutInvisible(spark: SparkSession, manifestRoot: String,
                        vFrom: Int, vTo: Int): Boolean = {
    def pairs(v: Int): Set[Dv.Entry] =
      Dv.entries(manifestAt(spark, manifestRoot, v)).toSet
    val from = pairs(vFrom)
    val to = pairs(vTo)
    val removed = (from -- to).toSeq
    val added = (to -- from).toSeq
    if (removed.isEmpty && added.isEmpty) return true
    if (removed.isEmpty || added.isEmpty) return false
    def fp(es: Seq[Dv.Entry]): Seq[Any] = {
      val df = Dv.readLive(spark, es, declaredAt(spark, manifestRoot, vTo))
      val cs = df.columns.sorted.map(col)
      df.agg(count(lit(1)),
          sum(xxhash64(cs: _*).cast("decimal(38,0)")),
          sum(xxhash64((lit(7) +: cs): _*).cast("decimal(38,0)")))
        .collect()(0).toSeq
    }
    fp(removed) == fp(added)
  }

  // ------------------------------------------------------------------
  // COLUMN MAPPING — non-additive schema evolution (rename/drop) without
  // touching a single data file: the Iceberg/Delta "column mapping"
  // indirection re-expressed on the version log. A mapping is a
  // logical→physical name table that rides a commit as an
  // underscore-prefixed marker (visible in the same atomic rename as the
  // manifest, like the txn tag); data files always store PHYSICAL names,
  // so a rename commit rewrites ONLY the mapping — zero data files, like
  // a DV re-point — while pinned reads below the commit still serve the
  // old names and stats/pruning follow the map by translating logical
  // range columns to physical before touching the manifest.
  // Contract: when a mapping exists at a version, the visible schema is
  // EXACTLY the mapping's logical keys. Reads below the first mapping
  // commit serve raw physical names. Writers appending after a rename
  // route batches through [[toPhysical]] so every data file keeps the one
  // physical schema.
  // ------------------------------------------------------------------

  // ------------------------------------------------------------------
  // TABLE PROPERTIES — the Delta TBLPROPERTIES store, re-expressed on the
  // version log: the full property map rides a commit as an underscore-
  // prefixed marker (same superseding-set semantics as the column
  // mapping: the marker at the largest version ≤ v is the map in force at
  // v; pinned reads see the properties of THEIR version). Keys and values
  // are base64-coded independently, so any characters survive.
  // ------------------------------------------------------------------

  private val PropsPrefix = "_props_"

  private def b64e(s: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes("UTF-8"))

  private def b64d(s: String): String =
    new String(java.util.Base64.getUrlDecoder.decode(s), "UTF-8")

  // separators '~' and ',' are outside the base64url alphabet AND legal
  // in a Hadoop path segment (':' is not — it reads as a URI scheme)
  //
  // A property map too big for ONE path segment (most filesystems cap a
  // name at 255 bytes — nine ANALYZE statistics already blow it) CHUNKS
  // across several `_props_` markers in the same commit dir; readers
  // merge every chunk of the newest version that carries any (keys are
  // disjoint across chunks, so merge order is irrelevant, and the atomic
  // dir rename publishes all chunks together or none).
  private[graft] def propsMarkers(m: Map[String, String]): Seq[String] = {
    val parts = m.toSeq.sorted
      .map { case (k, v) => s"${b64e(k)}~${b64e(v)}" }
    parts.foreach(p => require(p.length <= 230,
      s"property too long for a name-encoded marker (${p.length} chars) — " +
        "oversized values belong in a content marker like _schema.json"))
    if (parts.isEmpty) return Seq(PropsPrefix)
    val chunks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    parts.foreach { p =>
      if (chunks.last.nonEmpty &&
          chunks.last.map(_.length + 1).sum + p.length > 180)
        chunks += scala.collection.mutable.ArrayBuffer(p)
      else chunks.last += p
    }
    chunks.map(c => PropsPrefix + c.mkString(",")).toSeq
  }

  private def parseProps(name: String): Map[String, String] = {
    val body = name.stripPrefix(PropsPrefix)
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val Array(k, v) = kv.split("~", 2)
      b64d(k) -> b64d(v)
    }.toMap
  }

  /** The property map in force at `version` — empty before any SET. */
  // (root, version) → properties memo. Sound because a committed
  // version's marker set is immutable (every property change is a NEW
  // commit; VACUUM removes whole versions, never edits markers) — the
  // cached map IS the map that was in force at that version. A root
  // re-created at the same path (DROP + CREATE) reuses version numbers;
  // [[invalidateProperties]] runs both on table re-registration (the SQL
  // layer's policy-cache discipline) AND — because Snapshots is a public
  // API usable without the registry — inside [[commitStaged]] whenever a
  // commit lands at v=1, which is the only way a fresh-or-recreated root
  // can begin. Bounded by LRU: access-ordered LinkedHashMap evicting the
  // least-recently-used entry past 8192 (never clear-all — a hot
  // multi-table session keeps its working set).
  private val propsCache =
    new java.util.LinkedHashMap[(String, Int), Map[String, String]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Map[String, String]])
          : Boolean = size() > 8192
    }

  /** Drop a root's memoized property maps AND declared schemas
    * (re-created roots). */
  def invalidateProperties(manifestRoot: String): Unit = {
    propsCache.synchronized {
      val it = propsCache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == manifestRoot) it.remove()
    }
    clearSchemaMemo(manifestRoot)
    clearTxnVisMemo(manifestRoot)
    clearManifestCache(manifestRoot)
    Dv.clearReadLiveCache()
  }

  def tableProperties(spark: SparkSession, manifestRoot: String,
                      version: Int): Map[String, String] = {
    val key = (manifestRoot, version)
    propsCache.synchronized(Option(propsCache.get(key))).getOrElse {
      val fs = hfs(spark, manifestRoot)
      val m = versions(spark, manifestRoot).filter(_ <= version)
        .sorted.reverse
        .iterator
        .map { v =>
          val hits = fs.listStatus(
              new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"))
            .toSeq.map(_.getPath.getName)
            .filter(_.startsWith(PropsPrefix))
          if (hits.isEmpty) None
          else Some(hits.map(parseProps).reduce(_ ++ _)) // disjoint chunks
        }
        .collectFirst { case Some(mm) => mm }
        .getOrElse(Map.empty)
      propsCache.synchronized(propsCache.put(key, m))
      m
    }
  }

  /** SET TBLPROPERTIES — Delta merge semantics (existing keys overwrite,
    * others persist), as ONE metadata-only marker commit: the next
    * version carries the current manifest content unchanged plus the
    * merged map. */
  def setProperties(spark: SparkSession, manifestRoot: String,
                    props: Map[String, String]): Int = {
    require(props.nonEmpty, "SET TBLPROPERTIES with no properties")
    val v = latestVersion(spark, manifestRoot)
    val next = tableProperties(spark, manifestRoot, v) ++ props
    commit(spark, manifestAt(spark, manifestRoot, v), manifestRoot,
      markers = propsMarkers(next))
  }

  /** UNSET TBLPROPERTIES — removes the keys (missing keys are a no-op,
    * the IF EXISTS convention), one metadata-only marker commit. */
  def unsetProperties(spark: SparkSession, manifestRoot: String,
                      keys: Seq[String]): Int = {
    require(keys.nonEmpty, "UNSET TBLPROPERTIES with no keys")
    val v = latestVersion(spark, manifestRoot)
    val next = tableProperties(spark, manifestRoot, v) -- keys
    commit(spark, manifestAt(spark, manifestRoot, v), manifestRoot,
      markers = propsMarkers(next))
  }

  /** Table property carrying the DECLARED schema (StructType JSON) of a
    * table created empty by `CREATE TABLE` — the schema authority until
    * the first data file lands ([[tableAt]] falls back to it). */
  val SchemaProp = "graft.schema"

  /** Content-marker filename the declared schema travels in (schema JSON
    * is too long for the name-encoded props marker). */
  private val SchemaMarker = "_schema.json"

  // (root, version) → declared schema memo: a committed version's
  // `_schema.json` is immutable (schema changes are NEW commits), so the
  // memo is sound under the same discipline as the property memo — LRU
  // bounded, invalidated with [[invalidateProperties]] when a root is
  // re-created. Without it every declared-schema read walks the version
  // dirs.
  private val schemaMemo =
    new java.util.LinkedHashMap[(String, Int), Option[StructType]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Option[StructType]])
          : Boolean = size() > 8192
    }

  private[graft] def clearSchemaMemo(manifestRoot: String): Unit =
    schemaMemo.synchronized {
      val it = schemaMemo.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == manifestRoot) it.remove()
    }

  /** Memoizing front of [[declaredSchemaAt]] — what the hot read paths
    * call. */
  def declaredAt(spark: SparkSession, manifestRoot: String,
                 version: Int): Option[StructType] = {
    val key = (manifestRoot, version)
    schemaMemo.synchronized(Option(schemaMemo.get(key))).getOrElse {
      val s = declaredSchemaAt(spark, manifestRoot, version)
      schemaMemo.synchronized(schemaMemo.put(key, s))
      s
    }
  }

  /** The DECLARED schema in force at `version`: the content of the
    * largest `_schema.json` marker at or below it (a CREATE TABLE writes
    * one into v1). None for tables born from data (CTAS, CONVERT,
    * register()). */
  def declaredSchemaAt(spark: SparkSession, manifestRoot: String,
                       version: Int): Option[StructType] = {
    val fs = hfs(spark, manifestRoot)
    versions(spark, manifestRoot).filter(_ <= version).sorted.reverse
      .iterator
      .map { v =>
        val p = new org.apache.hadoop.fs.Path(
          s"$manifestRoot/v=$v", SchemaMarker)
        if (fs.exists(p)) {
          val in = fs.open(p)
          try Some(org.apache.spark.sql.types.DataType
            .fromJson(new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
              "UTF-8")).asInstanceOf[StructType])
          finally in.close()
        } else None
      }
      .collectFirst { case Some(s) => s }
  }

  /** Re-declare the table's schema — ONE metadata-only commit carrying a
    * fresh `_schema.json` whose content is `update(current)`. This is how
    * column-level contract changes that live in field METADATA (e.g.
    * `ALTER COLUMN … SET/DROP DEFAULT`) land: the manifest is carried
    * forward untouched, pinned reads below the commit keep the old
    * declaration, and every later write path reads the new one through
    * [[declaredSchemaAt]]. Fails on tables born from data (no declared
    * schema to amend). */
  def updateDeclaredSchema(spark: SparkSession, manifestRoot: String)
                          (update: StructType => StructType): Int = {
    val head = latestVersion(spark, manifestRoot)
    val cur = declaredSchemaAt(spark, manifestRoot, head).getOrElse(
      throw new IllegalArgumentException(
        "no declared schema to alter — the table was born from data " +
          "(CTAS/CONVERT/register), not CREATE TABLE"))
    commit(spark, manifestAt(spark, manifestRoot, head), manifestRoot,
      contentFiles = Seq(SchemaMarker -> update(cur).json))
  }

  /** Is `from → to` a lossless TYPE WIDENING — the Delta type-widening
    * whitelist (public contract): integral up-casts, int→double,
    * float→double, and decimal precision growth at the same scale. Every
    * member is value-preserving AND served natively by Spark's parquet
    * readers when handed the wide schema, which is what keeps the widen
    * commit METADATA-ONLY (old narrow files are read as the wide type,
    * never rewritten). */
  def widenOk(from: org.apache.spark.sql.types.DataType,
              to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision > f.precision
      case _ => false
    }
  }

  /** `ALTER TABLE … ALTER COLUMN … TYPE` as ONE metadata-only commit:
    * the next version carries (a) the declared schema with the column
    * widened (synthesized from the live read schema for tables born from
    * data — widening works on CTAS tables too) and (b) the SAME manifest
    * content with the column's min/max stats cast to the wide type — a
    * FULL manifest commit, so later delta folds never mix narrow and
    * wide stat columns (a full commit is a fold base). Nothing is
    * scanned, no data file is touched: reads serve old narrow files AS
    * the wide type through the declared-schema read path
    * ([[graft.sinks.Dv.readLive]]), pinned pre-widen reads keep the
    * narrow type (their version's declaration is unchanged), and the
    * typed DML stats compiler sees wide native stat types from the new
    * manifest on. Refused on column-mapped tables (the declared schema
    * records logical names; the physical read pin would miss). */
  def widenColumn(spark: SparkSession, manifestRoot: String,
                  column: String,
                  newType: org.apache.spark.sql.types.DataType): Int = {
    val head = latestVersion(spark, manifestRoot)
    require(columnMapping(spark, manifestRoot, head).isEmpty,
      "ALTER COLUMN TYPE under a column mapping is not supported")
    val lower = column.toLowerCase(java.util.Locale.ROOT)
    val current = declaredAt(spark, manifestRoot, head)
      .getOrElse(tableAt(spark, manifestRoot, head).schema)
    val field = current.fields.find(
      _.name.toLowerCase(java.util.Locale.ROOT) == lower).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER COLUMN TYPE: no column '$column' " +
          s"(have ${current.fieldNames.mkString(", ")})"))
    require(widenOk(field.dataType, newType),
      s"ALTER COLUMN TYPE: ${field.dataType.sql} → ${newType.sql} is not " +
        "a lossless widening (supported: integral up-casts, int→double, " +
        "float→double, decimal precision growth at the same scale)")
    val widened = StructType(current.fields.map(f =>
      if (f.name.toLowerCase(java.util.Locale.ROOT) == lower)
        f.copy(dataType = newType)
      else f))
    val m = Dv.ensureDv(manifestAt(spark, manifestRoot, head))
    val statMin = m.columns.find(_.equalsIgnoreCase(s"min_$lower"))
    val statMax = m.columns.find(_.equalsIgnoreCase(s"max_$lower"))
    val m2 = (statMin, statMax) match {
      case (Some(mn), Some(mx)) =>
        m.withColumn(mn, col(mn).cast(newType))
          .withColumn(mx, col(mx).cast(newType))
      case _ => m
    }
    commit(spark, m2, manifestRoot,
      contentFiles = Seq(SchemaMarker -> widened.json))
  }

  /** `CREATE TABLE` — a table that exists BEFORE any data does: v1 is an
    * empty manifest whose `min_`/`max_` stats fields already carry the
    * declared stats columns' NATIVE types (so the typed DML predicate
    * compiler works from the first INSERT), plus a props marker recording
    * the declared schema ([[SchemaProp]]) and any user table properties.
    * Metadata-only: nothing is scanned, no data dir is touched. Fails if
    * the manifest root already has versions. */
  def createEmptyTable(spark: SparkSession, manifestRoot: String,
                       schema: StructType, statsCols: Seq[String],
                       props: Map[String, String] = Map.empty): Int = {
    require(versions(spark, manifestRoot).isEmpty,
      s"CREATE TABLE: $manifestRoot already has versions")
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = statsCols.filterNot(byName.contains)
    require(missing.isEmpty,
      s"stats columns ${missing.mkString(", ")} not in the declared " +
        s"schema (${schema.fieldNames.mkString(", ")})")
    val manifestSchema = StructType(
      StructField("file", org.apache.spark.sql.types.StringType,
        nullable = false) +:
      StructField("rows", org.apache.spark.sql.types.LongType,
        nullable = false) +:
      statsCols.flatMap(c => Seq(
        StructField(s"min_$c", byName(c), nullable = true),
        StructField(s"max_$c", byName(c), nullable = true))))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), manifestSchema)
    commit(spark, empty, manifestRoot,
      markers = if (props.isEmpty) Seq.empty else propsMarkers(props),
      contentFiles = Seq(SchemaMarker -> schema.json))
  }

  /** DETERMINISTIC identity assignment (the surrogate-key generator a
    * gold star schema needs — reference `run_load.py:113-124`): ids are
    * `next + step * rank`, where rank is the row's position under a
    * RANGE-partitioned sort on all the batch's columns — a distributed
    * partition-offset PREFIX SUM, never `monotonically_increasing_id`
    * (whose values depend on task scheduling) and never a single-
    * partition window (which would serialize a 100 TB ingest through one
    * task). Cost: one range shuffle + one per-partition count pass over
    * the batch — the same order of work as the z-order staging write
    * that follows. Equal rows tie arbitrarily BETWEEN themselves, which
    * leaves the (row, id) multiset deterministic — the property the
    * oracle checks. Returns (batch + id column, next high-water). */
  def assignIdentity(df: DataFrame, name: String,
                     dt: org.apache.spark.sql.types.DataType,
                     next: Long, step: Long): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sortCols = df.columns.toSeq.map(col)
    val base =
      if (sortCols.isEmpty) df.coalesce(1)
      else {
        val n = math.max(1, df.rdd.getNumPartitions)
        df.repartitionByRange(n, sortCols: _*)
          .sortWithinPartitions(sortCols: _*)
      }
    val cached = base.localCheckpoint()
    val counts = cached.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().toMap // one small row per partition — never data
    val nParts = cached.rdd.getNumPartitions
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    val rows = counts.values.sum
    val narrow = dt == org.apache.spark.sql.types.IntegerType
    val rdd = cached.rdd.mapPartitionsWithIndex { (i, it) =>
      var j = 0L
      it.map { r =>
        val v = next + step * (offsets(i) + j)
        j += 1
        Row.fromSeq(r.toSeq :+ (if (narrow) v.toInt else v))
      }
    }
    val out = spark.createDataFrame(rdd,
      StructType(cached.schema.fields :+
        StructField(name, dt, nullable = false)))
    (out, next + step * rows)
  }

  /** Marker NAMES for a superseding property map = current ∪ `updates` —
    * lets a DATA commit carry a property update in the SAME atomic
    * rename (e.g. the identity high-water mark riding its INSERT's
    * commit, never a separate metadata commit that could be lost
    * between the two). */
  def mergedPropsMarkers(spark: SparkSession, manifestRoot: String,
                         updates: Map[String, String]): Seq[String] =
    propsMarkers(tableProperties(spark, manifestRoot,
      latestVersion(spark, manifestRoot)) ++ updates)

  private def cmapMarker(m: Map[String, String]): String = {
    val joined = m.toSeq.sorted.map { case (l, p) => s"$l=$p" }.mkString(",")
    CmapPrefix + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(joined.getBytes("UTF-8"))
  }

  private def parseCmap(name: String): Map[String, String] = {
    val joined = new String(java.util.Base64.getUrlDecoder
      .decode(name.stripPrefix(CmapPrefix)), "UTF-8")
    joined.split(",").map { kv =>
      val Array(l, p) = kv.split("=", 2)
      l -> p
    }.toMap
  }

  /** The column mapping in force at `version`: the marker of the LARGEST
    * version at or below it that carries one (a mapping, once committed,
    * applies to every later version until superseded). None ⇒ physical
    * names are the visible schema. */
  def columnMapping(spark: SparkSession, manifestRoot: String,
                    version: Int): Option[Map[String, String]] = {
    val fs = hfs(spark, manifestRoot)
    versions(spark, manifestRoot).filter(_ <= version).sorted.reverse
      .iterator
      .map { v =>
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"))
          .toSeq.map(_.getPath.getName)
          .collectFirst { case n if n.startsWith(CmapPrefix) => parseCmap(n) }
      }
      .collectFirst { case Some(m) => m }
  }

  /** The mapping to commit against: the one in force, or identity over the
    * latest snapshot's physical schema when none exists yet. */
  private def currentMapping(spark: SparkSession,
                             manifestRoot: String): Map[String, String] = {
    val v = latestVersion(spark, manifestRoot)
    columnMapping(spark, manifestRoot, v).getOrElse(
      tableAt(spark, manifestRoot, v).columns.map(c => c -> c).toMap)
  }

  /** RENAME a logical column — a metadata-only commit: the next version
    * carries the current manifest CONTENT unchanged plus the updated
    * mapping marker; no data file is written, moved, or rewritten (the
    * q119 DV-re-point economics, applied to schema). Pinned reads below
    * the commit keep serving the old name. */
  def renameColumn(spark: SparkSession, manifestRoot: String,
                   logicalOld: String, logicalNew: String): Int = {
    val cur = currentMapping(spark, manifestRoot)
    require(cur.contains(logicalOld),
      s"rename: no visible column '$logicalOld' (have ${cur.keys.toSeq.sorted})")
    require(!cur.contains(logicalNew),
      s"rename: '$logicalNew' already visible")
    val next = (cur - logicalOld) + (logicalNew -> cur(logicalOld))
    commit(spark,
      manifestAt(spark, manifestRoot, latestVersion(spark, manifestRoot)),
      manifestRoot, markers = Seq(cmapMarker(next)))
  }

  /** DROP a logical column — metadata-only like [[renameColumn]]: the
    * column vanishes from the visible schema at this version; pinned reads
    * below it still serve it; the physical bytes stay (reclaimed only if a
    * later rewrite drops them). */
  def dropColumn(spark: SparkSession, manifestRoot: String,
                 logical: String): Int = {
    val cur = currentMapping(spark, manifestRoot)
    require(cur.contains(logical),
      s"drop: no visible column '$logical' (have ${cur.keys.toSeq.sorted})")
    require(cur.size > 1, "drop would leave an empty visible schema")
    commit(spark,
      manifestAt(spark, manifestRoot, latestVersion(spark, manifestRoot)),
      manifestRoot, markers = Seq(cmapMarker(cur - logical)))
  }

  /** EXTEND the mapping with a new logical column (schema-evolution ADD
    * after a rename/drop): once a mapping exists, an appended physical
    * column is invisible until mapped — the writer evolves the mapping
    * (one metadata commit), then appends batches carrying the column
    * through [[toPhysical]] as usual. The physical name defaults to the
    * logical one (a fresh column has nothing to indirect). */
  def extendMapping(spark: SparkSession, manifestRoot: String,
                    logical: String, physical: Option[String] = None): Int = {
    val cur = currentMapping(spark, manifestRoot)
    require(!cur.contains(logical), s"extend: '$logical' already visible")
    val phys = physical.getOrElse(logical)
    require(!cur.values.exists(_ == phys),
      s"extend: physical '$phys' already mapped")
    commit(spark,
      manifestAt(spark, manifestRoot, latestVersion(spark, manifestRoot)),
      manifestRoot, markers = Seq(cmapMarker(cur + (logical -> phys))))
  }

  /** ALTER TABLE ADD COLUMN — ONE metadata-only commit that (a) extends
    * the mapping with the new logical column and (b) declares its TYPE in
    * a companion marker, so the column is visible IMMEDIATELY as typed
    * nulls (the Delta ADD COLUMN contract) instead of waiting for the
    * first batch that materializes it. No data file is written; pinned
    * reads below the commit keep the old schema. Appended batches carry
    * the column physically from then on (the q118 footer-merge
    * mechanics), at which point the real values shadow the null fill. */
  def addColumn(spark: SparkSession, manifestRoot: String, logical: String,
                dataType: org.apache.spark.sql.types.DataType): Int = {
    val cur = currentMapping(spark, manifestRoot)
    require(!cur.contains(logical), s"add: '$logical' already visible")
    require(!cur.values.exists(_ == logical),
      s"add: physical '$logical' already exists")
    commit(spark,
      manifestAt(spark, manifestRoot, latestVersion(spark, manifestRoot)),
      manifestRoot,
      markers = Seq(cmapMarker(cur + (logical -> logical)),
        addColMarker(logical, dataType)))
  }

  private def addColMarker(physical: String,
                           dt: org.apache.spark.sql.types.DataType): String =
    AddColPrefix + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s"$physical:${dt.catalogString}".getBytes("UTF-8"))

  /** Declared (physical name → type) of every ADD COLUMN commit at or
    * below `version` — the types [[mappedTableAt]] null-fills with until
    * data materializes the column. Version × marker-count bounded
    * planner work, like [[columnMapping]]. */
  private def declaredTypes(spark: SparkSession, manifestRoot: String,
                            version: Int): Map[String, org.apache.spark.sql.types.DataType] = {
    val fs = hfs(spark, manifestRoot)
    versions(spark, manifestRoot).filter(_ <= version).flatMap { v =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"))
        .toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith(AddColPrefix) =>
          val decoded = new String(java.util.Base64.getUrlDecoder
            .decode(n.stripPrefix(AddColPrefix)), "UTF-8")
          val Array(p, ddl) = decoded.split(":", 2)
          p -> org.apache.spark.sql.types.DataType.fromDDL(ddl)
        }
    }.toMap
  }

  /** Route a LOGICAL-schema batch to PHYSICAL names for writing — what an
    * appender uses after a rename so every data file keeps the one
    * physical schema. Columns outside the mapping are rejected (a writer
    * must evolve the mapping first, not invent physical names). */
  def toPhysical(batch: DataFrame, mapping: Map[String, String]): DataFrame = {
    val unknown = batch.columns.filterNot(mapping.contains)
    require(unknown.isEmpty,
      s"toPhysical: columns not in the mapping: ${unknown.toSeq.sorted}")
    batch.select(batch.columns.map(c => col(c).as(mapping(c))): _*)
  }

  /** [[tableAt]] through the mapping in force at `version`: physical
    * columns served under their logical names, in physical-schema order;
    * unmapped physical columns (dropped, or never mapped) are invisible.
    * A mapped column declared by [[addColumn]] but not yet materialized
    * by any data file serves as typed nulls (appended last, in logical
    * name order). */
  def mappedTableAt(spark: SparkSession, manifestRoot: String,
                    version: Int): DataFrame = {
    val t = tableAt(spark, manifestRoot, version)
    columnMapping(spark, manifestRoot, version) match {
      case None => t
      case Some(m) =>
        val declared = declaredTypes(spark, manifestRoot, version)
        val order = t.columns.zipWithIndex.toMap
        val cols = m.toSeq
          .filter { case (_, p) => order.contains(p) }
          .sortBy { case (_, p) => order(p) }
          .map { case (l, p) => col(p).as(l) }
        val synthesized = m.toSeq
          .filter { case (_, p) => !order.contains(p) && declared.contains(p) }
          .sortBy(_._1)
          .map { case (l, p) => lit(null).cast(declared(p)).as(l) }
        require(cols.nonEmpty,
          s"mapping at v$version matches no physical column of the snapshot")
        t.select(cols ++ synthesized: _*)
    }
  }

  /** [[readAt]] with ranges over LOGICAL names: ranges translate to
    * physical before touching the manifest — so the stats columns
    * (`min_<physical>`/`max_<physical>`) keep pruning across renames —
    * and the emitted rows come back under logical names. */
  def mappedReadAt(spark: SparkSession, manifestRoot: String, version: Int,
                   ranges: Seq[(String, Double, Double)]): Layout.PrunedScan = {
    columnMapping(spark, manifestRoot, version) match {
      case None => readAt(spark, manifestRoot, version, ranges)
      case Some(m) =>
        val phys = ranges.map { case (l, lo, hi) =>
          require(m.contains(l), s"pruned read on unmapped column '$l'")
          (m(l), lo, hi)
        }
        val pr = readAt(spark, manifestRoot, version, phys)
        val order = pr.df.columns.zipWithIndex.toMap
        val cols = m.toSeq
          .filter { case (_, p) => order.contains(p) }
          .sortBy { case (_, p) => order(p) }
          .map { case (l, p) => col(p).as(l) }
        Layout.PrunedScan(pr.df.select(cols: _*), pr.filesRead, pr.filesTotal)
    }
  }

  /** [[changesBetween]] served under the DESTINATION version's mapping —
    * how a CDC consumer reads a feed that crosses a rename: the diff runs
    * on physical rows (key-correct by construction — a rename commit
    * changes no (file, dv) pair, so it contributes no row changes), and
    * only the emitted column names translate. */
  def mappedChangesBetween(spark: SparkSession, manifestRoot: String,
                           vFrom: Int, vTo: Int): ChangeScan = {
    val cs = changesBetween(spark, manifestRoot, vFrom, vTo)
    columnMapping(spark, manifestRoot, vTo) match {
      case None => cs
      case Some(m) =>
        val order = cs.df.columns.zipWithIndex.toMap
        val cols = m.toSeq
          .filter { case (_, p) => order.contains(p) }
          .sortBy { case (_, p) => order(p) }
          .map { case (l, p) => col(p).as(l) } :+ col("change_type")
        ChangeScan(cs.df.select(cols: _*), cs.filesRead, cs.filesTotal)
    }
  }

  /** Reclaim storage: drop all but the last `retainLast` versions, then
    * delete every data file under `path` that no RETAINED version
    * references (compared by unique part-file name, like
    * [[Layout.appendWithManifest]]'s listing diff, so URI scheme
    * differences can't alias). Hidden/_-prefixed files are never touched.
    * Files referenced only by expired versions are exactly the superseded
    * delete/compaction inputs — after vacuum, time travel to an expired
    * version is gone by construction. */
  final case class VacuumPlan(dropVersions: Seq[Int], deadFiles: Seq[String],
                              deadDvDirs: Seq[String])

  /** Plan a [[vacuum]] WITHOUT touching anything — the `VACUUM … DRY RUN`
    * contract: exactly the versions, data files, and DV sidecar dirs the
    * real vacuum would reclaim, computed from the same retained-reference
    * sets the destructive path uses (shared code, so the listing can
    * never drift from what vacuum actually deletes). */
  def vacuumPlan(spark: SparkSession, path: String, manifestRoot: String,
                 retainLast: Int): VacuumPlan = {
    require(retainLast >= 1, "must retain at least the latest version")
    val vs = versions(spark, manifestRoot)
    require(vs.nonEmpty, s"no committed versions under $manifestRoot")
    val (drop, keep) = vs.splitAt((vs.size - retainLast).max(0))
    val retained = keep.map(v => Dv.entries(manifestAt(spark, manifestRoot, v)))
    val referenced = retained.flatten.map(e => Layout.fileName(e.file)).toSet
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = hfs(spark, path)
    val dead = fs.listStatus(dir).toSeq.filter { st =>
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") &&
        !referenced.contains(st.getPath.getName)
    }.map(_.getPath.toString)
    // deletion-vector sidecars are versioned metadata like the data files:
    // a sidecar dir under _dv/ that no RETAINED manifest's dv column
    // references belongs only to expired masks — reclaim it the same way
    val dvDir = new org.apache.hadoop.fs.Path(path, "_dv")
    val deadDv =
      if (!fs.exists(dvDir)) Seq.empty
      else {
        val liveDv = retained.flatten
          .flatMap(_.dv).map(Layout.fileName).toSet
        fs.listStatus(dvDir).toSeq.filter { st =>
          st.isDirectory && !liveDv.contains(st.getPath.getName)
        }.map(_.getPath.toString)
      }
    VacuumPlan(drop, dead, deadDv)
  }

  def vacuum(spark: SparkSession, path: String, manifestRoot: String,
             retainLast: Int): VacuumResult = {
    val plan = vacuumPlan(spark, path, manifestRoot, retainLast)
    val vs = versions(spark, manifestRoot)
    val drop = plan.dropVersions
    // log-structured tails must stay self-contained: if the oldest retained
    // version is a delta whose fold base is about to be dropped,
    // materialize it as a checkpoint FIRST — every retained version then
    // folds from a base ≥ the cut. (writeCheckpoint is a no-op when the
    // base is already a retained full version or surviving checkpoint.)
    val cut = vs.drop(drop.size).head
    if (drop.nonEmpty && isDelta(spark, manifestRoot, cut) &&
        foldInfo(spark, manifestRoot, cut).base < cut)
      writeCheckpoint(spark, manifestRoot, cut)
    val fs = hfs(spark, path)
    plan.deadFiles.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false))
    plan.deadDvDirs.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
    // a marker commit (column mapping / declared column types / constraint
    // set) governs every LATER version until superseded — dropping its dir
    // must not lose the table's schema indirection or write contracts
    preserveMarkers(spark, manifestRoot, drop, cut)
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"), true)
    }
    // checkpoints below the cut cache expired log prefixes — reclaim them
    // (after the version drop, so a crash mid-vacuum never leaves a delta
    // tail whose base was deleted first)
    val mfs = hfs(spark, manifestRoot)
    checkpoints(spark, manifestRoot).filter(_ < cut).foreach { c =>
      mfs.delete(new org.apache.hadoop.fs.Path(s"$manifestRoot/ckpt=$c"), true)
    }
    // vacuum is the one operation that DELETES version dirs and data/DV
    // files a cached manifest or read plan may reference — drop both
    // caches for this root (and the file-keyed read-plan memo wholesale;
    // vacuum cadence is rare, the memo re-warms in one read)
    clearManifestCache(manifestRoot)
    Dv.clearReadLiveCache()
    VacuumResult(plan.deadFiles.size.toLong + plan.deadDvDirs.size.toLong,
      drop.size.toLong)
  }

  /** Metadata-only aggregates: COUNT(*) and per-column MIN/MAX served
    * entirely from the manifest — sum of per-file row counts, min of
    * per-file mins, max of per-file maxes — with ZERO data files opened.
    * This is the "SELECT count(*) answered from table metadata" fast path
    * every table format serves; at 100 TB it is the difference between a
    * sub-second planner read and a full scan. SOUNDNESS GUARD: a manifest
    * carrying deletion-vector pointers cannot serve metadata counts (the
    * footer row counts include masked rows) — this refuses LOUDLY rather
    * than answer wrong; purge or compact first. MIN/MAX stay sound under
    * DVs in general table formats only as bounds, not exact extremes, so
    * they ride the same guard. */
  final case class StatsAgg(rows: Long, mins: Map[String, Double],
                            maxs: Map[String, Double])

  def statsAggAt(spark: SparkSession, manifestRoot: String, version: Int,
                 cols: Seq[String]): StatsAgg = {
    val m = statsManifestGuarded(spark, manifestRoot, version, cols)
    val aggs = sum(col("rows")).as("_n") +:
      cols.flatMap(c => Seq(
        min(col(s"min_$c")).cast("double").as(s"_lo_$c"),
        max(col(s"max_$c")).cast("double").as(s"_hi_$c")))
    val r = m.agg(aggs.head, aggs.tail: _*).collect()(0)
    StatsAgg(r.getLong(0),
      cols.zipWithIndex.map { case (c, i) => c -> r.getDouble(1 + 2 * i) }.toMap,
      cols.zipWithIndex.map { case (c, i) => c -> r.getDouble(2 + 2 * i) }.toMap)
  }

  /** [[statsAggAt]] with the stats columns' NATIVE types preserved: one
    * Row `(rows: Long, min_c1, max_c1, …)` in `cols` order, each extreme
    * typed exactly as the manifest (= data) column. For callers that
    * substitute the values INTO a plan — the metadata-only aggregate
    * rewrite — where a double round-trip would corrupt 64-bit or string
    * extremes. Same soundness guards: refuses DV-masked versions (footer
    * row counts include masked rows) and manifests mixing stats-bearing
    * and stats-less files (min/max silently skip nulls). */
  def statsAggRowAt(spark: SparkSession, manifestRoot: String, version: Int,
                    cols: Seq[String]): Row = {
    val m = statsManifestGuarded(spark, manifestRoot, version, cols)
    val aggs = coalesce(sum(col("rows")), lit(0L)).as("_n") +:
      cols.flatMap(c => Seq(
        min(col(s"min_$c")).as(s"_lo_$c"),
        max(col(s"max_$c")).as(s"_hi_$c")))
    m.agg(aggs.head, aggs.tail: _*).collect()(0)
  }

  private def statsManifestGuarded(spark: SparkSession, manifestRoot: String,
                                   version: Int, cols: Seq[String]): DataFrame = {
    val m = Dv.ensureDv(manifestAt(spark, manifestRoot, version))
    require(m.filter(col("dv").isNotNull).isEmpty,
      s"metadata-only aggregates are unsound over DV-masked files " +
        s"(v$version of $manifestRoot carries masks) — purge or compact first")
    cols.foreach { c =>
      require(m.columns.contains(s"min_$c") && m.columns.contains(s"max_$c"),
        s"no manifest stats for '$c' — was it in the stats column list?")
    }
    // a manifest MIXING stats-bearing and stats-less rows (e.g. a
    // generation committed without stats for a column) must not serve
    // extremes computed over the subset that happens to carry them —
    // min/max aggregates silently skip nulls, so guard loudly instead
    val partial = cols.filter(c =>
      !m.filter(col(s"min_$c").isNull || col(s"max_$c").isNull).isEmpty)
    require(partial.isEmpty,
      s"metadata-only extremes are unsound: manifest rows lack stats for " +
        s"${partial.sorted.mkString(", ")} — rebuild the manifest with " +
        "stats for every file, or aggregate by scan")
    m
  }

  /** Thrown by [[appendCommitChecked]] when a batch violates the table's
    * CHECK constraint — nothing is staged, moved, or committed. */
  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** CHECK-constraint-enforced append (the Delta `ALTER TABLE ... ADD
    * CONSTRAINT` enforcement point re-expressed on the version log): the
    * batch is validated BEFORE any staging, in one counting pass; a
    * violating batch raises [[ConstraintViolationException]] and leaves
    * the table byte-identical — no data files, no version, the write-path
    * atomicity every constraint system needs. SQL CHECK semantics: NULL
    * passes, only an explicit FALSE violates. */
  def appendCommitChecked(spark: SparkSession, batch: DataFrame,
                          cols: Seq[String], path: String,
                          manifestRoot: String, nFiles: Int,
                          constraint: org.apache.spark.sql.Column,
                          constraintName: String): (Int, Int) = {
    val bad = batch.filter(!coalesce(constraint, lit(true))).count()
    if (bad > 0)
      throw new ConstraintViolationException(
        s"CHECK constraint '$constraintName' violated by $bad rows — " +
          "nothing committed")
    appendCommit(spark, batch, cols, path, manifestRoot, nFiles)
  }

  // ------------------------------------------------------------------
  // PERSISTED CHECK CONSTRAINTS — the Delta `ALTER TABLE ADD CONSTRAINT`
  // table property, re-expressed on the version log: the constraint SET
  // (name → SQL condition over PHYSICAL column names) rides a commit as an
  // underscore-prefixed marker, exactly like the column mapping — visible
  // in the same atomic rename as the manifest, superseding-set semantics
  // (the marker at the largest version ≤ v is the set in force at v).
  // Enforcement is at the staged-files seam every write path already
  // passes through ([[enforceStagedConstraints]]): the about-to-be-moved
  // staging dir is validated in ONE fused counting pass, and a violation
  // drops the staging and aborts BEFORE the move — no data file is ever
  // referenced, the table stays byte-identical (the same validate-before-
  // visibility contract as [[appendCommitChecked]], but persisted and
  // writer-independent: ANY committer against the log obeys it).
  // ------------------------------------------------------------------

  private def ckMarker(cs: Map[String, String]): String = {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
    CkPrefix + cs.toSeq.sorted.map { case (n, c) =>
      enc.encodeToString(n.getBytes("UTF-8")) + "." +
        enc.encodeToString(c.getBytes("UTF-8"))
    }.mkString(",")
  }

  private def parseCk(name: String): Map[String, String] = {
    val dec = java.util.Base64.getUrlDecoder
    val body = name.stripPrefix(CkPrefix)
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val Array(n, c) = kv.split("\\.", 2)
      new String(dec.decode(n), "UTF-8") -> new String(dec.decode(c), "UTF-8")
    }.toMap
  }

  // marker-version memo per manifest root: (highest version scanned, ck
  // markers found so far, DESCENDING by version). Sound because committed
  // version dirs are immutable (markers ride the commit's atomic rename;
  // vacuum's re-homing only duplicates an already-known set), so only the
  // (scanned, head] tail ever needs listing — the write-path constraint
  // probe costs O(new commits), not O(log length), per call. The memo is
  // per-JVM; a fresh process pays one backward scan to the newest marker.
  private val ckScan = scala.collection.concurrent.TrieMap
    .empty[String, (Int, List[(Int, Map[String, String])])]

  /** Test hook: drop the marker memo so the next [[checkConstraints]]
    * re-reads the log from disk (what a fresh JVM would see). */
  private[graft] def resetConstraintMemo(): Unit = { ckScan.clear(); cpScan.clear() }

  // COPY INTO idempotency ledger: loaded-source-file keys ride the
  // append's atomic rename as `_copy_<key>` markers and ACCUMULATE across
  // versions (like ADD COLUMN markers — vacuum re-homes them). Same
  // monotone memo shape as [[ckScan]].
  private val cpScan = scala.collection.concurrent.TrieMap
    .empty[String, (Int, Set[String])]

  /** Every source-file key ever loaded by [[copyIntoCommit]] (union over
    * all committed versions). O(new commits) FS listings per call. */
  def copiedKeys(spark: SparkSession, manifestRoot: String): Set[String] = {
    val fs = hfs(spark, manifestRoot)
    val vs = versions(spark, manifestRoot)
    val (scanned0, known0) = cpScan.getOrElse(manifestRoot, (0, Set.empty[String]))
    val (scanned, known) =
      if (vs.isEmpty || vs.last < scanned0) (0, Set.empty[String])
      else (scanned0, known0)
    val fresh = vs.filter(_ > scanned).flatMap { v =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"))
        .toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith(CopyPrefix) =>
          n.stripPrefix(CopyPrefix) }
    }
    val all = known ++ fresh
    if (vs.nonEmpty && vs.last > scanned)
      cpScan.put(manifestRoot, (vs.last, all)) : Unit
    all
  }

  final case class CopyResult(version: Int, filesLoaded: Long,
                              rowsLoaded: Long, filesSkipped: Long)

  /** Idempotent file-tracking ingest — the Databricks `COPY INTO` shape:
    * `srcFiles` are (absolute path, idempotency key) pairs for the source
    * directory's data files; files whose key the ledger already carries
    * are SKIPPED, the rest are read by `read`, staged z-ordered, and
    * committed as ONE append whose version dir also records the new keys
    * (marker + data land in the same atomic rename — a crash can lose the
    * whole commit but never double-load, and a re-run after success loads
    * nothing). Zero new files → metadata no-op: NO version committed.
    *
    * Scale shape: the ledger scan is O(new commits) FS listings
    * (memoized); skip/load partitioning is file-count-bounded driver
    * work; the data path is the ordinary staged z-ordered append — the
    * daily-ingest cadence cost is the new files' bytes, never the
    * table's. */
  def copyIntoCommit(spark: SparkSession, path: String, manifestRoot: String,
                     cols: Seq[String], nFiles: Int,
                     srcFiles: Seq[(String, String)],
                     read: Seq[String] => DataFrame): CopyResult = {
    val loaded = copiedKeys(spark, manifestRoot)
    val (skip, fresh) = srcFiles.partition(f => loaded.contains(f._2))
    if (fresh.isEmpty)
      return CopyResult(latestVersion(spark, manifestRoot), 0L, 0L,
        skip.size.toLong)
    val batch = read(fresh.map(_._1)).localCheckpoint()
    val rows = batch.count()
    val (version, _) = appendCommit(spark, batch, cols, path, manifestRoot,
      nFiles, markers = fresh.map(f => CopyPrefix + f._2))
    CopyResult(version, fresh.size.toLong, rows, skip.size.toLong)
  }

  /** The CHECK-constraint set in force at `version`: the marker of the
    * largest version at or below it carrying one (a set, once committed,
    * governs every later version until superseded). Conditions are SQL
    * expression text over PHYSICAL column names. */
  def checkConstraints(spark: SparkSession, manifestRoot: String,
                       version: Int): Map[String, String] = {
    val fs = hfs(spark, manifestRoot)
    val vs = versions(spark, manifestRoot)
    val (scanned0, known0) = ckScan.getOrElse(manifestRoot, (0, Nil))
    // a log whose head went BACKWARDS was deleted and recreated at the
    // same path (DROP PURGE + CREATE) — the memo describes the old log
    val (scanned, known) =
      if (vs.isEmpty || vs.last < scanned0) (0, Nil) else (scanned0, known0)
    val fresh = vs.filter(_ > scanned).sorted.reverse.flatMap { v =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"))
        .toSeq.map(_.getPath.getName)
        .collectFirst { case n if n.startsWith(CkPrefix) => v -> parseCk(n) }
    }
    val all = fresh.toList ++ known
    if (vs.nonEmpty && vs.last > scanned)
      ckScan.put(manifestRoot, (vs.last, all)) : Unit
    all.collectFirst { case (v, m) if v <= version => m }
      .getOrElse(Map.empty)
  }

  /** ADD a named CHECK constraint — ONE metadata-only commit after
    * validating that every EXISTING live row satisfies it (the Delta ADD
    * CONSTRAINT contract: a constraint that is already false cannot be
    * declared; one O(live-rows) counting pass, the unavoidable cost).
    * From this commit on, every write path refuses staged batches that
    * violate it. NULL passes; only explicit FALSE violates (SQL CHECK
    * three-valued semantics). */
  def addConstraint(spark: SparkSession, manifestRoot: String,
                    name: String, condition: String): Int = {
    require(name != null && name.nonEmpty, "constraint needs a name")
    val v = latestVersion(spark, manifestRoot)
    val cur = checkConstraints(spark, manifestRoot, v)
    require(!cur.contains(name),
      s"constraint '$name' already exists (${cur(name)})")
    // an EMPTY table (a plain CREATE TABLE before any INSERT) trivially
    // satisfies every constraint — nothing to validate, no scan
    val entries = Dv.entries(Dv.ensureDv(manifestAt(spark, manifestRoot, v)))
    val bad =
      if (entries.isEmpty) 0L
      else Dv.readLive(spark, entries, declaredAt(spark, manifestRoot, v))
        .filter(!coalesce(expr(condition), lit(true))).count()
    if (bad > 0)
      throw new ConstraintViolationException(
        s"cannot ADD CONSTRAINT '$name' CHECK ($condition): $bad existing " +
          "rows violate it — nothing committed")
    commit(spark, manifestAt(spark, manifestRoot, v), manifestRoot,
      markers = Seq(ckMarker(cur + (name -> condition))))
  }

  /** FOREIGN KEY constraints in force at `version` —
    * name → (column, parent manifest root, parent key column). Stored as
    * `graft.fk.<name>` table properties (the parent is resolved to its
    * manifest root at ADD time, so enforcement never needs a name
    * registry). Unlike RELY constraints ([[graft.plans.RelyConstraints]],
    * optimizer hints the engine TRUSTS), these are ENFORCED: they gate
    * every staged write. */
  def foreignKeys(spark: SparkSession, manifestRoot: String,
                  version: Int): Map[String, (String, String, String)] =
    tableProperties(spark, manifestRoot, version).collect {
      case (k, v) if k.startsWith("graft.fk.") =>
        val Array(c, root, key) = v.split("\t", 3)
        k.stripPrefix("graft.fk.") -> ((c, root, key))
    }

  /** ADD an ENFORCED foreign key: existing rows validate first (an
    * orphan-carrying table cannot adopt the contract — nothing commits),
    * then the edge lands as ONE metadata-only property commit. NULL child
    * values pass (the SQL MATCH SIMPLE convention, mirroring CHECK's
    * three-valued logic); enforcement on later writes is a key-distinct
    * anti-join of the staged batch against the parent's live keys —
    * batch-keys-bounded, the parent streams once. */
  def addForeignKey(spark: SparkSession, manifestRoot: String, name: String,
                    column: String, parentManifestRoot: String,
                    parentKey: String): Int = {
    val v = latestVersion(spark, manifestRoot)
    require(!foreignKeys(spark, manifestRoot, v).contains(name),
      s"foreign key '$name' already exists")
    val entries = Dv.entries(Dv.ensureDv(manifestAt(spark, manifestRoot, v)))
    if (entries.nonEmpty) {
      val orphans = orphanCount(spark,
        Dv.readLive(spark, entries, declaredAt(spark, manifestRoot, v)),
        column, parentManifestRoot, parentKey)
      if (orphans > 0)
        throw new ConstraintViolationException(
          s"cannot ADD FOREIGN KEY '$name' ($column → $parentKey): " +
            s"$orphans existing rows have no parent — nothing committed")
    }
    setProperties(spark, manifestRoot, Map(
      s"graft.fk.$name" -> s"$column\t$parentManifestRoot\t$parentKey"))
  }

  /** Child rows of `df` whose non-null `column` has no match in the
    * parent's live `parentKey` set — the FK violation count. Distinct
    * child keys anti-join the parent (both sides key-distinct, so the
    * join is keys × keys, never rows × rows), then matches broadcast
    * back. */
  private def orphanCount(spark: SparkSession, df: DataFrame, column: String,
                          parentManifestRoot: String,
                          parentKey: String): Long = {
    val parent = Dv.readLive(spark, Dv.entries(Dv.ensureDv(
        manifestAt(spark, parentManifestRoot,
          latestVersion(spark, parentManifestRoot)))),
      declaredAt(spark, parentManifestRoot,
        latestVersion(spark, parentManifestRoot)))
      .select(col(parentKey).as("_fk_p")).distinct()
    df.filter(col(column).isNotNull)
      .select(col(column).as("_fk_c")).distinct()
      .join(parent, col("_fk_c") === col("_fk_p"), "left_anti")
      .count()
  }

  /** DROP a named CHECK constraint — metadata-only commit superseding the
    * set without it; later writes stop enforcing it, pinned reads below
    * the commit are unaffected (constraints gate writes, not reads). */
  def dropConstraint(spark: SparkSession, manifestRoot: String,
                     name: String, ifExists: Boolean = false): Int = {
    val v = latestVersion(spark, manifestRoot)
    val cur = checkConstraints(spark, manifestRoot, v)
    if (!cur.contains(name)) {
      require(ifExists,
        s"no constraint '$name' (have ${cur.keys.toSeq.sorted.mkString(", ")})")
      return v
    }
    commit(spark, manifestAt(spark, manifestRoot, v), manifestRoot,
      markers = Seq(ckMarker(cur - name)))
  }

  /** The write-path enforcement seam: validate a finished staging dir
    * against the constraint set in force, in ONE fused counting pass over
    * the staged bytes (zero extra compute of the input frame — the rows
    * were just written; reading them back costs one local columnar scan).
    * A violation deletes the staging dir and aborts: nothing was moved or
    * referenced, so the table stays byte-identical. No-op (and no read)
    * when the table has no constraints. */
  private def enforceStagedConstraints(spark: SparkSession,
                                       manifestRoot: String,
                                       staging: String): Unit = {
    val v = latestVersion(spark, manifestRoot)
    val cs = checkConstraints(spark, manifestRoot, v).toSeq.sorted
    // NOT NULL (the OTHER write-side contract a Databricks table
    // carries): declared-nullable=false columns gate alongside the CHECK
    // constraints, in the SAME fused single-pass aggregate. Note the
    // semantics difference the fixture pins: a NULL PASSES a CHECK
    // (three-valued logic — only FALSE rejects) but FAILS NOT NULL.
    val nn = declaredSchemaAt(spark, manifestRoot, v)
      .map(_.fields.filter(!_.nullable).map(_.name).toSeq)
      .getOrElse(Seq.empty)
    // FK enforcement runs first: its per-edge anti-join is separate from
    // the fused aggregate below, and both share the abort discipline
    enforceStagedForeignKeys(spark, manifestRoot, staging)
    if (cs.isEmpty && nn.isEmpty) return
    val df = spark.read.parquet(staging)
    val present = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val nnHere = nn.filter(c =>
      present(c.toLowerCase(java.util.Locale.ROOT))).sorted
    val checks: Seq[(String, org.apache.spark.sql.Column)] =
      cs.map { case (n, c) =>
        s"CHECK constraint '$n' ($c)" -> !coalesce(expr(c), lit(true)) } ++
      nnHere.map(c => s"NOT NULL constraint on '$c'" -> col(c).isNull)
    val aggs = checks.zipWithIndex.map { case ((_, bad), i) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"_c$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.foreach { case ((what, _), i) =>
      val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (bad > 0) {
        val p = new org.apache.hadoop.fs.Path(staging)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true) : Unit
        throw new ConstraintViolationException(
          s"$what violated by $bad staged rows — " +
            "staging dropped, nothing committed")
      }
    }
  }

  /** The FOREIGN KEY leg of the write gate — separate from the fused
    * CHECK/NOT-NULL aggregate because it needs a join, but still
    * batch-keys-bounded (see [[orphanCount]]). Same abort discipline:
    * orphans drop the staging dir, nothing moves. */
  private def enforceStagedForeignKeys(spark: SparkSession,
                                       manifestRoot: String,
                                       staging: String): Unit = {
    val v = latestVersion(spark, manifestRoot)
    val fks = foreignKeys(spark, manifestRoot, v).toSeq.sortBy(_._1)
    if (fks.isEmpty) return
    val df = spark.read.parquet(staging)
    val present = df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    fks.foreach { case (name, (column, parentRoot, parentKey)) =>
      if (present(column.toLowerCase(java.util.Locale.ROOT))) {
        val orphans = orphanCount(spark, df, column, parentRoot, parentKey)
        if (orphans > 0) {
          val p = new org.apache.hadoop.fs.Path(staging)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true) : Unit
          throw new ConstraintViolationException(
            s"FOREIGN KEY '$name' ($column → $parentKey) violated by " +
              s"$orphans staged rows with no parent — staging dropped, " +
              "nothing committed")
        }
      }
    }
  }

  final case class ReplaceResult(version: Int, filesRewritten: Long,
                                 filesTotal: Long, rowsDeleted: Long,
                                 filesAppended: Long, filesDropped: Long = 0L)

  /** Scoped atomic OVERWRITE — the Delta `replaceWhere` shape: ONE commit
    * replaces exactly the predicate's rows with `batch`. Files whose stats
    * intersect `prune` are rewritten to their surviving (non-matching LIVE)
    * rows, the batch stages z-ordered, and vN+1 = (manifest − touched) ∪
    * survivors ∪ batch lands in a single manifest swap — a reader sees the
    * old state or the new, never the gap a separate DELETE + INSERT would
    * open. Untouched files are never read (the deleteWhere pruning
    * economics). Every batch row must satisfy `pred` — an overwrite scoped
    * to a slice must not smuggle rows outside it (checked FIRST, before
    * any staging; the Delta replaceWhere contract) — and the batch passes
    * the table's CHECK constraints like every other write. A crash at any
    * point pre-commit leaves only unreferenced files. */
  def replaceWhereCommit(spark: SparkSession, batch: DataFrame,
                         cols: Seq[String], path: String, manifestRoot: String,
                         nFiles: Int, prune: org.apache.spark.sql.Column,
                         pred: org.apache.spark.sql.Column,
                         cover: Option[(org.apache.spark.sql.Column, Seq[String])] = None)
      : ReplaceResult = {
    val escaped = batch.filter(!coalesce(pred, lit(false))).count()
    require(escaped == 0,
      s"REPLACE WHERE batch has $escaped rows OUTSIDE the replaced " +
        "predicate — a scoped overwrite cannot smuggle rows past its " +
        "scope; nothing committed")
    val manifest =
      pinLocal(Dv.ensureDv(manifestAt(spark, manifestRoot,
        latestVersion(spark, manifestRoot))))
    val total = localCount(manifest)
    val hit = Dv.entries(manifest.filter(prune))
    // whole-file drops (same proof as [[deleteWherePred]]): the daily
    // `REPLACE WHERE run_date = X` re-land is THE partition-overwrite
    // workload — on a date-clustered layout the old partition's files are
    // fully covered, so the replace removes them metadata-only and pays
    // for writing the new batch, not rewriting the old one
    val dropped = wholeFileDrops(spark, manifest, prune, cover)
    val rewrite = hit.filterNot(e => dropped.contains(e.file))
    // batch stages (and constraint-checks) FIRST: a rejected batch aborts
    // before any survivor rewrite work is spent or moved
    val bStaging = path + ".replace_batch_" + java.util.UUID.randomUUID()
    Layout.zorderWrite(batch, cols, bStaging, nFiles)
    enforceStagedConstraints(spark, manifestRoot, bStaging)
    val (survivorFiles, deleted) =
      if (rewrite.isEmpty) (Seq.empty[String], 0L)
      else {
        val live = Dv.readLive(spark, rewrite,
          declaredAt(spark, manifestRoot, latestVersion(spark, manifestRoot)))
        val del = live.filter(pred).count()
        val sStaging = path + ".replace_surv_" + java.util.UUID.randomUUID()
        live.filter(!coalesce(pred, lit(false)))
          .write.mode("overwrite").parquet(sStaging)
        (Layout.moveStagedIn(spark, sStaging, path), del)
      }
    val bMoved = Layout.moveStagedIn(spark, bStaging, path)
    val keep =
      if (hit.isEmpty) manifest
      else manifest.filter(!col("file").isInCollection(hit.map(_.file)))
    val adds = survivorFiles ++ bMoved
    val next =
      if (adds.isEmpty) keep
      else keep.unionByName(Layout.buildManifestFor(spark, adds, cols),
        allowMissingColumns = true)
    ReplaceResult(commit(spark, next, manifestRoot), rewrite.size.toLong,
      total, deleted + dropped.values.sum, bMoved.size.toLong,
      dropped.size.toLong)
  }

  final case class HistoryEntry(version: Int, operation: String, rows: Long)

  /** DESCRIBE HISTORY over the version log: one entry per commit with the
    * OPERATION inferred from the log itself — no writer cooperation
    * needed. Markers classify what manifests can't (`_restore_*`,
    * column-mapping commits); everything else falls out of the
    * (file, dv)-pair diff against the previous version plus the manifest
    * row counts: adds-only ⇒ append, dv-pointer-only movement ⇒
    * mor-delete, equal rows across a changed file set ⇒ relayout
    * (compaction/purge), shrinking rows ⇒ delete, growing rows with
    * rewrites ⇒ merge. Planner-side work, version × file-count bounded;
    * `rows` is the manifest row count (for MoR versions that includes
    * masked rows — the physical count, like the formats' own histories). */
  def history(spark: SparkSession, manifestRoot: String): Seq[HistoryEntry] = {
    val vs = versions(spark, manifestRoot)
    val fs = hfs(spark, manifestRoot)
    var prevEntries: Set[Dv.Entry] = Set.empty
    var prevRows = 0L
    vs.map { v =>
      val m = Dv.ensureDv(manifestAt(spark, manifestRoot, v))
      val entries = Dv.entries(m).toSet
      val rows = m.agg(sum(col("rows"))).collect()(0).getLong(0)
      val markers = fs
        .listStatus(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"))
        .toSeq.map(_.getPath.getName)
      val op =
        if (markers.exists(_.startsWith("_restore_"))) "restore"
        else if (v == vs.head) "create"
        else if (markers.exists(_.startsWith(CmapPrefix))) "schema"
        else {
          val added = entries -- prevEntries
          val removed = prevEntries -- entries
          val sameFiles = entries.map(_.file) == prevEntries.map(_.file)
          if (added.isEmpty && removed.isEmpty) "metadata"
          else if (sameFiles) "mor-delete"
          else if (removed.isEmpty) "append"
          else if (rows == prevRows) "relayout"
          else if (rows < prevRows) "delete"
          else "merge"
        }
      prevEntries = entries; prevRows = rows
      HistoryEntry(v, op, rows)
    }
  }

  /** Re-home governing markers out of about-to-drop version dirs (markers
    * are empty files whose NAME carries the payload, so "copy" = create
    * the same name in the oldest RETAINED version's dir):
    *  - the newest column-mapping / constraint-set marker at-or-below the
    *    cut is the one in force for every retained version — if it lives
    *    in a dropped dir, recreate it at the cut (superseding-set
    *    semantics at every surviving version are unchanged; history below
    *    the cut is gone anyway);
    *  - ADD COLUMN type markers ACCUMULATE (declaredTypes unions all ≤ v),
    *    so every one in a dropped dir moves to the cut.
    * Without this, a vacuum reaching past the last schema/constraint
    * commit would silently strip the table of its renames, declared
    * columns, or write contracts. */
  private def preserveMarkers(spark: SparkSession, manifestRoot: String,
                              drop: Seq[Int], cut: Int): Unit = {
    if (drop.isEmpty) return
    val fs = hfs(spark, manifestRoot)
    val dropSet = drop.toSet
    def names(v: Int): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$manifestRoot/v=$v"))
        .toSeq.map(_.getPath.getName)
    def rehome(marker: String): Unit =
      fs.create(new org.apache.hadoop.fs.Path(
        s"$manifestRoot/v=$cut/$marker"), true).close()
    val below = versions(spark, manifestRoot).filter(_ <= cut).sorted.reverse
    // props may CHUNK across several markers in one commit dir — rehome
    // every chunk of the newest carrying version, or the surviving map
    // would silently lose the keys of the unmoved chunks
    for (prefix <- Seq(CmapPrefix, CkPrefix, PropsPrefix)) {
      below.iterator
        .map { v =>
          val ms = names(v).filter(_.startsWith(prefix))
          if (ms.isEmpty) None else Some((v, ms))
        }
        .collectFirst { case Some(hit) => hit }
        .foreach { case (v, ms) =>
          if (dropSet.contains(v)) ms.foreach(rehome) }
    }
    drop.foreach(v => names(v).filter(n =>
        n.startsWith(AddColPrefix) || n.startsWith(CopyPrefix))
      .foreach(rehome))
  }

  /** [[vacuum]] by RETENTION PERIOD (the `VACUUM ... RETAIN n HOURS`
    * form): expires every version whose commit timestamp (q130's
    * in-commit stamps) is strictly older than `cutoffMs`, always
    * retaining at least the latest version — then reclaims files exactly
    * as [[vacuum]] does. Resolution reuses [[versionAtTimestamp]]: the
    * newest version at-or-before the cutoff is the oldest survivor
    * (pinning it keeps `AS OF cutoff` time travel working — the retention
    * contract users actually rely on). */
  def vacuumRetention(spark: SparkSession, path: String, manifestRoot: String,
                      cutoffMs: Long): VacuumResult =
    vacuum(spark, path, manifestRoot,
      retainLast = retentionRetain(spark, manifestRoot, cutoffMs))

  /** [[vacuumPlan]] for the retention-period form — same resolution as
    * [[vacuumRetention]], nothing touched. */
  def vacuumRetentionPlan(spark: SparkSession, path: String,
                          manifestRoot: String, cutoffMs: Long): VacuumPlan =
    vacuumPlan(spark, path, manifestRoot,
      retainLast = retentionRetain(spark, manifestRoot, cutoffMs))

  private def retentionRetain(spark: SparkSession, manifestRoot: String,
                              cutoffMs: Long): Int = {
    val vs = versions(spark, manifestRoot)
    require(vs.nonEmpty, s"no committed versions under $manifestRoot")
    val survivor =
      try versionAtTimestamp(spark, manifestRoot, cutoffMs)
      catch { case _: Exception => vs.head } // cutoff predates the log
    vs.count(_ >= survivor).max(1)
  }

  /** RESTORE to `toVersion` as a NEW head commit (the Delta `RESTORE
    * TABLE ... TO VERSION AS OF` shape — north-star depth beyond the
    * reference's overwrite loads, run_load.py:61): the restored manifest
    * is the target version's
    * manifest re-committed at the head — roll-FORWARD, so history between
    * the target and the old head stays pinnable, and the bad commits can
    * still be audited through the change feed. Zero data files are
    * written, moved, or deleted: the commit re-references files every
    * prior version already references (which is also why a restore is
    * only valid while those versions survive [[vacuum]]). When the table
    * carries a column mapping, the mapping IN FORCE AT THE TARGET is
    * re-asserted on the restore commit — otherwise marker resolution
    * (largest version ≤ head) would serve the abandoned head's schema
    * over restored data. */
  def restoreCommit(spark: SparkSession, manifestRoot: String,
                    toVersion: Int): Int = {
    val vs = versions(spark, manifestRoot)
    require(vs.contains(toVersion),
      s"restore: no version $toVersion under $manifestRoot (have $vs)")
    val head = vs.last
    val targetMap = columnMapping(spark, manifestRoot, toVersion)
    val headMap = columnMapping(spark, manifestRoot, head)
    val markers =
      if (targetMap == headMap) Seq.empty
      else Seq(cmapMarker(targetMap.getOrElse(
        // the head mapped names but the target predates every mapping:
        // the restore must re-expose raw physical names → identity map
        tableAt(spark, manifestRoot, toVersion).columns
          .map(c => c -> c).toMap)))
    commit(spark, manifestAt(spark, manifestRoot, toVersion), manifestRoot,
      markers = markers :+ s"_restore_$toVersion")
  }

  /** SHALLOW CLONE: initialize a fresh manifest root whose v=1 is the
    * source's pinned manifest — zero data files copied; the clone
    * references the source's files by the same absolute paths the source
    * manifest carries. From that point the two logs evolve independently:
    * commits on the clone (appends/deletes staged into the CLONE's data
    * dir) are invisible to the source and vice versa, because immutable
    * data files are only ever superseded by new manifests, never edited.
    * The source's column mapping at the pinned version travels with the
    * clone. Documented hazard (shared with every shallow-clone design):
    * a [[vacuum]] on the SOURCE can reclaim files the clone still
    * references — don't vacuum a cloned-from table, or deep-copy first. */
  def cloneCommit(spark: SparkSession, srcRoot: String, dstRoot: String,
                  version: Int): Int = {
    require(versions(spark, dstRoot).isEmpty,
      s"clone destination $dstRoot already has commits")
    val markers = columnMapping(spark, srcRoot, version).map(cmapMarker).toSeq
    commit(spark, manifestAt(spark, srcRoot, version), dstRoot,
      markers = markers :+ s"_clone_v$version")
  }

  final case class DeepCloneResult(version: Int, filesCopied: Long,
                                   bytesCopied: Long)

  /** DEEP CLONE — an independent PHYSICAL copy of one version: every live
    * data file and referenced DV sidecar is copied into the destination
    * directory by an EXECUTOR-PARALLEL job, and the destination's v1
    * references the copies. Unlike [[cloneCommit]] (the zero-copy fork)
    * the result shares no storage with the source, so vacuuming, purging,
    * or deleting the source can never invalidate it — the migration /
    * backup statement. At 100 TB the byte copy IS the whole cost, which
    * is why it runs as a Spark job over the file list (driver work stays
    * file-count-bounded: listing, name mapping, the manifest remap) —
    * never a driver-side byte loop. Executors resolve filesystems from a
    * BROADCAST of the session's Hadoop configuration
    * ([[org.apache.spark.util.SerializableConfiguration]]), so schemes
    * that need session config (s3a credentials, custom FS impls) resolve
    * the same FS on executors as on the driver. Column mapping is
    * re-asserted like the shallow twin; stats carry over unchanged (a
    * byte copy cannot move min/max). */
  def deepCloneCommit(spark: SparkSession, srcRoot: String, dstPath: String,
                      dstRoot: String, version: Int): DeepCloneResult = {
    require(versions(spark, dstRoot).isEmpty,
      s"clone destination $dstRoot already has commits")
    val m = pinLocal(Dv.ensureDv(manifestAt(spark, srcRoot, version)))
    val entries = Dv.entries(m)
    require(entries.nonEmpty, "DEEP CLONE of an empty version")
    val conf = spark.sparkContext.hadoopConfiguration
    val dstDir = new org.apache.hadoop.fs.Path(dstPath)
    val fs = dstDir.getFileSystem(conf)
    fs.mkdirs(dstDir) : Unit
    def base(p: String) = new org.apache.hadoop.fs.Path(p).getName
    require(entries.map(e => base(e.file)).distinct.size == entries.size,
      "DEEP CLONE source has colliding data-file names")
    val dataPairs = entries.map(e => e.file ->
      fs.makeQualified(new org.apache.hadoop.fs.Path(dstDir, base(e.file)))
        .toString)
    // data files: plain executor-parallel byte copy; the session conf
    // rides along as a broadcast so executor-side FS resolution matches
    // the driver's (credentials, custom schemes)
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val bytes = spark.sparkContext
      .parallelize(dataPairs, math.max(1, math.min(dataPairs.size, 64)))
      .map { case (s, d) =>
        val c = bcConf.value.value
        val sp = new org.apache.hadoop.fs.Path(s)
        val dp = new org.apache.hadoop.fs.Path(d)
        val dfs = dp.getFileSystem(c)
        org.apache.hadoop.fs.FileUtil.copy(
          sp.getFileSystem(c), sp, dfs, dp, false, true, c) : Unit
        dfs.getFileStatus(dp).getLen
      }
      .fold(0L)(_ + _)
    // sidecars canNOT be byte-copied: their rows key masks by the SOURCE
    // file paths. Each referenced sidecar is REWRITTEN through the path
    // remap (a small Spark job per sidecar, mask-size-bounded); rows for
    // files outside this version's manifest drop (a shared sidecar may
    // carry other versions' masks the clone never references)
    val remap = spark.createDataFrame(dataPairs).toDF("_of", "_nf")
    val dvDirs = entries.flatMap(_.dv).distinct
    val dvDirMap = dvDirs.map { d =>
      d -> fs.makeQualified(
        new org.apache.hadoop.fs.Path(s"$dstPath/_dv/${base(d)}")).toString
    }.toMap
    val dvBytes = dvDirMap.toSeq.map { case (srcDv, dstDv) =>
      spark.read.parquet(srcDv)
        .join(org.apache.spark.sql.functions.broadcast(remap),
          col(Dv.FileCol) === col("_of"))
        .select(col("_nf").as(Dv.FileCol), col(Dv.PosCol))
        .coalesce(1).write.mode("overwrite").parquet(dstDv)
      val dp = new org.apache.hadoop.fs.Path(dstDv)
      dp.getFileSystem(conf).getContentSummary(dp).getLength
    }.sum
    // manifest remap through broadcast joins (file-count-bounded frames);
    // stats columns ride along untouched
    val fdf = spark.createDataFrame(dataPairs).toDF("file", "_nf")
    val remappedFile = m
      .join(org.apache.spark.sql.functions.broadcast(fdf), Seq("file"))
      .withColumn("file", col("_nf")).drop("_nf")
    val next =
      if (dvDirMap.isEmpty) remappedFile
      else {
        val ddf = spark.createDataFrame(dvDirMap.toSeq).toDF("dv", "_nd")
        remappedFile
          .join(org.apache.spark.sql.functions.broadcast(ddf), Seq("dv"),
            "left")
          .withColumn("dv", coalesce(col("_nd"), col("dv"))).drop("_nd")
      }
    val markers = columnMapping(spark, srcRoot, version).map(cmapMarker).toSeq
    val v = commit(spark, next, dstRoot,
      markers = markers :+ s"_deepclone_v$version")
    DeepCloneResult(v, (dataPairs.size + dvDirMap.size).toLong,
      bytes + dvBytes)
  }
}
