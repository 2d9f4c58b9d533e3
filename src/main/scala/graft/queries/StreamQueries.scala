package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.model.Tables
import graft.sinks.{Layout, Snapshots}
import graft.streaming.{Stateful, Streaming}

/** Streaming semantics under the driver's DuckDB gate (SURVEY §2.10): each
  * query REPLAYS a real Structured Streaming run to completion — file-source
  * micro-batches (maxFilesPerTrigger=1 forces several), state store,
  * watermark advancement, append-mode emission — and returns the final
  * output as a batch DataFrame whose rows the oracle predicts in ANSI SQL.
  *
  * Determinism contract: file-stream batch ORDER is not deterministic, so
  * each replay is configured so its final output is order-independent —
  * the dedup uses a lateness wider than the data's event-time span (no row
  * can be late-dropped; cross-batch dedup still runs through the state
  * store), and the stateful counter is reduced by per-user MAX (the running
  * total's last value equals the group size no matter how rows were
  * batched). The order-DEPENDENT behaviors (late-data drops, timeout
  * eviction) stay in the streaming ScalaTest suites where batch boundaries
  * are pinned.
  */
object StreamQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The deterministic 30% events subset all three replays stream over. */
  private def eventsSubset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_id") % 10 < 3)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))

  /** Deterministic dup-injected subset of events: 30% of rows, with an
    * exact duplicate of every even-keyed row. */
  private def dupInjected(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsSubset(s, dir)
    ev.unionAll(ev.filter(col("event_id") % 2 === 0))
  }

  /** Land the shared events subset ONCE per sf dir and reuse it across the
    * replays (q63, q80) and across bench reps — previously every replay of
    * every rep re-wrote its own copy of the same subset. */
  private val sharedIn = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** q98's landed input (data files + trailing sentinel) — cached per sf
    * dir like [[sharedIn]], but separate because the sentinel row must not
    * leak into the other replays' inputs. */
  private val q98In = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** q124's landed input: the shared subset + trailing sentinel rows on
    * BOTH event types (the outer join flushes on the MIN of the two
    * sides' watermarks, so each side's stream must see its own flusher). */
  private val q124In = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** q273's landed variant input (data files + trailing sentinel). */
  private val q273In = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Data part-file names currently in `dir` (used to tell sentinel files
    * from data files after an append). */
  private def partNames(s: SparkSession, dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
  }

  /** Guarantee the just-appended sentinel file(s) are processed LAST:
    * FileStreamSource orders candidate files by modification time, and on
    * a mod-time TIE with a data file (fs timestamp granularity) it can
    * process a sentinel early — advancing the watermark thousands of days
    * past the data and late-dropping every real row (loud oracle diff, but
    * flaky). Explicitly stamps every file NOT in `before` to the max data
    * mtime + 2s, well past any filesystem timestamp granularity. */
  private def stampSentinelsLast(s: SparkSession, dir: String,
                                 before: Set[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(p).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
    val (sent, data) = all.partition(st => !before.contains(st.getPath.getName))
    require(sent.nonEmpty && data.nonEmpty,
      s"sentinel stamp: nothing to order in $dir")
    val last = data.map(_.getModificationTime).max + 2000L
    sent.foreach(st => fs.setTimes(st.getPath, last, -1))
  }

  private def landedSubset(s: SparkSession, dir: String): String =
    sharedIn.computeIfAbsent(dir, _ => {
      val tmp = QueryTmp.dir("stream_shared")
      eventsSubset(s, dir).repartition(2).write.parquet(s"$tmp/in")
      s"$tmp/in"
    })

  /** Land `df` as a multi-file parquet stream source and replay `transform`
    * over it one file per micro-batch; returns the appended output read
    * back as a batch frame. */
  private def replay(s: SparkSession, df: DataFrame, name: String,
                     nFiles: Int)(transform: DataFrame => DataFrame): DataFrame = {
    val tmp = QueryTmp.dir(name)
    df.repartition(nFiles).write.mode("overwrite").parquet(s"$tmp/in")
    replayLanded(s, s"$tmp/in", tmp)(stream => transform(stream()))
  }

  /** Replay `transform` over an already-landed parquet dir, one file per
    * micro-batch; the transform gets a STREAM FACTORY so it can open several
    * independent readers over the same files (stream-stream joins — each
    * side tracks its own file progress). */
  private def replayLanded(s: SparkSession, inDir: String, tmp: String)(
      transform: (() => DataFrame) => DataFrame): DataFrame = {
    val schema = s.read.parquet(inDir).schema
    def stream(): DataFrame = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    // State-store partition count is a data-volume dial: each micro-batch
    // commits one store per shuffle partition, so at replay scale (a few
    // thousand rows per trigger) 32 partitions is pure fixed overhead. Cap
    // it for the replay and restore — on a real cluster the same conf is
    // sized to the stream's key cardinality, not to this harness.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      math.min(prevParts.toInt, 8).toString)
    try {
      val q = Streaming.writeOnce(transform(stream _), s"$tmp/out", s"$tmp/ckpt")
        .start()
      // awaitTermination THROWS on stream failure but returns false on
      // timeout — a silent false would read a partial output directory and
      // report a bogus correctness diff.
      require(q.awaitTermination(300000), s"stream drain timed out: $tmp")
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    s.read.parquet(s"$tmp/out")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // dropDuplicatesWithinWatermark replayed across micro-batches: the
    // second copy of a key arriving in a LATER batch must be suppressed by
    // the state store, not batch-local dedup. Lateness exceeds the data's
    // span, so nothing is late-dropped and the output is exactly DISTINCT.
    "q62_stream_dedup" -> ((s, dir) => {
      // 2 files keep the cross-batch path hot (repartition scatters the
      // injected copies across files, so half the dup pairs straddle a
      // batch boundary) at half the per-trigger fixed cost of 4.
      replay(s, dupInjected(s, dir), "q62", nFiles = 2) { stream =>
        Streaming.streamingDedup(stream, Seq("event_id"), "3650 days")
      }.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    }),

    // flatMapGroupsWithState replayed across micro-batches: per-user running
    // totals must ACCUMULATE through the state store (a lost or reset state
    // yields totals below the group size). Append emits one row per
    // (user, batch); the final running total — per-user MAX — must equal
    // the plain GROUP BY count.
    "q63_stream_stateful" -> ((s, dir) => {
      import s.implicits._
      replayLanded(s, landedSubset(s, dir), QueryTmp.dir("q63")) { stream =>
        Stateful.runningUserStats(
          stream().select(col("user_id"), col("event_type")).as[Stateful.UserEvent]
        ).toDF()
      }.groupBy(col("user_id"))
        .agg(max(col("total_events")).as("n_events"))
    }),

    // Session-window aggregation replayed across micro-batches — the one
    // windowed-agg shape where append-mode emission needs care: a session
    // only emits once the watermark passes its END, and the watermark never
    // passes max(ts) - lateness, so a naive bounded replay emits nothing.
    // A sentinel row 20 years ahead (dedicated user) makes the single run
    // deterministic AND complete:
    //   - the input lands ONCE per sf dir (cached across bench reps, like
    //     q63/q80's shared subset): 2 data files, THEN the sentinel file —
    //     FileStreamSource processes discovered files oldest-modification-
    //     first, so the sentinel is always the LAST data trigger;
    //   - lateness (3650d) exceeds the data's span but not the sentinel's
    //     offset (7305d): no real row is ever late-dropped (every data file
    //     is processed before the sentinel moves the watermark), and once
    //     the sentinel batch commits, the watermark jumps past every real
    //     session's end — the trailing no-data batch emits them all. The
    //     sentinel's own session stays open forever (its end is always
    //     ahead of the watermark it creates).
    // One streaming run instead of the previous land+drain+append+drain
    // per rep — same emitted rows, half the trigger/commit fixed cost
    // (the q80 harness lesson applied to the session-window replay).
    // The oracle is the classic gap-and-islands rewrite: break when the
    // gap to the previous event is >= 2h (session windows are [ts, ts+gap),
    // merged on overlap — strictly-less comparison).
    "q98_stream_session_window" -> ((s, dir) => {
      val in = q98In.computeIfAbsent(dir, _ => {
        val d = QueryTmp.dir("q98in")
        val sub = eventsSubset(s, dir)
        sub.repartition(2).write.parquet(s"$d/in")
        val dataNames = partNames(s, s"$d/in")
        // No sentinel-user filter downstream, and that is LOAD-BEARING: a
        // filter on a grouping column is legally pushed below the
        // aggregation into the scan, which would drop the sentinel row
        // before it ever reaches the watermark node — the flush would
        // silently never fire. The sentinel needs no filter: its session
        // can never be emitted.
        sub.agg(max(col("ts")).as("ts")).select(
          lit(-1L).as("event_id"),
          (col("ts") + expr("INTERVAL 7305 DAYS")).as("ts"),
          lit(-1L).as("user_id"),
          lit("flush").as("event_type"),
          lit(0.0).as("value"))
          .coalesce(1).write.mode("append").parquet(s"$d/in")
        stampSentinelsLast(s, s"$d/in", dataNames)
        s"$d/in"
      })
      val tmp = QueryTmp.dir("q98")
      val schema = s.read.parquet(in).schema
      def stream(): DataFrame = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val agg =
        Streaming.streamingSessionAgg(stream(), gap = "2 hours",
          lateness = "3650 days")
          .select(col("user_id"),
            unix_micros(col("session_start")).as("session_start_us"),
            col("n_events"))
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        math.min(prevParts.toInt, 8).toString)
      try {
        val q = Streaming.writeOnce(agg, s"$tmp/out", s"$tmp/ckpt").start()
        require(q.awaitTermination(300000), s"stream drain timed out: $tmp")
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(s"$tmp/out")
    }),

    // STREAMING VARIANT (q273): the open-schema column under Structured
    // Streaming — multi-shape variant values land IN the stream's parquet
    // files (VariantType through FileStreamSource), each micro-batch
    // extracts the normalized key with the same coalesced variant_get
    // paths as q265, and a WATERMARKED weekly tumbling aggregation keyed
    // on the extracted value accumulates across batches. The q98
    // sentinel mechanics flush every real window (the sentinel's own
    // window stays forever unemittable, so no downstream filter is
    // needed — the q98 pushdown lesson). Scale shape: extraction is a
    // codegen projection inside the micro-batch; state is keyed on
    // (window, k) — bounded by the key domain, never corpus size.
    "q273_stream_variant" -> ((s, dir) => {
      val in = q273In.computeIfAbsent(dir, _ => {
        val d = QueryTmp.dir("q273in")
        val base = VariantQueries.variantEvents(s, dir)
          .select(col("event_id"), col("ts"), col("v"))
        base.repartition(2).write.parquet(s"$d/in")
        val dataNames = partNames(s, s"$d/in")
        base.agg(max(col("ts")).as("ts")).select(
          lit(-1L).as("event_id"),
          (col("ts") + expr("INTERVAL 7305 DAYS")).as("ts"),
          parse_json(lit("{\"cents\": 0, \"k\": -1}")).as("v"))
          .coalesce(1).write.mode("append").parquet(s"$d/in")
        stampSentinelsLast(s, s"$d/in", dataNames)
        s"$d/in"
      })
      val tmp = QueryTmp.dir("q273")
      val schema = s.read.parquet(in).schema
      val agg = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .withColumn("k", coalesce(
          variant_get(col("v"), "$.k", "bigint"),
          variant_get(col("v"), "$.data[0].k", "bigint"),
          variant_get(col("v"), "$.items[0].k", "bigint")))
        .withColumn("cents", coalesce(
          variant_get(col("v"), "$.cents", "bigint"),
          variant_get(col("v"), "$.data[0].cents", "bigint"),
          variant_get(col("v"), "$.items[0].cents", "bigint")))
        .withWatermark("ts", "3650 days")
        .groupBy(window(col("ts"), "7 days"), col("k"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("k"), col("n"), col("cents_sum"))
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        math.min(prevParts.toInt, 8).toString)
      try {
        val q = Streaming.writeOnce(agg, s"$tmp/out", s"$tmp/ckpt").start()
        require(q.awaitTermination(300000), s"stream drain timed out: $tmp")
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(s"$tmp/out")
    }),

    // STREAMING INGEST UNDER LIQUID CLUSTERING (q274): the q268
    // incremental-OPTIMIZE contract maintained INSIDE a stream —
    // foreachBatch appends each micro-batch to a CLUSTER BY table and
    // immediately re-clusters, and because only unclustered files
    // rewrite, each maintenance pass costs exactly THAT batch's files
    // (gated per batch: files_in == the files the INSERT just added),
    // never the accumulated table. This is the shape that keeps a
    // 100 TB continuously-ingested table permanently clustered at
    // per-batch cost. Post-drain gates: zero unclustered files remain,
    // a final OPTIMIZE is a commit-free no-op, and a cluster-key band
    // read skips files on manifest stats.
    "q274_stream_cluster_maintenance" -> ((s, dir) => {
      import graft.sql.LakeSql
      val root = QueryTmp.dir("q274")
      LakeSql.unregister("ord274")
      LakeSql.sql(s,
        s"""CREATE TABLE ord274
           |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
           |USING lake CLUSTER BY (o_custkey) LOCATION '$root'
           |TBLPROPERTIES ('stats_cols' = 'o_custkey,o_orderkey',
           |'files' = '2')""".stripMargin)
      // a third of orders: the gates (per-batch incrementality, zero
      // unclustered, no-op, prune) are size-independent; the fixture cost
      // is not — keep the replay in the board's q141-class budget
      val in = t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      in.repartition(3).write.mode("overwrite").parquet(s"$root/in")
      val schema = s.read.parquet(s"$root/in").schema
      val perBatchOk = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      def liveFiles(): Set[String] = Snapshots.manifestAt(s, s"$root/m",
          Snapshots.latestVersion(s, s"$root/m"))
        .select("file").collect().map(_.getString(0)).toSet
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val before = liveFiles()
          // the view lives in the MICRO-BATCH's session, so the INSERT
          // must parse there too (foreachBatch hands a cloned session)
          batch.createOrReplaceTempView(s"q274_b$id")
          LakeSql.sql(batch.sparkSession,
            s"INSERT INTO ord274 SELECT * FROM q274_b$id")
          val appended = liveFiles().diff(before).size
          val r = LakeSql.sql(s, "OPTIMIZE ord274").head()
          // incrementality DURING ingest: this pass rewrote exactly the
          // files the INSERT just added — everything older was already
          // clustered and stayed byte-untouched
          perBatchOk += (appended > 0 &&
            r.getAs[Long]("files_in") == appended.toLong)
          ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), s"q274 stream drain timed out")
      val batchesOk = perBatchOk.nonEmpty && perBatchOk.forall(identity)
      require(batchesOk, s"q274 per-batch maintenance gates: $perBatchOk")
      val vHead = Snapshots.latestVersion(s, s"$root/m")
      val noopOk = LakeSql.sql(s, "OPTIMIZE ord274").head()
        .getAs[Long]("files_in") == 0L
      require(noopOk, "q274 post-drain OPTIMIZE was not a no-op")
      val mf = Snapshots.manifestAt(s, s"$root/m", vHead).localCheckpoint()
      val unclustered = mf.filter(
        !coalesce(col(Snapshots.ClusteredCol), lit(false))).count()
      require(unclustered == 0L, s"q274 left $unclustered unclustered files")
      val Seq(mn, mx) = in.agg(min("o_custkey"), max("o_custkey"))
        .head().toSeq.map(_.toString.toLong)
      val hi = mn + (mx - mn) / 10
      val total = mf.count()
      val hit = mf.filter(col("min_o_custkey") <= lit(hi) &&
        col("max_o_custkey") >= lit(mn)).count()
      require(hit < total,
        s"q274 cluster-key band read $hit of $total files — no skipping")
      LakeSql.sql(s,
          "SELECT o_orderkey, o_custkey, o_totalprice FROM ord274")
        .withColumn("batches_ok", lit(batchesOk))
        .withColumn("noop_ok", lit(noopOk))
        .withColumn("pruned_ok", lit(hit < total))
    }),

    // CONTINUOUS exact-dedup screen (the q104 daily screen as a stream):
    // three "days" of documents land as one file each (mtime-ordered —
    // FileStreamSource processes oldest-first, maxFilesPerTrigger=1 makes
    // each day one micro-batch); every batch is screened against the
    // fingerprint store of the PRIOR batches via foreachBatch, then the
    // store grows by the batch's novel fingerprints. Batch boundaries are
    // pinned by construction, so the verdicts are the oracle's: a doc is a
    // dup iff an EARLIER day contains its text (same-day copies are not —
    // the store only ever holds prior days). Replay-idempotent per-batch
    // overwrite partition dirs (see Streaming.exactScreenStream).
    // Corpus: bases split across day 0/1 by id parity; %5 docs re-keyed
    // +100000 land on day 2 (guaranteed cross-day dups at every sf).
    "q108_stream_exact_screen" -> ((s, dir) => {
      val root = QueryTmp.dir("q108")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
      val aug = docs.select(col("doc_id"), col("text"),
          (col("doc_id") % 2).cast("int").as("day"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
            lit(2).cast("int").as("day")))
      new java.io.File(s"$root/in").mkdirs()
      val t0 = System.currentTimeMillis()
      (0 to 2).foreach { d =>
        val staging = s"$root/staging$d"
        aug.filter(col("day") === d).coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dest = new java.io.File(s"$root/in/day$d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        // pin the processing order even if the three writes land within
        // one mtime granule
        require(dest.setLastModified(t0 + d * 2000L))
      }
      val schema = s.read.parquet(s"$root/in").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        math.min(prevParts.toInt, 8).toString)
      try {
        val q = Streaming.exactScreenStream(stream, "doc_id", "text",
          throughCols = Seq("day"), storeDir = s"$root/store",
          outDir = s"$root/out", checkpoint = s"$root/ckpt").start()
        require(q.awaitTermination(300000), s"stream drain timed out: $root")
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(s"$root/out")
        .select(col("doc_id"), col("day"), col("is_dup"))
    }),

    // STREAMING BENCHMARK DECONTAMINATION (q233, round 15): q72's
    // eval-leakage guard run incrementally — training docs land in three
    // day files, each micro-batch joins its raw shingle stream against the
    // STATIC benchmark hash set (pre-shingled once, broadcast — no store,
    // no state: the verdict is a pure per-doc property, so batch order
    // cannot change results and the oracle is exactly q72's SQL over the
    // same landed corpus + the day column). Day 2 additionally lands
    // re-keyed VERBATIM copies of benchmark docs — the leak the screen
    // exists to catch — so the verdict set is structurally non-trivial.
    // Contract at 100 TB: per-release cost is the NEW docs' scan, never a
    // corpus re-scan.
    "q233_stream_decontam" -> ((s, dir) => {
      val root = QueryTmp.dir("q233")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
      val benchH = graft.ext.Curation
        .wordShingleHashes(docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", 8)
        .select(col("h")).distinct().localCheckpoint()
      val train = docs.filter(col("doc_id") % 50 =!= 0)
        .withColumn("day", (col("doc_id") % 3).cast("int"))
        .unionByName(docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
          .withColumn("day", lit(2).cast("int")))
      new java.io.File(s"$root/in").mkdirs()
      val t0 = System.currentTimeMillis()
      (0 to 2).foreach { d =>
        val staging = s"$root/staging$d"
        train.filter(col("day") === d).coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dest = new java.io.File(s"$root/in/day$d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        require(dest.setLastModified(t0 + d * 2000L))
      }
      val schema = s.read.parquet(s"$root/in").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.contaminationScreenStream(stream, "doc_id", "text",
        throughCols = Seq("day"), benchHashes = benchH, n = 8,
        outDir = s"$root/out", checkpoint = s"$root/ckpt").start()
      require(q.awaitTermination(300000), s"stream drain timed out: $root")
      s.read.parquet(s"$root/out")
        .select(col("doc_id"), col("day"), col("n_shared"))
    }),

    // CONTINUOUS near-dup screen (the q102 daily near-dup loop as a
    // stream): same 3-day landing as q108, but the per-batch screen is the
    // banded MinHash retrieval against the prior batches' SIGNATURE store
    // with exact-text confirmation against their landed lake — retrieval
    // by banding, precision by confirm, so the verdict is exactly "an
    // earlier day holds this text" (identical text ⇒ identical signature ⇒
    // same band keys: the banded retrieval cannot miss it; the confirm
    // kills every near-but-not-identical candidate). Day 2 adds both
    // verbatim cross-day dups (%5, re-keyed) and NEAR-dup decoys (%7==3,
    // one-token suffix): decoys band-pair against the store but must come
    // out is_dup=false — precision is load-bearing in the oracle.
    "q112_stream_neardup_screen" -> ((s, dir) => {
      val root = QueryTmp.dir("q112")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
      val aug = docs.select(col("doc_id"), col("text"),
          (col("doc_id") % 2).cast("int").as("day"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
            lit(2).cast("int").as("day")))
        .unionByName(docs.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(col("text"), lit(" q112near")).as("text"),
            lit(2).cast("int").as("day")))
      new java.io.File(s"$root/in").mkdirs()
      val t0 = System.currentTimeMillis()
      (0 to 2).foreach { d =>
        val staging = s"$root/staging$d"
        aug.filter(col("day") === d).coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dest = new java.io.File(s"$root/in/day$d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        require(dest.setLastModified(t0 + d * 2000L))
      }
      val schema = s.read.parquet(s"$root/in").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        math.min(prevParts.toInt, 8).toString)
      try {
        val q = Streaming.nearDupScreenStream(stream, "doc_id", "text",
          throughCols = Seq("day"), storeDir = s"$root/store",
          lakeDir = s"$root/lake", outDir = s"$root/out",
          checkpoint = s"$root/ckpt").start()
        require(q.awaitTermination(300000), s"stream drain timed out: $root")
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(s"$root/out")
        .select(col("doc_id"), col("day"), col("is_dup"))
    }),

    // CONTINUOUS materialized view over a versioned lake table (q117):
    // the q116 maintenance loop as a STREAM. Day 0 of orders is committed
    // as v1 and aggregated ONCE into the bootstrap view; days 1 and 2 land
    // as separate micro-batches, each append-committed to the table with a
    // batch-id TAG (exactly-once: a replayed batch finds its tag and skips
    // the double-append) and folded into the view purely from the commit's
    // change feed — the table is never re-aggregated. Gates: exactly 3
    // versions committed (one per day — no replay duplicates), and the
    // maintained view matches a from-scratch recompute of the final
    // snapshot (counts exact, sums to 1e-4). Emits the maintained view;
    // the oracle aggregates ALL orders, so a dropped batch, a double
    // commit, or a sign error each hash-mismatch.
    "q117_stream_ivm" -> ((s, dir) => {
      val root = QueryTmp.dir("q117")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          pmod(col("o_custkey"), lit(8)).as("bucket"), // long, like the oracle's %
          (col("o_orderkey") % 3).cast("int").as("day"))
      val zcols = Seq("o_custkey", "o_totalprice")
      def gold(df: DataFrame): DataFrame =
        df.groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
      Layout.zorderWrite(orders.filter(col("day") === 0).drop("day"),
        zcols, s"$root/z", nFiles = 8)
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      gold(Snapshots.tableAt(s, s"$root/m", 1))
        .coalesce(1).write.parquet(s"$root/view/batch=-1")
      new java.io.File(s"$root/in").mkdirs()
      val t0 = System.currentTimeMillis()
      (1 to 2).foreach { d =>
        val staging = s"$root/staging$d"
        orders.filter(col("day") === d).drop("day").coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dest = new java.io.File(s"$root/in/day$d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        require(dest.setLastModified(t0 + d * 2000L))
      }
      val schema = s.read.parquet(s"$root/in").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        math.min(prevParts.toInt, 8).toString)
      try {
        val q = Streaming.ivmStream(stream, zcols, Seq("bucket"),
          Seq("total" -> "o_totalprice"), "cnt", s"$root/z", s"$root/m",
          s"$root/view", s"$root/ckpt").start()
        require(q.awaitTermination(300000), s"stream drain timed out: $root")
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val versionsOk = Snapshots.versions(s, s"$root/m") == Seq(1, 2, 3)
      require(versionsOk, "q117 expected one commit per day, no duplicates")
      val view = s.read.parquet(s"$root/view/batch=1")
      val drift = view.as("i")
        .join(gold(Snapshots.tableAt(s, s"$root/m", 3)).as("r"),
          Seq("bucket"), "full_outer")
        .filter(col("i.cnt").isNull || col("r.cnt").isNull ||
          col("i.cnt") =!= col("r.cnt") ||
          abs(col("i.total") - col("r.total")) > 1e-4)
        .count()
      require(drift == 0,
        s"q117 streamed view drifts from recompute on $drift groups")
      view.select(col("bucket"), col("cnt"),
          round(col("total"), 2).as("total"))
        .withColumn("ivm_ok", lit(true))
        .withColumn("versions_ok", lit(versionsOk))
    }),

    // Stream-stream interval join replayed across micro-batches: view →
    // purchase attribution within 6 hours. Both sides stream from the
    // same landed files; lateness exceeds the data's span so no join state
    // expires before AvailableNow drains — every qualifying pair is emitted
    // exactly once regardless of batch interleaving, making the output the
    // plain batch interval join the oracle computes.
    "q80_stream_interval_join" -> ((s, dir) => {
      // 2 files × 2 streams still forces cross-batch joins through the
      // state store (matching view/purchase rows land in different
      // micro-batches); more files only multiply fixed batch overhead.
      replayLanded(s, landedSubset(s, dir), QueryTmp.dir("q80")) { stream =>
        val views = stream().filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("ts"), col("user_id"))
        val purchases = stream().filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts"), col("user_id"))
        Streaming.streamIntervalJoin(
          views, purchases, key = "user_id",
          interval = "6 hours", lateness = "3650 days")
          .select(col("l.user_id").as("user_id"),
            col("view_id"), col("purchase_id"),
            unix_micros(col("l.ts")).as("view_ts_us"),
            unix_micros(col("r.ts")).as("purchase_ts_us"))
      }
    }),

    // Stream-stream LEFT OUTER interval join: q80's attribution plus the
    // NO-CONVERSION rows — a view matching no purchase within 6 hours
    // null-pads once the watermark passes its window. Emission mechanics
    // (and why they are deterministic here): unmatched rows flush only
    // when the MIN of both sides' watermarks passes view.ts + 6h, so the
    // landed input appends a trailing sentinel of EACH event type (7305
    // days ahead, dedicated negative users). Lateness (3650 d) exceeds
    // the data's span but not the sentinels' offset: no real row is ever
    // late-dropped, every real unmatched view flushes in the trailing
    // batch, and the sentinels themselves can never emit (a sentinel
    // view's expiry is always ahead of the watermark it creates). The
    // q98 filter-pushdown lesson applies twice over: the event_type
    // filters that SPLIT the sides legitimately pass their own side's
    // sentinel, and the sentinel-user filter runs on the BATCH read-back
    // of the output — never inside the streaming plan, where it would be
    // pushed below the watermark node and silently kill the flush.
    "q124_stream_outer_join" -> ((s, dir) => {
      val in = q124In.computeIfAbsent(dir, _ => {
        val d = QueryTmp.dir("q124in")
        val sub = eventsSubset(s, dir)
        sub.repartition(2).write.parquet(s"$d/in")
        val dataNames = partNames(s, s"$d/in")
        val mx = sub.agg(max(col("ts")).as("ts"))
        def sentinel(id: Long, tpe: String) = mx.select(
          lit(id).as("event_id"),
          (col("ts") + expr("INTERVAL 7305 DAYS")).as("ts"),
          lit(id).as("user_id"),
          lit(tpe).as("event_type"),
          lit(0.0).as("value"))
        sentinel(-1L, "view").unionByName(sentinel(-2L, "purchase"))
          .coalesce(1).write.mode("append").parquet(s"$d/in")
        stampSentinelsLast(s, s"$d/in", dataNames)
        s"$d/in"
      })
      replayLanded(s, in, QueryTmp.dir("q124")) { stream =>
        val views = stream().filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("ts"), col("user_id"))
        val purchases = stream().filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts"), col("user_id"))
        Streaming.streamIntervalJoinOuter(
          views, purchases, key = "user_id",
          interval = "6 hours", lateness = "3650 days")
          .select(col("l.user_id").as("user_id"),
            col("view_id"), col("purchase_id"),
            unix_micros(col("l.ts")).as("view_ts_us"),
            unix_micros(col("r.ts")).as("purchase_ts_us"))
      }.filter(col("user_id") >= 0)
    }),

    // Stream-stream FULL OUTER interval join — q124 plus the symmetric
    // null-padding: a purchase no view could claim ALSO emits, (null, r),
    // once the combined watermark passes its state bound. Same landed
    // input (sentinels on both event types already exist — each side's
    // unmatched rows flush on the MIN of the two watermarks), same
    // emission determinism argument; the user_id must COALESCE across
    // sides because either can be null now. Sentinels still can't emit
    // (each side's expiry stays ahead of the watermark it creates), and
    // the `user_id >= 0` filter on the batch read-back drops nothing
    // real: sentinel users are negative by construction.
    "q131_stream_full_outer_join" -> ((s, dir) => {
      val in = q124In.computeIfAbsent(dir, _ => {
        val d = QueryTmp.dir("q124in")
        val sub = eventsSubset(s, dir)
        sub.repartition(2).write.parquet(s"$d/in")
        val dataNames = partNames(s, s"$d/in")
        val mx = sub.agg(max(col("ts")).as("ts"))
        def sentinel(id: Long, tpe: String) = mx.select(
          lit(id).as("event_id"),
          (col("ts") + expr("INTERVAL 7305 DAYS")).as("ts"),
          lit(id).as("user_id"),
          lit(tpe).as("event_type"),
          lit(0.0).as("value"))
        sentinel(-1L, "view").unionByName(sentinel(-2L, "purchase"))
          .coalesce(1).write.mode("append").parquet(s"$d/in")
        stampSentinelsLast(s, s"$d/in", dataNames)
        s"$d/in"
      })
      replayLanded(s, in, QueryTmp.dir("q131")) { stream =>
        val views = stream().filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("ts"), col("user_id"))
        val purchases = stream().filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts"), col("user_id"))
        Streaming.streamIntervalJoinFullOuter(
          views, purchases, key = "user_id",
          interval = "6 hours", lateness = "3650 days")
          .select(coalesce(col("l.user_id"), col("r.user_id")).as("user_id"),
            col("view_id"), col("purchase_id"),
            unix_micros(col("l.ts")).as("view_ts_us"),
            unix_micros(col("r.ts")).as("purchase_ts_us"))
      }.filter(col("user_id") >= 0)
    }),

    // Stream-stream RIGHT OUTER interval join (q164): q124's mirror —
    // every purchase appears once per claiming view, or once null-padded
    // when NO view preceded it within 6 hours (the orphan-conversion
    // audit). Same dual-sided-sentinel fixture as q124/q131; unmatched
    // rights flush when the combined watermark passes their bound.
    "q164_stream_right_outer_join" -> ((s, dir) => {
      val in = q124In.computeIfAbsent(dir, _ => {
        val d = QueryTmp.dir("q124in")
        val sub = eventsSubset(s, dir)
        sub.repartition(2).write.parquet(s"$d/in")
        val dataNames = partNames(s, s"$d/in")
        val mx = sub.agg(max(col("ts")).as("ts"))
        def sentinel(id: Long, tpe: String) = mx.select(
          lit(id).as("event_id"),
          (col("ts") + expr("INTERVAL 7305 DAYS")).as("ts"),
          lit(id).as("user_id"),
          lit(tpe).as("event_type"),
          lit(0.0).as("value"))
        sentinel(-1L, "view").unionByName(sentinel(-2L, "purchase"))
          .coalesce(1).write.mode("append").parquet(s"$d/in")
        stampSentinelsLast(s, s"$d/in", dataNames)
        s"$d/in"
      })
      replayLanded(s, in, QueryTmp.dir("q164")) { stream =>
        val views = stream().filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("ts"), col("user_id"))
        val purchases = stream().filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts"), col("user_id"))
        Streaming.streamIntervalJoinRightOuter(
          views, purchases, key = "user_id",
          interval = "6 hours", lateness = "3650 days")
          .select(col("r.user_id").as("user_id"),
            col("view_id"), col("purchase_id"),
            unix_micros(col("l.ts")).as("view_ts_us"),
            unix_micros(col("r.ts")).as("purchase_ts_us"))
      }.filter(col("user_id") >= 0)
    }),

    // Stream-stream LEFT SEMI interval join (q156): "which views
    // converted within 6 hours" — one row per converted view, emitted on
    // its FIRST matching purchase and dropped from state immediately
    // (the funnel-dedup shape without an extra dropDuplicates store over
    // an inner join). Same landed replay + lateness discipline as q80;
    // no sentinels needed — semi rows emit eagerly on match, and
    // unconverted views simply never emit.
    "q156_stream_semi_join" -> ((s, dir) => {
      replayLanded(s, landedSubset(s, dir), QueryTmp.dir("q156")) { stream =>
        val views = stream().filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("ts"), col("user_id"))
        val purchases = stream().filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts"), col("user_id"))
        Streaming.streamIntervalJoinSemi(views, purchases, key = "user_id",
          interval = "6 hours", lateness = "3650 days")
          .select(col("user_id"), col("view_id"),
            unix_micros(col("ts")).as("view_ts_us"))
      }
    }),

    // STREAM THE VERSION LOG (q144): the lake table as a Structured
    // Streaming SOURCE — a DataSource V2 MicroBatchStream whose offsets
    // are VERSION numbers and whose rows are the data files each commit
    // added (the metadata-only file-manifest bridge; the consumer reads
    // the named files as a normal distributed parquet scan inside
    // foreachBatch). Script: three append-only commits land BEFORE the
    // stream starts; Trigger.AvailableNow drains them; gates in-query:
    // the captured (version → file-set) map equals the manifest adds
    // exactly (driver-side, file-count-bounded); a RESTARTED query on the
    // same checkpoint re-emits NOTHING (exactly-once falls out of the
    // offset contract). Emits a pruned box read over the files the stream
    // delivered — which must reassemble the whole table.
    "q144_stream_table_commits" -> ((s, dir) => {
      val root = QueryTmp.dir("q144")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val zcols = Seq("o_custkey", "o_totalprice")
      Layout.zorderWrite(orders.filter(col("o_orderkey") % 3 === 0),
        zcols, s"$root/z", nFiles = 8)
      Snapshots.commit(s,
        Layout.buildManifest(s, s"$root/z", zcols), s"$root/m")
      (1 to 2).foreach { d =>
        Snapshots.appendCommit(s, orders.filter(col("o_orderkey") % 3 === d),
          zcols, s"$root/z", s"$root/m", nFiles = 4)
      }
      def drain(): Unit = {
        val q = s.readStream.format("graft.sources.v2.TableCommitsSource")
          .option("manifestRoot", s"$root/m").load()
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.coalesce(1).write.mode("append").parquet(s"$root/captured")
            ()
          }
          .start()
        require(q.awaitTermination(300000), s"q144 stream drain timed out")
      }
      drain()
      val captured = s.read.parquet(s"$root/captured")
        .collect().map(r => (r.getInt(0), r.getString(1)))
      val byVersion = captured.groupBy(_._1)
        .map { case (v, rs) => v -> rs.map(_._2).toSet }
      val adds = (1 to 3).map { v =>
        def files(x: Int): Set[String] =
          if (x < 1) Set.empty
          else Snapshots.manifestAt(s, s"$root/m", x)
            .select(col("file")).collect().map(_.getString(0)).toSet
        v -> (files(v) -- files(v - 1))
      }.toMap
      val filesOk = byVersion == adds && adds.values.forall(_.nonEmpty)
      require(filesOk, s"q144 streamed file sets diverge from manifest adds")
      // restart on the same checkpoint: nothing re-emits
      drain()
      val resumeOk =
        s.read.parquet(s"$root/captured").count() == captured.length.toLong
      require(resumeOk, "q144 restarted stream re-emitted committed offsets")
      s.read.parquet(captured.map(_._2).distinct: _*)
        .filter(col("o_custkey").between(30, 120))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .withColumn("files_ok", lit(filesOk))
        .withColumn("resume_ok", lit(resumeOk))
    }),

    // STREAM-STATIC BROADCAST ENRICHMENT (q174, round-12 verdict item 7 —
    // the simplest production streaming shape, previously uncovered): the
    // watermarked event stream is joined to the static customer dim with
    // the dim explicitly broadcast INSIDE the streaming plan (stateless
    // per micro-batch: the stream side never shuffles for the join, the
    // dim rides executor-resident), and each batch lands through the
    // idempotent foreachBatch `batch=<id>` sink. The broadcast is
    // asserted on the streaming query's OWN last executed plan (captured
    // from q.explain after the drain), not a batch-mode twin. Inner
    // stream-static joins are batch-order-invariant, so the replay is
    // deterministic; the oracle is the plain events⋈customer join.
    "q174_stream_static_join" -> ((s, dir) => {
      val inDir = landedSubset(s, dir)
      val tmp = QueryTmp.dir("q174")
      val schema = s.read.parquet(inDir).schema
      val dim = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .withWatermark("ts", "3650 days")
      val joined = Streaming.enrichWithDim(stream, dim,
        col("user_id") === col("c_custkey"))
      val q = Streaming.landBatchesStream(joined, s"$tmp/out", s"$tmp/ckpt")
        .start()
      require(q.awaitTermination(300000), "q174 stream drain timed out")
      val planBuf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(planBuf)) { q.explain() }
      val broadcastOk = planBuf.toString.contains("BroadcastHashJoin")
      require(broadcastOk,
        s"q174 stream-static join did not broadcast the dim:\n$planBuf")
      s.read.parquet(s"$tmp/out")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"),
          col("c_name"), col("c_mktsegment"))
        .withColumn("broadcast_ok", lit(broadcastOk))
    }),

    // STREAMING HEAVY HITTERS (q242, round 15): the q93 frequent-tokens
    // monitor as a stream — documents land in three day files, each
    // micro-batch folds into a Misra-Gries summary carried across
    // triggers (k counters of state forever; a streaming
    // groupBy(tok).count() would hold one state row per DISTINCT token).
    // After the drain, the final summary's candidates — a guaranteed
    // superset of every token with share > 1/k, under ANY batch split —
    // are re-counted exactly with one broadcast semi-join over the landed
    // corpus. A merge bug that drops a true heavy hitter shrinks the
    // emitted set and fails the hash compare against the exhaustive
    // oracle.
    "q242_stream_heavy_hitters" -> ((s, dir) => {
      val root = QueryTmp.dir("q242")
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
        .withColumn("day", (col("doc_id") % 3).cast("int"))
      new java.io.File(s"$root/in").mkdirs()
      val t0 = System.currentTimeMillis()
      (0 to 2).foreach { d =>
        val staging = s"$root/staging$d"
        docs.filter(col("day") === d).coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dest = new java.io.File(s"$root/in/day$d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        require(dest.setLastModified(t0 + d * 2000L))
      }
      val schema = s.read.parquet(s"$root/in").schema
      val toks = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val q = Streaming.heavyHitterStream(toks, "tok", k = 1024,
        storeDir = s"$root/store", checkpoint = s"$root/ckpt").start()
      require(q.awaitTermination(300000), s"stream drain timed out: $root")
      val sketch = Streaming.latestSummary(s, s"$root/store", Long.MaxValue)
        .getOrElse(sys.error("q242: no summary committed"))
      val minCount = math.ceil(0.002 * sketch.n).toLong
      val cand = s.createDataset(sketch.keys.toSeq)(
        org.apache.spark.sql.Encoders.STRING).toDF("tok")
      s.read.parquet(s"$root/in")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .join(broadcast(cand), Seq("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)
    }),

    // STREAMING ANOMALY SCREEN (q254's median/MAD baseline as an alerting
    // stream): the event history replays as three DAY-ALIGNED dekad files
    // (a calendar day lands wholly in one trigger, so per-day counts are
    // complete per batch and the verdict set is batching-independent);
    // each micro-batch's (type, day) volumes join the broadcast STATIC
    // baseline and land robust-z verdicts. Per-trigger cost is the
    // batch's one hash-agg — the baseline history is never rescanned.
    "q261_stream_anomaly_screen" -> ((s, dir) => {
      val root = QueryTmp.dir("q261")
      val ev = t(s, dir, "events").select(col("event_type"), col("ts"))
      val daily = ev.groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy(col("event_type"))
        .agg(expr("percentile(n, 0.5)").as("med"))
      val baseline = daily.join(med, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
        .join(med, Seq("event_type"))
        .localCheckpoint()
      require(baseline.filter(col("mad") <= 0).isEmpty,
        "q261: a type's MAD collapsed to zero — the screen is vacuous")
      new java.io.File(s"$root/in").mkdirs()
      val t0 = System.currentTimeMillis()
      Seq((1, 10), (11, 20), (21, 31)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          val staging = s"$root/staging$i"
          ev.filter(dayofmonth(col("ts")).between(lo, hi)).coalesce(1)
            .write.mode("overwrite").parquet(staging)
          val part = new java.io.File(staging).listFiles()
            .filter(_.getName.startsWith("part-")).head
          val dest = new java.io.File(s"$root/in/dekad$i.parquet")
          java.nio.file.Files.move(part.toPath, dest.toPath)
          require(dest.setLastModified(t0 + i * 2000L))
      }
      val schema = s.read.parquet(s"$root/in").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.anomalyScreenStream(stream, "event_type", "ts",
        baseline, s"$root/out", s"$root/ckpt").start()
      require(q.awaitTermination(300000), s"q261 stream drain timed out")
      s.read.parquet(s"$root/out")
        .select(col("event_type"), col("day"), col("n"), col("med"),
          col("mad"), col("robust_z"), col("is_anomaly"))
    })
  )

  val oracle: Map[String, String] = Map(
    // q108: a doc is a dup iff an EARLIER day holds the same text — the
    // pinned batch order makes the streaming verdicts exactly this SQL.
    "q108_stream_exact_screen" ->
      """WITH aug AS (
        |  SELECT doc_id, text, CAST(doc_id % 2 AS INT) AS day
        |  FROM documents WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 100000, text, CAST(2 AS INT) AS day
        |  FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL)
        |SELECT a.doc_id, a.day,
        |  EXISTS(SELECT 1 FROM aug b
        |         WHERE b.text = a.text AND b.day < a.day) AS is_dup
        |FROM aug a""".stripMargin,
    // q233: q72's contamination SQL over the landed corpus (incl. the
    // planted verbatim bench copies) + the day column — the per-doc
    // verdict is batching-independent by construction.
    "q233_stream_decontam" ->
      """WITH aug AS (
        |  SELECT doc_id, text, CAST(doc_id % 3 AS INT) AS day
        |  FROM documents WHERE doc_id % 50 <> 0 AND text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 100000, text, CAST(2 AS INT) AS day
        |  FROM documents WHERE doc_id % 50 = 0 AND text IS NOT NULL),
        |ws AS (SELECT doc_id, day, string_split(text, ' ') AS w FROM aug),
        |sh AS (SELECT DISTINCT doc_id, day,
        |         md5(array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 7], ' ')) AS h
        |       FROM ws, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS u(i)),
        |bench AS (SELECT DISTINCT
        |            md5(array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 7], ' ')) AS h
        |          FROM (SELECT string_split(text, ' ') AS w FROM documents
        |                WHERE doc_id % 50 = 0 AND text IS NOT NULL),
        |            unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS u(i))
        |SELECT s.doc_id, s.day, count(*) AS n_shared
        |FROM sh s JOIN bench b ON s.h = b.h
        |GROUP BY 1, 2""".stripMargin,
    // q112: banded retrieval + exact confirm ⇒ dup iff an earlier day
    // holds the same text; the near-dup decoys (suffix-modified) must be
    // false — the EXISTS below is text EQUALITY, so they are.
    "q112_stream_neardup_screen" ->
      """WITH aug AS (
        |  SELECT doc_id, text, CAST(doc_id % 2 AS INT) AS day
        |  FROM documents WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 100000, text, CAST(2 AS INT) AS day
        |  FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 200000, text || ' q112near', CAST(2 AS INT) AS day
        |  FROM documents WHERE doc_id % 7 = 3 AND text IS NOT NULL)
        |SELECT a.doc_id, a.day,
        |  EXISTS(SELECT 1 FROM aug b
        |         WHERE b.text = a.text AND b.day < a.day) AS is_dup
        |FROM aug a""".stripMargin,
    // q117: the streamed, feed-maintained view must equal the aggregate
    // of everything committed — all three days, i.e. all orders.
    "q117_stream_ivm" ->
      """SELECT o_custkey % 8 AS bucket, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total,
        |  TRUE AS ivm_ok, TRUE AS versions_ok
        |FROM orders GROUP BY 1""".stripMargin,
    "q62_stream_dedup" ->
      """SELECT DISTINCT event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  user_id, event_type, value
        |FROM events WHERE event_id % 10 < 3""".stripMargin,
    "q63_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events
        |FROM events WHERE event_id % 10 < 3
        |GROUP BY user_id""".stripMargin,
    "q98_stream_session_window" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_id % 10 < 3),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 7200000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM m)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, grp""".stripMargin,
    // q274: the stream lands every order exactly once; maintenance is
    // content-invariant (pure re-layout), so the final table is the
    // plain projection. Gates ride as booleans.
    "q274_stream_cluster_maintenance" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS batches_ok, TRUE AS noop_ok, TRUE AS pruned_ok
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin,
    // q273: weekly tumbling windows are epoch-floored integer math
    // (Spark's window origin is the epoch), replayed exactly; k and
    // cents come from the same props/value derivations as q265.
    "q273_stream_variant" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000)
        |    * 604800000000 AS window_start_us,
        |  json_extract(props, '$.k')::BIGINT AS k,
        |  count(*) AS n,
        |  sum(round(value * 100)::BIGINT)::BIGINT AS cents_sum
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "q80_stream_interval_join" ->
      """SELECT l.user_id, l.event_id AS view_id, r.event_id AS purchase_id,
        |  epoch_us(CAST(l.ts AS TIMESTAMP)) AS view_ts_us,
        |  epoch_us(CAST(r.ts AS TIMESTAMP)) AS purchase_ts_us
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
        |WHERE l.event_type = 'view' AND r.event_type = 'purchase'
        |  AND l.event_id % 10 < 3 AND r.event_id % 10 < 3""".stripMargin,
    // q124: the left-outer twin — every subset view row appears exactly
    // once per matching purchase, or once null-padded when none exists;
    // the right-side predicates live in the ON clause (a WHERE would turn
    // the outer join back into an inner one).
    "q124_stream_outer_join" ->
      """SELECT l.user_id, l.event_id AS view_id, r.event_id AS purchase_id,
        |  epoch_us(CAST(l.ts AS TIMESTAMP)) AS view_ts_us,
        |  epoch_us(CAST(r.ts AS TIMESTAMP)) AS purchase_ts_us
        |FROM events l LEFT JOIN events r
        |  ON l.user_id = r.user_id
        | AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
        | AND r.event_type = 'purchase' AND r.event_id % 10 < 3
        |WHERE l.event_type = 'view' AND l.event_id % 10 < 3""".stripMargin,
    // q131: the full-outer twin — q124's rows plus every unclaimed
    // purchase as (null, r). Side filters live in subqueries, not ON/WHERE:
    // a WHERE on l would drop the unmatched-right rows a full join exists
    // to keep.
    "q131_stream_full_outer_join" ->
      """SELECT coalesce(l.user_id, r.user_id) AS user_id,
        |  l.event_id AS view_id, r.event_id AS purchase_id,
        |  epoch_us(CAST(l.ts AS TIMESTAMP)) AS view_ts_us,
        |  epoch_us(CAST(r.ts AS TIMESTAMP)) AS purchase_ts_us
        |FROM (SELECT * FROM events
        |      WHERE event_type = 'view' AND event_id % 10 < 3) l
        |FULL JOIN (SELECT * FROM events
        |      WHERE event_type = 'purchase' AND event_id % 10 < 3) r
        |  ON l.user_id = r.user_id
        | AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR""".stripMargin,
    // q164: the right-outer mirror of q124 — all pairs plus orphan
    // purchases with a null view side.
    "q164_stream_right_outer_join" ->
      """SELECT r.user_id AS user_id,
        |  l.event_id AS view_id, r.event_id AS purchase_id,
        |  epoch_us(CAST(l.ts AS TIMESTAMP)) AS view_ts_us,
        |  epoch_us(CAST(r.ts AS TIMESTAMP)) AS purchase_ts_us
        |FROM (SELECT * FROM events
        |      WHERE event_type = 'view' AND event_id % 10 < 3) l
        |RIGHT JOIN (SELECT * FROM events
        |      WHERE event_type = 'purchase' AND event_id % 10 < 3) r
        |  ON l.user_id = r.user_id
        | AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR""".stripMargin,
    // q156: the semi join emits each converted view exactly once —
    // DISTINCT over the inner pairs projected to the left side.
    "q156_stream_semi_join" ->
      """SELECT DISTINCT l.user_id, l.event_id AS view_id,
        |  epoch_us(CAST(l.ts AS TIMESTAMP)) AS view_ts_us
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
        |WHERE l.event_type = 'view' AND r.event_type = 'purchase'
        |  AND l.event_id % 10 < 3 AND r.event_id % 10 < 3""".stripMargin,
    // q144 reassembles the table from the streamed commit file-manifest:
    // three append-only commits cover all orders, so the emitted box read
    // is the full custkey box; the booleans assert manifest-exact file
    // delivery and exactly-once restart.
    "q144_stream_table_commits" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  TRUE AS files_ok, TRUE AS resume_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 30 AND 120""".stripMargin,
    // q174 emits the enriched stream: every replayed event joined to its
    // customer row — inner stream-static joins are batch-order-invariant,
    // so the streamed result is exactly the batch join.
    "q174_stream_static_join" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  user_id, event_type, value, c_name, c_mktsegment,
        |  TRUE AS broadcast_ok
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE event_id % 10 < 3""".stripMargin,
    // q242: the exhaustive heavy-hitter SQL (q93's shape) — the streaming
    // sketch's candidates re-counted exactly must equal this, or the
    // Misra-Gries merge lost a frequent token.
    "q242_stream_heavy_hitters" ->
      """WITH t AS (SELECT tok FROM documents,
        |             unnest(string_split(text, ' ')) AS u(tok)
        |           WHERE text IS NOT NULL),
        |c AS (SELECT tok, count(*) AS n FROM t GROUP BY 1)
        |SELECT tok, n FROM c
        |WHERE n >= ceil(0.002 * (SELECT sum(n) FROM c))""".stripMargin,
    // q261: q254's batch SQL verbatim — the streamed verdicts must equal
    // the all-at-once computation (day-aligned batching guarantees it).
    "q261_stream_anomaly_screen" ->
      """WITH d AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, median(n) AS med FROM d GROUP BY 1),
        |s AS (SELECT d.event_type, median(abs(d.n - m.med)) AS mad
        |      FROM d JOIN m ON d.event_type = m.event_type GROUP BY 1)
        |SELECT d.event_type, d.day, d.n,
        |  round(m.med, 2) AS med, round(s.mad, 2) AS mad,
        |  round((d.n - m.med) / (1.4826 * s.mad), 6) AS robust_z,
        |  abs(d.n - m.med) > 3 * 1.4826 * s.mad AS is_anomaly
        |FROM d JOIN m ON d.event_type = m.event_type
        |       JOIN s ON d.event_type = s.event_type""".stripMargin
  )
}
