package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.{Layout, Snapshots}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf = Seq(
    (1L, ts("2024-01-01 10:05:00"), 1L, "view", 1.0, "{}"),
    (2L, ts("2024-01-01 10:45:00"), 1L, "view", 2.0, "{}"),
    (3L, ts("2024-01-01 11:05:00"), 2L, "click", 3.0, "{}"),
    (4L, ts("2024-01-01 11:55:00"), 2L, "view", 4.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("tumblingAgg buckets by hour") {
    val out = Streaming.tumblingAgg(eventsDf, "1 hour")
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Timestamp]("window_start") == ts("2024-01-01 10:00:00"))
    assert(out(0).getAs[Long]("n") == 2L)
    assert(out(0).getAs[Double]("total") == 3.0)
  }

  test("streaming tumbling agg over a file stream matches the batch plan") {
    val dir = tmpDir("stream-in")
    val out = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    eventsDf.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val stream = Streaming.readEventsStream(spark, s"$dir/events.parquet")
    // complete mode result needs an aggregation sink; use AvailableNow + append
    // with watermark so finalized windows are emitted.
    val agg = Streaming.streamingTumblingAgg(stream, "1 hour", "1 minute")
    val q = Streaming.writeOnce(agg, out, ckpt).start()
    q.awaitTermination(60000)

    val streamed = spark.read.parquet(out)
      .orderBy("window_start", "event_type").collect()
    val batch = Streaming.tumblingAgg(eventsDf, "1 hour")
      .orderBy("window_start", "event_type").collect()
    // append mode with watermark emits only windows sealed by the final
    // watermark: all but the last window (no events arrive after 11:55).
    assert(streamed.nonEmpty)
    val batchMap = batch.map(r =>
      (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type")) -> r).toMap
    streamed.foreach { s =>
      val b = batchMap(
        (s.getAs[Timestamp]("window_start"), s.getAs[String]("event_type")))
      assert(s.getAs[Long]("n") == b.getAs[Long]("n"))
      assert(s.getAs[Double]("total") == b.getAs[Double]("total"))
    }
  }

  test("streamingDedup drops duplicate keys within the watermark") {
    val dir = tmpDir("dedup-in")
    val out = tmpDir("dedup-out")
    val ckpt = tmpDir("dedup-ckpt")
    // two rows share event_id=1 -> one survives
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (1L, ts("2024-01-01 10:00:30"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val stream = Streaming.readEventsStream(spark, s"$dir/events.parquet")
    val deduped = Streaming.streamingDedup(stream, Seq("event_id"), "10 minutes")
    val q = deduped.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out).start()
    q.awaitTermination(60000)

    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
  }

  test("streamingDedup runs on the RocksDB state store (the 100-TB state path)") {
    // HDFSBackedStateStore keeps every key on the JVM heap — fine for the
    // replay harness, fatal for billion-key dedup state. RocksDB spills
    // state to local disk; this proves the same plan runs unchanged under
    // the provider a real cluster would configure.
    val dir = tmpDir("rocks-in")
    val out = tmpDir("rocks-out")
    val ckpt = tmpDir("rocks-ckpt")
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (1L, ts("2024-01-01 10:00:30"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = Streaming.readEventsStream(spark, s"$dir/events.parquet")
      val deduped = Streaming.streamingDedup(stream, Seq("event_id"), "10 minutes")
      val q = deduped.writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      assert(q.awaitTermination(120000))
      val rows = spark.read.parquet(out).collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(1L, 2L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sessionAgg groups by gap-based session windows") {
    val out = Streaming.sessionAgg(eventsDf, "30 minutes")
      .orderBy("session_start").collect()
    // user 1: 10:05 & 10:45 with 30m gap -> 40m apart -> 2 sessions
    // user 2: 11:05 & 11:55 -> 2 sessions
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("n_events") == 1L))
  }

  test("contaminationScreenStream flags bench overlap per batch, no state") {
    val root = tmpDir("decontam")
    new java.io.File(s"$root/in").mkdirs()
    // 3-gram shingles; bench holds "a b c". Doc 11 contains it (2 shared
    // shingles would need 2 bench grams — here exactly one), doc 12 shares
    // nothing, doc 13 (day 1) contains it twice but distinct-counts once.
    val bench = Seq((100L, "a b c x")).toDF("doc_id", "text")
    val benchH = graft.ext.Curation
      .wordShingleHashes(bench, "doc_id", "text", 3)
      .select(col("h")).distinct().localCheckpoint()
    val days = Seq(
      Seq((11L, "z a b c z", 0), (12L, "q r s t", 0)),
      Seq((13L, "a b c a b c", 1)))
    val t0 = System.currentTimeMillis()
    days.zipWithIndex.foreach { case (rows, d) =>
      val staging = s"$root/staging$d"
      rows.toDF("doc_id", "text", "day").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dest = new java.io.File(s"$root/in/day$d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(t0 + d * 2000L))
    }
    val schema = spark.read.parquet(s"$root/in").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.contaminationScreenStream(stream, "doc_id", "text",
        Seq("day"), benchH, n = 3, s"$root/out", s"$root/ckpt").start()
      assert(q.awaitTermination(120000))
    }
    run()
    def flagged() = spark.read.parquet(s"$root/out")
      .select("doc_id", "n_shared").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = flagged()
    // doc 11: shares the "a b c" shingle; doc 13: same shingle appears
    // twice in-doc but counts distinct = 1 (plus "b c a"/"c a b"? not in
    // bench — bench grams are "a b c","b c x"); doc 12 absent entirely
    assert(v == Map(11L -> 1L, 13L -> 1L))
    // restart over the same checkpoint: nothing re-emitted, unchanged
    run()
    assert(flagged() == v)
  }

  test("heavyHitterStream carries the MG summary across batches, k-bounded") {
    val root = tmpDir("hhstream")
    new java.io.File(s"$root/in").mkdirs()
    // "hot" appears 30× spread across all 3 batches (share 30/90 = 1/3 —
    // far above 1/k); each batch alone also carries 20 distinct cold keys.
    // A summary that fails to carry across triggers undercounts hot below
    // the exact threshold; per-batch k-bounding keeps every summary ≤ k−1.
    val t0 = System.currentTimeMillis()
    (0 until 3).foreach { d =>
      val rows = (0 until 10).map(_ => s"hot") ++
        (0 until 20).map(i => s"cold_${d}_$i")
      val staging = s"$root/staging$d"
      rows.toDF("tok").coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dest = new java.io.File(s"$root/in/day$d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(t0 + d * 2000L))
    }
    val schema = spark.read.parquet(s"$root/in").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.heavyHitterStream(stream, "tok", k = 8,
        s"$root/store", s"$root/ckpt").start()
      assert(q.awaitTermination(120000))
    }
    run()
    val sk = Streaming.latestSummary(spark, s"$root/store", Long.MaxValue).get
    assert(sk.n == 90L, "n must be the exact stream length")
    assert(sk.keys.length <= 7, "summary must stay k-1 bounded")
    assert(sk.keys.contains("hot"),
      "a key with share 1/3 > 1/8 must survive the cross-batch merges")
    // MG residual undercounts by at most n/k
    val res = sk.keys.zip(sk.residuals).toMap.apply("hot")
    assert(res >= 30L - 90L / 8 && res <= 30L)
    // every per-batch summary held at most k-1 keys too
    (0 until 3).foreach { b =>
      val s = Streaming.latestSummary(spark, s"$root/store", b + 1L).get
      assert(s.keys.length <= 7)
    }
    // restart over the same checkpoint: no re-processing, summary unchanged
    run()
    val again = Streaming.latestSummary(spark, s"$root/store", Long.MaxValue).get
    assert(again.n == 90L && again.keys.sameElements(sk.keys))
  }

  test("exactScreenStream flags cross-batch dups and restarts idempotently") {
    val root = tmpDir("screen")
    new java.io.File(s"$root/in").mkdirs()
    val days = Seq(
      Seq((1L, "alpha text", 0), (2L, "beta text", 0)),
      Seq((3L, "alpha text", 1), (4L, "gamma text", 1), (5L, "gamma text", 1)),
      Seq((6L, "beta text", 2), (7L, "delta text", 2)))
    val t0 = System.currentTimeMillis()
    days.zipWithIndex.foreach { case (rows, d) =>
      val staging = s"$root/staging$d"
      rows.toDF("doc_id", "text", "day").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dest = new java.io.File(s"$root/in/day$d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(t0 + d * 2000L))
    }
    val schema = spark.read.parquet(s"$root/in").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.exactScreenStream(stream, "doc_id", "text",
        Seq("day"), s"$root/store", s"$root/out", s"$root/ckpt").start()
      assert(q.awaitTermination(120000))
    }
    run()
    def verdicts() = spark.read.parquet(s"$root/out")
      .select("doc_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val v = verdicts()
    // day0 never dup; doc 3 dups day0's alpha; docs 4/5 are SAME-day gammas
    // (not dups — the store holds only prior days); doc 6 dups day0's beta;
    // doc 7 is novel
    assert(v == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false,
      5L -> false, 6L -> true, 7L -> false))
    // restart over the same checkpoint: no new files, nothing re-emitted,
    // verdicts and store unchanged (per-batch overwrite dirs are stable)
    val storeRows = spark.read.parquet(s"$root/store").count()
    run()
    assert(verdicts() == v)
    assert(spark.read.parquet(s"$root/store").count() == storeRows)
  }

  test("ivmStream: feed-maintained view tracks commits; replays never double-append") {
    val root = tmpDir("ivm")
    def mk(lo: Int, hi: Int): DataFrame = (lo until hi).map(i =>
      (i.toLong, i % 4, i.toDouble)).toDF("id", "bucket", "v")
    Layout.zorderWrite(mk(0, 100), Seq("id", "v"), s"$root/z", nFiles = 4)
    Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$root/z", Seq("id", "v")), s"$root/m")
    def gold(df: DataFrame): DataFrame = df.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
    gold(Snapshots.tableAt(spark, s"$root/m", 1))
      .coalesce(1).write.parquet(s"$root/view/batch=-1")
    new java.io.File(s"$root/in").mkdirs()
    val t0 = System.currentTimeMillis()
    Seq((100, 150, 0), (150, 200, 1)).foreach { case (lo, hi, d) =>
      val staging = s"$root/staging$d"
      mk(lo, hi).coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dest = new java.io.File(s"$root/in/day$d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(t0 + d * 2000L))
    }
    def run(ckpt: String): Unit = {
      val schema = spark.read.parquet(s"$root/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.ivmStream(stream, Seq("id", "v"), Seq("bucket"),
        Seq("total" -> "v"), "cnt", s"$root/z", s"$root/m", s"$root/view",
        ckpt).start()
      assert(q.awaitTermination(120000))
    }
    run(s"$root/ckpt")
    assert(Snapshots.versions(spark, s"$root/m") == Seq(1, 2, 3))
    def finalView(): Set[(Int, Long, Double)] =
      spark.read.parquet(s"$root/view/batch=1").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val v1 = finalView()
    val expected = gold(mk(0, 200)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(v1 == expected)
    // HARD replay: a fresh checkpoint re-runs both batches from scratch —
    // the txn tags make the table commits idempotent (still exactly 3
    // versions, no double-appended rows) and the view chain rewrites to
    // the same state
    run(s"$root/ckpt_replay")
    assert(Snapshots.versions(spark, s"$root/m") == Seq(1, 2, 3))
    assert(Snapshots.tableAt(spark, s"$root/m", 3).count() == 200)
    assert(finalView() == v1)
  }

  test("store folding bounds file growth; verdicts identical with and without it") {
    // 8 single-doc days; every doc with an odd id duplicates the text of
    // id-1 from the PREVIOUS day, so cross-batch dup verdicts exercise the
    // store at every trigger depth, across fold boundaries
    def land(root: String): Unit = {
      new java.io.File(s"$root/in").mkdirs()
      val t0 = System.currentTimeMillis()
      (0 until 8).foreach { d =>
        val text = s"text number ${d / 2}"
        val staging = s"$root/staging$d"
        Seq((d.toLong, text, d)).toDF("doc_id", "text", "day").coalesce(1)
          .write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dest = new java.io.File(s"$root/in/day$d.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        assert(dest.setLastModified(t0 + d * 2000L))
      }
    }
    def run(root: String, every: Int): Map[Long, Boolean] = {
      val schema = spark.read.parquet(s"$root/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.exactScreenStream(stream, "doc_id", "text",
        Seq("day"), s"$root/store", s"$root/out", s"$root/ckpt",
        compactEvery = every).start()
      assert(q.awaitTermination(120000))
      spark.read.parquet(s"$root/out").select("doc_id", "is_dup").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    val rootFold = tmpDir("fold"); land(rootFold)
    val rootFlat = tmpDir("flat"); land(rootFlat)
    val vFold = run(rootFold, every = 2)
    val vFlat = run(rootFlat, every = 100) // never folds in 8 triggers
    // identical verdicts: fold is a pure re-layout of batch < id rows
    assert(vFold == vFlat)
    assert(vFold == (0 until 8).map(d => d.toLong -> (d % 2 == 1)).toMap)
    def batchDirs(root: String): Int =
      new java.io.File(s"$root/store").listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).count(f =>
          f.isDirectory && f.getName.startsWith("batch="))
    // folding kept the live generation bounded; flat grew one dir per batch
    assert(batchDirs(rootFold) <= 2, s"fold left ${batchDirs(rootFold)} dirs")
    assert(batchDirs(rootFlat) == 8)
    // restart over the same checkpoint with folding on: nothing re-emitted,
    // verdicts stable (replay idempotence survives the folds)
    assert(run(rootFold, every = 2) == vFold)
  }

  test("nearDupScreenStream: banded retrieval finds verbatim cross-batch " +
    "dups; exact confirm rejects near-but-not-identical candidates") {
    val root = tmpDir("ndscreen")
    new java.io.File(s"$root/in").mkdirs()
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val days = Seq(
      Seq((1L, base, 0), (2L, "entirely different content here", 0)),
      // doc 3 is a verbatim copy (must flag); doc 4 differs by ONE word —
      // its word shingles overlap heavily so banding pairs it with high
      // probability, and only the exact-text confirm keeps it false
      Seq((3L, base, 1),
        (4L, base + " extra", 1),
        (5L, "novel unrelated text", 1)))
    val t0 = System.currentTimeMillis()
    days.zipWithIndex.foreach { case (rows, d) =>
      val staging = s"$root/staging$d"
      rows.toDF("doc_id", "text", "day").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dest = new java.io.File(s"$root/in/day$d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(t0 + d * 2000L))
    }
    val schema = spark.read.parquet(s"$root/in").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      val q = Streaming.nearDupScreenStream(stream, "doc_id", "text",
        Seq("day"), s"$root/store", s"$root/lake", s"$root/out",
        s"$root/ckpt").start()
      assert(q.awaitTermination(120000))
    }
    run()
    def verdicts() = spark.read.parquet(s"$root/out")
      .select("doc_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val v = verdicts()
    assert(v == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false,
      5L -> false))
    // the near-miss doc 4 DID band-pair against the store (retrieval saw
    // it) — proving the confirm leg, not a banding miss, kept it false
    val sigs = spark.read.parquet(s"$root/store").filter(col("batch") === 0)
    val newSigs = graft.ext.Dedup.minHashSignaturesWords(
      Seq((4L, base + " extra")).toDF("doc_id", "text"), "doc_id", "text",
      n = 3, k = 32)
    val paired = graft.ext.Dedup.incrementalNearDupPairs(
      newSigs, sigs.drop("batch", "gen"), k = 32, bands = 8, threshold = 0.9)
    assert(paired.count() > 0,
      "decoy never banded — the precision assertion above is vacuous")
    // restart idempotence, same contract as the exact screen
    run()
    assert(verdicts() == v)
  }
}
