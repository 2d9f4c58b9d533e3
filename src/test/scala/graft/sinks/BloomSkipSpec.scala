package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomSkipSpec extends SparkSpec {

  // id is UNCLUSTERED in the layout (z-ordered on x): interval stats on id
  // are useless, which is the regime blooms exist for
  private def data = spark.range(20000)
    .select(col("id"), pmod(xxhash64(col("id")), lit(1000)).as("x"))

  private def build(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = tmpDir("bloom")
    Layout.zorderWrite(data, Seq("x"), s"$dir/z", nFiles = 16)
    val files = spark.read.parquet(s"$dir/z")
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSeq
    val m = BloomSkip.manifestWithBloom(spark, files, Seq("x", "id"), "id")
      .localCheckpoint()
    (dir, m)
  }

  test("point lookup reads a fraction of the files stats would; result exact") {
    val (_, m) = build()
    val keys = spark.range(5).select((col("id") * 4021 + 13).as("id"))
    val pr = BloomSkip.pointRead(spark, m, "id", keys)
    val statsN = BloomSkip.statsCandidates(m, "id", keys)
    assert(pr.filesTotal >= 14) // ~16 requested; range split may merge one
    assert(statsN >= pr.filesTotal - 2) // control: stats prune ~nothing
    assert(pr.filesRead <= 8) // ≤ 5 true files + bloom false positives
    assert(pr.filesRead < statsN)
    val expected = data.join(keys, Seq("id"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(expected.size == 5)
    assert(pr.df.select("id").collect().map(_.getLong(0)).toSet == expected)
  }

  test("absent keys read at most false-positive files and return nothing") {
    val (_, m) = build()
    val keys = spark.range(5).select((col("id") + 1000000).as("id"))
    val pr = BloomSkip.pointRead(spark, m, "id", keys)
    assert(pr.df.isEmpty)
    assert(pr.filesRead <= 2) // fp-rate-bounded, typically 0
  }

  test("candidate plan is distributed: blooms never reach the driver") {
    val (_, m) = build()
    val keys = spark.range(5).select((col("id") * 4021 + 13).as("id"))
    val surviving = BloomSkip.survivingEntries(m, "id", keys)
    // the collected frame carries ONLY (file, dv) — the bloom column is
    // consumed inside the join and pruned before any driver materialization
    assert(surviving.columns.toSeq == Seq("file", "dv"))
    // the probe side is broadcast; no shuffle of the manifest's bloom column
    val plan = surviving.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"probe side should broadcast:\n$plan")
    // distributed verdict ≡ the driver-side reference evaluation
    val probes = keys
      .select(array((0 until BloomSkip.DefaultK).map(i =>
        pmod(xxhash64(col("id"), lit(i)), lit(BloomSkip.DefaultBits))
          .cast("int")): _*).as("ps"))
      .distinct().collect().map(_.getSeq[Int](0))
    val reference = m.select(col("file"), col("bloom_id")).collect()
      .filter(r => probes.exists(_.forall(r.getSeq[Int](1).toSet.contains)))
      .map(_.getString(0)).toSet
    val got = surviving.collect().map(_.getString(0)).toSet
    assert(got == reference)
  }

  test("bloomless manifest rows are mandatory candidates, not pruned") {
    // a manifest mixing generations — some rows with a bloom set, some
    // without (null) — must treat the bloomless files as un-prunable: the
    // bloom may only ever over-include, and a null membership verdict
    // silently dropping a file would lose matching rows from point reads
    val (_, m) = build()
    val stripped = m.withColumn("bloom_id",
      when(pmod(xxhash64(col("file")), lit(2)) === 0, col("bloom_id")))
    val nNull = stripped.filter(col("bloom_id").isNull).count()
    assert(nNull > 0 && nNull < stripped.count()) // genuinely mixed
    val keys = spark.range(5).select((col("id") * 4021 + 13).as("id"))
    val surviving = BloomSkip.survivingEntries(stripped, "id", keys)
      .collect().map(_.getString(0)).toSet
    // every bloomless file survives; bloomed files survive iff their bloom
    // admits a probe — so the point read still returns the exact rows
    val bloomless = stripped.filter(col("bloom_id").isNull)
      .select("file").collect().map(_.getString(0)).toSet
    assert(bloomless.subsetOf(surviving))
    val pr = BloomSkip.pointRead(spark, stripped, "id", keys)
    val expected = data.join(keys, Seq("id"), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pr.df.select("id").collect().map(_.getLong(0)).toSet == expected)
  }

  test("bloom point lookup composes with deletion vectors") {
    val (dir, _) = build()
    Snapshots.commit(spark,
      BloomSkip.manifestWithBloom(spark,
        spark.read.parquet(s"$dir/z").select(col("_metadata.file_path"))
          .distinct().collect().map(_.getString(0)).toSeq,
        Seq("x", "id"), "id"),
      s"$dir/m")
    val victim = spark.range(1).select((col("id") + 4034).as("id")) // 4034=4021+13
    Dv.deleteKeysMoR(spark, s"$dir/z", s"$dir/m", "id", victim)
    val m2 = Snapshots.manifestAt(spark, s"$dir/m",
      Snapshots.latestVersion(spark, s"$dir/m"))
    val keys = spark.range(5).select((col("id") * 4021 + 13).as("id"))
    val pr = BloomSkip.pointRead(spark, m2, "id", keys)
    val got = pr.df.select("id").collect().map(_.getLong(0)).toSet
    assert(!got.contains(4034L)) // the masked row cannot resurface
    assert(got.size == 4)
  }
}
