package graft.sql

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Round-15 item 2: `spark.readStream.table("lake.db.t")` — the
  * row-native streaming source over a lake table's version log, plus the
  * `$commits` metadata-only bridge addressed by name. */
class LakeStreamTableSpec extends SparkSpec {

  private def sql(s: String) = spark.sql(s)

  test("readStream.table serves ROWS; a checkpointed restart resumes at " +
      "the first unstreamed commit (exactly-once)") {
    sql("CREATE NAMESPACE IF NOT EXISTS lake.st")
    sql("DROP TABLE IF EXISTS lake.st.rows")
    sql("""CREATE TABLE lake.st.rows (k BIGINT, v STRING) USING lake
           TBLPROPERTIES ('stats_cols' = 'k', 'files' = '1')""")
    sql("INSERT INTO lake.st.rows VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO lake.st.rows VALUES (3, 'c')")
    val ckpt = tmpDir("st_ckpt")
    val out = tmpDir("st_out")

    def runOnce(): Unit = {
      // file sink: supports checkpoint RECOVERY (memory sink does not)
      val q = spark.readStream.table("lake.st.rows")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); ()
    }
    runOnce()
    val first = spark.read.parquet(out).orderBy("k")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v")))
    assert(first.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // two more commits while the stream is down; the restart reads ONLY
    // them (the file sink accumulates)
    sql("INSERT INTO lake.st.rows VALUES (4, 'd')")
    sql("INSERT INTO lake.st.rows VALUES (5, 'e')")
    runOnce()
    val all = spark.read.parquet(out).orderBy("k")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v")))
    assert(all.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")),
      s"restart re-emitted or skipped rows: ${all.mkString(",")}")
  }

  test("null columns and the supported leaf types round-trip") {
    sql("CREATE NAMESPACE IF NOT EXISTS lake.st")
    sql("DROP TABLE IF EXISTS lake.st.typed")
    sql("""CREATE TABLE lake.st.typed
           (k BIGINT, i INT, d DOUBLE, s STRING, ts TIMESTAMP, dt DATE,
            b BOOLEAN)
           USING lake TBLPROPERTIES ('stats_cols' = 'k', 'files' = '1')""")
    sql("""INSERT INTO lake.st.typed VALUES
           (1, 7, 1.5, 'x', TIMESTAMP '2026-01-02 03:04:05',
            DATE '2026-01-02', true),
           (2, NULL, NULL, NULL, NULL, NULL, NULL)""")
    val q = spark.readStream.table("lake.st.typed")
      .writeStream.format("memory").queryName("st_typed_sink")
      .option("checkpointLocation", tmpDir("st_ckpt2"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT k, i, d, s, CAST(ts AS STRING), CAST(dt AS STRING), b " +
        "FROM st_typed_sink ORDER BY k").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1 && rows(0).getInt(1) == 7 &&
      rows(0).getDouble(2) == 1.5 && rows(0).getString(3) == "x" &&
      rows(0).getString(4) == "2026-01-02 03:04:05" &&
      rows(0).getString(5) == "2026-01-02" && rows(0).getBoolean(6))
    assert(rows(1).getLong(0) == 2 && (1 to 6).forall(rows(1).isNullAt))
  }

  test("a non-append commit fails the stream loudly; ignoreDeletes " +
      "streams on") {
    sql("CREATE NAMESPACE IF NOT EXISTS lake.st")
    sql("DROP TABLE IF EXISTS lake.st.del")
    sql("""CREATE TABLE lake.st.del (k BIGINT) USING lake
           TBLPROPERTIES ('stats_cols' = 'k', 'files' = '1')""")
    sql("INSERT INTO lake.st.del VALUES (1), (2)")
    sql("DELETE FROM lake.st.del WHERE k = 1") // rewrite commit
    val q = spark.readStream.table("lake.st.del")
      .writeStream.format("memory").queryName("st_del_sink")
      .option("checkpointLocation", tmpDir("st_ckpt3"))
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(60000); ()
    }
    assert(e.getMessage.contains("non-append") ||
      Option(e.getCause).exists(_.getMessage.contains("non-append")))
    // opting in skips the removal, streams the rewrite's added files
    val q2 = spark.readStream.option("ignoreDeletes", "true")
      .table("lake.st.del")
      .writeStream.format("memory").queryName("st_del_sink2")
      .option("checkpointLocation", tmpDir("st_ckpt4"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val got = spark.sql("SELECT k FROM st_del_sink2 ORDER BY k").collect()
      .map(_.getLong(0))
    // v2 added the original file (1,2); v3's rewrite added the survivor
    // file (2) — re-delivery of rewritten rows is the documented
    // ignoreDeletes contract
    assert(got.toSeq == Seq(1L, 2L, 2L), got.mkString(","))
  }

  test("the $commits bridge serves (version, file) by name") {
    sql("CREATE NAMESPACE IF NOT EXISTS lake.st")
    sql("DROP TABLE IF EXISTS lake.st.br")
    sql("""CREATE TABLE lake.st.br (k BIGINT) USING lake
           TBLPROPERTIES ('stats_cols' = 'k', 'files' = '1')""")
    sql("INSERT INTO lake.st.br VALUES (1)")
    sql("INSERT INTO lake.st.br VALUES (2)")
    val q = spark.readStream.table("lake.st.`br$commits`")
      .writeStream.format("memory").queryName("st_br_sink")
      .option("checkpointLocation", tmpDir("st_ckpt5"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT version, file FROM st_br_sink ORDER BY version").collect()
    // v1 is the empty CREATE commit (no files); v2 and v3 add one each
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 3), rows.mkString(","))
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
  }
}
