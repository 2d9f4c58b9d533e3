package graft.sinks

import java.util.Properties

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end staged-MERGE against embedded Derby — the in-JVM stand-in for
  * the reference's SQL warehouse (reference `run_load.py:57-96`): stage,
  * MERGE, drop stage, plus the reference's empty-input skip and the
  * duplicate-source-key failure its warehouse MERGE would raise. */
class DerbyUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_spec;create=true"
  private def props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  System.setProperty("derby.stream.error.file",
    tmpDir("derby_spec") + "/derby.log")

  private def base = Seq(
    (1L, "a@x.com", 10.0), (2L, "b@x.com", 20.0), (3L, "c@x.com", 30.0)
  ).toDF("id", "email", "bal")

  test("stage -> MERGE -> drop: updates overwrite, inserts append, rest pass") {
    base.write.mode(SaveMode.Overwrite).jdbc(url, "dim_spec", props)
    val updates = Seq(
      (2L, "b2@x.com", 25.0), // matched: every non-key column updated
      (9L, "i@x.com", 90.0)   // unmatched: inserted
    ).toDF("id", "email", "bal")
    JdbcUpsert.upsert(updates, url, "dim_spec", Seq("id"), props,
      JdbcUpsert.Derby)
    val out = spark.read.jdbc(url, "dim_spec", props)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out == Map(
      1L -> ("a@x.com", 10.0), 2L -> ("b2@x.com", 25.0),
      3L -> ("c@x.com", 30.0), 9L -> ("i@x.com", 90.0)))
    // the stage must be gone (plain DROP ran in the same transaction)
    val ex = intercept[Exception] {
      spark.read.jdbc(url, JdbcUpsert.stagingName("dim_spec"), props).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("tmp_dim_spec"))
  }

  test("empty update batch skips entirely (reference run_load.py:68-70)") {
    base.write.mode(SaveMode.Overwrite).jdbc(url, "dim_empty", props)
    JdbcUpsert.upsert(base.filter(col("id") < 0), url, "dim_empty",
      Seq("id"), props, JdbcUpsert.Derby)
    assert(spark.read.jdbc(url, "dim_empty", props).count() == 3)
  }

  test("streaming foreachBatch upserts micro-batches into the Derby warehouse") {
    // the reference's daily load as a STREAM: late/re-pulled rows arrive as
    // micro-batches and are idempotently MERGEd into the warehouse table —
    // foreachBatch turns the JDBC staged MERGE into a streaming sink
    base.write.mode(SaveMode.Overwrite).jdbc(url, "dim_stream", props)
    val tmp = tmpDir("derby_stream")
    Seq((2L, "b-new@x.com", 22.0), (7L, "g@x.com", 70.0))
      .toDF("id", "email", "bal")
      .repartition(2).write.parquet(s"$tmp/in") // 2 files -> 2 micro-batches
    val schema = spark.read.parquet(s"$tmp/in").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      .writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        JdbcUpsert.upsert(batch, url, "dim_stream", Seq("id"), props,
          JdbcUpsert.Derby)
      }
      .start()
    assert(q.awaitTermination(120000))
    val out = spark.read.jdbc(url, "dim_stream", props)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(out == Map(
      1L -> ("a@x.com", 10.0), 2L -> ("b-new@x.com", 22.0),
      3L -> ("c@x.com", 30.0), 7L -> ("g@x.com", 70.0)))
  }

  test("replayed batch re-MERGEs harmlessly (checkpoint-recovery idempotence)") {
    // foreachBatch may redeliver a micro-batch after a crash-and-restore;
    // the staged MERGE keyed on id must leave the warehouse unchanged when
    // the same batch applies twice
    base.write.mode(SaveMode.Overwrite).jdbc(url, "dim_replay", props)
    JdbcUpsert.ensureKeyIndex(url, "dim_replay", Seq("id"), props,
      JdbcUpsert.Derby)
    val batch = Seq((2L, "b2@x.com", 25.0), (9L, "i@x.com", 90.0))
      .toDF("id", "email", "bal")
    JdbcUpsert.upsert(batch, url, "dim_replay", Seq("id"), props,
      JdbcUpsert.Derby)
    val after1 = spark.read.jdbc(url, "dim_replay", props)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    JdbcUpsert.upsert(batch, url, "dim_replay", Seq("id"), props,
      JdbcUpsert.Derby) // the replay
    val after2 = spark.read.jdbc(url, "dim_replay", props)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(after2 == after1, "replayed MERGE must be a no-op")
    assert(after1.size == 4)
  }

  test("ensureKeyIndex is idempotent (second call is a no-op)") {
    base.write.mode(SaveMode.Overwrite).jdbc(url, "dim_ix", props)
    JdbcUpsert.ensureKeyIndex(url, "dim_ix", Seq("id"), props, JdbcUpsert.Derby)
    JdbcUpsert.ensureKeyIndex(url, "dim_ix", Seq("id"), props, JdbcUpsert.Derby)
    assert(spark.read.jdbc(url, "dim_ix", props).count() == 3)
  }

  test("duplicate source keys fail fast under reference-parity policy") {
    base.write.mode(SaveMode.Overwrite).jdbc(url, "dim_dup", props)
    val dupes = Seq((2L, "x@x.com", 1.0), (2L, "y@x.com", 2.0))
      .toDF("id", "email", "bal")
    val e = intercept[IllegalArgumentException] {
      JdbcUpsert.upsert(dupes, url, "dim_dup", Seq("id"), props,
        JdbcUpsert.Derby, failOnDuplicateKeys = true)
    }
    assert(e.getMessage.contains("duplicate source keys"))
    // and nothing reached the warehouse (filter driver-side: a pushed-down
    // string predicate would compare CLOB to CHAR, which Derby rejects)
    assert(!spark.read.jdbc(url, "dim_dup", props).collect()
      .exists(_.getString(1) == "x@x.com"))
  }
}
