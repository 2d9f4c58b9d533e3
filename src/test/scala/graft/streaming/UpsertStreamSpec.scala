package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.SparkSpec

class UpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch upsert merges late re-pulled rows into the keyed target") {
    val inDir = tmpDir("ups-in")
    val targetDir = tmpDir("ups-target")
    val ckpt = tmpDir("ups-ckpt")

    // existing target: two rows
    Seq((1L, "old@x", ts("2024-01-01 00:00:00")),
      (2L, "keep@x", ts("2024-01-01 00:00:00")))
      .toDF("id", "email", "updated_at")
      .write.mode("overwrite").parquet(targetDir)

    // the "re-pull window" batch: id=1 updated, id=3 new
    Seq((1L, "new@x", ts("2024-01-02 00:00:00")),
      (3L, "ins@x", ts("2024-01-02 00:00:00")))
      .toDF("id", "email", "updated_at")
      .write.mode("overwrite").parquet(s"$inDir/batch")

    val stream = Streaming.readEventsStream(spark, s"$inDir/batch")
    val outDir = tmpDir("ups-out")
    val q = Streaming.upsertStream(stream, Seq("id"), ckpt)(
      readTarget = (s: SparkSession) => s.read.parquet(targetDir),
      writeTarget = df => df.write.mode("overwrite").parquet(outDir))
      .start()
    q.awaitTermination(60000)

    val out = spark.read.parquet(outDir).orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getString(1) == "new@x")  // updated
    assert(out(1).getString(1) == "keep@x") // untouched
    assert(out(2).getString(1) == "ins@x")  // inserted
  }
}
