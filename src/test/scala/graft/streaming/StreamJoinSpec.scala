package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked stream-stream interval join matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val l = purchases.toDS().toDF("user_id", "ts")
    val r = clicks.toDS().toDF("uid", "ts")
      .withColumnRenamed("uid", "user_id")

    val joined = Streaming.streamIntervalJoin(
      l, r, key = "user_id", interval = "5 MINUTES", lateness = "1 minute")
      .selectExpr("l.user_id AS user_id", "l.ts AS lts", "r.ts AS rts")

    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()

    purchases.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    clicks.addData(
      (1L, ts("2024-01-01 10:02:00")), // within 5m -> joins
      (1L, ts("2024-01-01 10:09:00")), // outside 5m -> dropped
      (2L, ts("2024-01-01 10:04:59"))) // within 5m -> joins
    q.processAllAvailable()
    val rows = spark.table("sj_out").collect()
    q.stop()

    assert(rows.length == 2)
    val byUser = rows.map(r => r.getAs[Long]("user_id") -> r.getAs[Timestamp]("rts")).toMap
    assert(byUser(1L) == ts("2024-01-01 10:02:00"))
    assert(byUser(2L) == ts("2024-01-01 10:04:59"))
  }
}
