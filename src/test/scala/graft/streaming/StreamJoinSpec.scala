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

  test("left-outer interval join null-pads unmatched rows only after the watermark passes their window") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val l = views.toDS().toDF("user_id", "ts")
    val r = purchases.toDS().toDF("uid", "ts").withColumnRenamed("uid", "user_id")

    val joined = Streaming.streamIntervalJoinOuter(
      l, r, key = "user_id", interval = "5 MINUTES", lateness = "1 minute")
      .selectExpr("l.user_id AS user_id", "l.ts AS lts", "r.ts AS rts")

    val q = joined.writeStream.format("memory").queryName("sjo_out")
      .outputMode("append").start()

    views.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    purchases.addData((1L, ts("2024-01-01 10:02:00"))) // user 1 converts; user 2 never
    q.processAllAvailable()
    // before any watermark passes 10:05, user 2 must NOT have null-padded:
    // a premature emission would duplicate once a real match arrived late
    val early = spark.table("sjo_out").collect()
    assert(early.count(_.isNullAt(2)) == 0,
      s"unmatched row emitted before its window closed: ${early.mkString(",")}")
    // advance BOTH watermarks past 10:00 + 5m (+1m lateness): user 2 flushes
    views.addData((99L, ts("2024-01-01 10:30:00")))
    purchases.addData((98L, ts("2024-01-01 10:30:00")))
    q.processAllAvailable()
    views.addData((97L, ts("2024-01-01 10:31:00"))) // extra batch: state eviction runs
    q.processAllAvailable()
    val rows = spark.table("sjo_out").collect()
    q.stop()

    val matched = rows.filter(!_.isNullAt(2))
    assert(matched.length == 1 && matched.head.getAs[Long]("user_id") == 1L)
    assert(matched.head.getAs[Timestamp]("rts") == ts("2024-01-01 10:02:00"))
    val padded = rows.filter(_.isNullAt(2)).map(_.getAs[Long]("user_id")).toSet
    assert(padded.contains(2L), s"user 2's no-conversion row never flushed: ${rows.mkString(",")}")
    // user 1 matched, so it must not ALSO null-pad
    assert(!padded.contains(1L), "matched row must not also emit null-padded")
  }

  test("full-outer interval join null-pads BOTH unmatched sides exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val l = views.toDS().toDF("user_id", "ts")
    val r = purchases.toDS().toDF("uid", "ts").withColumnRenamed("uid", "user_id")

    val joined = Streaming.streamIntervalJoinFullOuter(
      l, r, key = "user_id", interval = "5 MINUTES", lateness = "1 minute")
      .selectExpr("coalesce(l.user_id, r.user_id) AS user_id",
        "l.ts AS lts", "r.ts AS rts")

    val q = joined.writeStream.format("memory").queryName("sjf_out")
      .outputMode("append").start()

    // user 1: matched pair; user 2: view only; user 3: purchase only
    views.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
    purchases.addData((1L, ts("2024-01-01 10:02:00")), (3L, ts("2024-01-01 10:02:00")))
    q.processAllAvailable()
    // advance both watermarks past every window, then one more batch so
    // state eviction runs
    views.addData((99L, ts("2024-01-01 10:30:00")))
    purchases.addData((98L, ts("2024-01-01 10:30:00")))
    q.processAllAvailable()
    views.addData((97L, ts("2024-01-01 10:31:00")))
    purchases.addData((96L, ts("2024-01-01 10:31:00")))
    q.processAllAvailable()
    val rows = spark.table("sjf_out").collect()
      .filter(x => x.getAs[Long]("user_id") <= 3L)
    q.stop()

    val matched = rows.filter(x => !x.isNullAt(1) && !x.isNullAt(2))
    assert(matched.length == 1 && matched.head.getAs[Long]("user_id") == 1L)
    // user 2's view null-pads on the right; user 3's purchase on the left
    val leftOnly = rows.filter(x => !x.isNullAt(1) && x.isNullAt(2))
      .map(_.getAs[Long]("user_id")).toSeq
    val rightOnly = rows.filter(x => x.isNullAt(1) && !x.isNullAt(2))
      .map(_.getAs[Long]("user_id")).toSeq
    assert(leftOnly == Seq(2L), s"left-unmatched wrong: ${rows.mkString(",")}")
    assert(rightOnly == Seq(3L), s"right-unmatched wrong: ${rows.mkString(",")}")
  }
}
