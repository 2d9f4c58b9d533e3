package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import Stateful.{UserEvent, UserStats}

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState accumulates per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val query = Stateful.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("user_stats")
      .outputMode("append").start()

    input.addData(UserEvent(1L, "view"), UserEvent(1L, "click"), UserEvent(2L, "view"))
    query.processAllAvailable()
    input.addData(UserEvent(1L, "purchase"))
    query.processAllAvailable()

    val rows = spark.table("user_stats").as[UserStats].collect()
    query.stop()

    // batch 1: user1 -> 2 (first), user2 -> 1 (first); batch 2: user1 -> 3 (not first)
    assert(rows.exists(r => r.user_id == 1L && r.total_events == 2L && r.first_batch))
    assert(rows.exists(r => r.user_id == 2L && r.total_events == 1L && r.first_batch))
    assert(rows.exists(r => r.user_id == 1L && r.total_events == 3L && !r.first_batch))
  }

  test("batch twin counts per user") {
    val ds = Seq(UserEvent(1L, "a"), UserEvent(1L, "b"), UserEvent(2L, "c")).toDS()
    val out = Stateful.userStatsBatch(spark, ds).collect().map(s => s.user_id -> s.total_events).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}
