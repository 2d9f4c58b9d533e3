package graft.ext

import java.sql.Timestamp
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks latest right row <= left ts, with tie-break and null for no match") {
    val left = Seq(
      (1L, 100L, ts("2024-01-10 00:00:00")),
      (2L, 100L, ts("2024-01-01 00:00:00")), // before any right row
      (3L, 200L, ts("2024-01-10 00:00:00"))  // exactly at right ts (inclusive)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-05 00:00:00"), 11L, 5.0),
      (100L, ts("2024-01-08 00:00:00"), 12L, 6.0),
      (100L, ts("2024-01-08 00:00:00"), 13L, 7.0), // same ts: tie-break max key
      (100L, ts("2024-01-12 00:00:00"), 14L, 8.0), // after left ts: ignored
      (200L, ts("2024-01-10 00:00:00"), 20L, 9.0)
    ).toDF("k", "rts", "rkey", "rval")

    val out = AsofJoin.asOf(left, right, "user_id", "k", "ts", "rts",
      Seq("rkey", "rval"), "rkey")
      .orderBy("event_id").collect()

    assert(out.length == 3)
    assert(out(0).getAs[Long]("asof_rkey") == 13L) // latest <= 01-10, tie -> max rkey
    assert(out(1).isNullAt(out(1).fieldIndex("asof_rkey"))) // no prior row
    assert(out(2).getAs[Long]("asof_rkey") == 20L) // inclusive <=
    assert(out(2).getAs[Double]("asof_rval") == 9.0)
  }
}
