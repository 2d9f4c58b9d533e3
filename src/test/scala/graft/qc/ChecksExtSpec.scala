package graft.qc

import graft.SparkSpec

class ChecksExtSpec extends SparkSpec {
  import spark.implicits._

  test("max_dup_rate: unique keys pass, duplicates fail at rate 0") {
    val unique = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dups = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    assert(Checks.runAll(unique, Seq(MaxDupRate(Seq("id")))).head.passed)
    val r = Checks.runAll(dups, Seq(MaxDupRate(Seq("id")))).head
    assert(!r.passed && r.details.contains("dup_rate=0.333333"))
    // tolerant threshold passes
    assert(Checks.runAll(dups, Seq(MaxDupRate(Seq("id"), 0.5))).head.passed)
  }

  test("max_dup_rate: missing key column fails, never throws; fuses with other checks") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val results = Checks.runAll(df, Seq(
      MinRows(1), MaxDupRate(Seq("nope")), MaxDupRate(Seq("id")), MaxNullRate("v", 0.0)))
    assert(results.map(_.passed) == Seq(true, false, true, true))
  }

  test("referential integrity: all children resolve -> pass; orphans -> fail") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val okChild = Seq[(Long, java.lang.Long)]((10L, 1L), (11L, 3L), (12L, null))
      .toDF("id", "fk")
    val badChild = Seq((10L, 1L), (11L, 99L)).toDF("id", "fk")
    assert(Checks.referentialIntegrity(okChild, "fk", parent, "pk").passed)
    val r = Checks.referentialIntegrity(badChild, "fk", parent, "pk")
    assert(!r.passed && r.details == "orphans=1")
  }
}
