package graft.qc

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
    (4L, Option("d")), (5L, Option("e"))).toDF("id", "v")

  test("min_rows: >= is inclusive") {
    val Seq(atBoundary, above) = Checks.runAll(df, Seq(MinRows(5), MinRows(6)))
    assert(atBoundary.passed)
    assert(!above.passed)
  }

  test("max_null_rate: <= is inclusive at the boundary") {
    // v has exactly 1/5 = 0.2 null rate
    val results = Checks.runAll(df, Seq(
      MaxNullRate("v", 0.2),   // boundary: passes (<=)
      MaxNullRate("v", 0.19))) // just below: fails
    assert(results(0).passed)
    assert(!results(1).passed)
  }

  test("missing column is a failed check, not an exception") {
    val Seq(r) = Checks.runAll(df, Seq(MaxNullRate("nope", 0.5)))
    assert(!r.passed)
    assert(r.details.contains("missing"))
  }

  test("all checks run in a single pass and keep their offsets straight") {
    val results = Checks.runAll(df, Seq(
      MinRows(1), MaxNullRate("nope", 0.5), MaxNullRate("v", 0.5), MinRows(100)))
    assert(results.map(_.passed) == Seq(true, false, true, false))
  }

  test("empty table: min_rows fails, null-rate passes (no rows, no nulls)") {
    val empty = df.filter($"id" < 0L)
    val results = Checks.runAll(empty, Seq(MinRows(1), MaxNullRate("v", 0.0)))
    assert(!results(0).passed)
    assert(results(1).passed)
  }

  test("alert formatting mirrors reference style") {
    val line = Checks.formatAlert("customers",
      Seq(QCResult("min_rows", passed = false, "rows=0 min=1")))
    assert(line.contains("customers") && line.contains("FAILED") && line.contains("min_rows"))
  }
}
