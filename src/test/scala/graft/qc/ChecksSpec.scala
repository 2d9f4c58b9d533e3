package graft.qc

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

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

  test("postAlert delivers through the injected transport only on failure") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    val ok = Seq(QCResult("min_rows", passed = true, "rows=5 min=1"))
    assert(!Checks.postAlert("customers", ok)(sent += _))
    assert(sent.isEmpty)
    val bad = ok :+ QCResult("max_null_rate_v", passed = false, "null_rate=0.4 max=0.2")
    assert(Checks.postAlert("customers", bad)(sent += _))
    assert(sent.size == 1 && sent.head.contains("FAILED") &&
      sent.head.contains("max_null_rate_v"))
  }

  test("summaryFrame fuses count/null-rate/dup-rate into one row with verdicts") {
    val d = Seq((1L, Option("a")), (1L, Option("b")), (2L, Option.empty[String]))
      .toDF("id", "v")
    val r = Checks.summaryFrame(d, minRows = 3, nullCol = "v", maxNullRate = 0.5,
      dupKeys = Seq("id"), maxDupRate = 0.0).collect().head
    assert(r.getAs[Long]("n_rows") == 3)
    assert(math.abs(r.getAs[Double]("null_rate") - 1.0 / 3) < 1e-6)
    assert(math.abs(r.getAs[Double]("dup_rate") - 1.0 / 3) < 1e-6)
    assert(r.getAs[Boolean]("min_rows_ok"))
    assert(r.getAs[Boolean]("null_rate_ok"))
    assert(!r.getAs[Boolean]("dup_rate_ok"))
  }

  test("null keys follow SQL COUNT(DISTINCT): counted as rows, never as distinct keys") {
    // 4 rows: keys 1, 1, 2, null → SQL count(DISTINCT key) = 2, so
    // dup_rate = (4 − 2) / 4 = 0.5 — exactly what DuckDB computes. The
    // unguarded countDistinct(struct(key)) would give 3 and 0.25.
    val d = Seq(Option(1L), Option(1L), Option(2L), Option.empty[Long])
      .toDF("id").withColumn("v", lit("x"))
    val r = Checks.summaryFrame(d, 1, "v", 1.0, Seq("id"), 0.5).collect().head
    assert(math.abs(r.getAs[Double]("dup_rate") - 0.5) < 1e-6)
    assert(r.getAs[Boolean]("dup_rate_ok")) // inclusive at the boundary
    val Seq(check) = Checks.runAll(d, Seq(MaxDupRate(Seq("id"), 0.49)))
    assert(!check.passed && check.details.contains("dup_rate=0.5"))
  }

  test("summaryFrame on an empty table: zero rates, no divide-by-zero") {
    val d = Seq((1L, Option("a"))).toDF("id", "v").filter($"id" < 0)
    val r = Checks.summaryFrame(d, 1, "v", 0.0, Seq("id"), 0.0).collect().head
    assert(r.getAs[Long]("n_rows") == 0)
    assert(r.getAs[Double]("null_rate") == 0.0 && r.getAs[Double]("dup_rate") == 0.0)
    assert(!r.getAs[Boolean]("min_rows_ok"))
    assert(r.getAs[Boolean]("null_rate_ok") && r.getAs[Boolean]("dup_rate_ok"))
  }
}
