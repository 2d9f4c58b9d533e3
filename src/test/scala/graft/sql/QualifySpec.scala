package graft.sql

import graft.SparkSpec

/** QUALIFY text rewrite: the clause rewrites into the nested
  * window-filter form in the outermost block AND (round 18) inside
  * parenthesized subselects / CTE bodies, innermost first; string
  * literals and plain statements are untouched; ORDER BY/LIMIT tails
  * survive. */
class QualifySpec extends SparkSpec {
  import spark.implicits._

  test("rewrite mechanics: quote- and paren-aware; nested blocks " +
      "rewrite too (round-18 item 8)") {
    assert(LakeSql.rewriteQualify("SELECT a FROM t").isEmpty)
    assert(LakeSql.rewriteQualify("SELECT 'QUALIFY' AS s FROM t").isEmpty)
    // QUALIFY inside a subquery rewrites IN PLACE: the inner block gets
    // the window-filter form, the outer text around it is untouched
    val nested = LakeSql.rewriteQualify(
      "SELECT * FROM (SELECT a, rn FROM x QUALIFY rn = 1) y").get
    assert(nested.startsWith("SELECT * FROM (") &&
      nested.endsWith(") y") && nested.contains("WHERE ( rn = 1"),
      nested)
    assert(LakeSql.rewriteQualify(
      "SELECT * FROM (SELECT a FROM x) y WHERE a > 1").isEmpty)
    val r = LakeSql.rewriteQualify(
      "SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t " +
        "QUALIFY rn <= 2 ORDER BY a LIMIT 5").get
    assert(r.contains("WHERE ( rn <= 2 )") || r.contains("WHERE ( rn <= 2"))
    assert(r.trim.endsWith("ORDER BY a LIMIT 5"))
    // -- line comment containing QUALIFY is skipped
    assert(LakeSql.rewriteQualify(
      "SELECT a FROM t -- QUALIFY in a comment\nWHERE a > 0").isEmpty)
  }

  test("hardening: block comments, escaped quotes, non-query gate") {
    // /* block comment */ containing QUALIFY is skipped
    assert(LakeSql.rewriteQualify(
      "SELECT a FROM t /* QUALIFY is just prose here */ WHERE a > 0").isEmpty)
    assert(LakeSql.rewriteQualify(
      "SELECT a /* multi\nline QUALIFY\ncomment */ FROM t").isEmpty)
    // backslash-escaped quote inside a literal must not desync the scan:
    // the QUALIFY here is still INSIDE the string
    assert(LakeSql.rewriteQualify(
      "SELECT 'it\\'s not a QUALIFY clause' AS s FROM t").isEmpty)
    // …and a REAL clause after such a literal still rewrites
    assert(LakeSql.rewriteQualify(
      "SELECT 'it\\'s fine' AS s, rn FROM t QUALIFY rn = 1").isDefined)
    // non-query statements are never scanned: a column literally named
    // qualify in DML can't trigger a bogus rewrite
    assert(LakeSql.rewriteQualify(
      "UPDATE t SET qualify = 1 WHERE id = 2").isEmpty)
    assert(LakeSql.rewriteQualify(
      "INSERT INTO t SELECT qualify FROM u").isEmpty)
    // leading comments don't defeat the SELECT/WITH gate
    assert(LakeSql.rewriteQualify(
      "/* hdr */ -- note\nSELECT a, rn FROM t QUALIFY rn = 1").isDefined)
  }

  test("fallback: a bare identifier named qualify parses as the original " +
      "statement through both front doors") {
    Seq((1L, 5L), (2L, 7L)).toDF("id", "qualify")
      .createOrReplaceTempView("qy_fb")
    // the scanner false-positives on the bare column; the rewrite fails
    // to parse; both call sites must fall back to the original text
    val text = "SELECT id, qualify FROM qy_fb WHERE qualify > 6"
    assert(LakeSql.sql(spark, text).collect().map(_.getLong(0)).toSeq
      == Seq(2L))
    assert(spark.sql(text).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("end to end: QUALIFY filters on a window alias through both " +
      "LakeSql.sql and plain spark.sql; tails apply after the filter") {
    Seq((1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0),
      (4L, "b", 5.0), (5L, "b", 50.0))
      .toDF("id", "g", "v").createOrReplaceTempView("qy_t")
    val text =
      """SELECT g, id, v,
        |  row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
        |FROM qy_t
        |QUALIFY rn = 1
        |ORDER BY g""".stripMargin
    val front = LakeSql.sql(spark, text).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val plain = spark.sql(text).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(front.toSeq == Seq(("a", 2L), ("b", 5L)))
    assert(plain.toSeq == front.toSeq)
    // round-18 item 8: QUALIFY inside a FROM-subselect rewrites in place
    // and runs through both front doors
    val sub = "SELECT count(*) AS n FROM (" +
      text.replace("ORDER BY g", "") + ")"
    assert(spark.sql(sub).head().getLong(0) == 2L)
    assert(LakeSql.sql(spark, sub).head().getLong(0) == 2L)
    // …and inside a CTE body, with an outer QUALIFY in the same
    // statement (both levels rewrite, innermost first)
    val cte =
      """WITH w AS (
        |  SELECT g, id, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
        |  FROM qy_t
        |  QUALIFY rn <= 2)
        |SELECT g, id, row_number() OVER (ORDER BY v DESC) AS gr
        |FROM w
        |QUALIFY gr = 1""".stripMargin
    val top = spark.sql(cte).collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("b", 5L)), top)
    // scalar subquery with QUALIFY
    val scalar = spark.sql(
      "SELECT (SELECT id FROM (SELECT id, row_number() OVER " +
        "(ORDER BY v DESC) AS rn FROM qy_t QUALIFY rn = 1)) AS top_id")
      .head().getLong(0)
    assert(scalar == 5L)
  }
}
