package graft.sql

import graft.SparkSpec

/** QUALIFY text rewrite: top-level clause rewrites into the nested
  * window-filter form; string literals, subquery-nested QUALIFYs and
  * plain statements are untouched; ORDER BY/LIMIT tails survive. */
class QualifySpec extends SparkSpec {
  import spark.implicits._

  test("rewrite mechanics: top-level only, quote- and paren-aware") {
    assert(LakeSql.rewriteQualify("SELECT a FROM t").isEmpty)
    assert(LakeSql.rewriteQualify("SELECT 'QUALIFY' AS s FROM t").isEmpty)
    // QUALIFY inside a subquery is at depth > 0: the outer text is
    // untouched (the clause is OUTERMOST-BLOCK-ONLY — a nested one is a
    // loud parse error, never a silent misrewrite)
    assert(LakeSql.rewriteQualify(
      "SELECT * FROM (SELECT a, rn FROM x QUALIFY rn = 1) y").isEmpty)
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
    // outermost-block-only: a QUALIFY inside a subquery fails LOUDLY at
    // Spark's parser (no silent misrewrite of nested blocks)
    assert(scala.util.Try(spark.sql(
      "SELECT count(*) AS n FROM (" + text.replace("ORDER BY g", "") + ")")
      .collect()).isFailure)
  }
}
