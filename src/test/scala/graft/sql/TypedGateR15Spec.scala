package graft.sql

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.{Layout, Snapshots}
import graft.sql.LakeSql.LakeTableSpec

/** Round-15 ADVICE closures on the typed stats-box compiler:
  *
  *  1. CROSS-TYPE SOUNDNESS GATE — comparing string min_/max_ stats to a
  *     numeric literal coerces the LEXICAL bounds to doubles, an order
  *     the stats were never computed in. Unchecked, the cover proof
  *     drops whole files that still hold surviving rows (ADVICE r14:
  *     values {"99","300"}, lexical max "99", `s < 200` casts to
  *     99 < 200 → file dropped, row "300" silently dies) and the prune
  *     skips files that need a rewrite. The compiler now refuses a
  *     prune/cover term whose literal↔stats coercion is not provably
  *     monotone; the conjunct rides as row residual (sound) or, when
  *     nothing else prunes, the statement rejects loudly.
  *  2. COPY INTO keys on path:size:mtime, not name:size — a NEW file
  *     sharing a base name and byte size with a previously loaded one
  *     (fixed-name daily exports) must load, not silently skip.
  *  3. TRUNCATE / SHOW CREATE on an UNREGISTERED name fall through to
  *     Spark's own parser (same guard as every other claimed statement).
  */
class TypedGateR15Spec extends SparkSpec {

  /** Table whose `s` stats column is STRING holding numeric-looking
    * values, laid out so one file's lexical box is ["100", "99"] while
    * holding "300" — the exact silent-loss shape. */
  private def stringLake(name: String): (String, Long) = {
    val dir = tmpDir("tgate")
    import spark.implicits._
    val df = Seq(
      (0L, "100"), (1L, "300"), (2L, "99"), // one lexical box [100, 99]
      (3L, "150"), (4L, "210"), (5L, "50")
    ).toDF("id", "s")
    Layout.zorderWrite(df.filter(col("id") <= 2), Seq("id"),
      s"$dir/z", nFiles = 1)
    Layout.zorderWrite(df.filter(col("id") > 2), Seq("id"),
      s"$dir/z2", nFiles = 1)
    // single directory, two files: move z2's file into z
    val p = new org.apache.hadoop.fs.Path(s"$dir/z2")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_")).foreach { st =>
      fs.rename(st.getPath, new org.apache.hadoop.fs.Path(
        s"$dir/z", "f2_" + st.getPath.getName)) : Unit
    }
    val v = Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("id", "s")), s"$dir/m")
    LakeSql.register(name,
      LakeTableSpec(s"$dir/z", s"$dir/m", Seq("id", "s"), nFiles = 4))
    (dir, v.toLong)
  }

  test("cross-type DELETE with no other prunable conjunct rejects loudly") {
    stringLake("t_xtype1")
    val before = LakeSql.sql(spark, "SELECT count(*) AS n FROM t_xtype1")
      .head().getLong(0)
    val e = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "DELETE FROM t_xtype1 WHERE s < 200")
    }
    assert(e.getMessage.contains("no conjunct the manifest stats can prune"))
    // nothing committed, nothing lost
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_xtype1")
      .head().getLong(0) == before)
  }

  test("cross-type conjunct rides as residual; cover disabled — " +
      "row '300' survives the ADVICE scenario") {
    stringLake("t_xtype2")
    // id >= 0 prunes (numeric, same family); s < 200 is residual-only.
    // Row semantics: Spark casts s to double, so "99","100","150","50"
    // die and "300","210" survive. The OLD cover would have dropped the
    // whole ["100","99"]-box file — killing "300".
    val m = LakeSql.sql(spark,
      "DELETE FROM t_xtype2 WHERE id >= 0 AND s < 200").head()
    assert(m.getAs[Long]("rows_deleted") == 4)
    val left = LakeSql.sql(spark,
      "SELECT s FROM t_xtype2 ORDER BY s").collect().map(_.getString(0))
    assert(left.toSeq == Seq("210", "300"),
      s"survivors wrong: ${left.mkString(",")}")
  }

  test("same-type string comparison still prunes and covers lexically") {
    stringLake("t_xtype3")
    // lexical semantics on BOTH sides: s >= '2' kills "210","300","50",
    // "99" (lexical, not numeric!) — prune must engage (no loud reject)
    // and results match Spark's own string comparison
    val m = LakeSql.sql(spark,
      "DELETE FROM t_xtype3 WHERE s >= '2'").head()
    assert(m.getAs[Long]("rows_deleted") == 4)
    val left = LakeSql.sql(spark,
      "SELECT s FROM t_xtype3 ORDER BY s").collect().map(_.getString(0))
    assert(left.toSeq == Seq("100", "150"))
  }

  test("COPY INTO loads a new file that shares name+size with a " +
      "previously loaded one") {
    val dir = tmpDir("tcopykey")
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "x")
    Layout.zorderWrite(df, Seq("id"), s"$dir/z", nFiles = 1)
    Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("id", "x")), s"$dir/m") : Unit
    LakeSql.register("t_copykey",
      LakeTableSpec(s"$dir/z", s"$dir/m", Seq("id", "x"), nFiles = 4))
    // two SOURCE directories, each holding a file named d.json with the
    // SAME byte length but different rows — the fixed-name daily export
    def writeJson(sub: String, line: String): Unit = {
      val p = new java.io.File(s"$dir/$sub"); p.mkdirs() : Unit
      val w = new java.io.FileWriter(s"$dir/$sub/d.json")
      w.write(line + "\n"); w.close()
    }
    writeJson("day1", """{"id": 3, "x": 30}""")
    writeJson("day2", """{"id": 4, "x": 41}""") // same byte count
    assert(new java.io.File(s"$dir/day1/d.json").length ==
      new java.io.File(s"$dir/day2/d.json").length)
    val m1 = LakeSql.sql(spark,
      s"COPY INTO t_copykey FROM '$dir/day1' FILEFORMAT = JSON").head()
    assert(m1.getAs[Long]("files_loaded") == 1 &&
      m1.getAs[Long]("rows_loaded") == 1)
    val m2 = LakeSql.sql(spark,
      s"COPY INTO t_copykey FROM '$dir/day2' FILEFORMAT = JSON").head()
    assert(m2.getAs[Long]("files_loaded") == 1 &&
      m2.getAs[Long]("rows_loaded") == 1,
      s"new same-name-same-size file silently skipped: $m2")
    // and the true re-run stays idempotent
    val m3 = LakeSql.sql(spark,
      s"COPY INTO t_copykey FROM '$dir/day1' FILEFORMAT = JSON").head()
    assert(m3.getAs[Long]("files_loaded") == 0 &&
      m3.getAs[Long]("files_skipped") == 1)
    assert(LakeSql.sql(spark, "SELECT sum(x) AS s FROM t_copykey")
      .head().getLong(0) == 10 + 20 + 30 + 41)
  }

  test("TRUNCATE / SHOW CREATE on unregistered names fall through to " +
      "Spark's parser") {
    // Spark's own error (missing table), NOT 'not a registered lake table'
    val e1 = intercept[Exception] {
      LakeSql.sql(spark, "TRUNCATE TABLE never_registered_xyz")
    }
    assert(!e1.getMessage.contains("not a registered lake table"),
      s"claimed a non-lake TRUNCATE: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      LakeSql.sql(spark, "SHOW CREATE TABLE never_registered_xyz")
    }
    assert(!e2.getMessage.contains("not a registered lake table"),
      s"claimed a non-lake SHOW CREATE: ${e2.getMessage}")
  }
}
