package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.{Layout, Snapshots}
import graft.sql.LakeSql.LakeTableSpec

/** The general SQL MERGE clause matrix ([[Snapshots.mergeCommitClauses]]
  * via the front door): composite ON keys, conditional WHEN MATCHED
  * clauses with first-match-wins ordering, explicit SET assignments
  * reading both sides, matched DELETE, conditional explicit INSERT, and
  * the cardinality-violation guard. */
class MergeMatrixSpec extends SparkSpec {

  import spark.implicits._

  // target: unique composite key (k1, k2), 5000 rows
  private def freshLake(name: String) = {
    val dir = tmpDir(name)
    val data = spark.range(5000).select(
      (col("id") % 50).as("k1"), (col("id") / 50).as("k2"),
      (col("id") % 7).as("qty"),
      concat(lit("n"), col("id")).as("note"))
    Layout.zorderWrite(data, Seq("k1", "k2"), s"$dir/z", 8)
    Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("k1", "k2")), s"$dir/m")
    LakeSql.register(name, LakeTableSpec(s"$dir/z", s"$dir/m",
      Seq("k1", "k2"), nFiles = 8))
    data.localCheckpoint()
  }

  test("composite key + conditional clauses, first match wins") {
    val data = freshLake("t_mm1")
    // source: keys with id < 1000 (matched) plus 100 new keys
    val matchedSrc = spark.range(1000).select(
      (col("id") % 50).as("k1"), (col("id") / 50).as("k2"),
      (lit(10) - col("id") % 12).as("qty"), // 10..-1: some > t.qty, some ≤
      lit("s").as("note"))
    val newSrc = spark.range(100).select(
      (col("id") + 1000).as("k1"), col("id").as("k2"),
      (col("id") % 9).as("qty"), lit("x").as("note"))
    matchedSrc.unionByName(newSrc).createOrReplaceTempView("mm1_src")
    val m = LakeSql.sql(spark,
      """MERGE INTO t_mm1 t USING mm1_src s
        |ON t.k1 = s.k1 AND t.k2 = s.k2
        |WHEN MATCHED AND s.qty > t.qty
        |  THEN UPDATE SET qty = s.qty + 100, note = concat(t.note, '+')
        |WHEN MATCHED AND s.qty < 0 THEN DELETE
        |WHEN NOT MATCHED AND s.qty >= 5
        |  THEN INSERT (k1, k2, qty, note) VALUES (s.k1, s.k2, s.qty * 10, 'new')
        |""".stripMargin).head()
    // expected, computed independently over the same frames
    val joined = data.as("t").join(matchedSrc.as("s"), Seq("k1", "k2"))
    val expUpd = joined.filter(col("s.qty") > col("t.qty")).count()
    // first-match-wins: s.qty < 0 rows where also s.qty > t.qty im-
    // possible (qty >= 0), so deletes are exactly the s.qty < 0 matches
    val expDel = joined.filter(col("s.qty") < 0 && !(col("s.qty") > col("t.qty"))).count()
    val expIns = newSrc.filter(col("qty") >= 5).count()
    assert(m.getAs[Long]("rows_updated") == expUpd, s"updated: $m")
    assert(m.getAs[Long]("rows_deleted") == expDel, s"deleted: $m")
    assert(m.getAs[Long]("rows_inserted") == expIns, s"inserted: $m")
    assert(m.getAs[Long]("files_rewritten") <= m.getAs[Long]("files_total"))
    // final state vs a DataFrame-computed expectation
    val srcAll = matchedSrc
    val expect = data.as("t")
      .join(srcAll.as("s"), Seq("k1", "k2"), "left")
      .select(col("k1"), col("k2"),
        when(col("s.qty") > col("t.qty"), col("s.qty") + 100)
          .otherwise(col("t.qty")).as("qty"),
        when(col("s.qty") > col("t.qty"), concat(col("t.note"), lit("+")))
          .otherwise(col("t.note")).as("note"),
        (col("s.qty").isNotNull && col("s.qty") < 0 &&
          !(col("s.qty") > col("t.qty"))).as("dead"))
      .filter(!col("dead")).drop("dead")
      .unionByName(newSrc.filter(col("qty") >= 5)
        .select(col("k1"), col("k2"), (col("qty") * 10).as("qty"),
          lit("new").as("note")))
    val got = LakeSql.sql(spark, "SELECT k1, k2, qty, note FROM t_mm1")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "final table state diverges from the clause-matrix semantics")
  }

  test("unmatched target rows in touched files pass through unchanged") {
    val data = freshLake("t_mm2")
    // one matched key per file region; most touched rows unmatched
    Seq((0L, 0L, 99L, "s")).toDF("k1", "k2", "qty", "note")
      .createOrReplaceTempView("mm2_src")
    val m = LakeSql.sql(spark,
      """MERGE INTO t_mm2 t USING mm2_src s
        |ON t.k1 = s.k1 AND t.k2 = s.k2
        |WHEN MATCHED THEN UPDATE SET qty = s.qty
        |""".stripMargin).head()
    assert(m.getAs[Long]("rows_updated") == 1L)
    assert(m.getAs[Long]("rows_inserted") == 0L)
    val got = LakeSql.sql(spark, "SELECT k1, k2, qty, note FROM t_mm2")
    val expect = data.withColumn("qty",
      when(col("k1") === 0 && col("k2") === 0, 99L).otherwise(col("qty")))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("duplicate source key tuples are a loud cardinality violation") {
    freshLake("t_mm3")
    Seq((1L, 0L, 5L, "a"), (1L, 0L, 6L, "b"))
      .toDF("k1", "k2", "qty", "note").createOrReplaceTempView("mm3_src")
    val e = intercept[IllegalArgumentException] {
      LakeSql.sql(spark,
        """MERGE INTO t_mm3 t USING mm3_src s
          |ON t.k1 = s.k1 AND t.k2 = s.k2
          |WHEN MATCHED THEN UPDATE SET qty = s.qty
          |""".stripMargin)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("merge keys off the stats columns are rejected") {
    freshLake("t_mm4")
    Seq((1L, 0L, 5L, "a")).toDF("k1", "k2", "qty", "note")
      .createOrReplaceTempView("mm4_src")
    val e = intercept[IllegalArgumentException] {
      LakeSql.sql(spark,
        """MERGE INTO t_mm4 t USING mm4_src s
          |ON t.qty = s.qty
          |WHEN MATCHED THEN UPDATE SET note = s.note
          |""".stripMargin)
    }
    assert(e.getMessage.contains("stats"))
  }
}
