package graft.sql

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.{Layout, Snapshots}
import graft.sql.LakeSql.LakeTableSpec

class LakeSqlSpec extends SparkSpec {

  private def data = spark.range(10000)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))

  /** Fresh committed lake table registered as `name`; returns (dir, v1). */
  private def freshLake(name: String): (String, Int) = {
    val dir = tmpDir("lakesql")
    Layout.zorderWrite(data, Seq("id", "x"), s"$dir/z", nFiles = 16)
    val v1 = Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("id", "x")), s"$dir/m")
    LakeSql.register(name,
      LakeTableSpec(s"$dir/z", s"$dir/m", Seq("id", "x"), nFiles = 8))
    (dir, v1)
  }

  test("SELECT over a registered lake table reads the latest version") {
    val (dir, _) = freshLake("t_sel")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 99.0)))
    val n = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_sel").head().getLong(0)
    assert(n == Snapshots.tableAt(spark, s"$dir/m", 2).count())
    assert(n < 10000L)
  }

  test("VERSION AS OF pins the pre-delete snapshot; qualified refs resolve") {
    val (dir, v1) = freshLake("t_ver")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 99.0)))
    val pinned = LakeSql.sql(spark,
      s"SELECT t_ver.id, t_ver.x FROM t_ver VERSION AS OF $v1 " +
        "WHERE t_ver.x < 100")
    assert(pinned.count() ==
      data.filter(col("x") < 100).count())
    // aliased form too
    val aliased = LakeSql.sql(spark,
      s"SELECT a.id FROM t_ver VERSION AS OF $v1 a WHERE a.x >= 900")
    assert(aliased.count() == data.filter(col("x") >= 900).count())
  }

  test("TIMESTAMP AS OF resolves through versionAtTimestamp (string + millis)") {
    val (dir, v1) = freshLake("t_ts")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 499.0)))
    val ts1 = Snapshots.commitTimestamp(spark, s"$dir/m", v1).get
    val iso = java.time.Instant.ofEpochMilli(ts1).toString
    val viaIso = LakeSql.sql(spark,
      s"SELECT count(*) AS n FROM t_ts TIMESTAMP AS OF '$iso'")
      .head().getLong(0)
    val viaMillis = LakeSql.sql(spark,
      s"SELECT count(*) AS n FROM t_ts TIMESTAMP AS OF $ts1")
      .head().getLong(0)
    assert(viaIso == 10000L && viaMillis == 10000L)
  }

  test("SQL and DataFrame time-travel paths produce the same plan") {
    val (dir, v1) = freshLake("t_plan")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 99.0)))
    val sqlPlan = LakeSql.sql(spark,
      s"SELECT * FROM t_plan VERSION AS OF $v1")
      .queryExecution.optimizedPlan
    val dfPlan = Snapshots.tableAt(spark, s"$dir/m", v1)
      .queryExecution.optimizedPlan
    assert(sqlPlan.sameResult(dfPlan),
      s"SQL plan diverged from DataFrame plan:\n$sqlPlan\nvs\n$dfPlan")
  }

  test("MERGE INTO routes to mergeCommit: updates + inserts, stats-pruned") {
    val (dir, _) = freshLake("t_merge")
    val src = data.filter(col("id") < 500)
      .withColumn("x", col("x") + 10000)
      .unionByName(data.filter(col("id") % 1000 === 0)
        .withColumn("id", col("id") + 1000000))
    src.createOrReplaceTempView("merge_src")
    val m = LakeSql.sql(spark,
      "MERGE INTO t_merge t USING merge_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *").head()
    assert(m.getAs[Long]("rows_updated") == 500L)
    assert(m.getAs[Long]("rows_inserted") == 10L)
    assert(m.getAs[Long]("files_rewritten") < m.getAs[Long]("files_total"))
    val after = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_merge WHERE x >= 10000").head().getLong(0)
    assert(after == 500L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_merge")
      .head().getLong(0) == 10010L)
  }

  test("MERGE with box-scoped NOT MATCHED BY SOURCE DELETE → mergeCommitFull") {
    val (dir, _) = freshLake("t_merge3")
    // source is authoritative for id < 1000: re-sends evens only
    data.filter(col("id") < 1000 && col("id") % 2 === 0)
      .createOrReplaceTempView("merge3_src")
    val m = LakeSql.sql(spark,
      "MERGE INTO t_merge3 t USING merge3_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT * " +
        "WHEN NOT MATCHED BY SOURCE AND t.id >= 0 AND t.id <= 999 " +
        "THEN DELETE").head()
    assert(m.getAs[Long]("rows_deleted") == 500L)
    assert(m.getAs[Long]("rows_updated") == 500L)
    assert(m.getAs[Long]("rows_inserted") == 0L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_merge3")
      .head().getLong(0) == 9500L)
  }

  test("DELETE FROM compiles the WHERE conjunction to a stats box") {
    val (dir, _) = freshLake("t_del")
    val expect = data.filter(col("x") >= 100 && col("x") < 200 &&
      col("id") > 5000).count()
    val d = LakeSql.sql(spark,
      "DELETE FROM t_del WHERE x >= 100 AND x < 200 AND id > 5000").head()
    assert(d.getAs[Long]("rows_deleted") == expect)
    assert(d.getAs[Long]("files_rewritten") < d.getAs[Long]("files_total"))
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_del")
      .head().getLong(0) == 10000L - expect)
  }

  test("DELETE box compiler handles mirrored operand order and equality") {
    val (dir, _) = freshLake("t_del2")
    val expect = data.filter(col("x") >= 100 && col("x") < 200 &&
      col("id") > 5000).count()
    // literal-first forms of the same predicate
    val d = LakeSql.sql(spark,
      "DELETE FROM t_del2 WHERE 100 <= x AND 200 > x AND 5000 < id").head()
    assert(d.getAs[Long]("rows_deleted") == expect)
    val dirB = freshLake("t_del3")._1
    val one = data.filter(col("x") === 7).count()
    val e = LakeSql.sql(spark, "DELETE FROM t_del3 WHERE 7 = x").head()
    assert(e.getAs[Long]("rows_deleted") == one && one > 0)
  }

  test("unprunable predicates and unscoped by-source deletes are rejected") {
    freshLake("t_rej")
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "DELETE FROM t_rej WHERE y = 5") // no stats on y
    }
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "DELETE FROM t_rej WHERE x = 5 OR x = 7")
    }
    data.limit(1).createOrReplaceTempView("rej_src")
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark,
        "MERGE INTO t_rej t USING rej_src s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT * " +
          "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    }
  }

  test("INSERT INTO appends a committed version; OVERWRITE is rejected") {
    val (dir, v1) = freshLake("t_ins")
    data.filter(col("id") < 50)
      .withColumn("id", col("id") + 1000000)
      .createOrReplaceTempView("ins_src")
    val m = LakeSql.sql(spark,
      "INSERT INTO t_ins SELECT * FROM ins_src").head()
    assert(m.getAs[Long]("version") == v1 + 1)
    assert(m.getAs[Long]("files_appended") > 0)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_ins")
      .head().getLong(0) == 10050L)
    // pinned pre-insert snapshot excludes the batch
    assert(LakeSql.sql(spark,
      s"SELECT count(*) AS n FROM t_ins VERSION AS OF $v1")
      .head().getLong(0) == 10000L)
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "INSERT OVERWRITE t_ins SELECT * FROM ins_src")
    }
  }

  test("UPDATE compiles WHERE to a stats box; RHS sees the pre-update row") {
    val (dir, v1) = freshLake("t_upd")
    val expect = data.filter(col("x") >= 100 && col("x") <= 200).count()
    // x and y swap-with-arithmetic: both RHS must read the ORIGINAL row
    val m = LakeSql.sql(spark,
      "UPDATE t_upd SET y = x + y, x = x + 1 " +
        "WHERE x >= 100 AND x <= 200").head()
    assert(m.getAs[Long]("rows_updated") == expect)
    assert(m.getAs[Long]("files_rewritten") < m.getAs[Long]("files_total"))
    // pre-update semantics: both RHS evaluated against the ORIGINAL row —
    // exact multiset compare vs the batch-computed expectation
    val inBox = col("x").between(100, 200)
    val expected = data.select(col("id"),
      when(inBox, col("x") + 1).otherwise(col("x")).as("x"),
      when(inBox, col("x") + col("y")).otherwise(col("y")).as("y"))
    assert(graft.qc.RecallGate.equivalentFingerprint(Seq(
      (LakeSql.sql(spark, "SELECT id, x, y FROM t_upd"), expected,
        "post-update table vs batch-computed expectation")),
      Seq("id", "x", "y")))
    // pinned snapshot unchanged
    assert(LakeSql.sql(spark,
      s"SELECT count(*) AS n FROM t_upd VERSION AS OF $v1 " +
        "WHERE x >= 100 AND x <= 200").head().getLong(0) == expect)
    // unscoped UPDATE and unknown assignment column are rejected
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "UPDATE t_upd SET x = 1")
    }
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "UPDATE t_upd SET nope = 1 WHERE x = 5")
    }
  }

  test("CTAS creates a registered lake table that serves SQL DML + travel") {
    LakeSql.setWarehouse(tmpDir("lakesql_wh"))
    data.filter(col("id") < 2000).createOrReplaceTempView("ctas_src")
    val m = LakeSql.sql(spark,
      "CREATE TABLE t_ctas TBLPROPERTIES('stats_cols'='id,x', 'files'='4') " +
        "AS SELECT * FROM ctas_src").head()
    assert(m.getAs[Long]("version") == 1L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_ctas")
      .head().getLong(0) == 2000L)
    // the SQL-born table serves DML: delete a band, travel back
    val d = LakeSql.sql(spark,
      "DELETE FROM t_ctas WHERE id >= 0 AND id <= 99").head()
    assert(d.getAs[Long]("rows_deleted") == 100L)
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_ctas VERSION AS OF 1")
      .head().getLong(0) == 2000L)
    // IF NOT EXISTS on an existing table is a no-op; bare CREATE errors
    val noop = LakeSql.sql(spark,
      "CREATE TABLE IF NOT EXISTS t_ctas " +
        "TBLPROPERTIES('stats_cols'='id,x') AS SELECT * FROM ctas_src")
      .head()
    assert(noop.getAs[Long]("version") == 0L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_ctas")
      .head().getLong(0) == 1900L) // unchanged by the no-op
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark,
        "CREATE TABLE t_ctas TBLPROPERTIES('stats_cols'='id,x') " +
          "AS SELECT * FROM ctas_src")
    }
    // missing stats_cols is rejected
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "CREATE TABLE t_ctas2 AS SELECT * FROM ctas_src")
    }
  }

  test("ALTER RENAME/DROP COLUMN: metadata-only; reads and DML translate") {
    val (dir, v1) = freshLake("t_alt")
    val m = LakeSql.sql(spark,
      "ALTER TABLE t_alt RENAME COLUMN x TO score").head()
    assert(m.getAs[Long]("version") == v1 + 1)
    // reads serve the logical name; the pinned version keeps the old one
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_alt WHERE score < 100")
      .head().getLong(0) == data.filter(col("x") < 100).count())
    assert(LakeSql.sql(spark,
      s"SELECT count(*) AS n FROM t_alt VERSION AS OF $v1 WHERE x < 100")
      .head().getLong(0) == data.filter(col("x") < 100).count())
    // DML on the logical name: predicate, update target and RHS translate
    val expectUpd = data.filter(col("x").between(100, 200)).count()
    val u = LakeSql.sql(spark,
      "UPDATE t_alt SET score = score + 1000 " +
        "WHERE score >= 100 AND score <= 200").head()
    assert(u.getAs[Long]("rows_updated") == expectUpd)
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_alt WHERE score >= 1100")
      .head().getLong(0) == expectUpd)
    // INSERT routes the logical frame to physical names
    LakeSql.sql(spark, "SELECT id, score, y FROM t_alt WHERE id < 10")
      .createOrReplaceTempView("alt_src")
    LakeSql.sql(spark,
      "INSERT INTO t_alt SELECT id + 5000000 AS id, score, y FROM alt_src")
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_alt")
      .head().getLong(0) == 10010L)
    // DROP hides the column at head, pinned reads still serve it
    LakeSql.sql(spark, "ALTER TABLE t_alt DROP COLUMN y")
    assert(!LakeSql.sql(spark, "SELECT * FROM t_alt").columns.contains("y"))
    assert(LakeSql.sql(spark, s"SELECT * FROM t_alt VERSION AS OF $v1")
      .columns.contains("y"))
    // the old name is gone: a DELETE on it fails loudly
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "DELETE FROM t_alt WHERE x = 5")
    }
  }

  test("table_changes / table_history TVFs read the version log via SQL") {
    val (dir, v1) = freshLake("t_cdc")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 199.0)))
    val band = data.filter(col("x") <= 199).count()
    val feed = LakeSql.sql(spark,
      "SELECT id, change_type FROM table_changes('t_cdc', 1, 2)")
    assert(feed.count() == band)
    assert(feed.filter(col("change_type") =!= "delete").isEmpty)
    // composes with ordinary SQL
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM table_changes('t_cdc', 1, 2) " +
        "WHERE change_type = 'delete'").head().getLong(0) == band)
    val hist = LakeSql.sql(spark,
      "SELECT * FROM table_history('t_cdc') ORDER BY version").collect()
    assert(hist.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "create"), (2L, "delete")))
    assert(hist(0).getLong(2) == 10000L && hist(1).getLong(2) == 10000L - band)
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "SELECT * FROM table_changes('nope', 1, 2)")
    }
  }

  test("OPTIMIZE and VACUUM maintenance statements commit via SQL") {
    val (dir, v1) = freshLake("t_maint") // 16 files
    val o = LakeSql.sql(spark, "OPTIMIZE t_maint").head()
    assert(o.getAs[Long]("files_out") < o.getAs[Long]("files_in"))
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_maint")
      .head().getLong(0) == 10000L)
    // pinned pre-optimize version still serves until vacuumed
    assert(LakeSql.sql(spark,
      s"SELECT count(*) AS n FROM t_maint VERSION AS OF $v1")
      .head().getLong(0) == 10000L)
    val v = LakeSql.sql(spark, "VACUUM t_maint RETAIN 1 VERSIONS").head()
    assert(v.getAs[Long]("versions_dropped") == 1L)
    assert(v.getAs[Long]("files_deleted") == 16L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_maint")
      .head().getLong(0) == 10000L)
    // RETAIN ... HOURS keeps everything younger than the cutoff
    val h = LakeSql.sql(spark, "VACUUM t_maint RETAIN 1 HOURS").head()
    assert(h.getAs[Long]("versions_dropped") == 0L)
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "OPTIMIZE no_such_table")
    }
  }

  test("unregistered relations pass through to the session catalog") {
    data.createOrReplaceTempView("plain_view")
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM plain_view").head().getLong(0) == 10000L)
  }

  test("lake table composes with a temp view in one statement") {
    val (dir, _) = freshLake("t_join")
    data.filter(col("id") < 100).select(col("id"), col("y"))
      .createOrReplaceTempView("join_dim")
    val joined = LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_join t JOIN join_dim d ON t.id = d.id")
      .head().getLong(0)
    assert(joined == 100L)
  }

  test("temp views and CTEs shadow a same-named lake table (Spark precedence)") {
    freshLake("t_shadow")
    try {
      // temp view with the SAME name: Spark's resolution order (temp
      // views win) must be preserved — 5 rows, not the lake's 10000
      data.filter(col("id") < 5).createOrReplaceTempView("t_shadow")
      assert(LakeSql.sql(spark,
        "SELECT count(*) AS n FROM t_shadow").head().getLong(0) == 5L)
      // explicit time travel is lake-only, so it still binds to the lake
      assert(LakeSql.sql(spark,
        "SELECT count(*) AS n FROM t_shadow VERSION AS OF 1")
        .head().getLong(0) == 10000L)
    } finally spark.catalog.dropTempView("t_shadow")
    // CTE with the lake table's name wins inside its statement
    assert(LakeSql.sql(spark,
      "WITH t_shadow AS (SELECT 1 AS one) SELECT count(*) AS n FROM t_shadow")
      .head().getLong(0) == 1L)
    // and without the shadow, the lake serves again
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_shadow").head().getLong(0) == 10000L)
  }

  test("INSERT schema-on-write: drift rejected before staging, upcasts aligned") {
    val (dir, _) = freshLake("t_sow")
    // extra column → rejected, nothing committed
    data.withColumn("zz", lit(1)).createOrReplaceTempView("sow_extra")
    val e1 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "INSERT INTO t_sow SELECT * FROM sow_extra")
    }
    assert(e1.getMessage.contains("zz"))
    // missing column → rejected
    data.select(col("id"), col("x")).createOrReplaceTempView("sow_miss")
    val e2 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "INSERT INTO t_sow SELECT * FROM sow_miss")
    }
    assert(e2.getMessage.contains("y"))
    // incompatible retype (long stored, string arriving) → rejected
    data.withColumn("y", lit("oops")).createOrReplaceTempView("sow_retype")
    val e3 = intercept[IllegalArgumentException] {
      LakeSql.sql(spark, "INSERT INTO t_sow SELECT * FROM sow_retype")
    }
    assert(e3.getMessage.contains("upcast"))
    assert(Snapshots.latestVersion(spark, s"$dir/m") == 1,
      "a rejected INSERT must leave no version behind")
    // safe upcast (int → long) + shuffled column order: aligned in place
    spark.range(3).select(col("id").cast("int").as("y"),
        (col("id") + 20000).as("id"), col("id").cast("int").as("x"))
      .createOrReplaceTempView("sow_up")
    val ok = LakeSql.sql(spark,
      "INSERT INTO t_sow SELECT * FROM sow_up").head()
    assert(ok.getAs[Long]("version") == 2L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_sow")
      .head().getLong(0) == 10003L)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only, typed nulls, appends materialize") {
    val (_, v1) = freshLake("t_addcol")
    val m = LakeSql.sql(spark,
      "ALTER TABLE t_addcol ADD COLUMN score DOUBLE").head()
    assert(m.getAs[Long]("columns_added") == 1L)
    // immediately visible as typed nulls (no data file written)
    val now = LakeSql.sql(spark, "SELECT * FROM t_addcol")
    assert(now.columns.contains("score"))
    assert(now.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(now.filter(col("score").isNotNull).isEmpty)
    // pinned pre-alter read keeps the old schema
    assert(!LakeSql.sql(spark,
      s"SELECT * FROM t_addcol VERSION AS OF $v1").columns.contains("score"))
    // an INSERT carrying the column materializes real values; old rows null
    spark.range(5).select((col("id") + 50000).as("id"), col("id").as("x"),
        col("id").as("y"), lit(1.5).as("score"))
      .createOrReplaceTempView("addcol_batch")
    LakeSql.sql(spark, "INSERT INTO t_addcol SELECT * FROM addcol_batch")
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_addcol WHERE score = 1.5")
      .head().getLong(0) == 5L)
    assert(LakeSql.sql(spark,
      "SELECT count(*) AS n FROM t_addcol WHERE score IS NULL")
      .head().getLong(0) == 10000L)
    // DESCRIBE serves the evolved schema
    val desc = LakeSql.sql(spark, "DESCRIBE t_addcol").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("score") == "double" && desc("id") == "bigint")
    // DESCRIBE EXTENDED appends the detail block
    val ext = LakeSql.sql(spark, "DESCRIBE EXTENDED t_addcol").collect()
      .map(_.getString(0))
    assert(ext.contains("# Detailed Table Information"))
  }

  test("DROP TABLE and SHOW TABLES over the lake registry") {
    val (dir1, _) = freshLake("t_drop1")
    freshLake("t_drop2")
    def listed(): Set[String] =
      LakeSql.sql(spark, "SHOW TABLES LIKE 't_drop*'").collect()
        .map(_.getString(0)).toSet
    assert(listed() == Set("t_drop1", "t_drop2"))
    assert(LakeSql.sql(spark, "DROP TABLE t_drop2")
      .head().getAs[Long]("dropped") == 1L)
    assert(listed() == Set("t_drop1"))
    // dropped name no longer resolves
    intercept[Exception](
      LakeSql.sql(spark, "SELECT count(*) AS n FROM t_drop2").head())
    // IF EXISTS on a missing table is a quiet no-op
    assert(LakeSql.sql(spark, "DROP TABLE IF EXISTS t_drop2")
      .head().getAs[Long]("dropped") == 0L)
    // PURGE reclaims the data and manifest dirs
    val p = new org.apache.hadoop.fs.Path(s"$dir1/z")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(p))
    LakeSql.sql(spark, "DROP TABLE t_drop1 PURGE").head()
    assert(!fs.exists(p))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir1/m")))
  }

  test("RESTORE TABLE rolls forward; TIMESTAMP form resolves the stamp") {
    val (dir, v1) = freshLake("t_rst")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 499.0)))
    val r = LakeSql.sql(spark,
      s"RESTORE TABLE t_rst TO VERSION AS OF $v1").head()
    assert(r.getAs[Long]("restored_to") == v1.toLong)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_rst")
      .head().getLong(0) == 10000L)
    // the roll-forward keeps the bad version pinnable
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_rst VERSION AS OF 2")
      .head().getLong(0) < 10000L)
    // TIMESTAMP form: restore to the stamp of the delete (version 2)
    val ts = java.time.Instant
      .ofEpochMilli(Snapshots.commitTimestamp(spark, s"$dir/m", 2).get)
      .atZone(java.time.ZoneId.of("UTC")).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val r2 = LakeSql.sql(spark,
      s"RESTORE TABLE t_rst TO TIMESTAMP AS OF '$ts'").head()
    assert(r2.getAs[Long]("restored_to") == 2L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_rst")
      .head().getLong(0) < 10000L)
    // unknown target version fails loudly
    intercept[Exception](
      LakeSql.sql(spark, "RESTORE TABLE t_rst TO VERSION AS OF 99"))
  }

  test("SHALLOW CLONE defaults to the head version and refuses name reuse") {
    val (dir, v1) = freshLake("t_cln")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 499.0)))
    val headRows = LakeSql.sql(spark, "SELECT count(*) AS n FROM t_cln")
      .head().getLong(0)
    LakeSql.unregister("t_cln_fork")
    val c = LakeSql.sql(spark, "CREATE TABLE t_cln_fork SHALLOW CLONE " +
      s"t_cln LOCATION '$dir/fork'").head()
    // no VERSION AS OF → the clone pins the source HEAD (post-delete)
    assert(c.getAs[Long]("cloned_from") == 2L)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_cln_fork")
      .head().getLong(0) == headRows)
    // a second clone onto the same name is refused
    val e = intercept[IllegalArgumentException](
      LakeSql.sql(spark, "CREATE TABLE t_cln_fork SHALLOW CLONE t_cln " +
        s"LOCATION '$dir/fork2'"))
    assert(e.getMessage.contains("already exists"))
    // source-side DML after the fork is invisible to the clone
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 500.0, 749.0)))
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_cln_fork")
      .head().getLong(0) == headRows)
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_cln")
      .head().getLong(0) < headRows)
    // clone at a pinned version: v1 serves the full pre-delete table
    LakeSql.unregister("t_cln_fork1")
    LakeSql.sql(spark, "CREATE TABLE t_cln_fork1 SHALLOW CLONE t_cln " +
      s"VERSION AS OF $v1 LOCATION '$dir/fork1'")
    assert(LakeSql.sql(spark, "SELECT count(*) AS n FROM t_cln_fork1")
      .head().getLong(0) == 10000L)
  }

  test("property maps chunk across markers past the filename limit") {
    import spark.implicits._
    val dir = tmpDir("props_chunk")
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v")
    graft.sinks.Layout.zorderWrite(df, Seq("k"), s"$dir/z", 2)
    graft.sinks.Snapshots.commit(spark,
      graft.sinks.Layout.buildManifest(spark, s"$dir/z", Seq("k")), s"$dir/m")
    // 40 long-keyed properties — far past one 255-byte path segment
    val many = (1 to 40).map(i =>
      s"stats.some_rather_long_column_name_$i.distinctCount" ->
        (i * 1000).toString).toMap
    val v = graft.sinks.Snapshots.setProperties(spark, s"$dir/m", many)
    val back = graft.sinks.Snapshots.tableProperties(spark, s"$dir/m", v)
    assert(back == many)
    // merge semantics survive chunking: one more SET keeps all prior keys
    val v2 = graft.sinks.Snapshots.setProperties(spark, s"$dir/m",
      Map("owner" -> "etl"))
    val merged = graft.sinks.Snapshots.tableProperties(spark, s"$dir/m", v2)
    assert(merged == many + ("owner" -> "etl"))
    // every chunk file's NAME stays under the 255-byte segment limit
    val fs = new org.apache.hadoop.fs.Path(s"$dir/m")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/m/v=$v2"))
      .map(_.getPath.getName).filter(_.startsWith("_props_"))
    assert(names.length > 1, "expected the map to chunk")
    names.foreach(n => assert(n.getBytes("UTF-8").length < 255))
    // vacuum past the props commit rehomes EVERY chunk: the map survives
    val v3 = graft.sinks.Snapshots.commit(spark,
      graft.sinks.Snapshots.manifestAt(spark, s"$dir/m", v2), s"$dir/m")
    graft.sinks.Snapshots.vacuum(spark, s"$dir/z", s"$dir/m", retainLast = 1)
    assert(graft.sinks.Snapshots.tableProperties(spark, s"$dir/m", v3)
      == many + ("owner" -> "etl"))
  }
}
