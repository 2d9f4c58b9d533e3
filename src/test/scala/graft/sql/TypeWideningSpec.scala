package graft.sql

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sinks.Snapshots

/** ALTER COLUMN TYPE widening: metadata-only commit, old files read as
  * the wide type, pinned pre-widen reads keep the narrow type, stats
  * pruning stays sound across the boundary, non-widenings refuse. */
class TypeWideningSpec extends SparkSpec {

  private def fd(sql: String) = LakeSql.sql(spark, sql)

  private def dataFiles(root: String): Set[String] = {
    val d = new java.io.File(root, "z")
    d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
      !f.getName.startsWith(".")).map(f =>
      s"${f.getName}:${f.length()}:${f.lastModified()}").toSet
  }

  test("INT->BIGINT: one metadata-only commit; mixed narrow/wide files " +
      "read as BIGINT; pinned pre-widen read keeps INT; post-widen " +
      "banded DELETE still prunes files") {
    val root = tmpDir("widen1")
    LakeSql.unregister("w_t")
    fd(s"""CREATE TABLE w_t (k INT, v DOUBLE) USING lake
      LOCATION '$root' TBLPROPERTIES ('stats_cols' = 'k', 'files' = '4')""")
    import spark.implicits._
    Seq.tabulate(100)(i => (i, i * 1.5)).toDF("k", "v")
      .createOrReplaceTempView("w_src")
    fd("INSERT INTO w_t SELECT * FROM w_src")
    val before = dataFiles(root)
    val vPre = Snapshots.latestVersion(spark, s"$root/m")
    // widen — ONE commit, zero data files touched
    fd("ALTER TABLE w_t ALTER COLUMN k TYPE BIGINT")
    assert(dataFiles(root) == before, "widen touched data files")
    assert(Snapshots.latestVersion(spark, s"$root/m") == vPre + 1)
    // head read serves BIGINT over the old INT32 files
    val head = fd("SELECT k, v FROM w_t")
    assert(head.schema("k").dataType == LongType,
      s"head read is ${head.schema("k").dataType}, want BIGINT")
    assert(head.count() == 100 &&
      head.agg(sum("k")).head().getLong(0) == 4950L)
    // pinned pre-widen read keeps the NARROW type
    val pinned = fd(s"SELECT k FROM w_t VERSION AS OF $vPre")
    assert(pinned.schema("k").dataType == IntegerType,
      s"pinned read widened to ${pinned.schema("k").dataType}")
    // post-widen insert of a value only BIGINT can hold → mixed files
    fd("INSERT INTO w_t SELECT CAST(5000000000 AS BIGINT) AS k, " +
      "9.0 AS v")
    val mixed = fd("SELECT sum(k) AS s, count(*) AS n FROM w_t").head()
    assert(mixed.getLong(1) == 101L && mixed.getLong(0) == 5000004950L,
      s"mixed-file read wrong: ${mixed.toSeq}")
    // typed stats pruning across the boundary: a banded DELETE on the
    // widened column must still skip files (manifest stats are BIGINT now)
    val del = fd("DELETE FROM w_t WHERE k >= 10 AND k <= 19").head()
    val touched = del.getAs[Long]("files_rewritten")
    val total = del.getAs[Long]("files_total")
    assert(touched < total,
      s"post-widen delete read $touched of $total files — no pruning")
    assert(fd("SELECT count(*) AS n FROM w_t").head().getLong(0) == 91L)
    // OPTIMIZE folds narrow files away; the table still reads right
    fd("OPTIMIZE w_t")
    assert(fd("SELECT sum(k) AS s FROM w_t").head().getLong(0) ==
      5000004950L - (10 to 19).sum)
    LakeSql.unregister("w_t")
  }

  test("FLOAT->DOUBLE and DECIMAL precision growth widen; narrowing and " +
      "cross-kind changes refuse loudly; CTAS-born tables widen too") {
    val root = tmpDir("widen2")
    LakeSql.unregister("w_f")
    fd(s"""CREATE TABLE w_f (id INT, r FLOAT, m DECIMAL(10,2)) USING lake
      LOCATION '$root' TBLPROPERTIES ('stats_cols' = 'id', 'files' = '2')""")
    fd("INSERT INTO w_f SELECT 1, CAST(1.5 AS FLOAT), " +
      "CAST(12.34 AS DECIMAL(10,2))")
    fd("ALTER TABLE w_f ALTER COLUMN r TYPE DOUBLE")
    fd("ALTER TABLE w_f ALTER COLUMN m TYPE DECIMAL(20,2)")
    val row = fd("SELECT r, m FROM w_f")
    assert(row.schema("r").dataType == DoubleType)
    assert(row.schema("m").dataType == DecimalType(20, 2))
    assert(row.head().getDouble(0) == 1.5 &&
      row.head().getDecimal(1).toString == "12.34")
    // a value needing the new precision lands
    fd("INSERT INTO w_f SELECT 2, CAST(2.5 AS DOUBLE), " +
      "CAST(123456789012345678.99 AS DECIMAL(20,2))")
    assert(fd("SELECT count(*) AS n FROM w_f").head().getLong(0) == 2L)
    // refusals
    for (bad <- Seq(
      "ALTER TABLE w_f ALTER COLUMN id TYPE SMALLINT", // narrowing
      "ALTER TABLE w_f ALTER COLUMN r TYPE FLOAT", // no-op/narrow
      "ALTER TABLE w_f ALTER COLUMN m TYPE DECIMAL(20,4)", // scale change
      "ALTER TABLE w_f ALTER COLUMN id TYPE STRING")) // cross-kind
      assert(intercept[IllegalArgumentException](fd(bad))
        .getMessage.contains("lossless widening"), bad)
    // CTAS-born table (no declared schema) synthesizes one and widens
    LakeSql.unregister("w_c")
    LakeSql.setWarehouse(tmpDir("widen2w"))
    import spark.implicits._
    Seq((1, 10.0), (2, 20.0)).toDF("a", "b")
      .createOrReplaceTempView("wc_src")
    fd("CREATE TABLE w_c TBLPROPERTIES('stats_cols'='a','files'='1') " +
      "AS SELECT * FROM wc_src")
    fd("ALTER TABLE w_c ALTER COLUMN a TYPE BIGINT")
    val wc = fd("SELECT a FROM w_c")
    assert(wc.schema("a").dataType == LongType &&
      wc.agg(sum("a")).head().getLong(0) == 3L)
    LakeSql.unregister("w_f"); LakeSql.unregister("w_c")
  }

  test("change feed spans the widen boundary: a post-widen delete's feed " +
      "serves the WIDE type on both sides (removed narrow files align)") {
    val root = tmpDir("widen3")
    LakeSql.unregister("w_cf")
    fd(s"""CREATE TABLE w_cf (k INT, v DOUBLE) USING lake
      LOCATION '$root' TBLPROPERTIES ('stats_cols' = 'k', 'files' = '2')""")
    import spark.implicits._
    Seq.tabulate(20)(i => (i, i * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("wcf_src")
    fd("INSERT INTO w_cf SELECT * FROM wcf_src") // v2, narrow files
    fd("ALTER TABLE w_cf ALTER COLUMN k TYPE BIGINT") // v3
    fd("INSERT INTO w_cf SELECT CAST(100 AS BIGINT) AS k, 1.0 AS v") // v4 wide
    fd("DELETE FROM w_cf WHERE k >= 0 AND k <= 5") // v5: rewrites narrow
    val head = Snapshots.latestVersion(spark, s"$root/m")
    val feed = Snapshots.changesBetween(spark, s"$root/m", head - 1, head).df
    assert(feed.schema("k").dataType == LongType,
      s"feed serves ${feed.schema("k").dataType}, want BIGINT")
    val deleted = feed.filter(col("change_type") === "delete")
      .agg(sum("k")).head().getLong(0)
    assert(deleted == (0 to 5).sum,
      s"feed delete side wrong: $deleted")
    LakeSql.unregister("w_cf")
  }
}
