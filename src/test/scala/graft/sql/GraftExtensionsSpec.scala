package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.{Layout, Snapshots}
import graft.sql.LakeSql.LakeTableSpec

/** Session-catalog integration: with `graft.sql.GraftSparkExtensions`
  * registered (the shared test session does), PLAIN `spark.sql` resolves
  * lake tables, time travel, and the version-log TVFs — and produces the
  * SAME plan as the `LakeSql.sql` front door, because the injected rule
  * IS the front door's substitution block. */
class GraftExtensionsSpec extends SparkSpec {

  private def data = spark.range(8000)
    .select(col("id"), pmod(xxhash64(col("id")), lit(500)).as("x"))

  private def freshLake(name: String): (String, Int) = {
    val dir = tmpDir("ext")
    Layout.zorderWrite(data, Seq("id", "x"), s"$dir/z", nFiles = 8)
    val v1 = Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("id", "x")), s"$dir/m")
    LakeSql.register(name,
      LakeTableSpec(s"$dir/z", s"$dir/m", Seq("id", "x"), nFiles = 8))
    (dir, v1)
  }

  test("plain spark.sql resolves a lake table; plan == LakeSql.sql plan") {
    freshLake("t_ext1")
    val viaSpark = spark.sql("SELECT id, x FROM t_ext1 WHERE x < 100")
    val viaDoor = LakeSql.sql(spark, "SELECT id, x FROM t_ext1 WHERE x < 100")
    assert(viaSpark.queryExecution.optimizedPlan.sameResult(
      viaDoor.queryExecution.optimizedPlan),
      "spark.sql and LakeSql.sql diverged on the same text")
    assert(viaSpark.count() == data.filter(col("x") < 100).count())
  }

  test("time travel and TVFs work through plain spark.sql") {
    val (dir, v1) = freshLake("t_ext2")
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("id", "x"),
      Seq(("x", 0.0, 49.0)))
    val pinned = spark.sql(
      s"SELECT count(*) AS n FROM t_ext2 VERSION AS OF $v1")
      .head().getLong(0)
    assert(pinned == 8000L)
    val latest = spark.sql("SELECT count(*) AS n FROM t_ext2")
      .head().getLong(0)
    assert(latest < 8000L)
    val hist = spark.sql(
      "SELECT version, operation FROM table_history('t_ext2') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.map(_._2).toSeq == Seq("create", "delete"))
    val feed = spark.sql(
      s"SELECT count(*) AS n FROM table_changes('t_ext2', $v1, ${v1 + 1}) " +
        "WHERE change_type = 'delete'").head().getLong(0)
    assert(feed == 8000L - latest)
  }

  test("temp views keep precedence over same-named lake tables in spark.sql") {
    freshLake("t_ext3")
    try {
      data.filter(col("id") < 7).createOrReplaceTempView("t_ext3")
      assert(spark.sql("SELECT count(*) AS n FROM t_ext3")
        .head().getLong(0) == 7L)
    } finally spark.catalog.dropTempView("t_ext3")
    assert(spark.sql("SELECT count(*) AS n FROM t_ext3")
      .head().getLong(0) == 8000L)
  }

  test("lake tables join session-catalog views in one spark.sql statement") {
    freshLake("t_ext4")
    data.filter(col("id") % 100 === 0).select(col("id"))
      .createOrReplaceTempView("ext4_dim")
    assert(spark.sql(
      "SELECT count(*) AS n FROM t_ext4 t JOIN ext4_dim d ON t.id = d.id")
      .head().getLong(0) == 80L)
  }
}
