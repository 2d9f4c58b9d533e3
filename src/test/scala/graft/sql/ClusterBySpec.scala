package graft.sql

import graft.SparkSpec
import graft.sinks.Snapshots

/** CLUSTER BY as table state + incremental OPTIMIZE (the liquid shape):
  * keys persist in TBLPROPERTIES from CREATE/ALTER; a plain OPTIMIZE
  * re-clusters only the unclustered increment, leaving the clustered
  * base byte-identical; a clustered table with nothing new is a
  * commit-free no-op; CLUSTER BY NONE reverts to full compaction. */
class ClusterBySpec extends SparkSpec {
  import spark.implicits._

  private def fd(sql: String) = LakeSql.sql(spark, sql)

  private def fileStates(dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("CREATE TABLE … CLUSTER BY persists the keys; OPTIMIZE clusters " +
      "everything once, then only the appended increment — clustered " +
      "base files stay byte-identical; third OPTIMIZE is a no-op") {
    val root = tmpDir("clspec1")
    LakeSql.unregister("cl_t")
    fd(s"""CREATE TABLE cl_t (k BIGINT, g STRING, v DOUBLE)
        USING lake CLUSTER BY (k) LOCATION '$root'
        TBLPROPERTIES ('stats_cols' = 'k', 'files' = '4')""")
    val spec = spark.range(0, 4000).selectExpr("id % 97 AS k",
      "concat('g', id % 7) AS g", "cast(id as double) / 7 AS v")
    spec.createOrReplaceTempView("cl_src")
    fd("INSERT INTO cl_t SELECT * FROM cl_src")
    // keys visible as table state
    val props = Snapshots.tableProperties(spark, s"$root/m",
      Snapshots.latestVersion(spark, s"$root/m"))
    assert(props.get("graft.cluster.by").contains("k"))
    // first OPTIMIZE: every live file re-clusters
    val r1 = fd("OPTIMIZE cl_t").head()
    assert(r1.getAs[Long]("files_in") > 0 && r1.getAs[Long]("files_out") > 0)
    val base = fileStates(s"$root/z")
    // append an increment, then OPTIMIZE again
    spark.range(4000, 4500).selectExpr("id % 97 AS k",
      "concat('g', id % 7) AS g", "cast(id as double) / 7 AS v")
      .createOrReplaceTempView("cl_src2")
    fd("INSERT INTO cl_t SELECT * FROM cl_src2")
    val manifestBefore = Snapshots.manifestAt(spark, s"$root/m",
      Snapshots.latestVersion(spark, s"$root/m"))
    val liveBefore = manifestBefore.select("file").as[String].collect().toSet
    val appended = liveBefore.count(f => !base.contains(
      f.substring(f.lastIndexOf('/') + 1)))
    assert(appended > 0, "append produced no new files")
    val r2 = fd("OPTIMIZE cl_t").head()
    // ONLY the appended files re-clustered
    assert(r2.getAs[Long]("files_in") == appended.toLong,
      s"reclustered ${r2.getAs[Long]("files_in")} files, " +
        s"expected the $appended appended ones")
    // the clustered base is byte-identical (same name, size, mtime)
    val after = fileStates(s"$root/z")
    base.foreach { case (name, st) =>
      assert(after.get(name).contains(st), s"base file $name was touched")
    }
    // nothing new ⇒ commit-free no-op
    val vHead = Snapshots.latestVersion(spark, s"$root/m")
    val r3 = fd("OPTIMIZE cl_t").head()
    assert(r3.getAs[Long]("files_in") == 0L &&
      r3.getAs[Long]("version") == vHead.toLong)
    // contents intact through both incremental passes
    assert(fd("SELECT count(*) AS n FROM cl_t").head().getLong(0) == 4500L)
    assert(fd("SELECT sum(k) AS s FROM cl_t WHERE k BETWEEN 10 AND 20")
      .head().getLong(0) ==
      (0 until 4500).map(_ % 97).filter(k => k >= 10 && k <= 20).sum)
    LakeSql.unregister("cl_t")
  }

  test("ALTER TABLE … CLUSTER BY sets keys on an existing table (stats " +
      "rule enforced); CLUSTER BY NONE reverts OPTIMIZE to full " +
      "compaction") {
    val root = tmpDir("clspec2")
    LakeSql.unregister("cl_a")
    LakeSql.setWarehouse(tmpDir("clspec2wh"))
    spark.range(0, 1000).selectExpr("id % 50 AS k", "id AS v")
      .createOrReplaceTempView("cla_src")
    fd(s"CREATE TABLE cl_a TBLPROPERTIES('stats_cols'='k','files'='4') " +
      "AS SELECT * FROM cla_src")
    // a non-stats column is rejected loudly
    val e = intercept[IllegalArgumentException] {
      fd("ALTER TABLE cl_a CLUSTER BY (v)")
    }
    assert(e.getMessage.contains("stats"), e.getMessage)
    fd("ALTER TABLE cl_a CLUSTER BY (k)")
    val r1 = fd("OPTIMIZE cl_a").head()
    assert(r1.getAs[Long]("files_in") > 0)
    // no increment ⇒ no-op while keys are set
    assert(fd("OPTIMIZE cl_a").head().getAs[Long]("files_in") == 0L)
    fd("ALTER TABLE cl_a CLUSTER BY NONE")
    // keys gone ⇒ plain OPTIMIZE is the full re-layout again
    val r2 = fd("OPTIMIZE cl_a").head()
    assert(r2.getAs[Long]("files_in") > 0L)
    assert(fd("SELECT count(*) AS n FROM cl_a").head().getLong(0) == 1000L)
    LakeSql.unregister("cl_a")
  }

  test("OPTIMIZE FULL forces a full re-cluster (re-establishes the " +
      "incremental baseline); requires clustering keys") {
    val root = tmpDir("clspec3")
    LakeSql.unregister("cl_f")
    LakeSql.setWarehouse(tmpDir("clspec3wh"))
    spark.range(0, 1000).selectExpr("id % 50 AS k", "id AS v")
      .createOrReplaceTempView("clf_src")
    fd(s"CREATE TABLE cl_f TBLPROPERTIES('stats_cols'='k','files'='4') " +
      "AS SELECT * FROM clf_src")
    val e = intercept[IllegalArgumentException](fd("OPTIMIZE cl_f FULL"))
    assert(e.getMessage.contains("CLUSTER BY"), e.getMessage)
    fd("ALTER TABLE cl_f CLUSTER BY (k)")
    assert(fd("OPTIMIZE cl_f").head().getAs[Long]("files_in") > 0)
    // incremental is a no-op now, but FULL rewrites everything again
    assert(fd("OPTIMIZE cl_f").head().getAs[Long]("files_in") == 0L)
    val rf = fd("OPTIMIZE cl_f FULL").head()
    assert(rf.getAs[Long]("files_in") > 0L)
    // and the baseline is re-established: the next plain OPTIMIZE no-ops
    assert(fd("OPTIMIZE cl_f").head().getAs[Long]("files_in") == 0L)
    assert(fd("SELECT count(*) AS n FROM cl_f").head().getLong(0) == 1000L)
    LakeSql.unregister("cl_f")
  }
}
