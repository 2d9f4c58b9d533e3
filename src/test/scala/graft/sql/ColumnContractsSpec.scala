package graft.sql

import graft.SparkSpec
import graft.sinks.Snapshots

/** Round-15 item 3: write-side column contracts — NOT NULL and
  * GENERATED ALWAYS AS IDENTITY / AS (expr) — declared in plain
  * CREATE TABLE DDL, enforced before staging, identity assigned by the
  * deterministic partition-offset prefix sum. */
class ColumnContractsSpec extends SparkSpec {

  private def fd(sql: String) = LakeSql.sql(spark, sql)

  test("identity ids are deterministic rank-by-sort, continue across " +
      "commits, and survive a START WITH / INCREMENT BY spec") {
    val dir = tmpDir("idspec")
    fd(s"""CREATE TABLE id_t (
        k BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
        name STRING) USING lake LOCATION '$dir'
        TBLPROPERTIES ('stats_cols' = 'k')""")
    fd("INSERT INTO id_t VALUES ('b'), ('a'), ('c')")
    val first = fd("SELECT k, name FROM id_t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // rank by the batch's columns (name): a=10, b=12, c=14
    assert(first.toSeq == Seq((10L, "a"), (12L, "b"), (14L, "c")))
    // high-water continues — a second batch never reuses ids
    fd("INSERT INTO id_t VALUES ('z'), ('y')")
    val second = fd("SELECT k, name FROM id_t WHERE k > 14 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(second.toSeq == Seq((16L, "y"), (18L, "z")))
    LakeSql.unregister("id_t")
  }

  test("GENERATED ALWAYS rejects explicit values; arity mismatch rejects") {
    val dir = tmpDir("idspec2")
    fd(s"""CREATE TABLE id_t2 (
        k BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)
        USING lake LOCATION '$dir' TBLPROPERTIES ('stats_cols' = 'k')""")
    // supplying BOTH columns (arity 2) is an arity error — the table
    // wants only the non-generated one
    val e = intercept[IllegalArgumentException] {
      fd("INSERT INTO id_t2 VALUES (99, 'x')")
    }
    assert(e.getMessage.contains("non-generated"), e.getMessage)
    // a named batch explicitly carrying the identity column is called out
    spark.sql("SELECT 1 AS k").createOrReplaceTempView("bad_idb")
    val e2 = intercept[IllegalArgumentException] {
      fd("INSERT INTO id_t2 SELECT k, 'x' AS v FROM bad_idb")
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS"), e2.getMessage)
    assert(fd("SELECT count(*) AS n FROM id_t2").head().getLong(0) == 0)
    LakeSql.unregister("id_t2")
  }

  test("NOT NULL rejects before staging; NULL still PASSES a CHECK " +
      "constraint (three-valued logic) — the two contracts differ") {
    val dir = tmpDir("nnspec")
    fd(s"""CREATE TABLE nn_t (k BIGINT, name STRING NOT NULL, amt DOUBLE)
        USING lake LOCATION '$dir' TBLPROPERTIES ('stats_cols' = 'k')""")
    fd("ALTER TABLE nn_t ADD CONSTRAINT pos_amt CHECK (amt > 0)")
    fd("INSERT INTO nn_t VALUES (1, 'a', 5.0)")
    // NULL amt passes the CHECK (unknown ≠ false) — commits
    fd("INSERT INTO nn_t VALUES (2, 'b', NULL)")
    assert(fd("SELECT count(*) AS n FROM nn_t").head().getLong(0) == 2)
    // NULL name fails NOT NULL — rejected, nothing committed
    val e = intercept[Exception] {
      fd("INSERT INTO nn_t VALUES (3, NULL, 1.0)")
    }
    assert(e.getMessage.contains("NOT NULL"), e.getMessage)
    // negative amt fails the CHECK as before
    val e2 = intercept[Snapshots.ConstraintViolationException] {
      fd("INSERT INTO nn_t VALUES (4, 'd', -1.0)")
    }
    assert(e2.getMessage.contains("pos_amt"))
    assert(fd("SELECT count(*) AS n FROM nn_t").head().getLong(0) == 2)
    LakeSql.unregister("nn_t")
  }

  test("GENERATED ALWAYS AS (expr) computes from the batch's columns") {
    val dir = tmpDir("genspec")
    fd(s"""CREATE TABLE gen_t (a BIGINT, b BIGINT,
        tot BIGINT GENERATED ALWAYS AS (a + b))
        USING lake LOCATION '$dir' TBLPROPERTIES ('stats_cols' = 'a')""")
    fd("INSERT INTO gen_t VALUES (1, 10), (2, 20)")
    val got = fd("SELECT a, b, tot FROM gen_t ORDER BY a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L, 11L), (2L, 20L, 22L)))
    LakeSql.unregister("gen_t")
  }

  test("identity assignment is scale-shaped: distributed prefix sum, " +
      "ids exactly next..next+n-1 on a multi-partition batch") {
    import spark.implicits._
    val df = spark.range(0, 10000).select(($"id" % 977).as("x"),
      ($"id" * 3).as("y")).repartition(7)
    val (out, after) = Snapshots.assignIdentity(df, "sk",
      org.apache.spark.sql.types.LongType, 1000L, 1L)
    assert(after == 11000L)
    val ids = out.select("sk").as[Long].collect().sorted
    assert(ids.head == 1000L && ids.last == 10999L &&
      ids.distinct.length == 10000)
    // deterministic: a second run over the same data assigns the same
    // (row, id) pairs
    val (out2, _) = Snapshots.assignIdentity(df, "sk",
      org.apache.spark.sql.types.LongType, 1000L, 1L)
    val a = out.orderBy("x", "y", "sk").collect().toSeq
    val b = out2.orderBy("x", "y", "sk").collect().toSeq
    assert(a == b)
  }
}
