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

  test("DEFAULT fills omitted column-list columns; ALTER COLUMN SET/DROP " +
      "DEFAULT is write-time only (existing rows untouched)") {
    val dir = tmpDir("defspec")
    fd(s"""CREATE TABLE def_t (k BIGINT NOT NULL, v DOUBLE,
        tag STRING DEFAULT 'fresh', pri INT DEFAULT 7)
        USING lake LOCATION '$dir' TBLPROPERTIES ('stats_cols' = 'k')""")
    fd("INSERT INTO def_t (k, v) VALUES (1, 1.5), (2, 2.5)")
    assert(fd("SELECT tag, pri FROM def_t WHERE k = 1").head()
      .toSeq == Seq("fresh", 7))
    // re-declare the write default — only FUTURE inserts see it
    fd("ALTER TABLE def_t ALTER COLUMN tag SET DEFAULT 'late'")
    fd("INSERT INTO def_t (k, v) VALUES (3, 3.5)")
    assert(fd("SELECT tag FROM def_t WHERE k = 1").head().getString(0)
      == "fresh")
    assert(fd("SELECT tag FROM def_t WHERE k = 3").head().getString(0)
      == "late")
    // DROP DEFAULT reverts omission to typed NULL
    fd("ALTER TABLE def_t ALTER COLUMN pri DROP DEFAULT")
    fd("INSERT INTO def_t (k, v, tag) VALUES (4, 4.5, 'manual')")
    assert(fd("SELECT pri FROM def_t WHERE k = 4").head().isNullAt(0))
    // a column list may REORDER: values map to the listed columns
    fd("INSERT INTO def_t (v, k) VALUES (9.5, 9)")
    assert(fd("SELECT v, tag FROM def_t WHERE k = 9").head()
      .toSeq == Seq(9.5, "late"))
    LakeSql.unregister("def_t")
  }

  test("an explicit column list maps the source POSITIONALLY (standard " +
      "SQL): INSERT INTO t (a, b) SELECT b, a swaps even when the " +
      "source's own names match the target set") {
    val dir = tmpDir("posspec")
    fd(s"""CREATE TABLE pos_t (k BIGINT, v BIGINT)
        USING lake LOCATION '$dir' TBLPROPERTIES ('stats_cols' = 'k')""")
    // source columns NAMED k and v, but listed as (v, k): position wins,
    // so the source's k lands in v and vice versa
    fd("INSERT INTO pos_t (v, k) SELECT 1L AS k, 100L AS v")
    assert(fd("SELECT k, v FROM pos_t").head().toSeq == Seq(100L, 1L))
    // the no-list form keeps by-name mapping when names exactly cover
    fd("INSERT INTO pos_t SELECT 200L AS v, 2L AS k")
    assert(fd("SELECT v FROM pos_t WHERE k = 2").head().getLong(0) == 200L)
    LakeSql.unregister("pos_t")
  }

  test("DEFAULT contract gates: NOT NULL without default rejects; " +
      "column-referencing or mistyped defaults reject at DDL time; " +
      "identity columns cannot carry one; SHOW CREATE prints it") {
    val dir = tmpDir("defspec2")
    fd(s"""CREATE TABLE def_g (k BIGINT NOT NULL,
        s BIGINT GENERATED ALWAYS AS IDENTITY, tag STRING DEFAULT 'x')
        USING lake LOCATION '$dir' TBLPROPERTIES ('stats_cols' = 'k')""")
    // omitting NOT NULL k (no default) fails loudly, nothing commits
    val e = intercept[IllegalArgumentException] {
      fd("INSERT INTO def_g (tag) VALUES ('y')")
    }
    assert(e.getMessage.contains("NOT NULL"), e.getMessage)
    // constant-only: a column reference is GENERATED ALWAYS, not DEFAULT
    val e2 = intercept[IllegalArgumentException] {
      fd("ALTER TABLE def_g ALTER COLUMN tag SET DEFAULT upper(tag)")
    }
    assert(e2.getMessage.contains("constant"), e2.getMessage)
    // identity columns are engine-assigned — no default allowed
    val e3 = intercept[IllegalArgumentException] {
      fd("ALTER TABLE def_g ALTER COLUMN s SET DEFAULT 5")
    }
    assert(e3.getMessage.contains("engine-assigned"), e3.getMessage)
    // castability is probed at DDL time, not first INSERT
    intercept[Exception] {
      fd("CREATE TABLE def_bad (k BIGINT, d DATE DEFAULT 12.5) " +
        s"USING lake LOCATION '${tmpDir("defbad")}' " +
        "TBLPROPERTIES ('stats_cols' = 'k')")
    }
    val stmt = fd("SHOW CREATE TABLE def_g").head().getString(0)
    assert(stmt.contains("DEFAULT 'x'") && stmt.contains("k BIGINT NOT NULL")
      && stmt.contains("GENERATED ALWAYS AS IDENTITY"), stmt)
    LakeSql.unregister("def_g")
    LakeSql.unregister("def_bad")
  }
}
