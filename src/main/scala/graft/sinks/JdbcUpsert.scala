package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC staged-MERGE upsert — the warehouse form of the reference's load
  * stage (reference `run_load.py:57-96`): stage the batch into a temp table,
  * run one transactional `MERGE` keyed on the declared columns (update every
  * non-key column on match, insert all columns on no-match), drop the stage.
  *
  * Differences from the reference, by design:
  *  - the stage is written with executor-parallel `df.write.jdbc`
  *    (partitioned INSERTs), not a single-process pandas `to_sql` — the
  *    reference's acknowledged scale limit (`run_load.py:36`, with "Spark
  *    JDBC writes" named as the production alternative at `run_load.py:64-66`);
  *  - duplicate source keys are pre-deduped upstream (SQL Server MERGE
  *    errors on them; see [[graft.ops.Upsert]]).
  *
  * The MERGE text generation is a pure function so its semantics are unit
  * tested without a database; the full staged round-trip is exercised
  * end-to-end against embedded Derby (driver query q97).
  */
object JdbcUpsert {

  /** Warehouse dialect seam: identifier quoting and stage-drop syntax are
    * the only statements that differ between the targets we generate for.
    * Table names are passed through UNQUOTED on dialects whose default
    * case-folding must match how Spark's JDBC writer addressed the table
    * (Spark creates tables with the name verbatim-unquoted, columns quoted).
    */
  sealed trait Dialect {
    /** Quote a column identifier. */
    def col(ident: String): String
    /** Render a table name the same way Spark's JDBC writer does. */
    def table(ident: String): String
    /** Drop the staging table (dialects differ on IF EXISTS support). */
    def dropStageSql(tableName: String): String
    /** Statement terminator for the MERGE. T-SQL requires MERGE to end with
      * ';' (SQL Server Msg 10713; reference `run_load.py:89` keeps it);
      * Derby's JDBC layer rejects terminators. */
    def mergeTerminator: String
  }

  /** SQL Server / Synapse — the reference's warehouse (`run_load.py:75-90`):
    * bracket quoting, `DROP TABLE IF EXISTS`. */
  case object SqlServer extends Dialect {
    private def q(ident: String): String = "[" + ident.replace("]", "]]") + "]"
    def col(ident: String): String = q(ident)
    def table(ident: String): String = q(ident)
    def dropStageSql(tableName: String): String =
      s"DROP TABLE IF EXISTS ${table(stagingName(tableName))}"
    def mergeTerminator: String = ";"
  }

  /** Apache Derby (embedded) — the in-harness stand-in warehouse: unquoted
    * table names (Derby folds them the same way Spark's unquoted CREATE
    * TABLE did), double-quoted case-exact column names (Spark's Derby
    * dialect creates columns quoted), plain DROP (no IF EXISTS — the stage
    * is always freshly written when we drop it). */
  case object Derby extends Dialect {
    def col(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def table(ident: String): String = ident
    def dropStageSql(tableName: String): String =
      s"DROP TABLE ${table(stagingName(tableName))}"
    def mergeTerminator: String = ""
  }

  def stagingName(table: String): String = s"tmp_$table"

  /** Generate the MERGE statement (reference `run_load.py:75-90`):
    * ON all keys; WHEN MATCHED update every non-key column; WHEN NOT MATCHED
    * insert every column. SET targets are unqualified (SQL standard; both
    * dialects accept it). The terminator is dialect-specific: T-SQL requires
    * the MERGE to end with ';', Derby rejects one. */
  def mergeSql(table: String, keys: Seq[String], columns: Seq[String],
               dialect: Dialect = SqlServer): String = {
    require(keys.nonEmpty && keys.forall(columns.contains),
      s"keys ${keys.mkString(",")} must be a subset of columns")
    val nonKeys = columns.filterNot(keys.contains)
    val on = keys.map(k => s"t.${dialect.col(k)} = s.${dialect.col(k)}").mkString(" AND ")
    val setClause = nonKeys.map(c => s"${dialect.col(c)} = s.${dialect.col(c)}").mkString(", ")
    val insertCols = columns.map(dialect.col).mkString(", ")
    val insertVals = columns.map(c => s"s.${dialect.col(c)}").mkString(", ")
    val matched =
      if (nonKeys.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause " else ""
    s"""MERGE INTO ${dialect.table(table)} t
       |USING ${dialect.table(stagingName(table))} s
       |ON $on
       |${matched}WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)${dialect.mergeTerminator}""".stripMargin
  }

  def dropSql(table: String, dialect: Dialect = SqlServer): String =
    dialect.dropStageSql(table)

  /** Index the MERGE key columns on the target — the embedded-warehouse
    * stand-in for the PRIMARY KEY a real warehouse table carries (the
    * reference's load targets are keyed, `run_load.py:113-124`). Spark's
    * JDBC writer creates bare tables; without a key index Derby's MERGE
    * nested-loops stage × target (measured 5× slower at 15k rows, and
    * quadratic growth from there). Idempotent: an already-existing index
    * is ignored. */
  def ensureKeyIndex(url: String, table: String, keys: Seq[String],
                     props: Properties = new Properties(),
                     dialect: Dialect = SqlServer): Unit = {
    val conn: Connection = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"CREATE INDEX ${dialect.table(table + "_gkix")} ON " +
          s"${dialect.table(table)} ${keys.map(dialect.col).mkString("(", ", ", ")")}")
      catch {
        // Swallow ONLY the object-already-exists signals, matched by
        // SQLState / vendor code rather than message text (a substring match
        // on "already" would also swallow permission or locking failures and
        // leave the MERGE silently unindexed — the 5× regression this helper
        // exists to prevent): Derby X0Y32; SQL Server 1913 (duplicate index
        // name) / 2714 (object exists). Logged so an idempotent re-run is
        // still visible in the driver log.
        case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" ||
            e.getErrorCode == 1913 || e.getErrorCode == 2714 =>
          System.err.println(
            s"[jdbc] index ${table}_gkix already exists (${e.getSQLState}/" +
              s"${e.getErrorCode}) — skipping create")
      } finally st.close()
    } finally conn.close()
  }

  /** Full staged upsert: executor-parallel JDBC write of the stage, then the
    * MERGE + DROP in one driver-side transaction (DDL/DML on the warehouse is
    * inherently a single statement — the heavy lifting, the stage write, is
    * distributed). Empty batches skip entirely (reference `run_load.py:68-70`).
    *
    * Duplicate source keys: SQL Server's MERGE errors when several source
    * rows match one target row, so the reference load would fail at the
    * warehouse. Default policy here is pre-dedup (an arbitrary survivor per
    * key — appropriate when upstream already guarantees key semantics);
    * `failOnDuplicateKeys = true` restores reference parity by failing FAST
    * on the Spark side, before any stage rows are shipped. */
  def upsert(updates: DataFrame, url: String, table: String, keys: Seq[String],
             props: Properties = new Properties(),
             dialect: Dialect = SqlServer,
             failOnDuplicateKeys: Boolean = false): Unit = {
    if (updates.isEmpty) return
    if (failOnDuplicateKeys) {
      val dup = updates.groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
        .count().filter(org.apache.spark.sql.functions.col("count") > 1)
        .limit(1).collect()
      require(dup.isEmpty,
        s"duplicate source keys for MERGE into $table, first: ${dup.mkString}")
    }
    val deduped = updates.dropDuplicates(keys)
    deduped.write.mode(SaveMode.Overwrite).jdbc(url, stagingName(table), props)
    val conn: Connection = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(mergeSql(table, keys, updates.columns.toSeq, dialect))
        st.executeUpdate(dropSql(table, dialect))
        conn.commit()
      } catch {
        case t: Throwable => conn.rollback(); throw t
      } finally st.close()
    } finally conn.close()
  }
}
