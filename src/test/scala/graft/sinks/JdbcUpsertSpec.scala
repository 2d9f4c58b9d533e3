package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

class JdbcUpsertSpec extends AnyFunSuite {

  test("mergeSql: ON all keys, update all non-keys, insert all columns") {
    val sql = JdbcUpsert.mergeSql("dim_customers", Seq("id"),
      Seq("id", "email", "updated_at"))
    assert(sql.contains("MERGE INTO [dim_customers] t"))
    assert(sql.contains("USING [tmp_dim_customers] s"))
    assert(sql.contains("ON t.[id] = s.[id]"))
    assert(sql.contains(
      "WHEN MATCHED THEN UPDATE SET [email] = s.[email], [updated_at] = s.[updated_at]"))
    assert(sql.contains(
      "WHEN NOT MATCHED THEN INSERT ([id], [email], [updated_at]) VALUES (s.[id], s.[email], s.[updated_at])"))
    assert(sql.endsWith(";"),
      "T-SQL requires MERGE to be ';'-terminated (SQL Server Msg 10713)")
  }

  test("mergeSql: multi-key joins on AND of all keys; keys never updated") {
    val sql = JdbcUpsert.mergeSql("f", Seq("k1", "k2"), Seq("k1", "k2", "v"))
    assert(sql.contains("ON t.[k1] = s.[k1] AND t.[k2] = s.[k2]"))
    assert(sql.contains("UPDATE SET [v] = s.[v]"))
    assert(!sql.contains("[k1] = s.[k1],"))
  }

  test("mergeSql: all-key table omits the MATCHED clause") {
    val sql = JdbcUpsert.mergeSql("bridge", Seq("a", "b"), Seq("a", "b"))
    assert(!sql.contains("WHEN MATCHED"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT ([a], [b])"))
  }

  test("mergeSql: identifiers are bracket-quoted and escaped") {
    val sql = JdbcUpsert.mergeSql("we]ird", Seq("k"), Seq("k", "v"))
    assert(sql.contains("[we]]ird]"))
  }

  test("mergeSql rejects keys outside the column set") {
    intercept[IllegalArgumentException] {
      JdbcUpsert.mergeSql("t", Seq("nope"), Seq("a", "b"))
    }
  }

  test("Derby dialect: unquoted tables, double-quoted columns, plain DROP") {
    val sql = JdbcUpsert.mergeSql("customer_t", Seq("id"), Seq("id", "v"),
      JdbcUpsert.Derby)
    assert(sql.contains("MERGE INTO customer_t t"))
    assert(sql.contains("USING tmp_customer_t s"))
    assert(sql.contains("ON t.\"id\" = s.\"id\""))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET \"v\" = s.\"v\""))
    assert(!sql.contains(";"), "Derby's JDBC layer rejects statement terminators")
    assert(JdbcUpsert.dropSql("customer_t", JdbcUpsert.Derby) ===
      "DROP TABLE tmp_customer_t")
    assert(JdbcUpsert.dropSql("customer_t") ===
      "DROP TABLE IF EXISTS [tmp_customer_t]")
  }
}
