package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("cleanCustomers dedups on id, parses timestamps, stamps audit column") {
    val bronze = Seq(
      (1L, "Ada", "ada@x.com", "2026-01-03T10:00:00Z", "2026-01-05T09:30:00Z"),
      (1L, "Ada2", "ada2@x.com", "2026-01-03T10:00:00Z", "2026-01-06T09:30:00Z"),
      (2L, "Bob", null, "not-a-timestamp", null))
      .toDF("id", "name", "email", "created_at", "updated_at")
    val out = Cleaning.cleanCustomers(bronze)
    assert(out.select("id").distinct.count() == 2)
    assert(out.count() == 2)
    assert(out.schema("created_at").dataType.typeName == "timestamp")
    // unparseable timestamp becomes null, not an error
    assert(out.filter($"id" === 2L).select("created_at").head().isNullAt(0))
    assert(out.columns.contains(Cleaning.AuditCol))
  }

  test("cleanCustomers is schema-tolerant: absent columns are no-ops") {
    val bronze = Seq((1L, "Ada")).toDF("other_key", "name")
    val out = Cleaning.cleanCustomers(bronze) // no id/created_at/email columns
    assert(out.count() == 1)
    assert(out.columns.toSet == Set("other_key", "name", Cleaning.AuditCol))
  }

  test("cleanPayments casts string amount to double and dedups on payment_id") {
    val bronze = Seq(
      ("77", "19.99", "2026-01-05T11:00:00Z"),
      ("77", "19.99", "2026-01-05T11:00:00Z"),
      ("78", "badnum", null))
      .toDF("payment_id", "amount", "paid_at")
    val out = Cleaning.cleanPayments(bronze)
    assert(out.count() == 2)
    assert(out.schema("amount").dataType.typeName == "double")
    assert(out.filter($"payment_id" === "78").select("amount").head().isNullAt(0))
  }

  test("goldDim drops the audit column; goldFact is identity") {
    val silver = Seq((1L, "x")).toDF("id", "v")
      .withColumn(Cleaning.AuditCol, current_timestamp())
    assert(!Cleaning.goldDim(silver).columns.contains(Cleaning.AuditCol))
    assert(Cleaning.goldFact(silver).columns.contains(Cleaning.AuditCol))
  }

  test("dedupKeepFirst is deterministic: survivor is first under given order") {
    val df = Seq((1, "b", 2), (1, "a", 1), (2, "c", 3))
      .toDF("k", "v", "seq")
    val out = df.transform(SchemaTolerant.dedupKeepFirst(Seq("k"), Seq(col("seq").asc)))
    val survivors = out.select("k", "v").as[(Int, String)].collect().toMap
    assert(survivors == Map(1 -> "a", 2 -> "c"))
  }
}
