package graft.ops

import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

class UpsertSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0),
    (2L, "b", 20.0)).toDF("id", "name", "amount")

  test("matched keys update every non-key column; new keys insert; unmatched kept") {
    val updates = Seq(
      (2L, "b2", 99.0), // update
      (3L, "c", 30.0))  // insert
      .toDF("id", "name", "amount")
    val out = Upsert.upsert(target, updates, Seq("id"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0)))
  }

  test("update sets non-key columns to null when the update row has null (MERGE updates all non-key cols)") {
    val updates = Seq((2L, Option.empty[String], Option(99.0)))
      .toDF("id", "name", "amount")
    val row = Upsert.upsert(target, updates, Seq("id"))
      .filter($"id" === 2L).head()
    assert(row.isNullAt(1) && row.getDouble(2) == 99.0)
  }

  test("empty update batch returns target unchanged (reference skip)") {
    val updates = target.filter($"id" < 0L)
    val out = Upsert.upsert(target, updates, Seq("id"))
    assert(out.collect().toSet == target.collect().toSet)
  }

  test("multi-column keys join on AND of all keys") {
    val t2 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val u2 = Seq((1L, "y", 9.0), (2L, "z", 3.0)).toDF("k1", "k2", "v")
    val out = Upsert.upsert(t2, u2, Seq("k1", "k2"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "x", 1.0), (1L, "y", 9.0), (2L, "z", 3.0)))
  }

  test("duplicate keys in updates are pre-deduped (SQL Server MERGE would error)") {
    val updates = Seq((2L, "u1", 1.0), (2L, "u2", 2.0)).toDF("id", "name", "amount")
    val out = Upsert.upsert(target, updates, Seq("id"))
    assert(out.filter($"id" === 2L).count() == 1)
  }

  test("upsert is idempotent: applying the same batch twice equals once") {
    val updates = Seq((2L, "b2", 99.0), (3L, "c", 30.0)).toDF("id", "name", "amount")
    val once = Upsert.upsert(target, updates, Seq("id"))
    val twice = Upsert.upsert(once, updates, Seq("id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("extra update columns are dropped; missing key errors") {
    val updates = Seq((3L, "c", 30.0, "extra")).toDF("id", "name", "amount", "junk")
    val out = Upsert.upsert(target, updates, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "name", "amount"))
    assertThrows[IllegalArgumentException] {
      Upsert.upsert(target, updates, Seq("nope"))
    }
  }
}
