package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a@x", "2024-01-01", null.asInstanceOf[String], true),
    (2L, "b@x", "2024-01-01", null.asInstanceOf[String], true),
    (3L, "old@x", "2023-01-01", "2024-01-01", false), // closed history row
    (3L, "new@x", "2024-01-01", null.asInstanceOf[String], true)
  ).toDF("id", "email", "valid_from", "valid_to", "is_current")

  test("changed row closes current version and opens a new one") {
    val updates = Seq((1L, "changed@x")).toDF("id", "email")
    val out = Upsert.scd2(target, updates, Seq("id"), "2024-06-01")
    val v1 = out.filter(col("id") === 1L).orderBy("valid_from").collect()
    assert(v1.length == 2)
    assert(v1(0).getAs[String]("valid_to") == "2024-06-01")
    assert(!v1(0).getAs[Boolean]("is_current"))
    assert(v1(1).getAs[String]("email") == "changed@x")
    assert(v1(1).getAs[Boolean]("is_current"))
    assert(v1(1).getAs[String]("valid_from") == "2024-06-01")
  }

  test("unchanged rows and untouched keys are preserved exactly; new keys open") {
    val updates = Seq((2L, "b@x"), (9L, "nine@x")).toDF("id", "email")
    val out = Upsert.scd2(target, updates, Seq("id"), "2024-06-01")
    // id=2 identical values -> single still-current row, original valid_from
    val v2 = out.filter(col("id") === 2L).collect()
    assert(v2.length == 1 && v2.head.getAs[Boolean]("is_current"))
    assert(v2.head.getAs[String]("valid_from") == "2024-01-01")
    // id=3 untouched: both history and current preserved
    assert(out.filter(col("id") === 3L).count() == 2)
    // id=9 new key opens at batch date
    val v9 = out.filter(col("id") === 9L).collect()
    assert(v9.length == 1 && v9.head.getAs[String]("valid_from") == "2024-06-01")
  }

  test("scd2 is idempotent for a repeated batch") {
    val updates = Seq((1L, "changed@x")).toDF("id", "email")
    val once = Upsert.scd2(target, updates, Seq("id"), "2024-06-01")
    val twice = Upsert.scd2(once, updates, Seq("id"), "2024-06-01")
    assert(twice.orderBy("id", "valid_from").collect().toSeq ==
      once.orderBy("id", "valid_from").collect().toSeq)
  }

  test("exactly one current row per key") {
    val updates = Seq((1L, "x@x"), (2L, "y@x"), (9L, "z@x")).toDF("id", "email")
    val out = Upsert.scd2(target, updates, Seq("id"), "2024-06-01")
    val dupCurrent = out.filter(col("is_current"))
      .groupBy("id").count().filter(col("count") > 1)
    assert(dupCurrent.isEmpty)
  }

  test("DATE-typed valid_from/valid_to dimension works (no string coercion)") {
    val tgt = target.select(col("id"), col("email"),
      col("valid_from").cast("date").as("valid_from"),
      col("valid_to").cast("date").as("valid_to"), col("is_current"))
    val updates = Seq((1L, "changed@x"), (9L, "nine@x")).toDF("id", "email")
    val out = Upsert.scd2(tgt, updates, Seq("id"), "2024-06-01")
    import org.apache.spark.sql.types.DateType
    assert(out.schema("valid_from").dataType == DateType)
    assert(out.schema("valid_to").dataType == DateType)
    val closed = out.filter(col("id") === 1L && !col("is_current")).collect().head
    assert(closed.getAs[java.sql.Date]("valid_to").toString == "2024-06-01")
    val opened = out.filter(col("id") === 9L).collect().head
    assert(opened.getAs[java.sql.Date]("valid_from").toString == "2024-06-01")
  }

  test("null-key current rows pass through kept instead of vanishing") {
    val tgt = Seq(
      (Option(1L), "a@x", "2024-01-01", Option.empty[String], true),
      (Option.empty[Long], "nokey@x", "2024-01-01", Option.empty[String], true)
    ).toDF("id", "email", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, "changed@x")).toDF("id", "email")
    val out = Upsert.scd2(tgt, updates, Seq("id"), "2024-06-01")
    val nullKey = out.filter(col("id").isNull).collect()
    assert(nullKey.length == 1 && nullKey.head.getAs[String]("email") == "nokey@x")
    assert(nullKey.head.getAs[Boolean]("is_current"))
  }
}
