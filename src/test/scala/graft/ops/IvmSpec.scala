package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def view(rows: (Int, Long, Double)*): DataFrame =
    rows.toDF("k", "cnt", "total")

  private def feed(rows: (Int, Double, String)*): DataFrame =
    rows.toDF("k", "v", "change_type")

  test("inserts and deletes adjust sum and count per group") {
    val out = Ivm.applyFeed(view((1, 2L, 10.0), (2, 1L, 5.0)),
      feed((1, 3.0, "insert"), (1, 4.0, "delete"), (2, 2.0, "insert")),
      Seq("k"), Seq("total" -> "v"), "cnt")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1, 2L, 9.0), (2, 2L, 7.0)))
  }

  test("a group deleted to zero count leaves the view; a new group enters") {
    val out = Ivm.applyFeed(view((1, 1L, 10.0)),
      feed((1, 10.0, "delete"), (9, 3.0, "insert"), (9, 4.0, "insert")),
      Seq("k"), Seq("total" -> "v"), "cnt")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((9, 2L, 7.0)))
  }

  test("NULL sums are preserved: a stored NULL sum with no (or NULL) " +
      "delta stays NULL instead of folding to 0; non-null deltas enter " +
      "through the 0-coalesce") {
    // group 1: stored sum NULL (all base values NULL), untouched by feed
    // group 2: stored sum NULL, receives a non-null insert → becomes 3.0
    // group 3: new group arriving with only NULL values → NULL sum
    val v = Seq((1, 2L, Option.empty[Double]), (2, 1L, Option.empty[Double]))
      .toDF("k", "cnt", "total")
    val f = Seq((2, Option(3.0), "insert"), (3, Option.empty[Double], "insert"))
      .toDF("k", "v", "change_type")
    val out = Ivm.applyFeed(v, f, Seq("k"), Seq("total" -> "v"), "cnt")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(out == Set((1, 2L, None), (2, 2L, Some(3.0)), (3, 1L, None)))
  }

  test("an empty feed is the identity") {
    val out = Ivm.applyFeed(view((1, 2L, 10.0)), feed(),
      Seq("k"), Seq("total" -> "v"), "cnt")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1, 2L, 10.0)))
  }

  test("maintained view converges with a recomputed one across a commit chain") {
    val base = spark.range(2000)
      .select(col("id"), pmod(col("id"), lit(7)).as("k"),
        (col("id") % 100).cast("double").as("v"))
    def agg(df: DataFrame): DataFrame =
      df.groupBy(col("k")).agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
    val adds = spark.range(2000, 2500)
      .select(col("id"), pmod(col("id"), lit(7)).as("k"),
        (col("id") % 100).cast("double").as("v"))
    val dels = base.filter(col("id") < 300)
    val feedDf = adds.withColumn("change_type", lit("insert"))
      .unionByName(dels.withColumn("change_type", lit("delete")))
    val maintained = Ivm.applyFeed(agg(base), feedDf, Seq("k"),
      Seq("total" -> "v"), "cnt")
    val recomputed = agg(base.filter(col("id") >= 300).unionByName(adds))
    val drift = maintained.as("i").join(recomputed.as("r"), Seq("k"), "full_outer")
      .filter(col("i.cnt").isNull || col("r.cnt").isNull ||
        col("i.cnt") =!= col("r.cnt") ||
        abs(col("i.total") - col("r.total")) > 1e-6)
      .count()
    assert(drift == 0)
  }
}
