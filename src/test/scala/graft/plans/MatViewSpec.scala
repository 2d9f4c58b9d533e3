package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The materialized-view rewrite must fire ONLY when the algebra is exact:
  * coarser grouping over registered partials. Everything else leaves the
  * plan untouched — a rewrite that widens semantics is a wrong-answer
  * machine. */
class MatViewSpec extends SparkSpec {

  private def fixture(): (String, MatView.SummaryDef, DataFrame) = {
    val dir = tmpDir("mv")
    spark.range(10000)
      .select(col("id"),
        pmod(col("id"), lit(7)).as("g1"), pmod(col("id"), lit(3)).as("g2"),
        (col("id") % 100).cast("double").as("v"))
      .write.mode("overwrite").parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    base.groupBy(col("g1"), col("g2"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$dir/summary")
    val d = MatView.SummaryDef(s"$dir/base",
      spark.read.parquet(s"$dir/summary"),
      dims = Seq("g1", "g2"), sums = Map("v" -> "sum_v"), cnt = "cnt")
    (dir, d, base)
  }

  private def scans(df: DataFrame, path: String): Boolean =
    df.queryExecution.executedPlan.toString.contains(path)

  test("coarser aggregation rewrites onto the summary, results exact") {
    val (dir, d, base) = fixture()
    val expected = base.groupBy(col("g1"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    MatView.withRewrite(spark, d) {
      val q = base.groupBy(col("g1"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      assert(scans(q, s"$dir/summary") && !scans(q, s"$dir/base"))
      assert(q.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet == expected)
      // compute wrapped AROUND the aggregates still rewrites
      // (CollapseProject folds it into the aggregate list)
      val q2 = base.groupBy(col("g1"), col("g2"))
        .agg(sum(col("v")).as("s")).select(col("g1"), round(col("s"), 2))
      assert(scans(q2, s"$dir/summary"))
    }
  }

  test("a row-level filter blocks the rewrite (semantics never widen)") {
    val (dir, d, base) = fixture()
    MatView.withRewrite(spark, d) {
      val q = base.filter(col("v") > 50)
        .groupBy(col("g1")).agg(count(lit(1)).as("n"))
      assert(scans(q, s"$dir/base") && !scans(q, s"$dir/summary"))
    }
  }

  test("non-decomposable aggregates and unregistered columns block it") {
    val (dir, d, base) = fixture()
    MatView.withRewrite(spark, d) {
      // avg is not registered as a partial
      val q1 = base.groupBy(col("g1")).agg(avg(col("v")).as("a"))
      assert(scans(q1, s"$dir/base"))
      // count(col) is not count(*): null semantics differ
      val q2 = base.groupBy(col("g1")).agg(count(col("v")).as("n"))
      assert(scans(q2, s"$dir/base"))
      // grouping by a non-dimension
      val q3 = base.groupBy(col("id")).agg(sum(col("v")).as("s"))
      assert(scans(q3, s"$dir/base"))
    }
  }

  test("unregistering restores the base plan") {
    val (dir, d, base) = fixture()
    MatView.withRewrite(spark, d) { () }
    val q = base.groupBy(col("g1")).agg(sum(col("v")).as("s"))
    assert(scans(q, s"$dir/base"))
    assert(spark.experimental.extraOptimizations.isEmpty)
  }
}
