package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Error bounds for the sketch aggregates whose driver check is rows-only
  * (engine-specific sketches have no DuckDB oracle): HLL distinct counts and
  * GK approximate percentiles must stay within their published error vs the
  * exact computation — so the rows-only check can't hide a broken sketch. */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def li = spark.read.parquet(s"$dir/lineitem.parquet")

  test("q36 HLL distinct counts are within 5% of exact") {
    val r = li.agg(
      approx_count_distinct(col("l_orderkey")).as("a_ord"),
      countDistinct(col("l_orderkey")).as("e_ord"),
      approx_count_distinct(col("l_partkey")).as("a_part"),
      countDistinct(col("l_partkey")).as("e_part")).head
    def relErr(a: Long, e: Long) = math.abs(a - e).toDouble / e
    assert(relErr(r.getLong(0), r.getLong(1)) < 0.05,
      s"orderkey: ${r.getLong(0)} vs ${r.getLong(1)}")
    assert(relErr(r.getLong(2), r.getLong(3)) < 0.05,
      s"partkey: ${r.getLong(2)} vs ${r.getLong(3)}")
  }

  test("q57 approximate percentiles are within GK accuracy of exact") {
    val approx = li.groupBy(col("l_returnflag")).agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
      count(lit(1)).as("n"))
    val exact = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.5)").as("e50"),
      expr("percentile(l_extendedprice, 0.95)").as("e95"),
      min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val span = r.getAs[Double]("hi") - r.getAs[Double]("lo")
      // GK with accuracy=10000 guarantees rank error <= n/10000; translate
      // to a generous 2%-of-range value bound for this distribution.
      assert(math.abs(r.getAs[Double]("p50") - r.getAs[Double]("e50")) <= 0.02 * span,
        s"p50 off for ${r.get(0)}")
      assert(math.abs(r.getAs[Double]("p95") - r.getAs[Double]("e95")) <= 0.02 * span,
        s"p95 off for ${r.get(0)}")
    }
  }
}
