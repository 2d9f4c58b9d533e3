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

  // --- SketchGate: the q36/q57 self-gating path ---------------------------

  test("hllGate passes within its bound and emits all-true booleans") {
    val out = graft.qc.SketchGate.hllGate(li,
      Seq("l_orderkey", "l_partkey"), relErr = 0.15).head
    assert(out.getBoolean(3) && out.getBoolean(4))
  }

  test("hllGate's require is LOAD-BEARING: an impossible bound throws") {
    // relErr = 0 demands approx == exact; HLL on tens of thousands of
    // distinct keys essentially never lands exactly — the gate must FAIL,
    // not quietly emit false booleans.
    val e = intercept[IllegalArgumentException] {
      graft.qc.SketchGate.hllGate(li, Seq("l_orderkey"), relErr = 0.0)
    }
    assert(e.getMessage.contains("sketch error contract violated"))
  }

  test("gkGate passes within the rank envelope and emits all-true booleans") {
    val rows = graft.qc.SketchGate.gkGate(li, "l_returnflag",
      "l_extendedprice", Seq(0.5, 0.95), accuracy = 10000,
      rankSlack = 0.005).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2) && r.getBoolean(3)))
  }

  test("gkGate's require is LOAD-BEARING: a broken sketch value throws") {
    // feed the rank-envelope core a deliberately wrong "approx" median
    // (9999 on uniform 1..10000 — true rank 0.9999, claimed 0.5): the
    // booleans must go false and the require must FIRE.
    import spark.implicits._
    val uniform = (1 to 10000).map(_.toDouble).toDF("v")
      .withColumn("g", lit("x"))
    val broken = Seq(("x", 9999.0)).toDF("g", "a_p50")
    val e = intercept[IllegalArgumentException] {
      graft.qc.SketchGate.rankGate(uniform, "g", "v", broken, Seq(0.5),
        rankSlack = 0.005)
    }
    assert(e.getMessage.contains("sketch error contract violated"))
  }
}
