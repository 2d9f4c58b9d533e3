package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHashAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private val agg = MinHashAggregator(n = 3, k = 64)

  test("typed groupByKey aggregation produces one signature per group") {
    val ds = Seq(
      ("src1", "the quick brown fox"),
      ("src1", "jumps over the lazy dog"),
      ("src2", "totally unrelated words here")
    ).toDS()
    val sigs = ds.groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .collect().toMap
    assert(sigs("src1").length == 64)
    assert(sigs("src1").forall(_ != Long.MaxValue))
    assert(!sigs("src1").sameElements(sigs("src2")))
  }

  test("merge is order-insensitive (associative+commutative partial agg)") {
    val a = agg.reduce(agg.zero, "hello world text")
    val b = agg.reduce(agg.zero, "another document body")
    val m1 = agg.merge(a.clone(), b.clone()).toSeq
    val m2 = agg.merge(b.clone(), a.clone()).toSeq
    assert(m1 == m2)
  }

  test("estimated jaccard: identical text ~1, disjoint text ~0") {
    val a = agg.reduce(agg.zero, "spark native analytics engine")
    val b = agg.reduce(agg.zero, "spark native analytics engine")
    val c = agg.reduce(agg.zero, "zzz qqq xxx vvv 12345")
    assert(MinHashAggregator.estimateJaccard(a, b) == 1.0)
    assert(MinHashAggregator.estimateJaccard(a, c) < 0.3)
  }
}
