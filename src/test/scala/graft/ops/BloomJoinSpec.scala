package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoin equals the plain left_semi join (long keys)") {
    val probe = spark.range(0, 5000).toDF("k")
      .withColumn("v", $"k" * 3)
    val build = spark.range(0, 5000).toDF("k")
      .filter($"k" % 17 === 0)
      .withColumn("extra", lit("x"))
    val got = BloomJoin.semiJoin(probe, "k", build, "k", expectedItems = 1000)
    val want = probe.join(build, Seq("k"), "left_semi")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("semiJoin equals the plain left_semi join (string keys)") {
    val probe = spark.range(0, 2000).toDF("i")
      .select(concat(lit("key_"), $"i").as("k"), $"i".as("v"))
    val build = spark.range(0, 2000).toDF("i")
      .filter($"i" % 23 === 0)
      .select(concat(lit("key_"), $"i").as("k"))
    val got = BloomJoin.semiJoin(probe, "k", build, "k", expectedItems = 500)
    val want = probe.join(build, Seq("k"), "left_semi")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("preFilter has no false negatives and trims most non-matches") {
    val probe = spark.range(0, 20000).toDF("k")
    val build = spark.range(0, 20000).toDF("k").filter($"k" % 100 === 0)
    val kept = BloomJoin.preFilter(probe, "k", build, "k",
      expectedItems = 1000, fpp = 0.01).count()
    // every true match survives...
    assert(kept >= 200)
    // ...and the pre-filter really filters: ≤ matches + ~3×fpp slack
    assert(kept <= 200 + (20000 * 0.03).toLong, s"kept=$kept")
  }

  test("pre-filter sits below the probe-side exchange in the non-broadcast plan") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = spark.range(0, 5000).toDF("k").withColumn("v", $"k" + 1)
      val build = spark.range(0, 5000).toDF("k").filter($"k" % 13 === 0)
      val plan = BloomJoin.semiJoin(probe, "k", build, "k", expectedItems = 500)
        .queryExecution.executedPlan.toString
      assert(plan.contains("bloom_might_contain"), plan)
      // probe side: Filter(bloom_might_contain) must appear BELOW the
      // exchange (i.e. after it in the printed tree on the same branch)
      val exIdx = plan.indexOf("Exchange")
      val bloomIdx = plan.indexOf("bloom_might_contain")
      assert(exIdx >= 0 && bloomIdx > exIdx,
        s"expected bloom filter below the first exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
