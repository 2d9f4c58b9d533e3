package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces the same rows as a plain join") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"))
      .toDF("k", "payload")
    val right = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "w")
    val plain = left.join(right, Seq("k")).orderBy("k", "payload")
      .collect().toSeq
    val salted = Skew.saltedJoin(left, right, Seq("k"), factor = 4)
      .orderBy("k", "payload").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin left-outer keeps unmatched left rows") {
    val left = Seq((1L, "a"), (9L, "z")).toDF("k", "payload")
    val right = Seq((1L, 10.0)).toDF("k", "w")
    val out = Skew.saltedJoin(left, right, Seq("k"), 4, "left")
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(2))
  }

  test("saltedJoin rejects right-preserving join types") {
    val left = Seq((1L, "a")).toDF("k", "payload")
    val right = Seq((1L, 10.0)).toDF("k", "w")
    Seq("right", "full_outer", "full").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(left, right, Seq("k"), 4, jt)
      }
      assert(e.getMessage.contains("left-preserving"))
    }
    // left-family types still accepted
    assert(Skew.saltedJoin(left, right, Seq("k"), 4, "left_semi").count() == 1)
    assert(Skew.saltedJoin(left, right, Seq("k"), 4, "left_anti").count() == 0)
  }

  test("saltedAgg equals single-phase aggregation") {
    val df = (1 to 1000).map(i => (i % 3L, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val salted = Skew.saltedAgg(df, Seq("k"), 16,
      partial = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
      fin = Seq(sum(col("s")).as("total"), sum(col("c")).as("n")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin joins on (key, salt) — the hot-key split is in the plan") {
    val left = (1 to 200).map(i => (1L, s"p$i")).toDF("k", "payload")
    val right = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "w")
    val p = Skew.saltedJoin(left, right, Seq("k"), 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"),
      s"expected __salt among the join keys, got:\n$p")
  }

  test("joinSkewAware picks AQE (plain join, no salt) when skew-split is on") {
    val left = (1 to 200).map(i => (1L, s"p$i")).toDF("k", "payload")
    val right = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "w")
    // test session defaults: adaptive on, skewJoin on → plain join path
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val p = Skew.joinSkewAware(left, right, Seq("k"), factor = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("__salt"),
      s"expected the PLAIN join (AQE handles the skew at runtime), got:\n$p")
  }

  test("joinSkewAware falls back to the static salt when AQE skew-split is off") {
    val left = (1 to 200).map(i => (1L, s"p$i")).toDF("k", "payload")
    val right = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "w")
    val key = "spark.sql.adaptive.skewJoin.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val df = Skew.joinSkewAware(left, right, Seq("k"), factor = 4)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("__salt"),
        s"expected the salted fallback with skew-split disabled, got:\n$p")
      // either path must be answer-preserving
      assert(df.count() == left.join(right, Seq("k")).count())
    } finally spark.conf.set(key, prev)
  }

  test("salt is deterministic and within [0, factor)") {
    val df = Seq(("x", 1), ("y", 2)).toDF("a", "b")
    val s1 = df.select(Skew.salt(8, col("a"), col("b"))).collect().map(_.getInt(0))
    val s2 = df.select(Skew.salt(8, col("a"), col("b"))).collect().map(_.getInt(0))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
  }
}
