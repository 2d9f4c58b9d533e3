package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PlanGuardSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> scala.util.Try(Option(spark.conf.get(k))).toOption.flatten
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("static guards pass/fail on the pre-execution plan") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
      .orderBy(col("k")).limit(1)
    PlanGuard.requireInPlan(df, "TakeOrderedAndProject", "top-k shape")
    val ex = intercept[IllegalArgumentException] {
      PlanGuard.requireInPlan(df, "SortMergeJoin", "not there")
    }
    assert(ex.getMessage.contains("SortMergeJoin"))
  }

  test("an AQE runtime re-plan is invisible to the static guard but trips the final-plan guard") {
    // Force the divergence the final-plan guard exists for: the STATIC
    // planner sees autoBroadcastJoinThreshold=-1 and plans a SortMergeJoin;
    // at runtime AQE's own (adaptive) threshold converts it to a
    // BroadcastHashJoin once real shuffle sizes arrive. The join strategy
    // the query actually RAN with differs from the one the static guard
    // inspected — exactly the blind spot VERDICT r9 flagged for q104.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val left = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 7).as("x"))
      val right = spark.range(0, 50).select(col("id").as("k"),
        (col("id") % 3).as("y"))
      val joined = left.join(right, "k")
      // static plan: SMJ planned, no broadcast anywhere
      PlanGuard.requireNotInPlan(joined, "BroadcastHashJoin",
        "static plan must not broadcast under threshold -1")
      // final plan: AQE re-planned the SMJ to a broadcast join at runtime —
      // the guard that executes first sees it and fires
      val ex = intercept[IllegalArgumentException] {
        PlanGuard.requireNotInFinalPlan(joined, "BroadcastHashJoin",
          "deliberately forbidding what AQE will introduce")
      }
      assert(ex.getMessage.contains("FINAL adaptive plan"))
      // and the positive form proves the final plan is the broadcast one
      PlanGuard.requireInFinalPlan(left.join(right, "k"),
        "BroadcastHashJoin", "AQE must have promoted the join")
    }
  }

  test("q3's broadcast and q88's zero-exchange survive in the adaptive FINAL plan") {
    // The in-query guards for q3/q88 are static (their joins are pinned by
    // explicit broadcast() hints / bucketed layouts, which AQE respects);
    // this spec closes the loop by asserting the same property on the
    // adaptive final plan after a real execution.
    val dim = Seq((0, "red"), (1, "blue")).toDF("k", "color")
    val fact = spark.range(0, 2000).select(col("id"),
      (col("id") % 2).cast("int").as("k"))
    PlanGuard.requireInFinalPlan(
      fact.join(broadcast(dim), "k").groupBy(col("color")).count(),
      "BroadcastHashJoin", "hinted broadcast must hold at runtime")
    PlanGuard.requireNotInFinalPlan(
      fact.join(broadcast(dim), "k").groupBy(col("color")).count(),
      "SortMergeJoin", "hinted broadcast must not demote to SMJ")
  }
}
