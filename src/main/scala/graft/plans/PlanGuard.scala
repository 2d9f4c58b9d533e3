package graft.plans

import org.apache.spark.sql.DataFrame

/** In-query physical-plan guards: assert the plan property that makes a
  * query viable at 100 TB (broadcast of a small dim, top-k as
  * TakeOrderedAndProject, partition pruning) AT QUERY CONSTRUCTION, so a
  * plan regression fails the driver's CORRECTNESS gate — not just an
  * offline explain audit. Guards only inspect `executedPlan` (planning,
  * no execution) and return the frame unchanged.
  *
  * STATIC-CHECK LIMITATION: the guard inspects the QueryExecution created
  * for THIS frame at construction time. A later action (`.write`, a new
  * transformation chain) plans its own QueryExecution, and AQE may re-plan
  * at runtime (e.g. demote a broadcast whose build side turns out larger
  * than the threshold) — neither is seen here. The guards are therefore
  * necessary-but-not-sufficient evidence of the 100 TB plan property: they
  * catch plan-shape regressions introduced by code changes (the common
  * failure), not runtime adaptive demotions. Where a property is
  * load-bearing at runtime, also assert on
  * `df.queryExecution.executedPlan` AFTER an action (the adaptive final
  * plan) in a spec.
  */
object PlanGuard {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The physical plan must contain `needle`. */
  def requireInPlan(df: DataFrame, needle: String, why: String): DataFrame = {
    val p = planOf(df)
    require(p.contains(needle), s"$why — expected '$needle' in plan:\n$p")
    df
  }

  /** The physical plan must NOT contain `needle`. */
  def requireNotInPlan(df: DataFrame, needle: String, why: String): DataFrame = {
    val p = planOf(df)
    require(!p.contains(needle), s"$why — found forbidden '$needle' in plan:\n$p")
    df
  }

  /** The physical plan must match `regex` (for patterns with expression
    * ids, e.g. partition filters). */
  def requirePlanMatches(df: DataFrame, regex: scala.util.matching.Regex,
                         why: String): DataFrame = {
    val p = planOf(df)
    require(regex.findFirstIn(p).isDefined,
      s"$why — expected pattern '$regex' in plan:\n$p")
    df
  }

  // --- Adaptive FINAL-plan guards -----------------------------------------
  //
  // The static guards above are blind to AQE runtime re-planning: under
  // adaptive execution the pre-execution plan is an AdaptiveSparkPlan
  // (isFinalPlan=false) whose join strategies can still change once real
  // shuffle statistics arrive. These variants EXECUTE the frame's physical
  // plan to completion (a distributed no-op pass — rows never reach the
  // driver), which finalizes AQE on THIS QueryExecution, then assert on the
  // final plan string. Cost = one full execution of the frame, so apply
  // them where the plan property is load-bearing and the inputs are cheap
  // to re-read (e.g. a localCheckpoint()ed leg), not on every guard site.

  private def finalPlanOf(df: DataFrame): String = {
    val qe = df.queryExecution
    // RDD action on the plan's own RDD: forces execution (and thereby the
    // AQE final plan) without collecting anything to the driver
    qe.executedPlan.execute().foreach(_ => ())
    qe.executedPlan.toString
  }

  /** Execute, then require `needle` in the ADAPTIVE FINAL plan. */
  def requireInFinalPlan(df: DataFrame, needle: String,
                         why: String): DataFrame = {
    val p = finalPlanOf(df)
    require(p.contains(needle),
      s"$why — expected '$needle' in FINAL adaptive plan:\n$p")
    df
  }

  /** Execute, then require `needle` ABSENT from the ADAPTIVE FINAL plan —
    * catches an AQE runtime demotion (e.g. a stat-estimated broadcast
    * falling back to sort-merge) that the static guard admits. */
  def requireNotInFinalPlan(df: DataFrame, needle: String,
                            why: String): DataFrame = {
    val p = finalPlanOf(df)
    require(!p.contains(needle),
      s"$why — found forbidden '$needle' in FINAL adaptive plan:\n$p")
    df
  }
}
