package graft.qc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Self-validating sketch aggregates: run the sketch AND its exact
  * counterpart in the same aggregation, emit the exact values plus
  * within-bound BOOLEANS, and `require` the bounds driver-side — so a
  * sketch whose error drifts outside its contract fails the query (and,
  * because the booleans are part of the emitted row, fails the driver's
  * hash compare against an oracle that expects TRUE).
  *
  * The exact twin is the verification harness, not the scale path — at
  * 100 TB you run the sketch alone; this gate is how the harness proves
  * the sketch's error contract on data large enough to be meaningful.
  * Results are localCheckpoint-ed so the gate's driver-side probe and the
  * returned frame share one execution.
  */
object SketchGate {

  /** HLL distinct-count gate: for each column, `approx_count_distinct`
    * must sit within `relErr` of the exact distinct count (HLL's default
    * rsd is 0.05; `relErr` = 0.15 is a 3-sigma-style bound — HLL is
    * deterministic for fixed data, so this either passes always or fails
    * always on a given dataset).
    * Output: exact_<col>... , n, within_<col>... (booleans). */
  def hllGate(df: DataFrame, cols: Seq[String], relErr: Double): DataFrame = {
    require(cols.nonEmpty)
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(approx_count_distinct(col(c)).as(s"approx_$c"),
        countDistinct(col(c)).as(s"exact_$c"))
    } :+ count(lit(1)).as("n")
    val gated = df.agg(aggs.head, aggs.tail: _*)
      .select(cols.map(c => col(s"exact_$c")) ++ Seq(col("n")) ++
        cols.map(c => (abs(col(s"approx_$c") - col(s"exact_$c")) <=
          col(s"exact_$c") * relErr).as(s"within_$c")): _*)
      .localCheckpoint()
    val r = gated.collect()(0)
    cols.zipWithIndex.foreach { case (c, i) =>
      require(r.getBoolean(cols.size + 1 + i),
        s"HLL estimate for $c outside ±$relErr of exact " +
          s"(exact=${r.get(i)}) — sketch error contract violated")
    }
    gated
  }

  /** GK-quantile gate: per group, each `percentile_approx(v, p, accuracy)`
    * value must satisfy the GK RANK guarantee directly —
    * count(v < a) ≤ (p+rankSlack)·n  AND  count(v ≤ a) ≥ (p−rankSlack)·n
    * (ε = 1/accuracy; pass rankSlack ≫ ε, e.g. 50×, so the gate tests the
    * contract, not boundary noise). Verifying by RANK instead of against
    * exact percentile values costs two cheap conditional-sum passes rather
    * than a full per-group value sort — the only gate shape that is itself
    * runnable at the sketch's own scale.
    * Output: <groupCol>, n, within_p<pct>... (booleans). */
  def gkGate(df: DataFrame, groupCol: String, valCol: String,
             percentages: Seq[Double], accuracy: Int,
             rankSlack: Double): DataFrame = {
    require(percentages.nonEmpty)
    val aggs: Seq[Column] = percentages.map { p =>
      percentile_approx(col(valCol), lit(p), lit(accuracy))
        .as(s"a_${pname(p)}")
    }
    val approx = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    rankGate(df, groupCol, valCol, approx, percentages, rankSlack)
  }

  private def pname(p: Double) = s"p${math.round(p * 100)}"

  /** Rank-envelope core of [[gkGate]], split out so the failure path is
    * testable with a deliberately wrong `approx` frame (one row per group
    * with columns a_p<pct>). */
  private[graft] def rankGate(df: DataFrame, groupCol: String, valCol: String,
                              approx: DataFrame, percentages: Seq[Double],
                              rankSlack: Double): DataFrame = {
    val joined = df.select(col(groupCol), col(valCol))
      .join(broadcast(approx), groupCol)
    val rankAggs: Seq[Column] = percentages.flatMap { p =>
      val n = pname(p)
      Seq(
        sum(when(col(valCol) < col(s"a_$n"), 1L).otherwise(0L)).as(s"lt_$n"),
        sum(when(col(valCol) <= col(s"a_$n"), 1L).otherwise(0L)).as(s"le_$n"))
    } ++ Seq(count(lit(1)).as("n"), count(col(valCol)).as("nv"))
    val gated = joined.groupBy(col(groupCol))
      .agg(rankAggs.head, rankAggs.tail: _*)
      .select(Seq(col(groupCol), col("n")) ++ percentages.map { p =>
        val nm = pname(p)
        (col(s"lt_$nm") <= (lit(p) + rankSlack) * col("nv") &&
          col(s"le_$nm") >= (lit(p) - rankSlack) * col("nv"))
          .as(s"within_$nm")
      }: _*)
      .localCheckpoint()
    gated.collect().foreach { r =>
      percentages.zipWithIndex.foreach { case (p, i) =>
        require(r.getBoolean(2 + i),
          s"GK ${pname(p)} estimate for group ${r.get(0)} outside the " +
            s"±$rankSlack rank envelope — sketch error contract violated")
      }
    }
    gated
  }
}
