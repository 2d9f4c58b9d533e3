package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for ALGEBRAIC grouped aggregates over a
  * change data feed ([[graft.sinks.Snapshots.changesBetween]]): a
  * materialized view `SELECT keys, sum(x)…, count(*) GROUP BY keys` is
  * updated by aggregating the FEED (inserts contribute +, deletes −) and
  * merging the per-group deltas into the stored view. Maintenance cost
  * tracks the commit's touch set — the feed is bounded by the files the
  * commit changed, the delta aggregation is one feed-sized shuffle, and
  * the merge is one equi-join on the view's own grain — the table itself
  * is never re-read. SUM and COUNT are self-inverting under deletion,
  * which is exactly what makes them maintainable this way; MIN/MAX cannot
  * shrink incrementally and would need per-group recompute — deliberately
  * out of scope (the reference's gold aggregates are sum/count rollups,
  * `run_transform.py:105-118`).
  */
object Ivm {

  /** Merge one change feed into `view`. `sums` maps view column → feed
    * source column; `cnt` is the view's count(*) column. New groups enter
    * through the full-outer merge; groups whose maintained count reaches
    * zero leave the view (their residual sum is definitionally zero too —
    * dropping the row, not testing the float, is what keeps accumulated
    * ulp drift from leaking tombstone groups).
    *
    * NULL discipline: `sum(col)` over a group whose values are ALL NULL
    * is NULL, not 0 — a stored NULL sum with no delta (or a NULL delta)
    * must stay NULL, and a NULL-sum group first receiving non-null rows
    * becomes exactly the delta. Both-sides-NULL therefore folds to NULL;
    * any non-null side folds through the 0-coalesce. The one case the
    * fold CANNOT express is a DELETE that removes the last non-null value
    * from a group that keeps NULL rows (sum must return to NULL, but
    * sum+count carry no non-null count) — [[graft.sql.MatViews.refresh]]
    * routes delete-bearing feeds to a per-group recompute for exactly
    * this reason (plus MIN/MAX); direct callers feeding deletes accept
    * the 0-for-NULL residue documented here. */
  def applyFeed(view: DataFrame, feed: DataFrame, keys: Seq[String],
                sums: Seq[(String, String)], cnt: String): DataFrame = {
    val sgn = when(col("change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val aggs = sum(sgn).as(s"_d_$cnt") +:
      sums.map { case (name, src) => sum(sgn * col(src)).as(s"_d_$name") }
    val delta = feed.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val names = cnt +: sums.map(_._1)
    view.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ names.map(n =>
        when(col(n).isNull && col(s"_d_$n").isNull, lit(null))
          .otherwise(coalesce(col(n), lit(0)) +
            coalesce(col(s"_d_$n"), lit(0))).as(n)): _*)
      .filter(col(cnt) > 0)
  }
}
