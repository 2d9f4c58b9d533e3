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
    * sum+count carry no non-null count) — `REFRESH MATERIALIZED VIEW …
    * FULL` is the repair for that corner; callers feeding deletes accept
    * the 0-for-NULL residue documented here (MIN/MAX-bearing views never
    * reach this fold on deletes — [[graft.sql.MatViews.refresh]] routes
    * them to a per-group recompute). */
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

  /** [[applyFeed]] extended with MIN/MAX measures for an INSERT-ONLY
    * feed (caller's contract — deletes cannot shrink an extremum
    * incrementally, so [[graft.sql.MatViews.refresh]] routes
    * delete-bearing feeds to a per-group recompute instead): new rows
    * can only keep or improve an extremum, so the fold is
    * `least(stored, delta_min)` / `greatest(stored, delta_max)` — both
    * skip NULLs, so an all-NULL group's extremum stays NULL and a NULL
    * stored extremum adopts the first non-null delta, matching a full
    * recompute exactly. Sums/count follow [[applyFeed]]'s NULL
    * discipline. */
  def applyFeedInsertOnly(view: DataFrame, feed: DataFrame,
                          keys: Seq[String], sums: Seq[(String, String)],
                          mins: Seq[(String, String)],
                          maxs: Seq[(String, String)],
                          cnt: String): DataFrame = {
    val aggs = count(lit(1)).as(s"_d_$cnt") +:
      (sums.map { case (name, src) => sum(col(src)).as(s"_d_$name") } ++
        mins.map { case (name, src) => min(col(src)).as(s"_d_$name") } ++
        maxs.map { case (name, src) => max(col(src)).as(s"_d_$name") })
    val delta = feed.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val sumCols = (cnt +: sums.map(_._1)).map(n =>
      when(col(n).isNull && col(s"_d_$n").isNull, lit(null))
        .otherwise(coalesce(col(n), lit(0)) +
          coalesce(col(s"_d_$n"), lit(0))).as(n))
    val minCols = mins.map(_._1).map(n => least(col(n), col(s"_d_$n")).as(n))
    val maxCols = maxs.map(_._1).map(n =>
      greatest(col(n), col(s"_d_$n")).as(n))
    view.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ sumCols ++ minCols ++ maxCols: _*)
      .filter(col(cnt) > 0)
  }
}
