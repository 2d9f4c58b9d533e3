package graft.qc

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Data-quality checks, mirroring the reference's QC semantics
  * (reference `checks.py:9-35`): a check yields a result, never throws —
  * a missing column is a *failed check*, not an error
  * (reference `checks.py:23-24`); the null-rate bound is inclusive (`<=`,
  * reference `checks.py:26`), as is the row-count bound (`>=`,
  * reference `checks.py:18`).
  *
  * Unlike the reference's one-pass-per-check loop (`checks.py:31-35`), all
  * checks against one DataFrame are fused into a single `agg` — one job, one
  * scan, regardless of how many checks run. At 100 TB that is the difference
  * between N table scans and one.
  */
final case class QCResult(name: String, passed: Boolean, details: String)

sealed trait Check {
  def name: String
  /** Aggregate expressions this check needs (empty if decided from schema alone). */
  def aggs(df: DataFrame): Seq[Column]
  /** Evaluate from the fused aggregate row; `offset` is where this check's
    * aggs start in the row. */
  def eval(df: DataFrame, row: Row, offset: Int): QCResult
}

/** Row-count gate (reference `checks.py:16-19`). */
final case class MinRows(min: Long, name: String = "min_rows") extends Check {
  def aggs(df: DataFrame): Seq[Column] = Seq(count(lit(1)))
  def eval(df: DataFrame, row: Row, offset: Int): QCResult = {
    val n = row.getLong(offset)
    QCResult(name, n >= min, s"rows=$n min=$min")
  }
}

/** Null-rate gate on one column (reference `checks.py:22-28`). */
final case class MaxNullRate(column: String, maxRate: Double,
    namePrefix: String = "max_null_rate") extends Check {
  def name: String = s"${namePrefix}_$column"
  def aggs(df: DataFrame): Seq[Column] =
    if (df.columns.contains(column))
      Seq(avg(col(column).isNull.cast("double")))
    else Seq.empty
  def eval(df: DataFrame, row: Row, offset: Int): QCResult =
    if (!df.columns.contains(column))
      QCResult(name, passed = false, s"column $column missing")
    else {
      // avg over zero rows is null: an empty table has no null-rate violation.
      val rate = if (row.isNullAt(offset)) 0.0 else row.getDouble(offset)
      QCResult(name, rate <= maxRate, f"null_rate=$rate%.6f max=$maxRate")
    }
}

/** Key-uniqueness gate (north-star extension): duplicate rate over the key
  * columns must not exceed `maxDupRate` (0.0 = strictly unique). Fused into
  * the single-pass agg like the reference-mirrored checks: duplicates are
  * counted as count(*) − count(distinct keys).
  *
  * Null-key semantics follow SQL `COUNT(DISTINCT key)`: a row with ANY null
  * key column contributes to the row count but never to the distinct count —
  * null keys are treated as duplicates (a null key can't witness
  * uniqueness). Without the null-gate, `countDistinct(struct(keys))` would
  * count null keys (the struct wrapper is non-null), silently diverging
  * from the SQL semantics. */
final case class MaxDupRate(keys: Seq[String], maxDupRate: Double = 0.0,
    namePrefix: String = "max_dup_rate") extends Check {
  def name: String = s"${namePrefix}_${keys.mkString("_")}"
  private def present(df: DataFrame): Boolean = keys.forall(df.columns.contains)
  def aggs(df: DataFrame): Seq[Column] =
    if (present(df))
      Seq(count(lit(1)), countDistinct(Checks.nonNullKey(keys)))
    else Seq.empty
  def eval(df: DataFrame, row: Row, offset: Int): QCResult =
    if (!present(df))
      QCResult(name, passed = false,
        s"column(s) ${keys.filterNot(df.columns.contains).mkString(",")} missing")
    else {
      val n = row.getLong(offset)
      val distinct = row.getLong(offset + 1)
      val rate = if (n == 0) 0.0 else (n - distinct).toDouble / n
      QCResult(name, rate <= maxDupRate, f"dup_rate=$rate%.6f max=$maxDupRate")
    }
}

object Checks {

  /** The key struct, nulled out when ANY key column is null, so
    * `countDistinct` over it matches SQL `COUNT(DISTINCT key)` (nulls
    * excluded from the distinct count). */
  private[qc] def nonNullKey(keys: Seq[String]): Column =
    when(keys.map(col(_).isNotNull).reduce(_ && _),
      struct(keys.map(col): _*))

  /** Run all checks in ONE aggregation pass (vs reference `checks.py:31-35`,
    * one pass per check). */
  def runAll(df: DataFrame, checks: Seq[Check]): Seq[QCResult] = {
    val offsets = checks.scanLeft(0)((acc, c) => acc + c.aggs(df).size)
    val allAggs = checks.flatMap(_.aggs(df))
    val row: Row =
      if (allAggs.isEmpty) Row.empty
      else df.agg(allAggs.head, allAggs.tail: _*).head()
    checks.zip(offsets).map { case (c, off) => c.eval(df, row, off) }
  }

  /** Referential-integrity gate: every non-null `childKey` must exist in
    * `parent(parentKey)`. Needs two tables, so it can't join the fused agg —
    * it is one anti-join + limit-bounded count (stops scanning after
    * `sampleLimit` orphans; pass 0 for an exact count). */
  def referentialIntegrity(child: DataFrame, childKey: String,
                           parent: DataFrame, parentKey: String,
                           sampleLimit: Int = 100): QCResult = {
    val name = s"ref_integrity_${childKey}_to_$parentKey"
    if (!child.columns.contains(childKey))
      QCResult(name, passed = false, s"column $childKey missing")
    else if (!parent.columns.contains(parentKey))
      QCResult(name, passed = false, s"column $parentKey missing")
    else {
      val orphans = child.filter(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)).distinct(),
          Seq(childKey), "left_anti")
      val n =
        if (sampleLimit > 0) orphans.limit(sampleLimit).count()
        else orphans.count()
      val bound = if (sampleLimit > 0 && n >= sampleLimit) s">=$n" else s"$n"
      QCResult(name, n == 0, s"orphans=$bound")
    }
  }

  /** Alert line formatting (reference `alerts.py:17-22`) — driver-side. */
  def formatAlert(table: String, results: Seq[QCResult]): String = {
    val failed = results.filterNot(_.passed)
    if (failed.isEmpty) s"[qc] $table: all ${results.size} checks passed"
    else s"[qc] $table: ${failed.size}/${results.size} FAILED — " +
      failed.map(r => s"${r.name} (${r.details})").mkString("; ")
  }

  /** Alert delivery seam (reference `alerts.py:12-22`): formats and hands
    * the line to an injectable transport — the webhook POST in the
    * reference, a log/queue/collector here. Delivery only fires when at
    * least one check failed (the reference posts only on failure,
    * `run_transform.py`-side guard); returns whether it fired. */
  def postAlert(table: String, results: Seq[QCResult])
               (send: String => Unit): Boolean = {
    val anyFailed = results.exists(!_.passed)
    if (anyFailed) send(formatAlert(table, results))
    anyFailed
  }

  /** The fused QC pass as a QUERYABLE one-row DataFrame (the driver-query
    * form of [[runAll]]'s single-scan fusion): row count, null rate of one
    * column, duplicate rate over a key, plus the pass/fail verdicts — all
    * from ONE aggregation (one scan, one job at any scale). Rates guard the
    * empty-table case (0.0, matching [[MaxNullRate]]'s null-avg rule).
    * Null keys follow [[MaxDupRate]]'s SQL `COUNT(DISTINCT)` rule: they
    * count as rows, never as distinct keys. */
  def summaryFrame(df: DataFrame, minRows: Long,
                   nullCol: String, maxNullRate: Double,
                   dupKeys: Seq[String], maxDupRate: Double): DataFrame = {
    val dupRate = when(col("n_rows") === 0, 0.0)
      .otherwise((col("n_rows") - col("nd")).cast("double") / col("n_rows"))
    val nullRate = coalesce(col("nr"), lit(0.0))
    df.agg(
        count(lit(1)).as("n_rows"),
        avg(col(nullCol).isNull.cast("double")).as("nr"),
        countDistinct(nonNullKey(dupKeys)).as("nd"))
      .select(
        col("n_rows"),
        round(nullRate, 6).as("null_rate"),
        round(dupRate, 6).as("dup_rate"),
        (col("n_rows") >= minRows).as("min_rows_ok"),
        (nullRate <= maxNullRate).as("null_rate_ok"),
        (dupRate <= maxDupRate).as("dup_rate_ok"))
  }

  /** One-pass table profile (the "describe before you train" step): row
    * count, per-column null rate + exact distinct count, numeric
    * min/max/avg — ALL from a single aggregation (the multi-distinct plans
    * as one scan with an Expand, never one scan per column the way a naive
    * loop of `df.select(countDistinct(c))` would at 100 TB). Output is one
    * wide typed row, so no lossy value-to-string casts. */
  def profile(df: DataFrame, cols: Seq[String],
              numeric: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      cols.flatMap(c => Seq(
        round(coalesce(avg(col(c).isNull.cast("double")), lit(0.0)), 6)
          .as(s"${c}_null_rate"),
        countDistinct(col(c)).as(s"${c}_nd"))) ++
      numeric.flatMap(c => Seq(
        round(min(col(c)), 6).as(s"${c}_min"),
        round(max(col(c)), 6).as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_avg")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
