package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. a non-shuffle-join stage, or an
  * aggregation with one dominant group).
  *
  * Salting trades one shuffle's skew for `factor`× replication of the small
  * side: the probe side gets a deterministic salt in [0, factor), the build
  * side is exploded across every salt value, and the join key becomes
  * (key, salt) — splitting each hot key's row group across `factor`
  * partitions. Aggregations do the same with a two-phase partial/final plan.
  *
  * Measured guidance (SCALE.md skew smoke — 100× dataset, 70% of 60M rows
  * on one key): against a skew-split-less sort-merge join the factor-8
  * salt HALVES the wall; AQE's runtime split beats the static salt where
  * it applies (no build-side replication), so prefer AQE on adaptive
  * shuffle-join plans and salt everywhere else. Do NOT salt ALGEBRAIC
  * aggregations (sum/count/avg): map-side partial aggregation already
  * collapses hot groups before the shuffle, so the salted two-phase plan
  * is pure overhead there — reach for [[saltedAgg]] only when per-group
  * state is holistic (exact distincts, collect-style).
  */
object Skew {

  /** Deterministic row salt: hash of the given columns mod factor. Using a
    * hash of payload columns (not rand()) keeps the plan re-executable —
    * important for retries and for deterministic tests. */
  def salt(factor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(factor.toLong)).cast("int")

  /** Equi-join `left` (large, possibly skewed) with `right` (small) on
    * `keys`, spreading each hot key over `factor` shuffle partitions.
    * `saltBy` columns pick the salt for a left row (default: all left
    * columns). The right side is replicated `factor`× — keep it broadcast-
    * small or keep `factor` modest. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    // Right-preserving joins are NOT salt-safe: the right side is exploded
    // factor×, so every unmatched right row would surface factor times.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")) ||
      allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left-preserving join types only, got $joinType " +
        "(right/full outer would duplicate unmatched right rows factor times)")
    val l = left.withColumn("__salt",
      salt(factor, left.columns.map(col).toIndexedSeq: _*))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Skew-aware join dispatcher encoding the MEASURED preference order from
    * the SCALE.md skew smoke (100× dataset, 70% of 60M rows on one key):
    *
    *   AQE skew-split (6.2 s)  >  static factor-8 salt (13.0 s)  >
    *   nothing (26.3 s)
    *
    * AQE's runtime split wins where it applies — it splits only the hot
    * partitions it OBSERVES, with no build-side replication — so when the
    * session can skew-split this join (adaptive execution on + skewJoin on
    * + a salt-safe join type, which AQE's OptimizeSkewedJoin also handles),
    * the dispatcher returns the PLAIN join and leaves the work to AQE.
    * Only when the runtime split is unavailable (AQE disabled, skew-join
    * disabled — e.g. a pipeline that needs deterministic partitioning)
    * does it fall back to the static salt. Never reaches for the salt on
    * algebraic aggregations — see the object scaladoc. */
  def joinSkewAware(left: DataFrame, right: DataFrame, keys: Seq[String],
                    factor: Int, joinType: String = "inner"): DataFrame =
    if (aqeSkewCapable(left)) left.join(right, keys, joinType)
    else saltedJoin(left, right, keys, factor, joinType)

  /** True when this session's AQE will skew-split a shuffle join at
    * runtime (both flags on). Split out for the path-choice spec. */
  private[graft] def aqeSkewCapable(df: DataFrame): Boolean = {
    val conf = df.sparkSession.conf
    conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
      conf.get("spark.sql.adaptive.skewJoin.enabled", "true").toBoolean
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), final aggregate on key. `partial` computes the salted
    * partials; `fin` merges them. Example:
    * {{{
    * saltedAgg(df, Seq("k"), 16,
    *   partial = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
    *   fin     = Seq(sum(col("s")).as("total"), sum(col("c")).as("n")))
    * }}} */
  def saltedAgg(df: DataFrame, keys: Seq[String], factor: Int,
                partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      salt(factor, df.columns.map(col).toIndexedSeq: _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }
}
