package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-validating retrieval gates for hash-randomized approximate
  * operators (MinHash/SimHash banding, hyperplane LSH, IVF) — the sibling
  * of [[SketchGate]] for operators whose OUTPUT (not just error) depends on
  * engine hash families the driver's DuckDB oracle cannot reproduce.
  *
  * The gate inverts which side is emitted: the returned frame is the EXACT
  * counterpart's rows (oracle-reproducible in ANSI SQL) plus constant
  * within-contract BOOLEANS; the approximate operator still runs in-query
  * as the gate subject, its retrieval is measured against the exact set,
  * and an in-query `require` fails fast when the contract is violated —
  * while the booleans ride the emitted rows so the same violation also
  * fails the driver's hash compare (the oracle expects TRUE).
  *
  * As with [[SketchGate]], the exact twin is the verification harness, not
  * the scale path: at 100 TB you run the approximate operator alone; the
  * gate is how the harness proves its retrieval contract on real data.
  * All hash seeds and inputs are fixed, so the measured recalls are
  * deterministic — a gate either always passes or always fails on a given
  * dataset, never flakily.
  */
object RecallGate {

  /** Gate verdicts measured by [[check]] — the booleans the caller rides on
    * its emitted rows (`precisionOk` is None when precision is not claimed,
    * e.g. ANN top-k which legitimately fills missed slots). */
  final case class GateVerdict(recallOk: Boolean, precisionOk: Option[Boolean])

  /** Measure `approx` against `exact` on `keys` and `require` the contract:
    *  - recall = |exact ⋉ approx| / |exact| must be ≥ `recallFloor`;
    *  - when `requireExactPrecision`, approx must be a SUBSET of exact
    *    (operators that exact-verify every candidate have precision 1.0 by
    *    construction — a spurious row means the verification broke).
    * Only the DISTINCT KEY projections are checkpointed — callers gating a
    * large emitted plane should pass its bounded gate plane here (e.g. the
    * representative-level pair set behind an exact-duplicate collapse) and
    * ride the verdict booleans on the expanded emission. */
  def check(exact: DataFrame, approx: DataFrame, keys: Seq[String],
            recallFloor: Double, what: String,
            requireExactPrecision: Boolean = true): GateVerdict = {
    val eKeys = exact.select(keys.map(col): _*).distinct().localCheckpoint()
    val aKeys = approx.select(keys.map(col): _*).distinct().localCheckpoint()
    val total = eKeys.count()
    require(total > 0, s"$what: exact ground truth is empty — recall undefined")
    val hits = eKeys.join(aKeys, keys, "left_semi").count()
    val recall = hits.toDouble / total
    require(recall >= recallFloor,
      f"$what: retrieval recall $recall%.3f below floor $recallFloor " +
        f"($hits of $total exact rows retrieved) — approximate operator's " +
        "contract violated")
    System.err.println(
      f"[gate] $what: recall=$recall%.3f (floor $recallFloor, $hits/$total)")
    if (!requireExactPrecision) GateVerdict(recall >= recallFloor, None)
    else {
      val spurious = aKeys.join(eKeys, keys, "left_anti").count()
      require(spurious == 0,
        s"$what: $spurious approximate rows outside the exact set — " +
          "candidate verification is broken (precision must be 1.0 by " +
          "construction)")
      GateVerdict(recall >= recallFloor, Some(spurious == 0))
    }
  }

  /** [[check]] + emission: returns `exact` with `recall_ok`
    * (+ `precision_ok` when checked) constant boolean columns. The exact
    * frame is localCheckpoint-ed so the probe and the returned frame share
    * one execution. Use for bounded exact planes; for large expanded
    * planes, [[check]] the bounded gate plane and attach the verdicts to
    * the expansion instead. */
  def gate(exact: DataFrame, approx: DataFrame, keys: Seq[String],
           recallFloor: Double, what: String,
           requireExactPrecision: Boolean = true): DataFrame = {
    val e = exact.localCheckpoint()
    val v = check(e, approx, keys, recallFloor, what, requireExactPrecision)
    val g = e.withColumn("recall_ok", lit(v.recallOk))
    v.precisionOk.fold(g)(p => g.withColumn("precision_ok", lit(p)))
  }

  /** Exact set equivalence of two frames on `keys` (e.g. banded SimHash vs
    * brute-force — pigeonhole says they must MATCH, not just overlap).
    * `require`s both directions empty and returns true (for riding emitted
    * rows as a constant gate boolean). */
  def equivalent(a: DataFrame, b: DataFrame, keys: Seq[String],
                 what: String): Boolean = {
    val (onlyA, onlyB, _) = diffCounts(a, b, keys)
    require(onlyA == 0 && onlyB == 0,
      s"$what: sets differ ($onlyA rows only in left, $onlyB only in " +
        "right) — expected exact equivalence")
    true
  }

  /** Both directions of the set difference (and the union size) in ONE
    * Spark job: distinct each side, full-outer join on the keys, count the
    * one-sided rows. Replaces the two anti-join probes + two checkpoints
    * the gate used to run — same verdict, a quarter of the jobs, which is
    * what the lake-DDL queries' gate bills are made of. */
  /** Several equivalence gates in ONE job via order-invariant MULTISET
    * fingerprints: each side's key projection reduces to
    * (count, Σ xxhash64(keys), Σ xxhash64(7, keys)) with exact
    * decimal-128 accumulation — no join, no distinct, no wide shuffle
    * (map-side partial aggregation carries one row per partition), and
    * FULL coverage instead of [[equivalentAllSampled]]'s 1/mod slice.
    * Equal fingerprints ⇒ equal multisets up to a ~2⁻¹²⁸ two-hash
    * collision — the same epistemics as the driver's own hash-compare
    * oracle, so this is the preferred gate wherever the subject is not
    * fully covered by the emitted rows: stronger than the slice AND
    * cheaper. Multiset semantics also catch a duplicated row, which the
    * distinct-then-join slice would miss. */
  def equivalentFingerprint(pairs: Seq[(DataFrame, DataFrame, String)],
                            keys: Seq[String]): Boolean = {
    require(pairs.nonEmpty, "need at least one gate pair")
    def side(df: DataFrame, tag: String, marker: String): DataFrame =
      df.select(
        lit(tag).as("_tag"), lit(marker).as("_side"),
        xxhash64(keys.map(col): _*).cast("decimal(38,0)").as("_h1"),
        xxhash64(lit(7) +: keys.map(col): _*).cast("decimal(38,0)").as("_h2"))
    val all = pairs.flatMap { case (a, b, tag) =>
      Seq(side(a, tag, "l"), side(b, tag, "r")) }.reduce(_.unionByName(_))
    val fp = all.groupBy(col("_tag"), col("_side"))
      .agg(count(lit(1)).as("_n"), sum(col("_h1")).as("_s1"),
        sum(col("_h2")).as("_s2"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDecimal(3), r.getDecimal(4))).toMap
    pairs.foreach { case (_, _, tag) =>
      val l = fp.get((tag, "l")); val r = fp.get((tag, "r"))
      require(l.nonEmpty && r.nonEmpty,
        s"$tag: a side is empty — fingerprint gate vacuous")
      require(l == r,
        s"$tag: multiset fingerprints differ (${l.get} vs ${r.get}) — " +
          "expected exact equivalence")
    }
    true
  }

  private def diffCounts(a: DataFrame, b: DataFrame,
                         keys: Seq[String]): (Long, Long, Long) = {
    val ak = a.select(keys.map(col): _*).distinct().withColumn("_l", lit(1))
    val bk = b.select(keys.map(col): _*).distinct().withColumn("_r", lit(1))
    val r = ak.join(bk, keys, "full_outer")
      .agg(coalesce(sum(when(col("_r").isNull, 1L)), lit(0L)),
        coalesce(sum(when(col("_l").isNull, 1L)), lit(0L)),
        count(lit(1)))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }
}
