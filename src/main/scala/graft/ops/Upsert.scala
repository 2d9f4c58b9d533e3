package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake-native MERGE upsert — the engine form of the reference's staged
  * SQL-Server `MERGE` (reference `run_load.py:57-96`): last-write-wins on the
  * declared key columns, updating every non-key column on match, inserting
  * all columns on no-match, keeping unmatched target rows, and skipping the
  * load when the update batch is empty (reference `run_load.py:68-70`).
  *
  * Implementation is a full-outer join keyed on `keys` — one shuffle on the
  * key columns for each side, no driver materialization, so it scales to
  * arbitrarily large targets (unlike the reference's pandas `to_sql` stage,
  * its acknowledged limit at `run_load.py:36`). At 100 TB the join is a
  * standard sort-merge exchange; if the target is bucketed/partitioned by the
  * key, Spark elides its exchange.
  *
  * SQL Server's MERGE errors on duplicate source keys; the reference relies
  * on upstream dedup (`run_transform.py:50,66`). We dedup defensively with a
  * deterministic keep-first so the operator is total.
  */
object Upsert {

  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    require(keys.forall(target.columns.contains),
      s"target missing key column(s): ${keys.filterNot(target.columns.contains).mkString(",")}")

    // Empty-batch skip (reference run_load.py:68-70). `isEmpty` is a
    // limit-1 job, not a full count — cheap at any scale.
    if (updates.isEmpty) return target

    val nonKeys = target.columns.filterNot(keys.contains).toSeq
    // Align update schema to target column order; extra update columns dropped.
    val aligned = updates.select(target.columns.map(col).toSeq: _*)
      .dropDuplicates(keys)

    val marker = "__graft_upd"
    val u = aligned
      .withColumn(marker, lit(true))
      .select((keys.map(col) :+ col(marker)) ++
        nonKeys.map(c => col(c).as(s"${c}__u")): _*)

    // USING-join on keys coalesces key columns across both sides.
    target.join(u, keys, "full_outer")
      .select(keys.map(col) ++ nonKeys.map { c =>
        // matched or inserted → update's value (even if null: MERGE updates
        // every non-key column, reference run_load.py:84-90); else target's.
        when(col(marker).isNotNull, col(s"${c}__u")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** SCD Type-2 upsert: where [[upsert]] overwrites (SCD1, the reference's
    * MERGE semantics), this keeps dimension HISTORY — a changed row closes
    * the current version (`valid_to` = batch date, `is_current` = false)
    * and appends the new version. Unchanged rows (same non-key values) are
    * left untouched, so re-running a batch is idempotent.
    *
    * Plan shape: one join of current rows vs updates on the key + a union —
    * shuffles only on the key columns, history rows pass through untouched
    * (filtered map-side), nothing driver-side.
    */
  def scd2(target: DataFrame, updates: DataFrame, keys: Seq[String],
           batchDate: String): DataFrame = {
    require(keys.nonEmpty, "scd2 requires at least one key column")
    val meta = Seq("valid_from", "valid_to", "is_current")
    val valueCols = target.columns.filterNot(c => keys.contains(c) || meta.contains(c)).toSeq
    if (updates.isEmpty) return target

    val history = target.filter(!col("is_current"))
    val current = target.filter(col("is_current"))
    val aligned = updates
      .select((keys ++ valueCols).map(col): _*)
      .dropDuplicates(keys)

    // valid_from/valid_to follow the TARGET's declared types (string, date,
    // or timestamp) — a hardcoded string would fail or silently coerce the
    // unionByName against a DATE-typed dimension.
    val vfType = target.schema("valid_from").dataType
    val vtType = target.schema("valid_to").dataType

    // Presence markers rather than key-null checks: a null-key row is still
    // a row (the === join never matches nulls, so null-key current rows pass
    // through `kept` and null-key update rows insert via `opened`).
    val tMark = "__graft_scd2_t"
    val uMark = "__graft_scd2_u"
    val cur = current.withColumn(tMark, lit(true))
    val u = aligned.select(
      (keys.map(c => col(c).as(s"${c}__u")) ++
        valueCols.map(c => col(c).as(s"${c}__u"))): _*)
      .withColumn(uMark, lit(true))
    val joinCond = keys.map(k => col(k) === col(s"${k}__u")).reduce(_ && _)
    val joined = cur.join(u, joinCond, "full_outer")
    val changed = valueCols
      .map(c => !(col(c) <=> col(s"${c}__u")))
      .reduceOption(_ || _).getOrElse(lit(false))

    val inUpdate = col(uMark).isNotNull
    val inTarget = col(tMark).isNotNull

    // current rows to close: matched AND changed
    val closed = joined.filter(inTarget && inUpdate && changed)
      .select((keys ++ valueCols).map(col) :+
        col("valid_from") :+ lit(batchDate).cast(vtType).as("valid_to") :+
        lit(false).as("is_current"): _*)
    // current rows kept open: unmatched, or matched with no change
    val kept = joined.filter(inTarget && (!inUpdate || !changed))
      .select((keys ++ valueCols).map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
    // new versions: updates that are new keys or changed values
    val opened = joined.filter(inUpdate && (!inTarget || changed))
      .select((keys.map(k => col(s"${k}__u").as(k)) ++
        valueCols.map(c => col(s"${c}__u").as(c))) :+
        lit(batchDate).cast(vfType).as("valid_from") :+
        lit(null).cast(vtType).as("valid_to") :+
        lit(true).as("is_current"): _*)

    history.select(closed.columns.map(col): _*)
      .unionByName(closed).unionByName(kept).unionByName(opened)
  }

  /** Point-in-time read over an [[scd2]] dimension: the version of each key
    * that was valid AT `date` — `valid_from <= date < valid_to` (open
    * versions have null `valid_to`). A pure filter over the versioned
    * frame: partition-prunable, no shuffle, the read-side contract that
    * makes SCD2 history useful (training-data reproducibility, late-event
    * joins against the dimension as it WAS). `date` must be the same
    * comparable type the dimension's validity columns use. */
  def asOf(scd2Frame: DataFrame, date: org.apache.spark.sql.Column): DataFrame =
    scd2Frame.filter(
      col("valid_from") <= date &&
        (col("valid_to").isNull || col("valid_to") > date))

  /** Declarative load plan (reference `run_load.py:113-128`): a list of
    * upserts driven per run. */
  final case class LoadSpec(table: String, keys: Seq[String])

  def runLoadPlan(
      specs: Seq[LoadSpec],
      readTarget: String => DataFrame,
      readUpdates: String => DataFrame,
      writeTarget: (String, DataFrame) => Unit): Unit =
    specs.foreach { spec =>
      writeTarget(spec.table, upsert(readTarget(spec.table), readUpdates(spec.table), spec.keys))
    }
}
