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
