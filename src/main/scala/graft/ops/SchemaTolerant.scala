package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-tolerant column combinators.
  *
  * The reference guards every cleaning step on column presence — transforms
  * are no-ops when the column is absent (reference `run_transform.py:49`,
  * `run_transform.py:53`, `run_transform.py:65-70`). These combinators make
  * that semantic first-class: they check the *schema* (driver-side metadata),
  * never the data, so they cost nothing at plan time and compose with
  * `df.transform(...)`.
  */
object SchemaTolerant {

  private def has(df: DataFrame, c: String): Boolean =
    df.columns.contains(c)

  /** Apply `f` only when column `c` exists; otherwise identity. */
  def whenPresent(c: String)(f: DataFrame => DataFrame): DataFrame => DataFrame =
    df => if (has(df, c)) f(df) else df

  /** Cast `c` to `dataType` when present; malformed input → null. The
    * reference runs PySpark with ANSI off, where cast returns null on bad
    * input (reference `run_transform.py:57,68`); Spark 4 defaults to ANSI
    * (throwing) casts, so `try_cast` is the faithful translation. */
  def castIfPresent(c: String, dataType: String): DataFrame => DataFrame =
    whenPresent(c)(df => df.withColumn(c, expr(s"try_cast($c AS $dataType)")))

  /** Parse string columns to timestamps when present, ISO default parsing,
    * unparseable → null (reference `run_transform.py:52-54,69-71`;
    * `try_to_timestamp` for the same ANSI reason as [[castIfPresent]]). */
  def toTimestampIfPresent(cols: String*): DataFrame => DataFrame =
    df => cols.foldLeft(df)((acc, c) =>
      if (has(acc, c)) acc.withColumn(c, try_to_timestamp(col(c))) else acc)

  /** Deduplicate by key columns when all are present, else no-op
    * (reference `run_transform.py:49-50,65-66`). Spark's `dropDuplicates`
    * keeps an arbitrary row per key, matching the reference. */
  def dedupIfPresent(keys: Seq[String]): DataFrame => DataFrame =
    df => if (keys.forall(has(df, _))) df.dropDuplicates(keys) else df

  /** Deterministic dedup: keep the first row per key under `order`. Unlike
    * `dropDuplicates`, the survivor is well-defined — required for any
    * oracle-compared dedup, and the right default at scale (one shuffle,
    * same cost as dropDuplicates, no nondeterminism across reruns/AQE). */
  def dedupKeepFirst(keys: Seq[String], order: Seq[Column]): DataFrame => DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df => {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  /** Drop columns that exist; absent names ignored (reference
    * `run_transform.py:83-85` gold projection). */
  def dropIfPresent(cols: String*): DataFrame => DataFrame =
    df => df.drop(cols: _*)
}
