package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import SchemaTolerant._

/** Silver-layer cleaning transforms, the engine equivalents of the
  * reference's `clean_customers` / `clean_payments`
  * (reference `run_transform.py:39-73`): key dedup, ISO timestamp parsing,
  * defensive casts, and an `etl_loaded_at` audit column. All transforms are
  * schema-tolerant `DataFrame => DataFrame` functions composed with
  * `df.transform(...)` — no action is ever triggered here.
  */
object Cleaning {

  val AuditCol = "etl_loaded_at"

  /** Customers silver clean (reference `run_transform.py:39-60`):
    * dedup on `id`, parse `created_at`/`updated_at`, cast `email` to string,
    * stamp audit column. */
  def cleanCustomers(df: DataFrame): DataFrame =
    df.transform(dedupIfPresent(Seq("id")))
      .transform(toTimestampIfPresent("created_at", "updated_at"))
      .transform(castIfPresent("email", "string"))
      .withColumn(AuditCol, current_timestamp())

  /** Payments silver clean (reference `run_transform.py:63-73`):
    * dedup on `payment_id`, cast `amount` to double, parse
    * `created_at`/`paid_at`, stamp audit column. */
  def cleanPayments(df: DataFrame): DataFrame =
    df.transform(dedupIfPresent(Seq("payment_id")))
      .transform(castIfPresent("amount", "double"))
      .transform(toTimestampIfPresent("created_at", "paid_at"))
      .withColumn(AuditCol, current_timestamp())

  /** Gold dimension projection: silver minus the audit column
    * (reference `run_transform.py:83-85`). */
  def goldDim(df: DataFrame): DataFrame = df.drop(AuditCol)

  /** Gold fact passthrough (reference `run_transform.py:87`). */
  def goldFact(df: DataFrame): DataFrame = df
}
