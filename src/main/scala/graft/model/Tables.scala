package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-layout conventions + table loading.
  *
  * The reference addresses tables by a `{layer}/{domain}/{table}/run_date=...`
  * path convention (reference `run_transform.py:24,30`, `adls.py:14-17`);
  * `TableRef` is the engine's typed equivalent. The driver testdata is a flat
  * `dir/name.parquet` layout, loaded via [[Tables.load]].
  */
final case class TableRef(layer: String, domain: String, table: String) {
  /** Hive-style partition path for one run_date (reference `run_transform.py:24`). */
  def path(root: String, runDate: String): String =
    s"$root/$layer/$domain/$table/run_date=$runDate"
  /** Root path of the table across all run_dates (partition-pruned reads). */
  def path(root: String): String = s"$root/$layer/$domain/$table"
}

object Tables {
  /** Load a driver testdata table: `dir/name.parquet`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val starSchema: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = starSchema ++ Seq("events", "documents", "embeddings")
}
