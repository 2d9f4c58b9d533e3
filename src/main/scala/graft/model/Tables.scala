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
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The driver testdata events table stores `ts` as parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright.
    * Read nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * truncate to microseconds — exactly what DuckDB's TIMESTAMP (µs) cast
    * does, so oracle values agree. Integer `DIV` is required: epoch-nanos
    * (~1.7e18) exceeds a double's 2^53 exact-integer range, so a float
    * division would corrupt the timestamp. A RE-LANDED events table
    * (written by Spark, e.g. the scale-smoke's 10× copy) already has µs
    * timestamps — those pass through untouched (type-dispatched).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw
    }
  }

  val starSchema: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = starSchema ++ Seq("events", "documents", "embeddings")
}
