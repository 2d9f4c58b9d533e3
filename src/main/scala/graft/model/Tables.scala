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
  /** Load a driver testdata table: `dir/name.parquet`. Every table goes
    * through [[normalizeNtz]] so a driver-side re-land that changes parquet
    * timestamp encoding (µs `isAdjustedToUTC=false` ⇒ Spark TIMESTAMP_NTZ)
    * can never strand downstream watermarks/`unix_micros` on NTZ again —
    * the round-10 q62/q66/q80/q98 regression class. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** The driver testdata events table stores `ts` as parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright.
    * Read nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * truncate to microseconds — exactly what DuckDB's TIMESTAMP (µs) cast
    * does, so oracle values agree. Integer `DIV` is required: epoch-nanos
    * (~1.7e18) exceeds a double's 2^53 exact-integer range, so a float
    * division would corrupt the timestamp. A RE-LANDED events table
    * (written by Spark, e.g. the scale-smoke's 10× copy) already has µs
    * timestamps — those pass through untouched (type-dispatched). A table
    * written by pyarrow with `isAdjustedToUTC=false` µs timestamps is
    * inferred by Spark 4 as TIMESTAMP_NTZ, which `EventTimeWatermark` and
    * `unix_micros` reject — with the session pinned to UTC a cast to
    * TIMESTAMP is value-identical (and matches DuckDB's naive-µs
    * TIMESTAMP oracle), so normalize it here once for every consumer.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"), "ts")
  }

  /** Cast every TIMESTAMP_NTZ column to TIMESTAMP. With the session pinned
    * to UTC the values are identical; what changes is that event-time
    * surfaces (`withWatermark`, `unix_micros`, window joins) accept the
    * column. Applied by [[load]] to every table. */
  def normalizeNtz(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    raw.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))
  }

  /** Normalize an event-time column to TIMESTAMP regardless of how the
    * parquet encoded it: NANOS-as-long → truncate to µs; TIMESTAMP_NTZ →
    * UTC-session-identical cast; TIMESTAMP → untouched.
    */
  def normalizeTs(raw: DataFrame, column: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema(column).dataType match {
      case LongType =>
        raw.withColumn(column, expr(s"timestamp_micros($column DIV 1000)"))
      case TimestampNTZType =>
        raw.withColumn(column, col(column).cast(TimestampType))
      case _ => raw
    }
  }

  val starSchema: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = starSchema ++ Seq("events", "documents", "embeddings")
}
