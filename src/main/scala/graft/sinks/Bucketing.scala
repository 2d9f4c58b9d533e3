package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §2.4 [N] scale path).
  *
  * Writing both sides of a recurring fact↔fact join bucketed (and sorted)
  * by the join key lets Spark elide BOTH shuffle exchanges: each bucket
  * pair joins with a sort-merge that reads pre-sorted, pre-partitioned
  * files. At 100 TB this turns the nightly fact-fact join from the
  * dominant shuffle into pure scan work — the lake-native analogue of the
  * warehouse's clustered index. Requires a catalog table (bucket metadata
  * lives in the catalog, not the parquet footer).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    // Overwrite only replaces tables the CURRENT catalog knows about; with
    // an in-memory catalog, a warehouse dir left by a previous JVM is an
    // orphan that blocks creation (LOCATION_ALREADY_EXISTS) — clear both.
    dropTable(df.sparkSession, table)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Drop `table` from the catalog AND delete its (possibly orphaned)
    * warehouse location. */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
  }

  /** Join two bucketed catalog tables on their bucket key. With matching
    * bucket counts the planner produces an exchange-free sort-merge join. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
