package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TableRef

/** Lake sinks (SURVEY §2.2).
  *
  * K1: idempotent per-partition parquet overwrite (reference
  * `run_transform.py:29-36`). K2: JSONL text sink (reference
  * `rest_api.py:96-100`, `adls.py:24-26`) — distributed, unlike the
  * reference's single-blob upload that materializes the whole endpoint in
  * one driver string (its scalability sin, SURVEY §3.2). K3: single JSON
  * document sink (reference `run_extract.py:69-71`) — raw-landing detail,
  * kept for fixture parity.
  */
object Sinks {

  /** K1 — overwrite exactly one run_date partition directory. Writing the
    * explicit partition path (not the table root) makes re-runs idempotent
    * per partition without touching sibling partitions. */
  def writeParquetPartition(df: DataFrame, root: String, ref: TableRef, runDate: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(ref.path(root, runDate))

  /** K1 variant — hive-layout write of many run_dates at once with DYNAMIC
    * partition overwrite: only partitions present in `df` are replaced.
    * This is the 100 TB-safe shape (static overwrite would drop the whole
    * table). */
  def writePartitionedByRunDate(df: DataFrame, root: String, ref: TableRef): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_date")
      .parquet(ref.path(root))

  /** K2 — distributed JSONL sink: each task writes its partition as
    * newline-delimited JSON. Line format matches the reference
    * (`ensure_ascii=False` ≙ raw UTF-8). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K3 — single-JSON-document sink (reference `run_extract.py:69-71` lands
    * each QuickBooks extract as one JSON blob): renders the frame as ONE
    * JSON array document in one file. A single task streams the rows
    * through (coalesce(1) + iterator, no driver materialization — the
    * reference builds the whole payload in a driver string, its raw-landing
    * bound); by construction this sink is for bronze fixtures, not big
    * tables. The document round-trips through [[graft.sources.Json.readItems]]
    * (bare-array shape). */
  def writeJsonDocument(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    val json = df.toJSON
    // A zero-partition input (empty LocalRelation, spark.emptyDataFrame)
    // would give mapPartitions nothing to run on — no task, no "[]"
    // document, and readItems would choke on the empty directory. Emit the
    // empty document explicitly.
    if (json.rdd.getNumPartitions == 0) {
      df.sparkSession.createDataset(Seq("[]"))
        .write.mode(SaveMode.Overwrite).text(path)
      return
    }
    val doc = json.coalesce(1).mapPartitions { it =>
      val buf = it.buffered
      val body: Iterator[String] = new Iterator[String] {
        def hasNext: Boolean = buf.hasNext
        def next(): String = {
          val s = buf.next()
          "  " + s + (if (buf.hasNext) "," else "")
        }
      }
      Iterator("[") ++ body ++ Iterator("]")
    }
    doc.write.mode(SaveMode.Overwrite).text(path)
  }

  /** Serialize rows to JSON lines as a column — the engine form of the
    * reference's per-record `json.dumps` (reference `rest_api.py:99`). */
  def toJsonLines(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))

  /** Read back a partitioned lake table with partition pruning available on
    * `run_date`. */
  def readLakeTable(spark: SparkSession, root: String, ref: TableRef): DataFrame =
    spark.read.option("basePath", ref.path(root)).parquet(ref.path(root))
}
