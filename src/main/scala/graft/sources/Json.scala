package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** JSON bronze sources (SURVEY §2.1 S1/S2/S7).
  *
  * S1: newline-delimited JSON with schema inference (reference
  * `run_transform.py:23-26`). S2: one pretty-printed JSON document per file
  * (reference `run_extract.py:69-71`). S7: variant-shape item extraction —
  * an API may return a bare array, or wrap the record array under `data`,
  * `items`, or `results` (reference `rest_api.py:42-55`); anything else is
  * an error, matching the reference's `ValueError`.
  */
object Json {

  /** S1 — JSONL scan; pass a schema for a stable contract, or None to infer
    * (inference costs one extra pass over the files). */
  def readJsonl(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S2 — multi-line JSON document scan (QuickBooks-style bronze). */
  def readJsonDoc(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", value = true).json(path)

  /** Wrapper fields probed for the record array, in reference order
    * (reference `rest_api.py:47-52`). */
  val WrapperFields: Seq[String] = Seq("data", "items", "results")

  /** S7 — normalize a variant-shape payload file to one row per record
    * (reference `rest_api.py:42-55`): a bare top-level array passes through
    * (`spark.read.json` already yields one row per element); an object must
    * wrap the record array under `data`/`items`/`results` (exploded); any
    * other shape errors, matching the reference's `ValueError`.
    *
    * The array-vs-object distinction is erased by `spark.read.json`, so probe
    * the first non-whitespace byte of the file (via Hadoop FS — works on any
    * lake scheme, reads one block, never the whole payload).
    */
  def readItems(spark: SparkSession, path: String): DataFrame = {
    val df = readJsonDoc(spark, path)
    if (firstByte(spark, path) == '[') df else extractItems(df)
  }

  /** S7 (object shape) — explode the record array found under the first
    * wrapper field; error when absent (reference `rest_api.py:54-55`). */
  def extractItems(df: DataFrame): DataFrame = {
    val wrapped = df.schema.fields.collectFirst {
      case f if WrapperFields.contains(f.name) &&
        f.dataType.isInstanceOf[ArrayType] => f.name
    }
    wrapped match {
      case Some(field) =>
        df.select(explode(col(field)).as("__rec")).select(col("__rec.*"))
      case None =>
        throw new IllegalArgumentException(
          s"Unsupported payload shape: expected a record array or one of " +
            s"${WrapperFields.mkString("/")} wrapping it; got schema ${df.schema.simpleString}")
    }
  }

  private def firstByte(spark: SparkSession, path: String): Int = {
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A sink directory (part-files + _SUCCESS): probe the first data file —
    // all parts of one document share the shape.
    val p =
      if (fs.getFileStatus(p0).isDirectory)
        fs.listStatus(p0).map(_.getPath)
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(s"no data files under $path"))
      else p0
    val in = fs.open(p)
    try Iterator.continually(in.read())
      .dropWhile(b => b != -1 && Character.isWhitespace(b)).next()
    finally in.close()
  }

  /** QBO-style query response: explode `QueryResponse.<entity>` from a
    * multi-line JSON document (reference `quickbooks.py:70-81`, fixture shape
    * in FIXTURES.md §B). */
  def extractQueryResponse(df: DataFrame, entity: String): DataFrame =
    df.select(explode(col(s"QueryResponse.$entity")).as("__rec"))
      .select(col("__rec.*"))
}
