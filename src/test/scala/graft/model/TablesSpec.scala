package graft.model

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.SparkSpec

/** Timestamp-encoding tolerance of the table loader. The driver regenerates
  * testdata parquet between rounds and has already shipped `ts` as
  * TIMESTAMP(NANOS) (round ≤9) and as µs `isAdjustedToUTC=false` ⇒
  * TIMESTAMP_NTZ (round 10); both must normalize to TIMESTAMP so
  * watermarks and `unix_micros` keep working, and with the session pinned
  * to UTC the normalization must be value-identical. */
class TablesSpec extends SparkSpec {

  private def writeNtz(dir: String): Unit = {
    // write with Spark's NTZ type directly — same inference class as
    // pyarrow's isAdjustedToUTC=false µs encoding
    spark.range(100)
      .select(col("id"),
        (lit("2024-03-01 00:00:00").cast(TimestampNTZType)
          + make_dt_interval(lit(0), lit(0), lit(0), col("id"))).as("ts"),
        (col("id") % 7).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("an NTZ events table normalizes to TIMESTAMP with identical values") {
    val dir = tmpDir("ntz")
    writeNtz(dir)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    // UTC session ⇒ micros are bit-identical to the naive encoding
    val micros = loaded.select(unix_micros(col("ts"))).collect()
      .map(_.getLong(0)).sorted
    assert(micros.length == 100 && micros.head == 1709251200000000L)
  }

  test("a watermark runs over the normalized column (streaming surface)") {
    val dir = tmpDir("ntz")
    writeNtz(dir)
    val loaded = Tables.load(spark, dir, "events")
    // analysis is where EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE fires; a green
    // plan here is the regression gate for q62/q80/q98's class of break
    val wm = loaded.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute")).count()
    assert(wm.count() > 0)
  }

  test("normalizeNtz touches every NTZ column and nothing else") {
    val df = spark.range(10)
      .select(col("id"),
        lit("2024-01-01 00:00:00").cast(TimestampNTZType).as("a"),
        lit("2024-01-02 00:00:00").cast(TimestampType).as("b"),
        lit("x").as("s"))
    val out = Tables.normalizeNtz(df)
    assert(out.schema("a").dataType == TimestampType)
    assert(out.schema("b").dataType == TimestampType)
    assert(out.schema("s").dataType.typeName == "string")
  }
}
