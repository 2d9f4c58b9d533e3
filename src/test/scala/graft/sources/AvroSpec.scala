package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class AvroSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("day", DateType, nullable = true),
    StructField("blob", BinaryType, nullable = true)))

  private def sample = {
    val rows = (0L until 100L).map { i =>
      Row(i,
        if (i % 7 == 0) null else s"name_$i",
        if (i % 5 == 0) null else i * 1.5,
        i % 2 == 0,
        if (i % 11 == 0) null
        else Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + i,
          (i % 1000) * 1000 * 1000)),
        if (i % 13 == 0) null
        else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000 + i)),
        if (i % 3 == 0) null else Array[Byte](i.toByte, (i + 1).toByte))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("round-trip preserves every supported type, null patterns included") {
    val dir = tmpDir("avro_rt")
    val df = sample
    Avro.write(df, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema == df.schema.map(f => f.copy(
      nullable = f.nullable)).foldLeft(new StructType)(_.add(_)))
    val a = df.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getAs[String](1) == y.getAs[String](1))
      assert(Option(x.getAs[java.lang.Double](2)) ==
        Option(y.getAs[java.lang.Double](2)))
      assert(x.getBoolean(3) == y.getBoolean(3))
      assert(x.getAs[Timestamp](4) == y.getAs[Timestamp](4))
      assert(x.getAs[java.sql.Date](5) == y.getAs[java.sql.Date](5))
      assert(java.util.Arrays.equals(
        Option(x.getAs[Array[Byte]](6)).getOrElse(Array.empty),
        Option(y.getAs[Array[Byte]](6)).getOrElse(Array.empty)))
    }
  }

  test("projected reader schema prunes at decode and matches the full read") {
    val dir = tmpDir("avro_proj")
    Avro.write(sample, dir)
    val proj = Avro.read(spark, dir, Some(Seq("id", "score")))
    assert(proj.columns.toSeq == Seq("id", "score"))
    val full = Avro.read(spark, dir).select("id", "score")
    assert(proj.exceptAll(full).isEmpty && full.exceptAll(proj).isEmpty)
  }

  test("one container file per non-empty partition; empty frame self-describes") {
    val dir = tmpDir("avro_parts")
    Avro.write(sample, dir) // 4 partitions
    val files = new java.io.File(dir).listFiles().filter(
      _.getName.endsWith(".avro"))
    assert(files.length == 4)
    val dirE = tmpDir("avro_empty")
    Avro.write(sample.limit(0), dirE)
    val back = Avro.read(spark, dirE)
    assert(back.isEmpty && back.columns.length == 7)
  }

  test("unsupported Spark type and unknown projected column fail loudly") {
    val bad = spark.range(3).select(array(col("id")).as("arr"))
    intercept[IllegalArgumentException] {
      Avro.write(bad, tmpDir("avro_bad"))
    }
    val dir = tmpDir("avro_cols")
    Avro.write(sample, dir)
    intercept[IllegalArgumentException] {
      Avro.read(spark, dir, Some(Seq("nope")))
    }
  }

  test("timestamp survives as exact micros (logical type, UTC)") {
    val dir = tmpDir("avro_ts")
    val df = spark.sql(
      "SELECT timestamp_micros(1700000000123456) AS ts")
    Avro.write(df, dir)
    val us = Avro.read(spark, dir)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(us == 1700000000123456L)
  }
}
