package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Json

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  test("K3 writeJsonDocument lands ONE file holding ONE JSON array document") {
    val dir = tmpDir("k3")
    Sinks.writeJsonDocument(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(parts.length == 1, "single document = single part file")
    val text = new String(
      java.nio.file.Files.readAllBytes(parts.head.toPath), "UTF-8")
    assert(text.trim.startsWith("[") && text.trim.endsWith("]"))
    // one record per line, comma-separated: a real single JSON document
    val parsed = spark.read.option("multiLine", value = true)
      .json(parts.head.getAbsolutePath)
    assert(parsed.count() == 3)
  }

  test("K3 document round-trips through Json.readItems (bare-array probe)") {
    val dir = tmpDir("k3rt")
    Sinks.writeJsonDocument(df, dir)
    val back = Json.readItems(spark, dir)
      .select(col("id"), col("v")).orderBy("id").collect().toSeq
    assert(back == df.orderBy("id").collect().toSeq)
  }

  test("K3 of an empty frame is still a valid (empty) JSON array") {
    val dir = tmpDir("k3empty")
    Sinks.writeJsonDocument(df.filter($"id" < 0), dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val text = new String(
      java.nio.file.Files.readAllBytes(parts.head.toPath), "UTF-8").trim
    assert(text.replaceAll("\\s", "") == "[]")
  }

  test("K3 of a ZERO-PARTITION frame still writes the [] document and round-trips") {
    // spark.emptyDataFrame has no partitions at all — no task ever runs, so
    // the iterator shape can't emit the brackets; the sink must special-case
    // it rather than land an empty directory.
    for ((name, empty) <- Seq(
        ("k3zero", spark.emptyDataFrame),
        ("k3zerolocal", Seq.empty[(Long, String)].toDF("id", "v")))) {
      val dir = tmpDir(name)
      assert(empty.toJSON.rdd.getNumPartitions == 0 ||
        empty.rdd.getNumPartitions == 0 || name == "k3zerolocal")
      Sinks.writeJsonDocument(empty, dir)
      val parts = new java.io.File(dir).listFiles()
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(parts.nonEmpty, s"$name: document file must exist")
      val text = new String(
        java.nio.file.Files.readAllBytes(parts.head.toPath), "UTF-8").trim
      assert(text.replaceAll("\\s", "") == "[]")
      assert(Json.readItems(spark, dir).isEmpty)
    }
  }

  test("K2 writeJsonl emits newline-delimited records readable as JSONL") {
    val dir = tmpDir("k2")
    Sinks.writeJsonl(df, dir)
    val back = Json.readJsonl(spark, dir)
      .select(col("id"), col("v")).orderBy("id").collect().toSeq
    assert(back == df.orderBy("id").collect().toSeq)
  }
}
