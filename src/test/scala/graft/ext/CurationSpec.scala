package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs all four PII kinds and is idempotent") {
    val df = Seq(
      (1L, "mail a.b+c@ex-am.ple.org now"),
      (2L, "ssn 123-45-6789 phone 555-123-4567 alt 555.123.4567"),
      (3L, "ip 192.168.0.1 end"),
      (4L, "clean text with no pii at all"))
      .toDF("id", "t")
    val once = df.select($"id", Curation.redactPii($"t").as("c"))
    val rows = once.orderBy("id").as[(Long, String)].collect()
    assert(rows(0)._2 == "mail <EMAIL> now")
    assert(rows(1)._2 == "ssn <SSN> phone <PHONE> alt <PHONE>")
    assert(rows(2)._2 == "ip <IP> end")
    assert(rows(3)._2 == "clean text with no pii at all")
    val twice = once.select($"id", Curation.redactPii($"c").as("c"))
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("splitAssign is deterministic and roughly 80/10/10") {
    val ids = spark.range(0, 10000).toDF("id")
    val counts = ids.select(Curation.splitAssign($"id").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts("train") > 7600 && counts("train") < 8300, counts)
    assert(counts("val") > 700 && counts("val") < 1400, counts)
    assert(counts("test") > 700 && counts("test") < 1400, counts)
    // stable under repartitioning (property of the row, not the pass)
    val a = ids.select($"id", Curation.splitAssign($"id").as("s"))
    val b = ids.repartition(13).select($"id", Curation.splitAssign($"id").as("s"))
    assert(a.except(b).isEmpty)
  }

  test("packSequences two-phase prefix sum equals the global window") {
    // irregular ids (gaps) and sizes; small buckets force multi-bucket path
    val docs = spark.range(0, 500).toDF("id")
      .filter($"id" % 7 =!= 3)
      .select($"id", (($"id" * 37) % 90 + 1).as("n"))
    val packed = Curation.packSequences(docs, "id", $"n",
      maxTokens = 256, bucketSize = 32)
    val naive = docs.select($"id", $"n".cast("long").as("n_tokens"),
      floor(coalesce(sum($"n").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).cast("double") / 256.0).cast("long").as("bin_id"))
    assert(packed.except(naive).isEmpty && naive.except(packed).isEmpty)
    // bins are contiguous in id order and start at 0
    val bins = packed.select("bin_id").distinct().as[Long].collect().sorted
    assert(bins.head == 0L && bins.sameElements(bins.head to bins.last))
  }

  test("contamination finds planted overlap via broadcast semi-join") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("id", "text")
    val train = Seq(
      (1L, "xx alpha beta gamma delta epsilon zeta eta theta yy"), // shares 8-grams
      (2L, "totally different words that never overlap with anything here"),
      (3L, "short doc"))
      .toDF("id", "text")
    val hits = Curation.contamination(train, bench, "id", "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet == Set(1L))
    assert(hits(1L) == 1L) // exactly one shared 8-gram window
  }
}
