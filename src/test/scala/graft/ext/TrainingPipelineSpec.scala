package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end LLM-training-data pipeline over the real testdata: quality
  * filter → exact dedup → MinHash near-dup pruning → per-language corpus
  * stats. Asserts the composition is deterministic and each stage only
  * removes rows. */
class TrainingPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def runPipeline() = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val quality = docs.filter(
      TextAnalysis.qualityScore(col("text")) >= 0.4 &&
        TextAnalysis.nTokens(col("text")) >= 10)
    val keepExact = Dedup.exactGroups(quality, "doc_id",
      TextAnalysis.fingerprint(col("text")))
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = quality.join(keepExact, "doc_id")
    val nearDupLosers = Dedup.minHashDedupPairs(
      exactDeduped, "doc_id", "text", n = 3, k = 32, bands = 8, threshold = 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    val corpus = exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
    (docs.count(), quality.count(), exactDeduped.count(), corpus.count(),
      corpus.groupBy(col("lang")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("pipeline stages are monotone-shrinking and deterministic") {
    val (total, afterQ, afterExact, afterNear, byLang) = runPipeline()
    assert(total >= afterQ && afterQ >= afterExact && afterExact >= afterNear)
    assert(afterNear > 0)
    assert(byLang.values.sum == afterNear)
    val second = runPipeline()
    assert(second._4 == afterNear && second._5 == byLang)
  }
}
