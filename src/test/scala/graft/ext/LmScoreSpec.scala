package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("lmScore ranks in-domain docs below off-domain ones") {
    val df = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta gamma", true),
      (10L, "alpha beta gamma alpha", false), // in-domain bigrams
      (11L, "zeta eta theta iota kappa", false)) // fully OOV
      .toDF("id", "text", "tr")
    val s = TextAnalysis.lmScore(df, "id", "text", $"tr")
      .select($"id", $"lm_score").as[(Long, Double)].collect().toMap
    // every doc with >= 2 tokens is scored, including the train slice
    assert(s.keySet == Set(1L, 2L, 10L, 11L), s)
    assert(s(10L) < s(11L), s)
    // OOV doc: every bigram backs off to the add-one unigram floor
    // p = 0.1 * 1/(T+V): T=10 train tokens, V=3 distinct
    val floor = 0.1 * (1.0 / 13.0)
    assert(math.abs(s(11L) - BigDecimal(-math.log(floor))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6, s)
    // deterministic under repartitioning (round-6 fixed point)
    val again = TextAnalysis.lmScore(df.repartition(5), "id", "text", $"tr")
      .select($"id", $"lm_score").as[(Long, Double)].collect().toMap
    assert(again == s)
  }

  test("lmScore skips docs with fewer than two tokens") {
    val df = Seq((1L, "alpha beta", true), (2L, "solo", false))
      .toDF("id", "text", "tr")
    val ids = TextAnalysis.lmScore(df, "id", "text", $"tr")
      .select($"id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
