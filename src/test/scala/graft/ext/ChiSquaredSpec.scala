package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChiSquaredSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, class = label; "pos" only in class docs, "neg" only outside,
  // "both" everywhere but one, "all" everywhere.
  private val docs = Seq(
    (0L, "pos both all", true),
    (1L, "pos both all", true),
    (2L, "neg both all", false),
    (3L, "neg all", false)
  ).toDF("doc_id", "text", "label")

  test("perfectly predictive tokens score N; chi2 matches the closed form") {
    val r = Curation.chiSquaredTerms(docs, "doc_id", "text",
        isClass = col("label"), minDf = 1, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // pos: a=2 b=0 c=0 d=2 → chi2 = 4·(4-0)²/(2·2·2·2) = 4
    assert(r("pos") == ((2L, 2L, 4.0)))
    assert(r("neg") == ((2L, 0L, 4.0)))
    // both: a=2 b=1 c=0 d=1 → 4·(2-0)²/(3·1·2·2) = 16/12 = 1.333333
    assert(r("both")._3 == 1.333333)
    // all: df = N → undefined marginal, excluded
    assert(!r.contains("all"))
  }

  test("minDf drops rare tokens") {
    val r = Curation.chiSquaredTerms(docs, "doc_id", "text",
        isClass = col("label"), minDf = 3, k = 10)
      .collect().map(_.getString(0)).toSet
    assert(r == Set("both")) // pos/neg have df=2, all is excluded
  }

  test("top-k orders by chi2 desc then token asc") {
    val r = Curation.chiSquaredTerms(docs, "doc_id", "text",
        isClass = col("label"), minDf = 1, k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("neg", "pos")) // tie at 4.0 broken lexically
  }
}
