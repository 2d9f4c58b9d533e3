package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 item: the learned (supervised Naive Bayes) text classifier
  * behind q221's distilled language gate. */
class NbClassifySpec extends SparkSpec {
  import spark.implicits._

  test("nbClassify learns a separable two-class vocabulary and " +
      "generalizes to held-out docs") {
    val df = Seq(
      (1L, "apple pear plum apple", "fruit", true),
      (2L, "pear plum apple pear plum", "fruit", true),
      (3L, "iron zinc gold iron", "metal", true),
      (4L, "gold zinc iron gold zinc", "metal", true),
      // held-out: label column present but NOT trained on
      (10L, "plum apple pear", "fruit", false),
      (11L, "zinc gold iron", "metal", false))
      .toDF("id", "text", "lbl", "tr")
    val out = TextAnalysis.nbClassify(df, "id", "text", "lbl", $"tr")
      .select($"id", $"pred").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L), out)
    assert(out(10L) == "fruit" && out(11L) == "metal", out)
    // train slice reproduces its own labels on separable vocab
    assert(out(1L) == "fruit" && out(3L) == "metal", out)
  }

  test("nbClassify hand-check: Laplace-smoothed log score matches the " +
      "closed form; argmax tiebreak is class-ascending on the round-6 " +
      "score") {
    val df = Seq(
      (1L, "a a b", "x", true),
      (2L, "b b a", "y", true),
      (10L, "a b", "x", false))
      .toDF("id", "text", "lbl", "tr")
    // train: x: {a:2, b:1} T=3; y: {a:1, b:2} T=3; V=2; priors 1/2 each
    // score(10, x) = ln(1/2) + ln(3/5) + ln(2/5)  (a: (2+1)/5, b: (1+1)/5)
    // score(10, y) = ln(1/2) + ln(2/5) + ln(3/5)  — IDENTICAL sum
    // → tie at round-6; class-ascending tiebreak picks "x"
    val row = TextAnalysis.nbClassify(df, "id", "text", "lbl", $"tr")
      .filter($"id" === 10L).select($"pred", $"nb_score")
      .as[(String, Double)].head()
    assert(row._1 == "x", row)
    val want = math.log(0.5) + math.log(3.0 / 5) + math.log(2.0 / 5)
    assert(math.abs(row._2 - BigDecimal(want)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, row)
  }

  test("nbClassify is deterministic under repartitioning") {
    val df = Seq.tabulate(40) { i =>
      val lbl = if (i % 2 == 0) "ev" else "od"
      val txt = if (i % 2 == 0) s"even alpha beta tok$i" else s"odd gamma delta tok$i"
      (i.toLong, txt, lbl, i < 20)
    }.toDF("id", "text", "lbl", "tr")
    val a = TextAnalysis.nbClassify(df, "id", "text", "lbl", $"tr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val b = TextAnalysis.nbClassify(df.repartition(7), "id", "text", "lbl",
      $"tr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(a == b)
    // a model trained on perfectly separable markers is perfect held-out
    val wrong = a.filter { case (id, p, _) =>
      p != (if (id % 2 == 0) "ev" else "od") }
    assert(wrong.isEmpty, wrong)
  }
}
