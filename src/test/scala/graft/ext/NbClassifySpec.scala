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

  test("nbPrune caps the count table at top-N per class (count desc, " +
      "word asc); pruned words score exactly like unseen ones — the " +
      "smoothing denominators keep their full-training values") {
    val df = Seq(
      (1L, "a a a b b c", "x", true),
      (2L, "d d d e e f", "y", true),
      (10L, "a c", "x", false))
      .toDF("id", "text", "lbl", "tr")
    val full = TextAnalysis.nbTrain(df, "id", "text", "lbl", $"tr")
    val pruned = TextAnalysis.nbPrune(full, 2)
    // x keeps {a:3, b:2} (c:1 cut); y keeps {d:3, e:2} (f:1 cut)
    val kept = pruned.counts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(kept == Set(("x", "a", 3L), ("x", "b", 2L),
      ("y", "d", 3L), ("y", "e", 2L)), kept)
    // denominators untouched: t = 6 per class, v = 6 global
    val c = pruned.consts.collect()(0)
    assert(c.getDouble(1) == 6.0, "vocab const must stay full-training")
    // doc 10 under the pruned model: 'a' seen (x:(3+1)/12, y:(0+1)/12),
    // 'c' PRUNED from x → scores the unseen floor 1/12 for both classes
    val row = TextAnalysis.nbApply(pruned, df.filter($"id" === 10L),
      "id", "text").collect()(0)
    val wantX = math.log(0.5) + math.log(4.0 / 12) + math.log(1.0 / 12)
    assert(row.getString(1) == "x", row)
    assert(math.abs(row.getDouble(2) - BigDecimal(wantX)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, row)
    // tie on count is broken word-ascending: the cut is deterministic
    val tied = TextAnalysis.nbTrain(
      Seq((1L, "p q r", "z", true)).toDF("id", "text", "lbl", "tr"),
      "id", "text", "lbl", $"tr")
    val keptTied = TextAnalysis.nbPrune(tied, 2).counts.collect()
      .map(_.getString(1)).toSet
    assert(keptTied == Set("p", "q"), keptTied)
  }
}
