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

  test("dsirWeights ranks target-like raw docs above off-domain ones") {
    // target docs speak "alpha"; raw docs 10/11 speak alpha too, 12/13
    // speak "zeta" — the alpha-speaking raw docs must score higher.
    val df = Seq(
      (1L, "alpha beta alpha gamma", true),
      (2L, "alpha alpha beta beta", true),
      (10L, "alpha beta alpha beta", false),
      (11L, "alpha gamma beta alpha", false),
      (12L, "zeta eta theta zeta", false),
      (13L, "zeta zeta eta iota", false))
      .toDF("id", "text", "tgt")
    val w = Curation.dsirWeights(df, "id", "text", $"tgt")
      .as[(Long, Double)].collect().toMap
    // only raw docs are scored
    assert(w.keySet == Set(10L, 11L, 12L, 13L), w)
    assert(math.min(w(10L), w(11L)) > math.max(w(12L), w(13L)), w)
    // deterministic under repartitioning (round-6 fixed point)
    val again = Curation.dsirWeights(df.repartition(7), "id", "text", $"tgt")
      .as[(Long, Double)].collect().toMap
    assert(again == w)
  }

  test("temperatureMixThresholds up-weights small groups, integer-exact") {
    // 6400 'big' + 100 'small': α=1/2 weights ⌊√6400⌋=80 vs ⌊√100⌋=10
    val df = spark.range(6500)
      .select(col("id"), when(col("id") < 6400, "big").otherwise("small").as("g"))
    val th = Curation.temperatureMixThresholds(df, "g", 1, 2) // 50% budget
    // target=3250; rate_big = 3250*80/(90*6400) = 0.4514; rate_small =
    // 3250*10/(90*100) = 3.61 → capped at 1.0
    val unit = BigInt(4294967296L)
    assert(th("small") == unit)
    assert(th("big") == BigInt(3250) * 80 * unit / (BigInt(90) * 6400))
    val kept = df.filter(
        Curation.temperatureMixKeep(col("g"), col("id"), th, "t1"))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(kept("small") == 100L) // rate 1.0 keeps every row
    // big keeps ≈ 45.1% — hash sampling is ±few-% at n=6400
    assert(kept("big") > 2600 && kept("big") < 3200)
    // stability: the keep decision is a row property, not a partition one
    val again = df.repartition(7)
      .filter(Curation.temperatureMixKeep(col("g"), col("id"), th, "t1"))
      .count()
    assert(again == kept.values.sum)
  }

  test("sourceOverlapMatrix: containment is directional, Jaccard exact") {
    import spark.implicits._
    // a ⊂ b (every a-doc duplicated into b), c disjoint from both
    val docs = Seq(
      ("a", "the quick brown fox jumps"),
      ("a", "pack my box with jugs"),
      ("b", "the quick brown fox jumps"),
      ("b", "pack my box with jugs"),
      ("b", "sphinx of black quartz judge"),
      ("c", "zzzz yyyy xxxx wwww vvvv")
    ).toDF("src", "text")
    val m = Curation.sourceOverlapMatrix(docs, "src", "text", k = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // a fully contained in b: a_in_b = 1.0, jaccard = |a|/|b| < 1
    val (jab, aInB, bInA) = m(("a", "b"))
    assert(aInB == 1.0 && bInA < 1.0 && jab == bInA)
    // disjoint source never appears (no shared shingle → no row)
    assert(!m.contains(("a", "c")) && !m.contains(("b", "c")))
    // pair key is ordered once: no ("b","a") mirror row
    assert(!m.contains(("b", "a")))
    // stable under repartitioning (exact set arithmetic, no sampling)
    val again = Curation.sourceOverlapMatrix(docs.repartition(5), "src",
      "text", k = 4).collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(again == m)
    // plan: the intersection joins on the shingle key with a hash join —
    // never a cartesian product over sources
    val plan = Curation.sourceOverlapMatrix(docs, "src", "text", k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("weightedSampleKey: A-ES key is a stable row property, monotone in weight") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, 1.0 + (i % 7))).toDF("id", "w")
    val keyed = rows.select(col("id"),
      Curation.weightedSampleKey(col("id"), col("w"), "t").as("k"))
    // row property: identical under repartitioning
    val a = keyed.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = keyed.repartition(7).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    // keys are strictly negative (u in (0,1) ⇒ ln(u) < 0, w > 0)
    a.values.foreach(k => assert(k < 0))
    // monotone in weight for a fixed row: a heavier copy of the same id
    // always outranks the lighter one (ln(u)/w grows toward 0 as w grows)
    val mono = rows.select(
      Curation.weightedSampleKey(col("id"), col("w"), "t").as("lo"),
      Curation.weightedSampleKey(col("id"), col("w") * 10, "t").as("hi"))
      .collect()
    mono.foreach(r => assert(r.getDouble(1) > r.getDouble(0)))
    // weighted selection actually biases: weight-by-id-parity, the heavy
    // half should take well over half the top-50 slots
    val heavy = rows.select(col("id"),
      Curation.weightedSampleKey(col("id"),
        when(col("id") % 2 === 0, 50.0).otherwise(1.0), "t").as("k"))
      .orderBy(col("k").desc, col("id").asc).limit(50)
      .filter(col("id") % 2 === 0).count()
    assert(heavy >= 40, s"heavy-weight rows took only $heavy of 50 slots")
  }
}
