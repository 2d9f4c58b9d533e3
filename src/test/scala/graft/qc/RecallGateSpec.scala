package graft.qc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The RecallGate must be LOAD-BEARING: these specs drive each gate down its
  * failure path with deliberately broken "approximate" inputs and assert the
  * in-query require fires — proving a recall collapse, a precision breach,
  * or a set divergence cannot pass the driver's gate silently. */
class RecallGateSpec extends SparkSpec {

  import spark.implicits._

  private def exact =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")

  test("passing gate returns exact rows + TRUE booleans") {
    val approx = exact // perfect retrieval
    val gated = RecallGate.gate(exact, approx, Seq("doc_a", "doc_b"),
      recallFloor = 0.9, what = "spec")
    assert(gated.count() == 4)
    val r = gated.select(col("recall_ok"), col("precision_ok")).distinct().collect()
    assert(r.length == 1 && r(0).getBoolean(0) && r(0).getBoolean(1))
  }

  test("recall collapse fails the gate (deliberate failure)") {
    val approx = exact.limit(1) // retrieval collapsed to one pair
    val e = intercept[IllegalArgumentException] {
      RecallGate.gate(exact, approx, Seq("doc_a", "doc_b"),
        recallFloor = 0.9, what = "spec-collapse")
    }
    assert(e.getMessage.contains("recall"))
  }

  test("spurious row fails the precision gate (deliberate failure)") {
    val approx = exact.unionByName(
      Seq((9L, 9L)).toDF("doc_a", "doc_b")) // row outside the exact set
    val e = intercept[IllegalArgumentException] {
      RecallGate.gate(exact, approx, Seq("doc_a", "doc_b"),
        recallFloor = 0.5, what = "spec-spurious")
    }
    assert(e.getMessage.contains("outside the exact set"))
  }

  test("spurious row passes when precision is not claimed (ANN top-k shape)") {
    val approx = exact.unionByName(Seq((9L, 9L)).toDF("doc_a", "doc_b"))
    val gated = RecallGate.gate(exact, approx, Seq("doc_a", "doc_b"),
      recallFloor = 0.5, what = "spec-ann", requireExactPrecision = false)
    assert(!gated.columns.contains("precision_ok"))
    assert(gated.count() == 4)
  }

  test("empty ground truth fails loudly, never divides by zero") {
    val e = intercept[IllegalArgumentException] {
      RecallGate.gate(exact.limit(0), exact, Seq("doc_a", "doc_b"),
        recallFloor = 0.5, what = "spec-empty")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("equivalent: identical sets pass, divergent sets fail both ways") {
    assert(RecallGate.equivalent(exact, exact, Seq("doc_a", "doc_b"), "spec-eq"))
    val missing = exact.limit(3)
    val eA = intercept[IllegalArgumentException] {
      RecallGate.equivalent(exact, missing, Seq("doc_a", "doc_b"), "spec-neq")
    }
    assert(eA.getMessage.contains("sets differ"))
    val extra = exact.unionByName(Seq((9L, 9L)).toDF("doc_a", "doc_b"))
    val eB = intercept[IllegalArgumentException] {
      RecallGate.equivalent(exact, extra, Seq("doc_a", "doc_b"), "spec-neq2")
    }
    assert(eB.getMessage.contains("sets differ"))
  }

  test("equivalentFingerprint: equal multisets pass, a changed row fails") {
    val a = spark.range(4000).select(col("id"), (col("id") * 3).as("v"))
    assert(RecallGate.equivalentFingerprint(
      Seq((a, a.repartition(7), "spec-fp-eq")), Seq("id", "v")))
    // one changed value — full coverage, no slice to hide in
    val b = a.withColumn("v",
      when(col("id") === 1234, lit(-1L)).otherwise(col("v")))
    val e = intercept[IllegalArgumentException] {
      RecallGate.equivalentFingerprint(Seq((a, b, "spec-fp-neq")),
        Seq("id", "v"))
    }
    assert(e.getMessage.contains("fingerprints differ"))
  }

  test("equivalentFingerprint: multiset semantics catch a duplicated row") {
    val a = spark.range(100).select(col("id"))
    // same SET of ids, but one row duplicated — a distinct-then-join slice
    // gate would pass this; the multiset fingerprint must not
    val dup = a.unionByName(a.filter(col("id") === 7))
    val e = intercept[IllegalArgumentException] {
      RecallGate.equivalentFingerprint(Seq((a, dup, "spec-fp-dup")),
        Seq("id"))
    }
    assert(e.getMessage.contains("fingerprints differ"))
  }

  test("equivalentFingerprint: an empty side fails loudly as vacuous") {
    val a = spark.range(10).select(col("id"))
    val e = intercept[IllegalArgumentException] {
      RecallGate.equivalentFingerprint(Seq((a, a.limit(0), "spec-fp-empty")),
        Seq("id"))
    }
    assert(e.getMessage.contains("vacuous"))
    // several gates batch into one job; the failing tag is named
    val e2 = intercept[IllegalArgumentException] {
      RecallGate.equivalentFingerprint(Seq(
        (a, a, "spec-fp-good"),
        (a, a.filter(col("id") =!= 3), "spec-fp-bad")), Seq("id"))
    }
    assert(e2.getMessage.contains("spec-fp-bad"))
  }
}
