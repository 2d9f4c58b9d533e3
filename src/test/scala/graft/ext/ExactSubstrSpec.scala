package graft.ext

import graft.SparkSpec
import graft.plans.PlanGuard

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // token alphabet a..z keeps windows readable; minLen = 3 for the fixture
  private def tokens(s: String) = s.trim

  private def docs = Seq(
    // doc 1 and doc 2 share the verbatim run "c d e f g" (5 tokens) —
    // with minLen=3 that is windows cde, def, efg, merging to span [2,7)
    // in doc 1 and [0,5) in doc 2
    (1L, tokens("a b c d e f g h")),
    (2L, tokens("c d e f g x y z")),
    // doc 3 self-repeats "p q r" at positions 0 and 4 — two spans
    (3L, tokens("p q r s p q r t")),
    // doc 4 shares nothing >= 3 tokens long with anything
    (4L, tokens("m n o m n u o m")),
    // doc 5 is shorter than minLen — filtered out, never a window
    (5L, tokens("a b"))
  ).toDF("doc_id", "text")

  private def spans(minLen: Int = 3) =
    ExactSubstr.duplicatedSpans(docs, "doc_id", "text", minLen)

  test("duplicated spans are maximal, 0-based, end-exclusive") {
    val got = spans().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 2L, 7L, 5L),
      (2L, 0L, 5L, 5L),
      (3L, 0L, 3L, 3L), // self-repeat counts: "p q r" occurs twice in doc 3
      (3L, 4L, 7L, 3L)))
  }

  test("adjacent coverage merges into one span; a 1-token gap does not") {
    // "a b c d e f" duplicated in full across two docs: every 3-window is
    // shared, coverage merges to a single [0,6) span per doc
    val full = ExactSubstr.duplicatedSpans(
      Seq((10L, "a b c d e f"), (11L, "a b c d e f")).toDF("doc_id", "text"),
      "doc_id", "text", minLen = 3).collect()
    assert(full.length == 2 &&
      full.forall(r => r.getLong(1) == 0L && r.getLong(2) == 6L))
    // same duplicated prefix+suffix but a unique middle token in one doc:
    // two separate spans around the hole
    val holed = ExactSubstr.duplicatedSpans(
      Seq((20L, "a b c Z d e f"), (21L, "a b c d e f"),
        (22L, "a b c q d e f")).toDF("doc_id", "text"),
      "doc_id", "text", minLen = 3)
      .filter($"doc_id" === 20L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(holed == Set((0L, 3L), (4L, 7L)))
  }

  test("a doc with no duplicated window emits nothing") {
    assert(spans().filter($"doc_id" === 4L || $"doc_id" === 5L).count() == 0)
  }

  test("removeDuplicates keeps exactly the canonical occurrence") {
    val cleaned = ExactSubstr.removeDuplicates(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 owns the canonical "c d e f g" windows (min doc) — untouched
    assert(cleaned(1L) == (("a b c d e f g h", 8L, 0L)))
    // doc 2 loses the duplicated run, keeps its unique tail
    assert(cleaned(2L) == (("x y z", 8L, 5L)))
    // doc 3's self-repeat at pos 4 is non-canonical — stripped
    assert(cleaned(3L) == (("p q r s t", 8L, 3L)))
    // doc 4 shares nothing; doc 5 is below minLen — both pass through
    assert(cleaned(4L)._3 == 0L && cleaned(5L) == (("a b", 2L, 0L)))
  }

  test("a fully-duplicated non-canonical doc survives as empty text") {
    val cleaned = ExactSubstr.removeDuplicates(
      Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text"),
      "doc_id", "text", minLen = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) == "a b c d" && cleaned(2L) == "")
  }

  test("spansAgainstStore finds prefix contamination without store shuffle") {
    val corpus = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val store = ExactSubstr.windowStore(corpus, "doc_id", "text", minLen = 3)
    // batch doc 10 = corpus prefix "a b c d" + a novel tail: the prefix
    // windows hit the store, the tail's do not → one span [0,4)
    val batch = Seq(
      (10L, "a b c d NOVEL1 NOVEL2 NOVEL3"),
      (11L, "entirely new words only here")).toDF("doc_id", "text")
    val spans = ExactSubstr.spansAgainstStore(batch, store,
      "doc_id", "text", minLen = 3)
    val got = spans.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 0L, 4L)))
    PlanGuard.requireNotInFinalPlan(spans, "SortMergeJoin",
      "the window store must be scan-only, never shuffled")
  }

  test("plan is shuffle-sort on the fingerprint, never all-pairs") {
    val df = spans()
    PlanGuard.requireNotInPlan(df, "CartesianProduct",
      "ExactSubstr must never take the all-pairs product")
    PlanGuard.requireNotInPlan(df, "BroadcastNestedLoopJoin",
      "ExactSubstr must never nested-loop join")
    // the duplicated-fingerprint confirm is a semi-join (AQE-skew-
    // splittable), not a window over the raw occurrence stream
    PlanGuard.requireInPlan(df, "LeftSemi",
      "duplicated fingerprints must semi-join back to positions")
    PlanGuard.requireInPlan(df, "HashAggregate",
      "occurrence counting must partial-aggregate map-side")
  }
}
