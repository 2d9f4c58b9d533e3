package graft.ext

import graft.SparkSpec

/** [[TextAnalysis.repetitionSignals]] — Gopher repetition rules on
  * hand-computable fixtures (position-union coverage semantics). */
class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: (Long, String)*) =
    TextAnalysis.repetitionSignals(rows.toDF("id", "text"), "id", "text",
        nTop = 2, nDup = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap

  test("top 2-gram coverage is a position union, not count x len") {
    // "a b a b a b": top 2-gram "a b" occurs 3x at pos 0,2,4 (the
    // overlapping "b a" occurs only 2x); union covers ALL 6 tokens
    // -> 6/6 chars. count x len would say 3*2=6 too, but for
    // "x x x x" top gram "x x" occurs 3x overlapping: union covers
    // 4 tokens = 4/4 chars = 1.0 where count x len says 6/4 = 1.5.
    val out = run(1L -> "a b a b a b", 2L -> "x x x x")
    assert(out(1L) == (("a b", 1.0, 0.0)))
    assert(out(2L) == (("x x", 1.0, 0.0)))
  }

  test("tie on count breaks to the lexicographically smallest gram") {
    // "b a c a": grams "b a", "a c", "c a" each once -> "a c" wins
    val out = run(1L -> "b a c a")
    assert(out(1L)._1 == "a c")
  }

  test("duplicated 5-gram coverage unions overlapping spans") {
    // 8 tokens: "p q r s t p q r s t" (10 tokens) — 5-gram "p q r s t"
    // occurs at pos 0 and 5 (disjoint): covers all 10 tokens -> 1.0.
    val dup = run(1L -> "p q r s t p q r s t")
    assert(dup(1L)._3 == 1.0)
    // "u v w x y z u v w x y z" (12 tokens): duplicated 5-grams
    // "u v w x y" (pos 0,6), "v w x y z" (pos 1,7): union covers all
    // 12 positions -> 1.0; a clean doc scores 0.
    val mix = run(1L -> "u v w x y z u v w x y z",
      2L -> "one two three four five six seven")
    assert(mix(1L)._3 == 1.0)
    assert(mix(2L)._3 == 0.0)
  }

  test("partial duplication yields an exact rational fraction") {
    // 12 tokens, each 1 char: "a b c d e m n o p q a1 b1"? — use a
    // doc where one 5-gram repeats and tail is unique:
    // "k l m n o k l m n o w z" (12 tokens): dup "k l m n o" covers
    // pos 0-4 and 5-9 = 10 tokens of 12; all tokens 1 char -> 10/12.
    val out = run(1L -> "k l m n o k l m n o w z")
    assert(math.abs(out(1L)._3 - math.rint(10.0 / 12.0 * 1e6) / 1e6) < 1e-9)
  }

  test("short docs (fewer tokens than n) score zero with empty top gram") {
    val out = run(1L -> "solo")
    assert(out(1L) == (("", 0.0, 0.0)))
  }
}
