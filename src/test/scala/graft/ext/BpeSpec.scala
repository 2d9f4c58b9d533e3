package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge order follows weighted pair counts with lexical tie-break") {
    // words: aa×3, ab×1, b×1 → pairs: (a,a)=3, (a,b)=1
    val docs = Seq("aa ab aa", "aa b").toDF("text")
    val m = Bpe.train(docs, "text", merges = 2)
    assert(m.map(x => (x.lhs, x.rhs, x.pairCount)) ==
      Seq(("a", "a", 3L), ("a", "b", 1L)))
  }

  test("greedy leftmost: 'aaa' yields one (a,a) pair after the first merge") {
    val docs = Seq("aaa").toDF("text")
    val m = Bpe.train(docs, "text", merges = 2)
    assert(m.head.lhs == "a" && m.head.rhs == "a" && m.head.pairCount == 2L)
    // after merging (a,a): 'aaa' → [aa, a]; the only remaining pair
    assert(m(1).lhs == "aa" && m(1).rhs == "a" && m(1).pairCount == 1L)
  }

  test("train stops early when no pairs remain") {
    val docs = Seq("ab ab").toDF("text")
    val m = Bpe.train(docs, "text", merges = 5)
    assert(m.size == 1) // after (a,b)→ab every word is a single symbol
    assert(m.head.pairCount == 2L)
  }

  test("encode applies merges in order, greedy per word") {
    val docs = Seq("aab aa").toDF("text")
    val m = Bpe.train(docs, "text", merges = 1) // merge (a,a)
    val enc = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .select(col("word"), Bpe.encode(col("word"), m).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc("aab") == List("aa", "b"))
    assert(enc("aa") == List("aa"))
  }

  test("merged symbols never false-match across boundaries") {
    // 'xa b' must not merge into 'xab' when the merge is (a, b):
    // words are xa×2 b×2 ab×1 → top pair is (x,a)=2... use explicit corpus:
    val docs = Seq("ab ab ab", "xa b").toDF("text")
    val m = Bpe.train(docs, "text", merges = 1)
    assert((m.head.lhs, m.head.rhs) == ("a", "b")) // ab×3 beats (x,a)×1
    val enc = docs.select(explode(split(col("text"), " ")).as("word"))
      .select(col("word"), Bpe.encode(col("word"), m).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc("xa") == List("x", "a")) // untouched — no 'a b' inside a word
    assert(enc("b") == List("b"))
    assert(enc("ab") == List("ab"))
  }
}
