package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — Sennrich et al.
  * 2016's algorithm re-expressed as Spark aggregates.
  *
  * The classic scale trick makes this corpus-size-independent after one
  * pass: merges are trained on the DISTINCT-WORD table weighted by word
  * frequency (one explode + hash-agg over the corpus), so each merge
  * iteration touches |vocab| rows, not |corpus| tokens. Per iteration:
  * one hash aggregate over adjacent symbol pairs (weighted by word freq)
  * and ONE driver-read row (the argmax pair — a bounded scalar, the same
  * economics as the engine's other single-row stat reads); the merge
  * itself is a literal string substitution folded into the word table's
  * projection, so iteration k's plan is the base table + k codegen'd
  * `replace` calls — no shuffle, no growing state.
  *
  * Symbol-sequence encoding: the word's symbols joined by TWO spaces,
  * padded with ONE space each side (`"ab" → " a  b "`). A merge of (a, b)
  * is then the literal replacement `" a  b " → " ab "`: the pattern
  * consumes one space of each flanking separator and the replacement
  * restores it, so left-to-right non-overlapping `replace` — identical
  * semantics in Spark and ANSI SQL — implements exactly BPE's greedy
  * leftmost merge scan, and token boundaries can never false-match
  * (symbols contain no spaces).
  *
  * Determinism: pair counts are integer sums; argmax ties break on
  * (count DESC, lhs ASC, rhs ASC). No floating point anywhere.
  */
object Bpe {

  /** The initial symbol encoding of a word: chars joined by two spaces,
    * padded by one (`"ab" → " a  b "`). */
  def reprOf(word: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** One trained merge. */
  final case class Merge(step: Int, lhs: String, rhs: String, pairCount: Long)

  /** Train `merges` BPE merges over the whitespace-token vocabulary of
    * `textCol`. Returns the merge table in training order. */
  def train(docs: DataFrame, textCol: String, merges: Int): Seq[Merge] = {
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .cache() // reused once per merge iteration; bounded by |vocab|
    try {
      var repr: Column = reprOf(col("word"))
      val out = Seq.newBuilder[Merge]
      var step = 1
      var done = false
      while (step <= merges && !done) {
        val pairs = words
          .select(col("freq"), split(trim(repr), "  ").as("syms"))
          .filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i-1] AS lhs, syms[i] AS rhs))")).as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
          .limit(1)
          .collect()
        if (pairs.isEmpty) done = true
        else {
          val (a, b, c) = (pairs.head.getString(0), pairs.head.getString(1),
            pairs.head.getLong(2))
          out += Merge(step, a, b, c)
          repr = replace(repr, lit(s" $a  $b "), lit(s" $a$b "))
          step += 1
        }
      }
      out.result()
    } finally words.unpersist()
  }

  /** The merge table as a DataFrame (step, lhs, rhs, pair_count). */
  def trainFrame(spark: SparkSession, docs: DataFrame, textCol: String,
                 merges: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, merges)
      .map(m => (m.step.toLong, m.lhs, m.rhs, m.pairCount))
      .toDF("step", "lhs", "rhs", "pair_count")
  }

  /** Tokenize a WORD column with a trained merge list: the symbol sequence
    * after applying every merge in order (the same literal replace chain
    * as training — pure codegen, applied corpus-wide; callers explode the
    * text into words first). */
  def encode(wordCol: Column, merges: Seq[Merge]): Column = {
    val repr = merges.foldLeft(reprOf(wordCol)) { (r, m) =>
      replace(r, lit(s" ${m.lhs}  ${m.rhs} "), lit(s" ${m.lhs}${m.rhs} "))
    }
    split(trim(repr), "  ")
  }
}
