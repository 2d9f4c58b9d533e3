package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FUZZY KEY MATCHING by deletion neighborhoods (the SymSpell trick,
  * Garbe 2012, public): two strings within Levenshtein distance 1 always
  * share a member of their deletion neighborhoods — {s} ∪ {s minus one
  * character} — because a substitution shares the deletion at the
  * differing position and an insertion/deletion makes one string a
  * deletion variant of the other. So candidate generation is a
  * VARIANT-BUCKET self-join (banded, like MinHash — never all-pairs):
  * each row explodes into |s|+1 variants, pairs sharing a bucket are
  * verified with one exact `levenshtein` evaluation. At 100 TB the
  * candidate volume tracks true near-matches plus hash-bucket noise,
  * not n²; the explode is shuffle-free generate, the join shuffles on
  * the variant string. The same construction extends to distance k with
  * k-deletion neighborhoods (|s| choose k variants — the SymSpell space
  * trade); distance 1 is the entity-resolution workhorse (one typo). */
object Fuzzy {

  /** All (id_a < id_b) pairs whose strings are within Levenshtein
    * distance 1. Output: (id_a, id_b, dist). */
  def editDistance1Pairs(df: DataFrame, idCol: String,
                         strCol: String): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(strCol).as("s"))
    val variants = rows
      .withColumn("v", explode(expr(
        "array_union(array(s), transform(sequence(1, length(s)), " +
          "i -> concat(substring(s, 1, i-1), substring(s, i+1, length(s)))))")))
      .select(col("id"), col("s"), col("v"))
    variants.as("a")
      .join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("sa"), col("b.s").as("sb"))
      .distinct() // a pair can share several variants
      .filter(levenshtein(col("sa"), col("sb")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).as("dist"))
  }
}
