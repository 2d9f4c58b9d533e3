package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT SUBSTRING deduplication — the ExactSubstr half of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better", public
  * literature), the standard companion to the MinHash screen
  * ([[Dedup.minHashSignaturesWords]], q27): emit, per document, the MAXIMAL
  * token spans whose every `minLen`-token substring occurs verbatim
  * somewhere else in the corpus (another document OR another position of
  * the same document — self-repeats are training-data duplication too).
  *
  * The reference paper builds one suffix array over the concatenated
  * corpus; the distributed equivalence this implementation uses is that a
  * position is covered by a duplicated substring of length ≥ `minLen` iff
  * some `minLen`-token window containing it occurs ≥ 2 times — so
  * stride-1 fixed-width windows, fingerprinted and sort-shuffled by
  * fingerprint, reproduce exactly the ≥-minLen duplicated-span coverage a
  * suffix array would report, without ever materialising the corpus on
  * one machine.
  *
  * Scale shape (the suffix-array sort becomes a shuffle):
  *  - the window generator is `explode(sequence)` + `slice` — pure codegen
  *    builtins, O(total corpus tokens) rows, never all-pairs;
  *  - duplicated fingerprints come from `groupBy(wkey).count` — partial
  *    (map-side) aggregation absorbs hot boilerplate keys BEFORE the
  *    shuffle, which a `count() over (partition by wkey)` window could
  *    not (a window function must co-locate every occurrence of a hot
  *    key in one partition; the agg + join formulation lets AQE split a
  *    skewed join partition instead);
  *  - the join back is a semi-join on the fingerprint (shuffle-sort,
  *    AQE-skew-splittable), then span assembly is a per-document
  *    lag/running-sum window over the few duplicated positions — bounded
  *    by coverage, not corpus size.
  *
  * Fingerprints are md5 of the space-joined window (deterministic across
  * engines, so a DuckDB oracle reproduces them bit-for-bit; 128-bit, so
  * collisions are not a practical concern — and the same trade q100's
  * passage stats already make).
  *
  * Output: (idCol, span_start, span_end, span_tokens) with token offsets
  * 0-based, end exclusive — `span_end - span_start >= minLen`.
  */
object ExactSubstr {

  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int = 50): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    // one row per stride-1 window: (doc, pos, fingerprint)
    val wins = docs
      .select(col(idCol).as("doc"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= minLen)
      .select(col("doc"),
        explode(sequence(lit(1), size(col("w")) - (minLen - 1), lit(1)))
          .as("i"),
        col("w"))
      .select(col("doc"), (col("i") - 1).cast("long").as("pos"),
        md5(array_join(slice(col("w"), col("i"), lit(minLen)), " "))
          .as("wkey"))
    // fingerprints seen >= 2 times anywhere in the corpus (map-side
    // combine makes the hot boilerplate keys cheap)
    val dupKeys = wins.groupBy(col("wkey"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select("wkey")
    val dupPos = wins.join(dupKeys, Seq("wkey"), "left_semi")
      .select("doc", "pos")
    // merge covered intervals [pos, pos+minLen) into maximal spans:
    // windows are fixed-width and sorted by start, so the running
    // coverage end is simply lag(pos) + minLen — a gap starts a new span
    val byDoc = Window.partitionBy("doc").orderBy("pos")
    dupPos
      .withColumn("gap",
        when(col("pos") - lag("pos", 1).over(byDoc) > minLen, 1L)
          .otherwise(lit(0L)))
      .withColumn("span_id",
        sum(when(lag("pos", 1).over(byDoc).isNull, 1L).otherwise(col("gap")))
          .over(byDoc))
      .groupBy(col("doc"), col("span_id"))
      .agg(min("pos").as("span_start"),
        (max("pos") + minLen).as("span_end"))
      .select(col("doc").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }
}
