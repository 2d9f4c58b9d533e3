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

  /** One row per stride-1 window: (doc, pos, fingerprint). */
  private def windows(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    docs
      .select(col(idCol).as("doc"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= minLen)
      .select(col("doc"),
        explode(sequence(lit(1), size(col("w")) - (minLen - 1), lit(1)))
          .as("i"),
        col("w"))
      .select(col("doc"), (col("i") - 1).cast("long").as("pos"),
        md5(array_join(slice(col("w"), col("i"), lit(minLen)), " "))
          .as("wkey"))
  }

  /** Merge covered intervals [pos, pos+minLen) into maximal spans:
    * windows are fixed-width and sorted by start, so the running coverage
    * end is simply lag(pos) + minLen — a gap starts a new span. */
  private def mergeSpans(dupPos: DataFrame, idCol: String,
                         minLen: Int): DataFrame = {
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

  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int = 50): DataFrame = {
    val wins = windows(docs, idCol, textCol, minLen)
    // fingerprints seen >= 2 times anywhere in the corpus (map-side
    // combine makes the hot boilerplate keys cheap)
    val dupKeys = wins.groupBy(col("wkey"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select("wkey")
    val dupPos = wins.join(dupKeys, Seq("wkey"), "left_semi")
      .select("doc", "pos")
    mergeSpans(dupPos, idCol, minLen)
  }

  /** The once-per-corpus ingest artifact for the incremental screen: the
    * corpus's DISTINCT window fingerprints (one string column `wkey`) —
    * persist it once, probe it every batch. */
  def windowStore(corpus: DataFrame, idCol: String, textCol: String,
                  minLen: Int = 50): DataFrame =
    windows(corpus, idCol, textCol, minLen).select("wkey").distinct()

  /** INCREMENTAL ExactSubstr screen (the daily-cadence shape, q102/q104's
    * contract applied to substrings): today's batch is screened for token
    * spans that already appear VERBATIM in the persisted corpus — the
    * corpus is never re-tokenized, never re-fingerprinted, and never
    * shuffled. The batch's distinct fingerprints broadcast INTO the store
    * scan (batch-bounded by construction), the matched keys broadcast back
    * onto the batch's positions, and span assembly is per-batch-doc window
    * work. At 100 TB of corpus the store contributes exactly one
    * column-pruned parquet scan. Output: the batch's contaminated spans,
    * same schema as [[duplicatedSpans]]. */
  def spansAgainstStore(batch: DataFrame, store: DataFrame, idCol: String,
                        textCol: String, minLen: Int = 50): DataFrame = {
    val wins = windows(batch, idCol, textCol, minLen)
    val hits = store.join(broadcast(wins.select("wkey").distinct()),
      Seq("wkey")).select("wkey")
    val dupPos = wins.join(broadcast(hits), Seq("wkey"))
      .select("doc", "pos")
    mergeSpans(dupPos, idCol, minLen)
  }

  /** The REMOVAL half of ExactSubstr (Lee et al. 2022 keep-one policy):
    * strip every duplicated-window occurrence EXCEPT its corpus-wide
    * canonical one — the lexicographically-first (doc, pos) per
    * fingerprint — and reassemble each document's surviving tokens in
    * order. Exactly one copy of every duplicated `minLen`-window
    * survives (at its canonical site; overlapping windows can force
    * additional removal around it, the inherent span-union semantics).
    * Documents stripped to nothing survive as EMPTY text — dropping
    * them is a separate curation decision ([[TextAnalysis]] precedent).
    *
    * Scale shape: the canonical pick is ONE partial-aggregating
    * `min(struct(doc, pos))` per fingerprint (hot boilerplate keys
    * combine map-side); the non-canonical occurrences expand to covered
    * token indexes (≤ occurrences × minLen rows — bounded by corpus
    * tokens) and anti-join the exploded token stream; reassembly is the
    * boilerplate remover's order-preserving collect_list + array_sort.
    * Everything shuffles by (doc) or (wkey) — never all-pairs.
    *
    * Output: (idCol, clean_text, n_tokens, n_removed).
    */
  def removeDuplicates(docs: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 50): DataFrame = {
    val wins = windows(docs, idCol, textCol, minLen)
    val canon = wins.groupBy(col("wkey"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc"), col("pos"))).as("canon"))
      .filter(col("occ") >= 2)
      .select(col("wkey"),
        col("canon.doc").as("cdoc"), col("canon.pos").as("cpos"))
    val badTokens = wins.join(canon, Seq("wkey"))
      .filter(!(col("doc") === col("cdoc") && col("pos") === col("cpos")))
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + (minLen - 1))).as("ti"))
      .distinct()
    val toks = docs
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("ti", "tok")))
      .select(col("doc"), col("ti").cast("long").as("ti"), col("tok"))
    val kept = toks.join(badTokens, Seq("doc", "ti"), "left_anti")
      .groupBy(col("doc"))
      .agg(
        array_join(expr("transform(array_sort(collect_list(" +
          "struct(ti, tok))), x -> x.tok)"), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs
      .select(col(idCol).as("doc"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }
}
