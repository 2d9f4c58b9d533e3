package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the `documents` table: an inverted index
  * (postings = one explode + hash-agg), BM25 query scoring, and TF-IDF
  * sparse cosine document similarity.
  *
  * This is the LEXICAL arm of the similarity-search family ([[Similarity]]
  * is the dense/embedding arm): production LLM-data pipelines use exactly
  * this shape for benchmark decontamination and retrieval-based curation
  * (reference analogy: the cleaning/QC surface of `run_transform.py` has no
  * retrieval; this is north-star breadth).
  *
  * Scale shape (100 TB corpus):
  *  - The postings table IS the classic distributed inverted index: one
  *    `explode` over tokens followed by a hash aggregate on (token, doc) —
  *    map-side partial counts absorb per-document repetition before the
  *    shuffle, so shuffle volume is bounded by DISTINCT (token, doc) pairs.
  *  - `df` (document frequency) is a second hash-agg over the postings,
  *    grouped by token only — the natural skew point (stopwords) is an
  *    aggregation, not a join, so a hot token costs one combiner row per
  *    partition, never a hot join partition.
  *  - Query scoring joins the BOUNDED query-term set to the postings on
  *    token; the query side is broadcast, so the corpus-sized side never
  *    shuffles. Per-(query, doc) scores are one more hash-agg; top-k is a
  *    window rank over per-query groups (query count is bounded).
  *  - TF-IDF pair similarity restricts the left side to the bounded probe
  *    set (broadcast) and drops ubiquitous tokens (`maxDf`) — the standard
  *    sparse-similarity guard that both removes stopword skew and caps the
  *    fan-out of the token self-join.
  *
  * Determinism: scores are double sums over ≤ a handful of matched terms;
  * both the engine and the DuckDB oracle round to 6 decimals before ranking
  * and rank ties break on doc_id, so the emitted rows are order-independent.
  */
object Search {

  /** BM25 constants (the standard Robertson/Lucene defaults). */
  val K1 = 1.2
  val B = 0.75

  private def toks(text: Column): Column = split(text, " ")

  /** Inverted index: one row per (token, doc_id) with the term frequency.
    * One explode + one hash aggregate; no joins, no skew-sensitive step. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).cast("double").as("tf"))

  /** Per-document token length (`dl`) — reuses the same tokenizer. */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(toks(col(textCol))).cast("double").as("dl"))

  /** BM25 top-k retrieval.
    *
    * @param queries (query_id, token) — the DISTINCT query-term relation;
    *                bounded (a query workload), broadcast into the join.
    * @param docs    the corpus (idCol, textCol).
    * @return (query_id, doc_id, bm25 rounded to 6, rank) — top `k` docs per
    *         query by rounded score, ties broken on doc_id.
    */
  def bm25TopK(queries: DataFrame, docs: DataFrame, idCol: String,
               textCol: String, k: Int): DataFrame = {
    val tf = postings(docs, idCol, textCol)
    val dl = docLengths(docs, idCol, textCol)
    // Corpus scalars (N, avgdl) as a one-row frame: stays declarative, and
    // the literal-free plan is reusable across query batches.
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    // idf per matched term (Lucene's non-negative variant).
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val termScore = idf * col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    val scored = broadcast(queries)
      .join(tf, "token")
      .join(df, "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(termScore), 6).as("bm25"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** TF-IDF sparse cosine similarity: bounded probe docs against the whole
    * corpus via a postings join on token (the sparse-vector dot product —
    * only co-occurring tokens ever meet). Tokens appearing in more than
    * `maxDfFrac` of documents are dropped on BOTH sides before the join:
    * the stopword guard that kills token skew and bounds join fan-out, and
    * it is corpus-size-relative so the same query is meaningful at any SF.
    *
    * Weights are ln(1 + tf) * ln(N / df) (classic log-tf · smooth-idf);
    * norms are per-document over the SAME pruned token space, so cosine is
    * exact within that space. Emits (probe_id, doc_id, cos rounded to 6,
    * rank ≤ k), probe ≠ doc.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                probeFilter: Column, maxDfFrac: Double, k: Int): DataFrame = {
    val tf = postings(docs, idCol, textCol)
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val df = tf.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("df"))
    val weighted = tf.join(df, "token").crossJoin(broadcast(n))
      .filter(col("df") <= lit(maxDfFrac) * col("n"))
      .select(col("token"), col("doc_id"),
        (log(lit(1.0) + col("tf")) * log(col("n") / col("df"))).as("w"))
    val norms = weighted.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val probes = weighted.join(norms, "doc_id")
      .filter(probeFilter)
      .select(col("doc_id").as("probe_id"), col("token"),
        col("w").as("pw"), col("nrm").as("pnrm"))
    val scored = broadcast(probes)
      .join(weighted, "token")
      .filter(col("probe_id") =!= col("doc_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      // pnrm is constant within a (probe_id, doc_id) group; max() carries it
      // through the agg deterministically.
      .agg(sum(col("pw") * col("w")).as("dot"), max(col("pnrm")).as("pnrm"))
      .join(norms, "doc_id")
      .select(col("probe_id"), col("doc_id"),
        round(col("dot") / (col("pnrm") * col("nrm")), 6).as("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion of a lexical and a dense retrieval arm — the
    * standard hybrid-search combiner (Cormack et al. 2009):
    * rrf(id) = Σ_arms 1/(rrfK + rank_arm(id)), arms where the id ranked.
    *
    * Both inputs are (query_id, id, rank) top-k lists — BOUNDED per query,
    * so the full-outer join is tiny regardless of corpus size (the heavy
    * lifting happened inside each arm). Score sums two fixed terms in a
    * fixed order, so fusion is bit-deterministic given the arm ranks.
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int,
              rrfK: Double = 60.0): DataFrame = {
    val fused = lex
      .select(col("query_id"), col("id"), col("rank").as("lex_rank"))
      .join(dense.select(col("query_id"), col("id"),
        col("rank").as("dense_rank")), Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("dense_rank")), lit(0.0)), 6)
          .as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
