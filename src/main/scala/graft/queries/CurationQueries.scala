package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, TextAnalysis}
import graft.model.Tables

/** Training-data curation queries under the DuckDB oracle gate: PII
  * redaction, deterministic splits, repetition stats, sequence packing,
  * and benchmark contamination (SURVEY §2.11 [N] north-star ops).
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Deterministic PII planted per doc so redaction is exercised on every
    * row even though the synthetic corpus contains none; the oracle builds
    * the identical string. */
  private def withPlantedPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        lit(" reach user"), col("doc_id").cast("string"),
        lit("@example.com, tel 555-123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(", host 10.1."), (col("doc_id") % 256).cast("string"),
        lit(".7")).as("t"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII detection counts + redacted text. Redaction is a chained
    // regexp_replace — one codegen projection, no shuffle.
    "q68_pii_redact" -> ((s, dir) => {
      withPlantedPii(t(s, dir, "documents")).select(
        col("doc_id"),
        Curation.piiCount(col("t"), Curation.EmailRe).as("n_email"),
        Curation.piiCount(col("t"), Curation.PhoneRe).as("n_phone"),
        Curation.piiCount(col("t"), Curation.Ipv4Re).as("n_ip"),
        Curation.redactPii(col("t")).as("clean_text"))
    }),

    // Hash-stable train/val/test assignment — reproducible per row under
    // repartitioning/appends, unlike rand() sampling.
    "q69_split_assign" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), Curation.splitAssign(col("doc_id")).as("split"))
    }),

    // Repeated-token ratio + top-token share (boilerplate signals).
    "q70_repetition" -> ((s, dir) => {
      Curation.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Context-window packing via two-phase distributed prefix sum (small
    // bucketSize so sf0.01 exercises multiple buckets + the offset table).
    "q71_seq_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.packSequences(docs, "doc_id",
        TextAnalysis.nTokens(col("text")), maxTokens = 512, bucketSize = 64)
    }),

    // Stratified deterministic sampling: 50% of English docs, 20% of the
    // rest, decided per row by a salted hash — reproducible under
    // repartition/appends; different salts give independent samples.
    "q77_stratified_sample" -> ((s, dir) => {
      val keep = when(col("lang") === "en",
        Curation.hashSampleExpr(col("doc_id"), 0.5, "s1"))
        .otherwise(Curation.hashSampleExpr(col("doc_id"), 0.2, "s1"))
      t(s, dir, "documents").filter(keep).select(col("doc_id"), col("lang"))
    }),

    // Per-source quota: at most 15 docs per crawl source (ordered by id) —
    // the guard against one domain dominating the training mix.
    "q78_source_cap" -> ((s, dir) => {
      Curation.capPerKey(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        keyCol = "source", orderCol = "doc_id", k = 15)
    }),

    // Overlapping token-window chunking (64-token chunks, stride 48):
    // shuffle-free generate+slice, the shape RAG/pre-training tokenization
    // fans out from.
    "q87_chunking" -> ((s, dir) => {
      Curation.chunkDocuments(t(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 64, stride = 48)
    }),

    // Keyword extraction: top-3 distinctive terms per doc (highest tf among
    // terms appearing in ≤ 50 docs — rational df suppression instead of
    // log-idf so the oracle ranks identically).
    "q79_distinctive_terms" -> ((s, dir) => {
      TextAnalysis.distinctiveTerms(t(s, dir, "documents"),
        "doc_id", "text", maxDf = 50, k = 3)
    }),

    // Near-dup-safe splits: every doc gets its near-dup CLUSTER
    // representative's split, so paraphrases never straddle train/test
    // (same pair graph as q59; the oracle re-derives clusters by
    // recursive CTE and applies the split rule to the representative).
    "q92_leakage_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.2)
      Curation.leakageSafeSplit(docs, pairs, "doc_id")
    }),

    // EXACT heavy hitters, sketch + verify: Misra-Gries candidates (fixed
    // k-counter state, superset guaranteed for minShare > 1/k), then an
    // exact broadcast-semi-join re-count — never a full groupBy over every
    // distinct token. The oracle computes the same answer the exhaustive way.
    "q93_heavy_hitters" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      Curation.heavyHitters(toks, "tok", minShare = 0.002, k = 1024)
    }),

    // Canonical text cleanup (native one-walk codegen expression): NFC
    // composition + control-char strip + whitespace collapse + trim. The
    // planted suffix carries a decomposed é, a BEL, a tab and edge spaces
    // so every row exercises every rule.
    "q94_normalize" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        Curation.normalizeText(
          concat(lit("  cafe\u0301\u0007 "), col("text"),
            lit("\tfine\u0301  "))).as("clean_text"))
    }),

    // Crawl-domain blocklist: URL host extraction + broadcast anti-join
    // (blocklists are tiny; the corpus side never shuffles).
    "q95_domain_blocklist" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("https://"),
          element_at(array(lit("ok-site.org"), lit("spam.example.com"),
            lit("news.example.io"), lit("mirror.example.net")),
            (col("doc_id") % 4 + 1).cast("int")),
          lit("/page/"), col("doc_id").cast("string")).as("url"))
      val blocked = docs.sparkSession.createDataFrame(
        Seq(Tuple1("spam.example.com"), Tuple1("mirror.example.net")))
        .toDF("domain")
      Curation.filterBlockedDomains(docs, "url", blocked, "domain")
        .select(col("doc_id"), col("url"),
          Curation.domainOf(col("url")).as("domain"))
    }),

    // Eval-leakage guard: training docs sharing an 8-token shingle with the
    // benchmark fixture (docs with doc_id % 50 = 0); benchmark hash set is
    // broadcast so the corpus side never shuffles.
    "q72_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.contamination(
        train = docs.filter(col("doc_id") % 50 =!= 0),
        bench = docs.filter(col("doc_id") % 50 === 0),
        idCol = "doc_id", textCol = "text", n = 8)
    }),

    // TEMPERATURE-WEIGHTED LANGUAGE MIXING (q140): the α = 1/2 sampling
    // rule multilingual pipelines use to up-weight low-resource languages
    // (weight ∝ n^α instead of ∝ n) at a 60% overall budget. Thresholds
    // are computed in INTEGER arithmetic (⌊√n⌋ weights, BigInt division
    // into 2⁻³² hash units) so the oracle reproduces every boundary
    // bit-for-bit; the keep decision is the salted-md5 row property —
    // stable under repartition and appends. The in-query gate asserts the
    // semantic point: the minority languages' achieved keep RATE exceeds
    // the majority language's (the up-weighting actually happened), which
    // a proportional-sampling regression would fail.
    "q140_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val th = Curation.temperatureMixThresholds(docs, "lang", 3, 5)
      val kept = docs
        .filter(Curation.temperatureMixKeep(col("lang"), col("doc_id"), th, "mix"))
        .select(col("doc_id"), col("lang"))
        .localCheckpoint() // sampled twice below (emit + gate)
      val rates = kept.groupBy(col("lang")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val sizes = docs.groupBy(col("lang")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val majority = sizes.maxBy(_._2)._1
      val majRate = rates.getOrElse(majority, 0L).toDouble / sizes(majority)
      val upweightedOk = sizes.keys.filter(_ != majority).forall { l =>
        rates.getOrElse(l, 0L).toDouble / sizes(l) > majRate
      }
      require(upweightedOk,
        s"q140 low-resource languages not up-weighted: rates=$rates sizes=$sizes")
      kept.withColumn("upweighted_ok", lit(upweightedOk))
    }),

    // DSIR-SHAPE IMPORTANCE SELECTION (q197): score every raw doc by the
    // log-likelihood ratio of its hashed-unigram bag under the target
    // domain (source='src0') vs the raw pool, keep the top-100. One
    // corpus-proportional shuffle on (doc, bucket) with map-side combine;
    // the 256-row bucket distribution broadcasts back; top-k is
    // TakeOrderedAndProject. Weights round-6 + doc_id tie-break so the
    // selection is deterministic and engine-portable.
    "q197_dsir_select" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.dsirWeights(docs, "doc_id", "text",
          col("source") === "src0")
        .orderBy(col("dsir_weight").desc, col("doc_id"))
        .limit(100)
    }),

    // CROSS-SOURCE OVERLAP MATRIX (q207): the dataset-overlap audit run
    // before mixing corpora — per source pair, shingle-set Jaccard plus
    // both directional containments (|A∩B|/|A|: how much of A is already
    // inside B). One distinct hash-agg on (source, shingle) bounded by
    // sources × shingle-vocab; the intersection self-join's per-key
    // expansion is bounded by sources-per-shingle (≤ S), never corpus
    // rows; the output is S²/2 rows.
    "q207_source_overlap" -> ((s, dir) => {
      Curation.sourceOverlapMatrix(
        t(s, dir, "documents"), "source", "text", k = 6)
    }),

    // CHI-SQUARED FEATURE SELECTION (q227, round 15): which tokens most
    // predict the `lang='en'` class — the supervised companion to q79's
    // unsupervised distinctive terms, and the standard feature-selection
    // pass before training quality/language classifiers (q200/q221 shape).
    // One distinct-presence hash-agg then one token-grain agg; every
    // count is an integer (exact in doubles), so χ² is bit-reproducible.
    "q227_chi2_terms" -> ((s, dir) => {
      Curation.chiSquaredTerms(t(s, dir, "documents"), "doc_id", "text",
        isClass = col("lang") === "en", minDf = 25, k = 20)
    }),

    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (q236, round 15): a 50-doc
    // sample where selection probability tracks document length — the
    // token-budgeted corpus subsampling rule (sampling documents
    // proportional to their token mass approximates sampling TOKENS
    // uniformly). Efraimidis–Spirakis A-ES: per-row key ln(u)/w from the
    // salted-md5 row property, global top-k by key. The plan is
    // TakeOrderedAndProject — per-partition top-50 heaps merged on the
    // driver, so a 100 TB corpus pays one streaming pass and a
    // k-bounded merge, never a global sort; the final rank is a window
    // over the 50 survivors only.
    "q236_weighted_sample" -> ((s, dir) => {
      val keyed = t(s, dir, "documents").select(
        col("doc_id"), col("n_chars"),
        Curation.weightedSampleKey(col("doc_id"),
          col("n_chars").cast("double"), "ws").as("skey"))
      val top = keyed.orderBy(col("skey").desc, col("doc_id").asc).limit(50)
      top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("skey").desc, col("doc_id").asc)).cast("long"))
    })
  )

  private val planted =
    """text || ' reach user' || CAST(doc_id AS VARCHAR) ||
      |'@example.com, tel 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |', host 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.7'""".stripMargin

  val oracle: Map[String, String] = Map(
    "q68_pii_redact" ->
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${Curation.EmailRe}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '${Curation.PhoneRe}')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(t, '${Curation.Ipv4Re}')) AS BIGINT) AS n_ip,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${Curation.EmailRe}', '<EMAIL>', 'g'),
         |    '${Curation.SsnRe}', '<SSN>', 'g'),
         |    '${Curation.PhoneRe}', '<PHONE>', 'g'),
         |    '${Curation.Ipv4Re}', '<IP>', 'g') AS clean_text
         |FROM p""".stripMargin,
    "q69_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q70_repetition" ->
      """WITH t AS (SELECT doc_id, tok, count(*) AS c
        |           FROM documents, unnest(string_split(text, ' ')) AS u(tok)
        |           GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(1.0 - count(*)::DOUBLE / sum(c)::DOUBLE, 6) AS rep_ratio,
        |  round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) AS top_tok_ratio
        |FROM t GROUP BY 1""".stripMargin,
    "q71_seq_pack" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(floor(coalesce(sum(n) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT)
        |    AS bin_id
        |FROM d""".stripMargin,
    "q77_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CASE WHEN lang = 'en'
        |  THEN substr(md5(CAST(doc_id AS VARCHAR) || ':s1'), 1, 8) < '80000000'
        |  ELSE substr(md5(CAST(doc_id AS VARCHAR) || ':s1'), 1, 8) < '33333333' END""".stripMargin,
    "q78_source_cap" ->
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 15""".stripMargin,
    "q87_chunking" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST((i - 1) // 48 AS BIGINT) AS chunk_idx,
        |  array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 63], ' ') AS chunk_text,
        |  CAST(least(len(w) - i + 1, 64) AS BIGINT) AS n_tokens
        |FROM ws, unnest(range(1, len(w) + 1, 48)) AS u(i)""".stripMargin,
    "q79_distinctive_terms" ->
      """WITH t AS (SELECT doc_id, tok AS term, count(*) AS tf
        |           FROM documents, unnest(string_split(text, ' ')) AS u(tok)
        |           GROUP BY 1, 2),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY 1 HAVING count(*) <= 50)
        |SELECT t.doc_id, t.term, t.tf, d.df
        |FROM t JOIN d USING (term)
        |QUALIFY row_number() OVER (PARTITION BY t.doc_id
        |  ORDER BY t.tf DESC, t.term ASC) <= 3""".stripMargin,
    "q92_leakage_safe_split" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS s
        |       FROM d, unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT x.doc_id AS pa, y.doc_id AS pb, count(*) AS c
        |          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT pa, pb FROM inter i
        |          JOIN sz sx ON i.pa = sx.doc_id JOIN sz sy ON i.pb = sy.doc_id
        |          WHERE c::DOUBLE / (sx.n + sy.n - c)::DOUBLE >= 0.2),
        |edges AS (SELECT pa AS x, pb AS y FROM pairs
        |          UNION ALL SELECT pb, pa FROM pairs),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT e.x, r.label FROM edges e JOIN reach r ON e.y = r.node),
        |cl AS (SELECT node AS doc_id, min(label) AS cluster_id
        |       FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM cl""".stripMargin,
    "q93_heavy_hitters" ->
      """WITH t AS (SELECT tok FROM documents,
        |             unnest(string_split(text, ' ')) AS u(tok)),
        |c AS (SELECT tok, count(*) AS n FROM t GROUP BY 1)
        |SELECT tok, n FROM c
        |WHERE n >= ceil(0.002 * (SELECT sum(n) FROM c))""".stripMargin,
    "q94_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    nfc_normalize('  cafe' || chr(769) || chr(7) || ' ' || text ||
        |                  chr(9) || 'fine' || chr(769) || '  '),
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |    '[ \t\n\r]+', ' ', 'g')) AS clean_text
        |FROM documents""".stripMargin,
    "q95_domain_blocklist" ->
      """WITH d AS (SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'ok-site.org' WHEN 1 THEN 'spam.example.com'
        |                  WHEN 2 THEN 'news.example.io' ELSE 'mirror.example.net'
        |  END AS domain FROM documents)
        |SELECT doc_id,
        |  'https://' || domain || '/page/' || CAST(doc_id AS VARCHAR) AS url,
        |  domain
        |FROM d
        |WHERE domain NOT IN ('spam.example.com', 'mirror.example.net')""".stripMargin,
    "q72_contamination" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         md5(array_to_string(w[CAST(i AS INT):CAST(i AS INT) + 7], ' ')) AS h
        |       FROM ws, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS u(i)),
        |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0)
        |SELECT s.doc_id, count(*) AS n_shared
        |FROM sh s JOIN bench b ON s.h = b.h
        |WHERE s.doc_id % 50 <> 0
        |GROUP BY 1""".stripMargin,
    // q140 recomputes the integer-exact α-sampling thresholds in HUGEINT
    // arithmetic and replays the salted-md5 keep rule — every kept row
    // must match bit-for-bit.
    "q140_temperature_mix" ->
      """WITH sz AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, CAST(n AS HUGEINT) AS n,
        |        CAST(floor(sqrt(n)) AS HUGEINT) AS sq FROM sz),
        |tot AS (SELECT sum(n) AS total, sum(sq) AS sumsq FROM w),
        |th AS (SELECT lang,
        |        least((SELECT total FROM tot) * 3 // 5 * sq * 4294967296
        |                // ((SELECT sumsq FROM tot) * n),
        |              CAST(4294967296 AS HUGEINT)) AS t
        |       FROM w)
        |SELECT d.doc_id, d.lang, TRUE AS upweighted_ok
        |FROM documents d JOIN th ON d.lang = th.lang
        |WHERE th.t >= 4294967296
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8)
        |        < printf('%08x', CAST(th.t AS BIGINT))""".stripMargin,
    // q197 recomputes the DSIR log-likelihood-ratio weights from the same
    // hashed-unigram bucket distributions (add-one smoothing, 256 buckets)
    // and replays the round-6 + doc_id-tie-break top-100.
    "q197_dsir_select" ->
      """WITH b AS (
        |  SELECT doc_id, is_target, substr(md5(tok), 1, 2) AS bucket
        |  FROM (SELECT doc_id, source = 'src0' AS is_target,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  WHERE tok <> ''),
        |db AS (SELECT doc_id, bucket, any_value(is_target) AS is_target,
        |         count(*) AS n
        |       FROM b GROUP BY 1, 2),
        |bs AS (SELECT bucket,
        |         sum(CASE WHEN is_target THEN n ELSE 0 END) AS ct,
        |         sum(CASE WHEN NOT is_target THEN n ELSE 0 END) AS cr
        |       FROM db GROUP BY 1),
        |tot AS (SELECT sum(ct)::DOUBLE AS tt, sum(cr)::DOUBLE AS tr FROM bs)
        |SELECT db.doc_id,
        |  round(sum(db.n * (ln((bs.ct + 1) / (tot.tt + 256)) -
        |                    ln((bs.cr + 1) / (tot.tr + 256)))), 6)
        |    AS dsir_weight
        |FROM db JOIN bs USING (bucket), tot
        |WHERE NOT db.is_target
        |GROUP BY 1
        |ORDER BY dsir_weight DESC, doc_id
        |LIMIT 100""".stripMargin,
    // q207 recomputes the source-pair matrix from distinct 6-char
    // shingles — same substr generator as the q26/q59 oracles.
    "q207_source_overlap" ->
      """WITH sh AS (
        |  SELECT DISTINCT source AS g, substr(text, CAST(i AS INT), 6) AS s
        |  FROM documents,
        |    unnest(range(1, greatest(length(text) - 5, 1) + 1)) AS u(i)),
        |sz AS (SELECT g, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.g AS source_a, b.g AS source_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.g < b.g
        |          GROUP BY 1, 2)
        |SELECT source_a, source_b,
        |  round(c::DOUBLE / (x.n + y.n - c)::DOUBLE, 6) AS jaccard,
        |  round(c::DOUBLE / x.n::DOUBLE, 6) AS a_in_b,
        |  round(c::DOUBLE / y.n::DOUBLE, 6) AS b_in_a
        |FROM inter
        |JOIN sz x ON source_a = x.g
        |JOIN sz y ON source_b = y.g""".stripMargin,
    // q227: same presence contingency; all terms are integer-valued
    // doubles, so the χ² ratio is exact before the single round.
    "q227_chi2_terms" ->
      """WITH pr AS (
        |  SELECT DISTINCT doc_id, lang = 'en' AS cls, t.token
        |  FROM documents, unnest(string_split(text, ' ')) AS t(token)
        |  WHERE t.token <> ''),
        |tot AS (SELECT count(*)::DOUBLE AS nn,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS p
        |  FROM documents),
        |c AS (SELECT token, count(*)::DOUBLE AS df,
        |    sum(CASE WHEN cls THEN 1 ELSE 0 END)::DOUBLE AS a
        |  FROM pr GROUP BY 1)
        |SELECT token, CAST(df AS BIGINT) AS df, CAST(a AS BIGINT) AS class_df,
        |  round(nn * (a * (nn - df - (p - a)) - (df - a) * (p - a))
        |           * (a * (nn - df - (p - a)) - (df - a) * (p - a))
        |        / (df * (nn - df) * p * (nn - p)), 6) AS chi2
        |FROM c, tot
        |WHERE df >= 25 AND df < nn
        |ORDER BY chi2 DESC, token ASC
        |LIMIT 20""".stripMargin,
    // q236 replays the A-ES key exactly: u=(h+0.5)/2^32 from the salted
    // md5 row property, key=round(ln(u)/w, 12) — ln/division in doubles
    // agree bit-for-bit across engines, the rounding absorbs any last-ulp
    // residue, ties break on doc_id.
    "q236_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 8)) AS BIGINT) + 0.5)
        |             / 4294967296.0)
        |          / CAST(n_chars AS DOUBLE), 12) AS skey
        |  FROM documents)
        |SELECT doc_id, n_chars, skey,
        |  CAST(row_number() OVER (ORDER BY skey DESC, doc_id ASC) AS BIGINT) AS rank
        |FROM k
        |ORDER BY skey DESC, doc_id ASC
        |LIMIT 50""".stripMargin
  )
}
