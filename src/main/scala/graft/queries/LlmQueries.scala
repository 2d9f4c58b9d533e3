package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsofJoin, AudioDedup, Dedup, ExactSubstr, Fuzzy, ImageDedup, Ivf, Multimodal, Search, Similarity, TextAnalysis, VideoDedup}
import graft.model.Tables
import graft.qc.{RecallGate, SketchGate}
import graft.streaming.Streaming

/** LLM-training-data pipeline operators (north-star extensions) as driver
  * queries: text analysis, dedup family, similarity search, multimodal
  * plumbing, time windows / sessionization / as-of joins over events.
  *
  * Oracle parity notes:
  *  - ratios/scores use only +,−,×,÷ on doubles (no libm) and identical
  *    left-to-right association in the SQL, so results are bit-equal;
  *  - cosine similarities are rounded to 6 decimals on BOTH sides before
  *    thresholding/ranking (group-sum order differs across engines in the
  *    last ulp);
  *  - EVERY query is oracle-gated. Operators whose raw output depends on
  *    engine-specific hashes (MinHash/SimHash banding q27/q28, hyperplane
  *    LSH q30/q56, IVF q45) are SELF-GATING via [[graft.qc.RecallGate]]:
  *    they emit their EXACT counterpart's rows (oracle-reproducible SQL)
  *    plus recall/precision booleans the oracle expects TRUE for, while the
  *    approximate operator runs in-query as the gate subject — a hash/seed/
  *    banding regression fails the driver's hash compare, not just a spec.
  *    The SKETCH queries (q36 HLL, q57 GK) self-gate the same way via
  *    [[graft.qc.SketchGate]] (exact values + within-bound booleans).
  */
object LlmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Train-once registry for q209's persisted lang-ID model (one
    * training+gate+save per JVM per input dir; the model DIR is cached,
    * reloads read parquet — the q110 persisted-index pattern). */
  private val nbModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-class vocabulary cap for the PERSISTED q209 model — what makes
    * `broadcastModel = true` sound at any corpus size (the broadcast is
    * ≤ classes×cap rows by construction; see [[TextAnalysis.nbPrune]]). */
  private val nbVocabCap = 4000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Text analysis ---------------------------------------------------
    "q21_text_stats" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.nTokens(txt).as("n_tokens"),
        TextAnalysis.nUniqueTokens(txt).as("n_uniq"),
        round(TextAnalysis.stopRatio(txt), 6).as("stop_ratio"),
        round(TextAnalysis.qualityScore(txt), 6).as("quality"))
    }),

    "q22_lang_id" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextAnalysis.langIdHeuristic(col("text")).as("pred_lang"))
    }),

    "q23_quality_filter" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.5 &&
          TextAnalysis.nTokens(col("text")) >= 20)
        .select(col("doc_id"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
    }),

    // Whole-doc + min-shingle fingerprints in one scan and one hash-agg
    // shuffle (the fp rides the explode as a grouping key — no self-join).
    "q24_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprintFrame(t(s, dir, "documents"), "doc_id", "text", 3)
    }),

    // Token frequencies (wordcount): explode tokens -> hash-agg counts ->
    // top-k. Map-side partial counts make the shuffle carry one row per
    // distinct token per partition; top-k is TakeOrderedAndProject.
    "q49_token_freq" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }),

    // --- Dedup -----------------------------------------------------------
    "q25_exact_dedup" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id",
        TextAnalysis.fingerprint(col("text")))
        .select(col("fp"), col("keep_id"), col("n_copies"))
    }),

    // Exact 5-gram Jaccard near-dup pairs on a bounded id range (constant
    // work across scale factors); the unbounded scale path is q27.
    "q26_ngram_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 150),
        "doc_id", "text", n = 5, threshold = 0.3)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // Cross-document repeated-passage detection (Lee et al. 2022 passage
    // dedup signal): strided 10-token rolling windows fingerprinted with
    // md5, a window is shared when it occurs in >1 distinct doc; per-doc
    // shared-window ratio. md5 is deterministic, so DuckDB reproduces the
    // exact fingerprints and the query is fully oracle-gated.
    "q100_passage_dedup" -> ((s, dir) => {
      Dedup.repeatedPassageStats(t(s, dir, "documents"), "doc_id", "text",
        window = 10, stride = 5)
    }),

    // Incremental near-dup screening under the gate: TODAY'S batch banded
    // against a PERSISTED signature store — the daily-cadence shape where
    // the corpus is never re-sketched (ext/Dedup.incrementalNearDupPairs;
    // the store is genuinely written to and read back from parquet here).
    // Batch = re-ingested copies of every %5 store doc (new ids, text
    // verbatim — the daily-crawl re-fetch case) + genuinely novel texts
    // (%7==3, suffixed with a marker no store text contains). Oracle
    // exactness despite banding: a re-ingested copy has the IDENTICAL
    // signature as its store original, so it shares every band bucket —
    // recall on text-equal pairs is 1 by construction, not probabilistic;
    // any near-miss candidates the bands happen to surface are dropped by
    // the exact text-equality confirmation against the lake (the store
    // retains no text, so confirmation is a join restricted to the few
    // emitted pairs — the scale path the scaladoc prescribes). The result
    // is therefore exactly the SQL text-equality join the oracle computes.
    "q102_incremental_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val tmp = QueryTmp.dir("q102")
      Dedup.minHashSignaturesWords(docs, "doc_id", "text", n = 3, k = 32)
        .write.mode("overwrite").parquet(s"$tmp/store")
      val store = s.read.parquet(s"$tmp/store")
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(col("text"), lit(" q102novel"), col("doc_id")).as("text")))
      val newSigs = Dedup.minHashSignaturesWords(batch, "doc_id", "text",
        n = 3, k = 32)
      val cands = Dedup.incrementalNearDupPairs(newSigs, store, k = 32,
        bands = 8, threshold = 0.9).localCheckpoint()
      // Exact-confirm leg: the LAKE read is PRUNED to the candidate ids —
      // the candidate set is emitted-pair-sized by construction (the store
      // keeps no text precisely so confirmation touches only these few), so
      // it is collected (bounded, capped) and pushed into the parquet scan
      // as an In filter: confirm cost tracks emitted pairs, not lake size.
      // PlanGuard asserts the filter actually reached the scan. Beyond the
      // cap (a pathological candidate explosion — the banding parameters,
      // not the confirm leg, are the fix there) it degrades to a semi-join,
      // still candidate-bounded but scanning the lake.
      val candIds = cands.select(col("store_doc")).distinct()
        .limit(100001).collect().map(_.getLong(0))
      val lakeSlice =
        if (candIds.length <= 100000)
          graft.plans.PlanGuard.requirePlanMatches(
            docs.filter(col("doc_id").isin(candIds.toIndexedSeq: _*)),
            "In\\(doc_id".r,
            "q102 confirm leg must push the candidate-id filter into the lake scan")
        else docs.join(broadcast(cands.select(col("store_doc").as("doc_id"))
          .distinct()), "doc_id")
      cands
        .join(batch.select(col("doc_id").as("new_doc"), col("text").as("nt")),
          "new_doc")
        .join(lakeSlice.select(col("doc_id").as("store_doc"),
          col("text").as("st")), "store_doc")
        .filter(col("nt") === col("st"))
        .select(col("new_doc").as("new_id"), col("store_doc").as("store_id"))
    }),

    // Incremental EXACT-dedup screen — the daily-cadence twin of q102 for
    // byte-identical content: today's batch gets a per-row dup verdict
    // against a PERSISTED fingerprint store (fp → canonical keeper id;
    // genuinely written to and read back from parquet here). The plan is
    // the 100-TB shape: the store is only ever SCANNED, never shuffled —
    // the batch's fingerprints broadcast into a semi-style join that
    // extracts the (batch-bounded) matching store rows, and the verdict
    // join broadcasts that small result back onto the batch. PlanGuard
    // rejects any sort-merge join (a corpus shuffle would mean the shape
    // regressed). Batch = re-ingested %3 docs (dup verdicts) + novel %7==1
    // docs (marker suffix no store text contains).
    "q104_incremental_exact_screen" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val tmp = QueryTmp.dir("q104")
      docs.filter(col("text").isNotNull)
        .groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"))
        .write.mode("overwrite").parquet(s"$tmp/fpstore")
      val store = s.read.parquet(s"$tmp/fpstore")
      val batch = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 7 === 1)
          .select((col("doc_id") + 400000L).as("doc_id"),
            concat(col("text"), lit(" q104novel"), col("doc_id")).as("text")))
      val withFp = batch.withColumn("fp", md5(col("text").cast("binary")))
        .localCheckpoint() // one batch scan feeds the probe AND the verdict
      val matched = store.join(
        broadcast(withFp.select(col("fp")).distinct()), "fp")
      val verdicts = withFp
        .join(broadcast(matched), Seq("fp"), "left")
        .select(col("doc_id").as("batch_id"),
          col("keep_id").isNotNull.as("is_dup"),
          coalesce(col("keep_id"), lit(-1L)).as("dup_of"))
      // FINAL-plan guard (not just static): the no-SMJ property is what
      // keeps the store scan-only at 100 TB, and AQE finalizes join
      // strategies at runtime — assert after execution. The extra pass is
      // cheap: batch side is localCheckpoint()ed, store side is a parquet
      // re-scan into a broadcast.
      graft.plans.PlanGuard.requireNotInFinalPlan(verdicts, "SortMergeJoin",
        "q104 screen must never shuffle the fingerprint store")
    }),

    // MinHash+LSH over ALL documents, SELF-GATING under the oracle
    // (RecallGate — the q36/q57 pattern for retrieval operators): the banded
    // path (exact-collapse → word-shingle signatures → banded join →
    // estimate pre-filter → exact-Jaccard verify) runs in-query and is
    // recall/precision-gated against the EXACT word-shingle Jaccard pair
    // set AT REPRESENTATIVE LEVEL (bounded by unique content at any
    // duplication depth — see Dedup.minHashGatedExactPairs); the query
    // emits the expanded exact pair set — oracle-reproducible in SQL —
    // with the gate booleans riding every row. A banding/seed regression
    // now fails CORRECTNESS, not just RecallSpec.
    "q27_minhash_pairs" -> ((s, dir) =>
      Dedup.minHashGatedExactPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.5, recallFloor = 0.75)),

    // SimHash banded near-dup, SELF-GATING (Dedup.simHashGatedExactDupPairs):
    // the banded path must EXACTLY equal brute-force all-pairs hamming<=3 on
    // the rep plane (pigeonhole over the four 16-bit chunks — equivalence,
    // not just overlap), and a deterministic modulo sample of the byte-
    // identical pairs must surface from the fully EXPANDED banded output at
    // hamming 0. The emitted rows are the oracle-computable exact-duplicate
    // pair set; the booleans carry both verdicts into the driver's hash
    // compare. The corpus is augmented with deterministically re-keyed
    // VERBATIM copies of every %5 doc (the q102 re-ingest shape) so the
    // exact-dup anchor is non-empty at every sf — the base documents table
    // has no byte-identical texts below sf0.1.
    "q28_simhash_pairs" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val docs = base.unionByName(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      Dedup.simHashGatedExactDupPairs(docs, "doc_id", "text", maxHamming = 3)
    }),

    // IMAGE near-dup over a binary media column, SELF-GATING (q28's pattern
    // on the multimodal plane): docs render to real PPM images keyed by
    // TEXT CONTENT (re-keyed %5 copies render with a one-bit perceptual
    // jitter — genuine near-duplicates, not byte dups); the engine decodes
    // the pixels (Multimodal netpbm parsing), computes the 8×9 dHash, and
    // pairs via the pigeonhole-banded hamming join. Gates: banded ≡ brute
    // on the hash plane, recall 1.0 AND precision 1.0 against the
    // text-identity pair set, which is what the query emits (oracle-
    // reproducible SQL over the same augment).
    "q105_image_neardup" -> ((s, dir) =>
      ImageDedup.gatedTextDupImagePairs(s, t(s, dir, "documents"),
        copyMod = 5, copyIdOffset = 100000L, maxHamming = 3)),

    // The AUDIO modality of the same screen (q125): every %7 doc re-keyed
    // and rendered as a gain-jittered WAV clip; clips are container-decoded
    // and energy-delta-hashed for real (ext/AudioDedup.scala), pairing and
    // gates shared with q105 via MediaNearDup — pigeonhole slice
    // equivalence, sampled end-to-end recall/precision 1.0, rep-level
    // gating bounded by unique audio content. copyMod=7 keeps the corpus
    // disjoint from q105's %5 fixture so the two modalities cannot mask
    // each other's failures.
    "q125_audio_neardup" -> ((s, dir) =>
      AudioDedup.gatedTextDupAudioPairs(s, t(s, dir, "documents"),
        copyMod = 7, copyIdOffset = 100000L, maxHamming = 3)),

    // The VIDEO modality of the same screen (q132), closing the
    // image/audio/video matrix on shared machinery: every %11 doc re-keyed
    // and rendered as a real multi-frame Y4M clip with a first-frame
    // perceptual jitter; the engine walks the container's FRAME markers,
    // dHashes SAMPLED frames' luma planes, folds them into an
    // order-sensitive clip signature (ext/VideoDedup.scala), and pairs via
    // the same banded hamming join. Gates shared with q105/q125 via
    // MediaNearDup; copyMod=11 keeps the fixture disjoint from image's %5
    // and audio's %7 so the three modalities cannot mask each other.
    "q132_video_neardup" -> ((s, dir) =>
      VideoDedup.gatedTextDupVideoPairs(s, t(s, dir, "documents"),
        copyMod = 11, copyIdOffset = 100000L, maxHamming = 3)),

    // Near-dup CLUSTERS: exact Jaccard pairs → connected components → every
    // doc labeled with its cluster's canonical (minimum) id. The full
    // pairs-to-dedup-decision path; oracle = DuckDB recursive-CTE
    // reachability over the same edge set.
    "q59_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.2)
      Dedup.dedupByPairs(docs, pairs, "doc_id")
        .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
    }),

    // --- Similarity search ----------------------------------------------
    "q29_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        corpus = emb.filter(col("vec_id") >= 5),
        k = 10)
    }),

    // Multi-probe hyperplane-LSH ANN, SELF-GATING: the LSH retrieval runs
    // in-query and its recall@10 is gated against the exact brute-force
    // top-k, which is what the query emits (the q29 plane — oracle-
    // reproducible); `recall_ok` rides every row. No precision gate: ANN
    // top-k legitimately fills missed slots with lower-ranked neighbors.
    "q30_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
      val ann = Similarity.annTopK(probes, corpus, k = 10, nPlanes = 4)
      RecallGate.gate(exact, ann, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.30, what = "q30 LSH ANN top-k",
        requireExactPrecision = false)
    }),

    // GRAPH-INDEX ANN (q222, round 15 — the HNSW/NSW production niche,
    // completing the ANN family beyond IVF/PQ): the k-NN graph builds by
    // NN-descent (Dong et al. 2011 — multi-salt blocked init refined by
    // neighbor-of-neighbor rounds, pure joins + window ranks, no
    // sequential inserts), augmented with NSW-style similarity-agnostic
    // long links for navigability; search is bounded-hop beam expansion
    // over the adjacency lists. SELF-GATING like q30/q45: the graph
    // search runs in-query, recall@10 gated against the exact
    // brute-force top-k the query emits (oracle-reproducible plane).
    "q222_ann_knng" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
      val g = graft.ext.Knng.buildGraph(corpus, k = 8, iters = 2,
        blocks = 8)
      val ann = graft.ext.Knng.searchTopK(probes, corpus, g, k = 10,
        beam = 48, hops = 4, entries = 16)
      RecallGate.gate(exact, ann, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.50, what = "q222 kNN-graph ANN top-k",
        requireExactPrecision = false)
    }),

    // IVF ANN (k-means coarse quantizer — declarative Lloyd's, no MLlib —
    // + inverted lists, probes visiting nProbe cells), SELF-GATING like
    // q30: IVF retrieval runs in-query, recall@10 gated against the exact
    // brute-force top-k the query emits.
    // PQ compressed ANN (q126): the memory-compression member of the ANN
    // family — codebook trained on a bounded hash-ordered sample, corpus
    // stored as m=8 one-byte codes (32x smaller than the 64-float
    // vectors, structurally gated in-query), search = broadcast ADC
    // tables + one pass over the code plane. Recall-gated against the
    // exact cosine twin like q30/q45; precision not claimed (top-k fills
    // missed slots by design).
    "q126_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
      val cb = graft.ext.Pq.train(corpus, "vec_id", "embedding", m = 8, k = 32)
      val compressedOk = cb.rawBytes >= 16 * cb.codeBytes
      require(compressedOk,
        s"q126 PQ code is ${cb.codeBytes} B vs raw ${cb.rawBytes} B — " +
          "compression story broken")
      val encoded = graft.ext.Pq.encode(corpus, "vec_id", "embedding", cb)
        .localCheckpoint()
      // ADC shortlist (code plane only) + exact re-rank on the fetched
      // shortlist rows — the FAISS refine arrangement; recall is bounded
      // by the shortlist's recall, not raw quantization error
      val pq = graft.ext.Pq.pqTopKRerank(probes, encoded, corpus,
        "probe_id", "vec_id", "embedding", cb, topK = 10, shortlist = 100)
      RecallGate.gate(exact, pq, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.40, what = "q126 PQ ANN top-k",
        requireExactPrecision = false)
        .withColumn("compressed_ok", lit(compressedOk))
    }),

    // IVF-PQ (q128): the COMPOSITION of the q45 coarse quantizer with the
    // q126 code plane — the 100 TB ANN deployment shape (FAISS IVFPQ;
    // Jégou TPAMI'11 §V). Residual-encoded codes persist PARTITIONED BY
    // CELL and the search scans only the probed cells' partitions — the
    // cell-bounded probe that lifts q126's flat-ADC full-plane scan.
    // Gates ride the emitted exact-twin rows: recall vs brute force (like
    // q30/q45/q126), compression ≥ 16×, and CELL-BOUNDEDNESS — the rows
    // the probe scanned must be a strict fraction of the corpus.
    "q128_ann_ivfpq" -> ((s, dir) => {
      val root = QueryTmp.dir("q128")
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5).localCheckpoint()
      val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
      val (index, codes) = graft.ext.IvfPq.build(corpus, "vec_id",
        "embedding", c = 10, m = 8, k = 32, iters = 1)
      val compressedOk = index.cb.rawBytes >= 16 * index.cb.codeBytes
      require(compressedOk,
        s"q128 PQ code is ${index.cb.codeBytes} B vs raw " +
          s"${index.cb.rawBytes} B — compression story broken")
      // the deployment shape: code plane persisted partitioned by cell,
      // searched from the store (partition pruning bounds the scan)
      codes.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$root/codes")
      val stored = s.read.parquet(s"$root/codes")
      val nProbe = 3
      // cell-boundedness: EACH probe's search reads only its nProbe cells'
      // code rows — a bounded fraction of the plane, where flat ADC (q126)
      // reads all of it per probe. Cell sizes come from the store (one
      // c-bounded aggregate with the same partition layout the scan uses).
      val sizes = stored.groupBy(col("cell")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val perProbe = graft.ext.IvfPq.perProbeCells(probes, index,
        "probe_id", "embedding", nProbe)
      val total = corpus.count()
      val worst = perProbe.values
        .map(_.map(sizes.getOrElse(_, 0L)).sum).max
      val cellBoundedOk = worst * 5 <= total * 4 // ≤ 80% of the plane
      require(cellBoundedOk,
        s"q128 probe not cell-bounded: worst probe scans $worst of $total " +
          "code rows")
      val ivfpq = graft.ext.IvfPq.search(probes, index, stored, corpus,
        "probe_id", "vec_id", "embedding", topK = 10, nProbe = nProbe,
        shortlist = 100)
      RecallGate.gate(exact, ivfpq, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.30, what = "q128 IVF-PQ ANN top-k",
        requireExactPrecision = false)
        .withColumn("compressed_ok", lit(compressedOk))
        .withColumn("cell_bounded_ok", lit(cellBoundedOk))
    }),

    "q45_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
      val (centroids, assignment) = Ivf.buildIndex(corpus, c = 10, iters = 1)
      val ivf = Ivf.ivfTopK(probes, corpus, centroids, k = 10, nProbe = 3,
        assignment = Some(assignment))
      RecallGate.gate(exact, ivf, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.30, what = "q45 IVF ANN top-k",
        requireExactPrecision = false)
    }),

    // PERSISTED-index IVF ANN — the index LIFECYCLE the q45 build lacks:
    // the coarse quantizer (centroids) and the inverted lists are written
    // to parquet and RELOADED before probing, exactly as a build-once-
    // probe-many deployment stores them (at 100 TB the index build is a
    // once-per-corpus job; probes run against the stored index). Same
    // recall self-gate as q45: the reloaded-index retrieval runs in-query
    // against the exact brute-force top-k the query emits.
    "q110_ivf_persisted" -> ((s, dir) => {
      val root = QueryTmp.dir("q110")
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val (centroids, assignment) = Ivf.buildIndex(corpus, c = 10, iters = 1)
      centroids.write.mode("overwrite").parquet(s"$root/centroids")
      assignment.write.mode("overwrite").parquet(s"$root/lists")
      val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
      val ivf = Ivf.ivfTopK(probes, corpus,
        s.read.parquet(s"$root/centroids"), k = 10, nProbe = 3,
        assignment = Some(s.read.parquet(s"$root/lists")))
      RecallGate.gate(exact, ivf, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.30, what = "q110 persisted-IVF ANN top-k",
        requireExactPrecision = false)
    }),

    // Exact near-dup pairs on a bounded range — the VERIFY primitive and
    // the recall oracle for q56's banded-LSH scale path.
    "q31_embedding_neardup" -> ((s, dir) => {
      Similarity.cosineNearDupPairs(
        t(s, dir, "embeddings").filter(col("vec_id") < 500),
        threshold = 0.4)
    }),

    // SEMANTIC dedup decisions end-to-end, composed ON THE SCALE PATH
    // (round-12 verdict weak item): banded-LSH near-dup pairs (q56's
    // candidates-by-equi-join, exact-cosine-verify generator — never
    // all-pairs) → connected components → every vector labeled with its
    // cluster's canonical (minimum) id. The exact O(n²) pair plane is
    // DEMOTED to the gate arm (q56's contract: recall ≥ 0.95 + exact
    // precision, require-failed in-query on violation) — the composed
    // plan is the one you'd run at 100 TB. On the driver's gate fixture
    // the generator's measured recall is complete (deterministic — fixed
    // seeds), so the emitted banded-pair clustering hash-matches the
    // DuckDB recursive-CTE oracle over the exact edge set: a banding
    // regression that drops a bridge edge flips a cluster label and fails
    // the driver compare, and a retrieval collapse fails the require.
    "q103_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 500)
      val banded = Similarity.cosineNearDupPairsBanded(emb, threshold = 0.4)
        .localCheckpoint()
      val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.4)
      val v = RecallGate.check(exact, banded, Seq("id_a", "id_b"),
        recallFloor = 0.95, what = "q103 banded pair generator vs exact plane")
      val pairsOk = v.recallOk && v.precisionOk.contains(true)
      Dedup.dedupByPairs(emb, banded, "vec_id", aCol = "id_a", bCol = "id_b")
        .select(col("vec_id"), col("cluster_id"), col("is_canonical"))
        .withColumn("pairs_ok", lit(pairsOk))
    }),

    // Banded-LSH embedding near-dup — the scale-shaped form of q31 (equi-
    // join candidates on (band, bucket), exact-cosine verify) — SELF-GATING:
    // the banded retrieval runs in-query, gated recall ≥ 0.95 AND exact
    // precision (its output is a subset of the exact all-pairs answer by
    // construction — a spurious pair means the cosine verify broke) against
    // the exact pair set the query emits (the q31 plane).
    "q56_neardup_lsh" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings").filter(col("vec_id") < 500)
      val exact = Similarity.cosineNearDupPairs(vecs, threshold = 0.4)
      val banded = Similarity.cosineNearDupPairsBanded(vecs, threshold = 0.4)
      RecallGate.gate(exact, banded, Seq("id_a", "id_b"),
        recallFloor = 0.95, what = "q56 banded-LSH embedding near-dup")
    }),

    // Int8 embedding quantization: per-vector max-abs scale, round-trip
    // error stats (scalar outputs — the driver's compare can't hash array
    // cells). 4x storage reduction path for embedding columns. One fused
    // native codegen loop per row (QuantizeStats); subexpression elimination
    // shares it across the four projected stats.
    "q50_quantize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantizeStats(col("embedding")).as("qs"))
        .select(
          col("vec_id"),
          round(col("qs.maxabs"), 6).as("maxabs"),
          col("qs.qmin").as("qmin"),
          col("qs.qmax").as("qmax"),
          round(col("qs.rmse"), 6).as("rmse"))
    }),

    // --- Multimodal plumbing --------------------------------------------
    // Each document becomes a VALID synthetic PPM/BMP/WAV file (kind and
    // dims derived from its text length), and decodeMeta parses the actual
    // headers back out — the oracle predicts the metadata analytically.
    // sha256 is decoded too but not selected (not SQL-reproducible).
    "q32_multimodal_meta" -> ((s, dir) => {
      Multimodal.decodeMeta(
        Multimodal.documentsAsSyntheticMedia(s, t(s, dir, "documents")))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("width"), col("height"),
          col("format"), col("n_frames"))
    }),

    // Frame sampling over the same synthetic media: every 2nd content frame
    // (pixel row / PCM frame) with its exact byte sum. The sampler genuinely
    // parses each container's layout; the oracle re-derives the frame grid
    // and byte sums analytically from the deterministic fill pattern
    // ((media_id + k) % 256). Pure per-row generate — zero shuffle.
    "q96_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.documentsAsSyntheticMedia(s, t(s, dir, "documents")),
        stride = 2)
    }),

    // --- Event-time windows / sessions / as-of ---------------------------
    "q33_tumbling_window" -> ((s, dir) => {
      Streaming.tumblingAgg(t(s, dir, "events"), "1 hour")
        .select(
          unix_timestamp(col("window_start")).cast("long").as("window_start_epoch"),
          col("event_type"), col("n"), col("total"))
    }),

    // Sliding windows: each event lands in two 1h/30m windows; the batch
    // form of Streaming.slidingAgg with an oracle (DuckDB expresses the
    // window assignment by exploding the two candidate buckets).
    "q44_sliding_window" -> ((s, dir) => {
      Streaming.slidingAgg(t(s, dir, "events"), "1 hour", "30 minutes")
        .groupBy(col("window_start"))
        .agg(sum(col("n")).as("n"))
        .select(unix_timestamp(col("window_start")).cast("long")
          .as("window_start_epoch"), col("n"))
    }),

    "q34_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("ns",
          when(col("prev").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))) > 1800, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("ns")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    "q35_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val ord = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      AsofJoin.asOf(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_totalprice"),
        rightTieBreak = "o_orderkey")
        .select(col("event_id"), col("user_id"),
          col("asof_o_orderkey"), col("asof_o_totalprice"))
    }),

    // Structured JSON parsing: from_json into a typed struct (vs q19's
    // string-path extraction) — the schema-on-read path for props payloads.
    "q51_from_json" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("p", from_json(col("props"), lit("k INT")))
        .select(col("event_id"), col("p.k").cast("long").as("k"))
    }),

    // --- Sketch aggregates — SELF-GATING: the sketch runs alongside its
    // exact twin; the emitted row carries exact values + within-bound
    // booleans, an in-query require fails fast, AND the oracle expects
    // TRUE — so sketch-error drift fails CORRECTNESS, not just a spec.
    "q36_hll_distinct" -> ((s, dir) => {
      SketchGate.hllGate(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey"), relErr = 0.15)
    }),

    // GK-sketch quantiles per group — the streaming/low-memory percentile
    // path (exact percentile shuffles every value; the sketch carries
    // O(1/ε log εN) per group). Gated against the exact ±0.5%-rank
    // envelope (50× the accuracy=10000 guarantee of ε=1e-4); SketchSpec
    // additionally pins the raw error and the gate's failure path.
    "q57_approx_percentile" -> ((s, dir) => {
      SketchGate.gkGate(t(s, dir, "lineitem"),
        groupCol = "l_returnflag", valCol = "l_extendedprice",
        percentages = Seq(0.5, 0.95), accuracy = 10000, rankSlack = 0.005)
    }),

    // GOPHER-STYLE RULE FILTER (Rae et al. 2021 §A1.1, the public
    // quality-rule battery every large text pipeline runs before
    // training): word-count bounds, mean-word-length band, minimum
    // distinct-stopword hits, and a repetition guard (type–token ratio —
    // the duplicate-line surrogate for single-line docs). Every rule is a
    // pure codegen column expression over one scan — no UDF, no shuffle,
    // linear at 100 TB. Thresholds are parameters; the values here are
    // tuned so each rule genuinely splits the synthetic corpus (probed:
    // 331/249/317/219 of 500 pass the four rules respectively), so a
    // broken rule can't hide behind an always-true battery. Emits per-doc
    // measurements + per-rule flags + the composite verdict; the oracle
    // recomputes all of it from the same rational arithmetic.
    // CLUSTER-BALANCED CORESET SAMPLING (q179): the first 8 embeddings
    // serve as diversity anchors; every other vector is assigned to its
    // nearest anchor and each cluster keeps its 16 closest members — a
    // dominant topic cannot flood the sample. Fully deterministic
    // (6-decimal rounding before both rankings, id tie-breaks), so the
    // DuckDB oracle recomputes the identical selection from raw arrays —
    // an assignment flip, a quota off-by-one, or an unstable tie all
    // hash-mismatch.
    "q179_coreset_anchors" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.coresetByAnchors(
        corpus = emb.filter(col("vec_id") >= 8),
        anchors = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("anchor_id"), col("embedding")),
        perCluster = 16)
    }),

    // EXACT SUBSTRING DEDUP (q187, the ExactSubstr half of Lee et al.
    // 2022 — the standard companion to the q27 MinHash screen): per
    // document, the MAXIMAL token spans whose every 15-token window
    // occurs verbatim >= 2 times anywhere in the corpus (cross-doc or
    // self-repeat). Distributed suffix-array equivalence: stride-1
    // fixed-width fingerprints sort-shuffled by value reproduce exactly
    // the >=L duplicated-span coverage — O(corpus tokens) rows, never
    // all-pairs (spec-guarded: no cartesian in the plan). Oracle = the
    // same windows/HAVING/semi-join/gaps-and-islands in DuckDB with
    // identical md5 fingerprints, so a missed span, a wrong merge, or an
    // off-by-one boundary all hash-mismatch.
    "q187_exact_substr" -> ((s, dir) => {
      ExactSubstr.duplicatedSpans(t(s, dir, "documents"),
        "doc_id", "text", minLen = 15)
    }),

    // EXACT SUBSTRING REMOVAL (q190, the keep-one half of Lee et al.
    // 2022): every duplicated 15-token window occurrence is stripped
    // EXCEPT its corpus-wide canonical site (lexicographically-first
    // (doc, pos) per fingerprint — deterministic, so the DuckDB oracle
    // recomputes the identical canonical pick via row_number) and the
    // surviving tokens reassemble in order; all-duplicate docs survive
    // as empty text. A wrong canonical, an off-by-one coverage bound,
    // or a reordered reassembly all hash-mismatch.
    "q190_exact_substr_removal" -> ((s, dir) => {
      ExactSubstr.removeDuplicates(t(s, dir, "documents"),
        "doc_id", "text", minLen = 15)
    }),

    // INCREMENTAL ExactSubstr SCREEN (q191, the daily-cadence shape of
    // q102/q104 applied to substrings): the corpus's distinct window
    // fingerprints persist ONCE as a parquet store; today's batch —
    // verbatim re-fetches of every %5 doc plus %7==3 docs with a novel
    // suffix — probes it for spans already present verbatim in the
    // corpus. Re-fetched docs surface whole-doc spans; suffixed docs
    // surface their PREFIX spans (the suffix windows are novel) —
    // partial contamination found, not just whole-document. The store
    // is never re-tokenized and never shuffled (final-plan-guarded: no
    // SortMergeJoin — batch fingerprints broadcast into the store scan).
    "q191_incremental_exact_substr" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val tmp = QueryTmp.dir("q191")
      ExactSubstr.windowStore(docs, "doc_id", "text", minLen = 15)
        .write.mode("overwrite").parquet(s"$tmp/wstore")
      val store = s.read.parquet(s"$tmp/wstore")
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 7 === 3)
          .select((col("doc_id") + 600000L).as("doc_id"),
            concat(col("text"), lit(" q191novel"), col("doc_id")).as("text")))
      val spans = ExactSubstr.spansAgainstStore(batch, store,
        "doc_id", "text", minLen = 15)
      graft.plans.PlanGuard.requireNotInFinalPlan(spans, "SortMergeJoin",
        "q191 screen must never shuffle the window store")
    }),

    // LINE-LEVEL BOILERPLATE REMOVAL (q178, CCNet/RefinedWeb cleaning):
    // pages are built from the documents fixture with injected template
    // chrome — a cookie banner on every %3 doc and a copyright footer on
    // every %2 doc (both cross the 5% corpus-frequency threshold) around
    // a unique title/ref and the unique body — and the operator strips
    // exactly the chrome while preserving line order. Oracle = the same
    // explode → frequency HAVING → anti-semijoin → ordered reassembly in
    // DuckDB, so an off-by-one in the threshold, a dropped unique line,
    // or a reordered reassembly all hash-mismatch.
    "q178_boilerplate_lines" -> ((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          when(col("doc_id") % 3 === 0,
            lit("COOKIE NOTICE: accept our cookies"))
            .otherwise(concat(lit("Title "), col("doc_id").cast("string"))),
          col("text"),
          when(col("doc_id") % 2 === 0, lit("(c) 2026 Example Corp"))
            .otherwise(concat(lit("ref "), col("doc_id").cast("string"))))
          .as("page"))
      TextAnalysis.removeBoilerplateLines(pages, "doc_id", "page",
        minDocFrac = 0.05)
    }),

    // TARGET-TRAINED LM QUALITY SCORE (q200, the CCNet shape — Wenzek et
    // al. 2020): a Jelinek-Mercer bigram LM trained on the src0 slice
    // scores EVERY doc's cross-entropy; low = target-like. Counts are
    // hash-aggs with map-side combine; scoring is shuffle joins on the
    // token keys (LM tables are vocabulary-sized — never broadcast at
    // 100 TB) + a broadcast 2-scalar totals row; round-6 keeps the score
    // engine-portable.
    "q200_lm_perplexity" -> ((s, dir) => {
      TextAnalysis.lmScore(
        t(s, dir, "documents").select(col("doc_id"), col("text"),
          col("source")),
        "doc_id", "text", col("source") === "src0")
    }),

    "q135_gopher_rules" -> ((s, dir) => {
      val txt = col("text")
      val nw = TextAnalysis.nTokens(txt)
      val ml = TextAnalysis.meanWordLen(txt)
      val stops = TextAnalysis.stopHitCount(txt, Seq("the", "a", "to", "of"))
      val ttrC = TextAnalysis.typeTokenRatio(txt)
      val wcOk = nw.between(40L, 100000L)
      val mlOk = ml.between(3.0, 4.5)
      val stopOk = stops >= 2L
      val repOk = ttrC >= 0.5
      t(s, dir, "documents").select(
        col("doc_id"), nw.as("n_words"),
        round(ml, 6).as("mean_word_len"),
        stops.as("stop_hits"),
        round(ttrC, 6).as("ttr"),
        wcOk.as("wc_ok"), mlOk.as("ml_ok"),
        stopOk.as("stop_ok"), repOk.as("rep_ok"),
        (wcOk && mlOk && stopOk && repOk).as("passes"))
    }),

    // FILTERED ANN (q145): the vector-store "search with metadata filter"
    // staple — top-k restricted to corpus vectors whose label passes a
    // predicate, served from the IVF index with the filter applied to the
    // inverted lists BEFORE ranking (rank-exact within probed cells of
    // the filtered corpus; never silently fewer than k the way
    // rank-then-filter degrades). Recall-gated against the exact twin
    // computed on the pre-filtered corpus.
    "q145_ann_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val pred = col("label") % 3 === 0
      val exact = Similarity.bruteForceTopK(probes, corpus.filter(pred),
        k = 10)
      val (centroids, assignment) = Ivf.buildIndex(corpus, c = 10, iters = 1)
      val filtered = Ivf.ivfTopKFiltered(probes, corpus, centroids, pred,
        k = 10, nProbe = 4, assignment = Some(assignment))
      RecallGate.gate(exact, filtered, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.30, what = "q145 filtered ANN top-k",
        requireExactPrecision = false)
    }),

    // ONE-PASS CORPUS PROFILE (q146): the per-language summary a pipeline
    // operator reads before choosing mixing/filter thresholds — doc
    // counts, token totals, mean quality, char-length extremes, and
    // distinct-source counts, all in ONE scan + one hash aggregation
    // (every measure is a codegen column expression; map-side partials
    // carry one row per language per partition — profile cost is the scan,
    // independent of group fan-out, at 100 TB as at 500 rows).
    "q146_corpus_profile" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.nTokens(txt)).as("total_tokens"),
          round(avg(TextAnalysis.qualityScore(txt)), 6).as("avg_quality"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          countDistinct(col("source")).as("n_sources"))
    }),

    // INCREMENTAL IVF MAINTENANCE (q147, the q127 bloom-append shape for
    // ANN): a new vector batch joins the index by assignment to the
    // EXISTING centroids — postings appended, indexed corpus never
    // re-read, existing postings byte-untouched (fingerprint-gated
    // in-query). Search over the extended index is recall-gated against
    // the exact twin over the FULL corpus, so a maintenance bug that
    // dropped or mis-binned the batch fails the gate.
    "q147_ann_incremental" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val old = corpus.filter(col("vec_id") % 4 =!= 0)
      val batch = corpus.filter(col("vec_id") % 4 === 0)
      val (centroids, assignment) = Ivf.buildIndex(old, c = 10, iters = 1)
      val extended = Ivf.extendIndex(centroids, assignment,
        batch.select(col("vec_id"), col("embedding"))).localCheckpoint()
      val incrementalOk = RecallGate.equivalentFingerprint(Seq(
        (extended.join(old.select(col("vec_id")), "vec_id")
          .select(col("vec_id"), col("centroid_id")),
          assignment.select(col("vec_id"), col("centroid_id")),
          "q147 old postings must be untouched by the append")),
        Seq("vec_id", "centroid_id"))
      val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
      val ivf = Ivf.ivfTopK(probes, corpus, centroids, k = 10, nProbe = 3,
        assignment = Some(extended))
      RecallGate.gate(exact, ivf, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.30, what = "q147 incrementally-maintained ANN",
        requireExactPrecision = false)
        .withColumn("incremental_ok", lit(incrementalOk))
    }),

    // FUZZY KEY JOIN (q161): one-typo entity resolution via SymSpell
    // deletion neighborhoods — candidates come from a variant-bucket
    // self-join (each string explodes into |s|+1 single-deletion
    // variants; distance-1 pairs provably share one), verified by one
    // exact levenshtein — banded like MinHash, never all-pairs. The
    // oracle recomputes the full quadratic truth on the slice, so a
    // missed bucket (recall) or an unverified candidate (precision)
    // hash-mismatches.
    "q161_fuzzy_join" -> ((s, dir) => {
      Fuzzy.editDistance1Pairs(
        t(s, dir, "customer").filter(col("c_custkey") <= 200),
        "c_custkey", "c_name")
    }),

    // PURE-SQL VECTOR MATH (q163): dot products and norms as
    // `zip_with` + `aggregate` higher-order functions — the
    // no-custom-Expression fallback every Spark shop can deploy (the
    // codegen `cosine_sim` is the fast path; this is the portable one).
    // Emits consecutive-id pair dots/norms/cosines; the in-query gate
    // requires the SQL-computed cosine to equal the native expression's
    // on every pair at 6 decimals, so the two implementations
    // cross-validate.
    "q163_sql_vector_math" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 60)
      val pairs = emb.select(col("vec_id"), col("embedding").as("ea"))
        .join(emb.select((col("vec_id") - 1).as("vec_id"),
          col("embedding").as("eb")), "vec_id")
      val dot = expr("aggregate(zip_with(ea, eb, (x, y) -> " +
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), " +
        "(acc, v) -> acc + v)")
      def norm(c: String) = expr(s"sqrt(aggregate($c, CAST(0 AS DOUBLE), " +
        "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
      val out = pairs.select(col("vec_id"),
          round(dot, 6).as("dot"),
          round(norm("ea"), 6).as("norm_a"),
          round(norm("eb"), 6).as("norm_b"),
          round(dot / (norm("ea") * norm("eb")), 6).as("cos"),
          (round(dot / (norm("ea") * norm("eb")), 6) ===
            round(Similarity.cosine(col("ea"), col("eb")), 6))
            .as("native_matches_ok"))
        .localCheckpoint()
      require(out.filter(!col("native_matches_ok")).isEmpty,
        "q163 SQL vector math diverges from the native cosine expression")
      out
    }),

    // CORPUS-STATISTICAL RARITY SCORE (q165): a count-based surprisal
    // proxy with EXACT-RATIONAL arithmetic — per-document mean inverse
    // character-bigram frequency against the corpus's own counts (rare
    // character patterns score high: mojibake, ciphered junk, wrong-
    // alphabet text — the signal an n-gram LM filter uses, minus the
    // libm log whose rounding would break oracle parity). One explode +
    // two hash aggregations + one broadcast join against the ~|Σ|² count
    // table; linear in the scan at 100 TB.
    "q165_bigram_rarity" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val bg = docs.select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(text) - 1, 1)), " +
          "i -> substring(text, i, 2))")).as("bg"))
      val counts = bg.groupBy(col("bg")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val total = counts.agg(sum(col("n")).cast("double").as("total"))
      bg.join(broadcast(counts), "bg")
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(round(avg(col("total") / col("n")), 6).as("rarity"),
          count(lit(1)).as("n_bigrams"))
    }),

    // TOMBSTONE-AWARE ANN (q167): deleting vectors from the live index —
    // the maintenance half q147's append leaves open. An anti-join drops
    // the tombstoned ids' postings (surviving postings fingerprint-
    // proven untouched); search over the pruned index is recall-gated
    // against the exact twin over the SURVIVOR corpus, and an in-query
    // require proves no deleted id can ever be served.
    "q167_ann_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val (centroids, assignment) = Ivf.buildIndex(corpus, c = 10, iters = 1)
      val tombstones = corpus.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"))
      val pruned = Ivf.removeFromIndex(assignment, tombstones)
        .localCheckpoint()
      val untouchedOk = RecallGate.equivalentFingerprint(Seq(
          (pruned.select(col("vec_id"), col("centroid_id")),
            assignment.join(tombstones, Seq("vec_id"), "left_anti")
              .select(col("vec_id"), col("centroid_id")),
            "q167 surviving postings must be byte-identical")),
        Seq("vec_id", "centroid_id"))
      val survivors = corpus.join(tombstones, Seq("vec_id"), "left_anti")
      val exact = Similarity.bruteForceTopK(probes, survivors, k = 10)
      val ivf = Ivf.ivfTopK(probes, corpus, centroids, k = 10, nProbe = 3,
        assignment = Some(pruned))
      val gated = RecallGate.gate(exact, ivf,
        Seq("probe_id", "neighbor_id"), recallFloor = 0.30,
        what = "q167 post-delete ANN", requireExactPrecision = false)
      require(ivf.join(tombstones.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_semi").isEmpty,
        "q167 a deleted vector was served from the index")
      gated.withColumn("untouched_ok", lit(untouchedOk))
    }),

    // PREFIX-FILTERED SET-SIMILARITY JOIN (q168, the AllPairs/PPJoin
    // family): EXACT word-set Jaccard ≥ 0.9 pairs — candidates come only
    // from each document's rarest-token PREFIX (provably shared by any
    // qualifying pair), verified by exact intersection. The oracle
    // recomputes the full quadratic truth on the slice, so a prefix miss
    // (broken frequency ordering, off-by-one prefix length) loses a pair
    // and hash-mismatches — COMPLETENESS is the oracle's to catch; the
    // in-query gate just pins that the threshold is selective here.
    "q168_prefix_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 150)
      val pairs = Dedup.prefixJaccardPairsWords(docs, "doc_id", "text",
        threshold = 0.9).localCheckpoint()
      val n = docs.count()
      val selectiveOk = pairs.count() < n * (n - 1) / 2
      require(selectiveOk, "q168 threshold admitted the whole pair space")
      pairs.select(col("doc_a"), col("doc_b"),
          round(col("jaccard"), 6).as("jaccard"))
        .withColumn("selective_ok", lit(selectiveOk))
    }),

    // GOPHER REPETITION SIGNALS (q205 — Rae et al. 2021 Table A1, the
    // repetitious-text rules q135's lexical half doesn't cover): most
    // frequent 2-gram coverage + duplicated 5-gram coverage, both as
    // POSITION-UNION character fractions (overlap never double-counts,
    // bounded ≤ 1), with Gopher's published cutoffs (top-2-gram ≤ 0.20,
    // dup-5-gram ≤ 0.15) as pass flags. Grams are codegen array
    // expressions; counts/coverage shuffle on doc-embedded keys only.
    "q205_gopher_repetition" -> ((s, dir) => {
      // every 4th doc re-quotes its own opening (first 6 tokens appended)
      // — the self-plagiarizing shape the dup-5-gram rule exists to
      // catch; the raw corpus is random word soup with no repeated
      // 5-grams, so without this the dup arm would gate nothing.
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" "),
            expr("array_join(slice(split(text, ' '), 1, 6), ' ')")))
          .otherwise(col("text")).as("text"))
      val r = TextAnalysis.repetitionSignals(
        docs, "doc_id", "text", nTop = 2, nDup = 5).localCheckpoint()
      val fired = r.filter(col("dup_frac") > 0).count()
      val clean = r.filter(col("dup_frac") === 0).count()
      require(fired > 0 && clean > 0,
        s"q205 dup-gram arm vacuous: fired=$fired clean=$clean")
      r.select(col("doc_id"), col("top_gram"), col("top_frac"),
        col("dup_frac"),
        (col("top_frac") <= 0.20).as("top_ok"),
        (col("dup_frac") <= 0.15).as("dup_ok"),
        (col("top_frac") <= 0.20 && col("dup_frac") <= 0.15).as("passes"))
    }),

    // CORPUS INTAKE PIPELINE (q209): the standard web-corpus front half —
    // language gate → quality gate → exact dedup (keep-first) → split
    // assignment — composed END TO END as one declarative plan, the way a
    // user would actually chain the engine's curation stages. Shuffle
    // shape: the gates are pure codegen column filters fused into the ONE
    // corpus scan; dedup is one hash-agg on the fingerprint plus a
    // semi-join back (both shuffle the POST-gate survivors only — the
    // gates prune before any data movement); split assignment is a row
    // property. Nothing in the chain shuffles the corpus twice.
    // DISTILLED LANGUAGE-ID (q221, the learned counterpart of q22's
    // rules engine): a supervised Naive Bayes bag-of-words classifier
    // (TextAnalysis.nbClassify — the linear-over-n-gram-counts family
    // language ID belongs to) TRAINED on the labels the q22 heuristic
    // assigns to the even-doc_id half, scored over the whole corpus —
    // the public distillation recipe (a fast learned model replaces a
    // rules engine at scale). Closed-form Laplace counts make the
    // trained model exactly reproducible, so the oracle RETRAINS it;
    // the held-out halves' teacher agreement is gated in-query (floor
    // 0.6 vs the 3-class majority baseline ~0.35) and emitted round-6.
    "q221_distilled_lang_id" -> ((s, dir) => {
      val teacher = t(s, dir, "documents").select(col("doc_id"),
        col("text"),
        TextAnalysis.langIdHeuristic(col("text")).as("teacher_lang"))
      val pred = TextAnalysis.nbClassify(teacher, "doc_id", "text",
        "teacher_lang", col("doc_id") % 2 === 0)
      val out = teacher.join(pred, Seq("doc_id"))
        .withColumn("is_train", col("doc_id") % 2 === 0)
        .withColumn("agree", col("pred") === col("teacher_lang"))
      val acc = out.filter(!col("is_train"))
        .agg(avg(when(col("agree"), 1.0).otherwise(0.0))).head().getDouble(0)
      require(acc >= 0.6,
        f"q221 held-out teacher agreement $acc%.3f below the 0.6 floor " +
          "(3-class majority baseline ~0.35) — the distilled model did " +
          "not learn the teacher")
      out.select(col("doc_id"), col("teacher_lang"),
        col("pred").as("pred_lang"), col("nb_score"), col("is_train"),
        col("agree"))
        .withColumn("heldout_agreement", round(lit(acc), 6))
    }),

    "q209_corpus_intake" -> ((s, dir) => {
      // round-15 upgrade: the lang gate is the DISTILLED learned model
      // (q221's nbClassify, teacher = the q22 heuristic on the training
      // half) instead of running the rules engine over the whole corpus.
      // Round 16: TRAIN-ONCE-REUSE (q110's persisted-index pattern) —
      // the first intake trains, passes the held-out gate, and PERSISTS
      // the model to parquet; every later intake reloads the
      // vocab×classes-sized tables and broadcasts them into the scoring
      // join, never paying the training pass again. At 100 TB that
      // flips intake cost from corpus-sized distillation per run to one
      // bounded model read.
      val docs = t(s, dir, "documents")
      val modelDir = nbModelCache.computeIfAbsent(s"q209:$dir", _ => {
        val d = QueryTmp.dir("q209_nb_model")
        val teacher = docs.select(col("doc_id"), col("text"),
          TextAnalysis.langIdHeuristic(col("text")).as("teacher_lang"))
        // PRUNE before persist: the persisted count table is what later
        // intakes BROADCAST, and an open-vocabulary table is
        // corpus-vocab-sized at 100 TB — capping at top-N words per
        // class bounds the broadcast by construction (classes×N rows)
        // while pruned words fall to the same Laplace floor as unseen
        // ones. The held-out gate runs on the PRUNED model — an ungated
        // model is never persisted, and the gate must gate what serves.
        val model = TextAnalysis.nbPrune(
          TextAnalysis.nbTrain(teacher, "doc_id", "text",
            "teacher_lang", col("doc_id") % 2 === 0), nbVocabCap)
        val acc = TextAnalysis.nbApply(model, teacher, "doc_id", "text")
          .join(teacher, Seq("doc_id"))
          .filter(col("doc_id") % 2 === 1)
          .agg(avg(when(col("pred") === col("teacher_lang"), 1.0)
            .otherwise(0.0))).head().getDouble(0)
        require(acc >= 0.6,
          f"q209 distilled lang gate agreement $acc%.3f below floor")
        TextAnalysis.nbSave(model, d)
        d
      })
      val nb = TextAnalysis.nbApply(TextAnalysis.nbLoad(s, modelDir),
        docs, "doc_id", "text", broadcastModel = true)
      val lang = docs
        .join(nb.select(col("doc_id"), col("pred").as("pred_lang")),
          Seq("doc_id"))
        .filter(col("pred_lang") =!= "other")
      val qual = lang
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.5 &&
          TextAnalysis.nTokens(col("text")) >= 20)
        .withColumn("quality",
          round(TextAnalysis.qualityScore(col("text")), 6))
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val keep = qual.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      qual.join(keep, Seq("fp", "doc_id"), "left_semi")
        .select(col("doc_id"), col("pred_lang"), col("quality"),
          graft.ext.Curation.splitAssign(col("doc_id")).as("split"))
    }),

    // LEXICAL RETRIEVAL (q223, round 15): BM25 over an inverted index —
    // the lexical arm of the similarity family (q29+ are the dense arm),
    // the production shape for benchmark decontamination lookups.
    // Postings/df are hash-aggs (stopword skew is absorbed map-side, never
    // a hot join key); the bounded query-term set broadcasts into the
    // postings join, so the corpus side never shuffles. Oracle-exact: BM25
    // is pure arithmetic over (tf, df, dl, N, avgdl), rounded to 6 before
    // the rank on both sides.
    "q223_bm25_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val q = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          explode(slice(split(col("text"), " "), 1, 5)).as("token"))
        .distinct()
      Search.bm25TopK(q, docs, "doc_id", "text", k = 10)
    }),

    // TF-IDF SPARSE COSINE (q224, round 15): bounded probe docs against
    // the corpus through a postings self-join on token — the sparse dot
    // product where only co-occurring tokens meet. Tokens in > 80% of the
    // corpus drop before the join (the stopword/skew guard, corpus-size-
    // relative; the synthetic vocab is dense, so 0.8 trims the ubiquitous
    // tail without emptying the token space). Exact within the pruned
    // space; oracle reproduces the same weighting (ln(1+tf)·ln(N/df)) and
    // pruning.
    "q224_tfidf_pairs" -> ((s, dir) => {
      Search.tfidfTopK(t(s, dir, "documents"), "doc_id", "text",
        probeFilter = col("doc_id") < 5, maxDfFrac = 0.8, k = 5)
    }),

    // BPE MERGE TRAINING (q228, round 15): Sennrich et al. 2016 as Spark
    // aggregates — merges train on the distinct-word table weighted by
    // frequency (corpus-size-independent after one explode+hash-agg), each
    // iteration is one integer hash-agg over adjacent symbol pairs plus
    // ONE driver-read argmax row; the merge applies as a literal `replace`
    // in the projection (greedy leftmost scan — see [[graft.ext.Bpe]] for
    // why the two-space encoding makes that exact). Fully oracle-exact:
    // integer counts, deterministic tie-break, and the DuckDB oracle
    // unrolls the same 8 iterations with scalar-subquery replaces.
    "q228_bpe_train" -> ((s, dir) =>
      graft.ext.Bpe.trainFrame(s, t(s, dir, "documents"), "text",
        merges = 8)),

    // BPE CORPUS ENCODING (q229, round 15): apply q228's trained merges
    // back to the full corpus word stream — the tokenizer side of the
    // trainer. The merge chain is literal `replace` calls folded into the
    // projection (pure codegen map over the corpus: ZERO shuffles after
    // the per-source aggregate), so encoding 100 TB is one streaming
    // pass. Emits per-source token compression, integer-exact.
    "q229_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.ext.Bpe.train(docs, "text", merges = 8)
      docs.select(col("source"),
          explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .select(col("source"), col("word"),
          graft.ext.Bpe.encode(col("word"), merges).as("toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("word"))).cast("long").as("base_tokens"),
          sum(size(col("toks"))).cast("long").as("bpe_tokens"))
        .select(col("source"), col("n_words"), col("base_tokens"),
          col("bpe_tokens"),
          round(col("base_tokens").cast("double") /
            col("bpe_tokens").cast("double"), 6).as("compression"))
    }),

    // HYBRID RETRIEVAL — RRF FUSION (q230, round 15): the lexical arm
    // (q223's BM25) and the dense arm (q29's exact cosine) fused by
    // reciprocal-rank (1/(60+rank) summed where an id appears in either
    // top-50). The join operates on two BOUNDED per-query top-k lists —
    // corpus-scale work stays inside the arms. Deterministic: both arms
    // rank on 6-rounded scores with id tie-breaks; fusion adds two fixed
    // terms.
    // SEMDEDUP-PROPER (q231, round 15): the cluster-partitioned form of
    // semantic dedup (Abbas et al. 2023) — k-means (the IVF coarse
    // quantizer, deterministic seeding) partitions the embedding space and
    // pairs are generated ONLY within a cluster (top-2 multi-assignment
    // recovers boundary-straddlers), exact-cosine verified. Complements
    // q103's banded-LSH generator: same gate discipline (recall floor
    // in-query, precision exact by construction), emitted rows are the
    // oracle-reproducible exact pair plane.
    "q231_semdedup_kmeans" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings").filter(col("vec_id") < 500)
      val exact = Similarity.cosineNearDupPairs(vecs, threshold = 0.4)
      val cents = Ivf.trainCentroids(vecs, c = 4, iters = 2)
      val sem = Similarity.semDedupPairs(vecs, cents, threshold = 0.4,
        topAssign = 2)
      RecallGate.gate(exact, sem, Seq("id_a", "id_b"),
        recallFloor = 0.70, what = "q231 SemDeDup cluster-partitioned pairs")
    }),

    "q230_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qterms = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          explode(slice(split(col("text"), " "), 1, 5)).as("token"))
        .distinct()
      val lex = Search.bm25TopK(qterms, docs, "doc_id", "text", k = 50)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val probes = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("probe_id"), col("embedding"))
      val dense = Similarity.bruteForceTopK(probes, emb, k = 50)
        .select(col("probe_id").as("query_id"),
          col("neighbor_id").as("id"), col("rank"))
      Search.rrfFuse(lex, dense, k = 10)
    }),

    // CONTRASTIVE HARD-NEGATIVE MINING (q238, round 15): for each anchor
    // (vec_id < 5, carrying its class label), the 10 corpus vectors that
    // score highest while being DIFFERENT-labeled (true negatives) and
    // below a 0.95 near-dup ceiling (a mislabeled twin of the anchor can't
    // poison the negative set) — the offline batch job behind
    // DPR/SimCSE-style embedding training. Emits the exact plane
    // (oracle-reproducible); the production-scale arm — IVF retrieval with
    // 4× overfetch, label/ceiling filter, re-rank — runs in-query as the
    // recall-gate subject, so a seed or filter regression fails the hash
    // compare. No precision gate: the IVF arm legitimately backfills
    // missed slots with lower-ranked negatives.
    "q238_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding"),
          col("label").as("probe_label"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val exact = Similarity.hardNegatives(probes, corpus,
        k = 10, dupCeiling = 0.95)
      val (cents, carried) = Ivf.buildIndex(corpus, c = 4, iters = 2)
      val cand = Ivf.ivfTopK(probes, corpus, cents, k = 40, nProbe = 2,
        assignment = Some(carried))
        .join(corpus.select(col("vec_id").as("neighbor_id"), col("label")),
          "neighbor_id")
        .join(probes.select(col("probe_id"), col("probe_label")), "probe_id")
        .filter(col("probe_label") =!= col("label") &&
          col("cos_sim") < 0.95)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      val approx = cand.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("probe_id"), col("neighbor_id"))
      RecallGate.gate(exact, approx, Seq("probe_id", "neighbor_id"),
        recallFloor = 0.50, what = "q238 IVF-retrieved hard negatives",
        requireExactPrecision = false)
    }),

    // LATE-INTERACTION RETRIEVAL (q240, round 15): ColBERT-style MaxSim —
    // query and document as BAGS of token vectors (the embedding's 4
    // contiguous 16-dim slices, deterministic), score = per-query-token
    // best doc-token cosine, summed. Completes the retrieval family:
    // lexical BM25 (q223), dense single-vector (q29/q45), hybrid RRF
    // (q230), late interaction (here). Two hash aggregates over a
    // broadcast probe-token plane — the token-interaction matrix is never
    // materialized; at corpus scale an ANN prefilter feeds this as the
    // re-scorer.
    "q240_late_interaction" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lateInteractionTopK(
        probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        corpus = emb.filter(col("vec_id") >= 5),
        k = 10)
    })
  )

  private val stopList = "['the','a','of','and','to','in']"
  private val toks = "string_split(text, ' ')"
  private val nTok = s"len($toks)"
  private val stopRatio =
    s"len(list_filter($toks, t -> list_contains($stopList, t)))::DOUBLE / $nTok::DOUBLE"
  private val ttr = s"len(list_distinct($toks))::DOUBLE / $nTok::DOUBLE"
  private val quality =
    s"(1.0 - $stopRatio) * 0.5 + least(CAST($nTok AS DOUBLE), 100.0) / 100.0 * 0.25 + $ttr * 0.25"

  /** DuckDB CTE block RETRAINING q221's distilled Naive Bayes (teacher =
    * the q22 heuristic on the even-doc_id half; Laplace-smoothed
    * bag-of-words; round-6 argmax with class-ascending tiebreak) —
    * yields `lbl(doc_id, text, teacher_lang, tr)` and
    * `nbp(doc_id, pred_lang, nb_score)`. Shared by q221 (full vocab,
    * `vocabCap = None`) and q209 (persisted model pruned to top-N words
    * per class; the oracle mirrors the prune: scoring left-joins the
    * CAPPED count table while the smoothing denominators t/v keep their
    * full-training values — [[TextAnalysis.nbPrune]] semantics). */
  private def nbCte(vocabCap: Option[Int] = None) = {
    val ccnt = vocabCap match {
      case None => "ccnt AS (SELECT cls, w, n FROM ccnt_all)"
      case Some(cap) =>
        s"""ccnt AS (SELECT cls, w, n FROM (
           |  SELECT *, row_number() OVER (PARTITION BY cls
           |    ORDER BY n DESC, w ASC) AS rk FROM ccnt_all) WHERE rk <= $cap)""".stripMargin
    }
    s"""lbl AS (SELECT doc_id, text,
       |  CASE WHEN len(list_filter($toks, t -> t = 'the'))::DOUBLE / $nTok::DOUBLE >= 0.04 THEN 'en'
       |       WHEN len(list_filter($toks, t -> t = 'the'))::DOUBLE / $nTok::DOUBLE >= 0.015
       |         OR (length(text) - length(replace(text, 'th', '')))::DOUBLE / 2.0 / length(text)::DOUBLE >= 0.02 THEN 'en_like'
       |       ELSE 'other' END AS teacher_lang,
       |  doc_id % 2 = 0 AS tr
       |  FROM documents),
       |fw AS (SELECT doc_id, teacher_lang, tr,
       |         unnest(string_split(lower(text), ' ')) AS w FROM lbl),
       |ccnt_all AS (SELECT teacher_lang AS cls, w, count(*) AS n
       |         FROM fw WHERE tr GROUP BY 1, 2),
       |$ccnt,
       |cpri AS (SELECT teacher_lang AS cls, count(*) AS p
       |         FROM lbl WHERE tr GROUP BY 1),
       |ctot AS (SELECT cls, sum(n) AS t FROM ccnt_all GROUP BY 1),
       |cc AS (SELECT (SELECT sum(p) FROM cpri)::DOUBLE AS ntr,
       |              (SELECT count(DISTINCT w) FROM ccnt_all)::DOUBLE AS v),
       |sc AS (SELECT fw.doc_id, cpri.cls,
       |         round(ln(cpri.p::DOUBLE / cc.ntr) +
       |           sum(ln((coalesce(ccnt.n, 0) + 1)::DOUBLE /
       |                  (ctot.t::DOUBLE + cc.v))), 6) AS s
       |       FROM fw CROSS JOIN cpri
       |         JOIN ctot ON ctot.cls = cpri.cls
       |         LEFT JOIN ccnt ON ccnt.cls = cpri.cls AND ccnt.w = fw.w
       |         CROSS JOIN cc
       |       GROUP BY fw.doc_id, cpri.cls, cpri.p, ctot.t, cc.ntr, cc.v),
       |nbp AS (SELECT doc_id, cls AS pred_lang, s AS nb_score
       |        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |                ORDER BY s DESC, cls) AS rk FROM sc)
       |        WHERE rk = 1)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q221_distilled_lang_id" ->
      s"""WITH ${nbCte()},
         |j AS (SELECT l.doc_id, l.teacher_lang, n.pred_lang, n.nb_score,
         |        l.tr AS is_train, n.pred_lang = l.teacher_lang AS agree
         |      FROM lbl l JOIN nbp n USING (doc_id)),
         |a AS (SELECT round(avg(CASE WHEN agree THEN 1.0 ELSE 0.0 END), 6)
         |        AS ha FROM j WHERE NOT is_train)
         |SELECT j.*, a.ha AS heldout_agreement FROM j, a""".stripMargin,
    "q21_text_stats" ->
      s"""SELECT doc_id,
         |  CAST($nTok AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct($toks)) AS BIGINT) AS n_uniq,
         |  round($stopRatio, 6) AS stop_ratio,
         |  round($quality, 6) AS quality
         |FROM documents""".stripMargin,
    "q22_lang_id" ->
      s"""SELECT doc_id, lang,
         |  CASE
         |    WHEN len(list_filter($toks, t -> t = 'the'))::DOUBLE / $nTok::DOUBLE >= 0.04 THEN 'en'
         |    WHEN len(list_filter($toks, t -> t = 'the'))::DOUBLE / $nTok::DOUBLE >= 0.015
         |      OR (length(text) - length(replace(text, 'th', '')))::DOUBLE / 2.0 / length(text)::DOUBLE >= 0.02 THEN 'en_like'
         |    ELSE 'other' END AS pred_lang
         |FROM documents""".stripMargin,
    "q23_quality_filter" ->
      s"""SELECT doc_id, round($quality, 6) AS quality
         |FROM documents
         |WHERE ($quality) >= 0.5 AND $nTok >= 20""".stripMargin,
    "q24_fingerprint" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |  list_min(list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
        |    i -> md5(concat(ws[CAST(i AS INT)], ' ', ws[CAST(i AS INT) + 1], ' ', ws[CAST(i AS INT) + 2])))) AS min_shingle_fp
        |FROM w""".stripMargin,
    "q49_token_freq" ->
      """SELECT t.token AS token, count(*) AS n
        |FROM documents, unnest(string_split(text, ' ')) AS t(token)
        |GROUP BY 1
        |ORDER BY n DESC, token ASC
        |LIMIT 20""".stripMargin,
    "q25_exact_dedup" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY 1""".stripMargin,
    "q26_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
        |sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS s
        |       FROM d, unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(c::DOUBLE / (x.n + y.n - c)::DOUBLE, 6) AS jaccard
        |FROM inter
        |JOIN sz x ON doc_a = x.doc_id
        |JOIN sz y ON doc_b = y.doc_id
        |WHERE c::DOUBLE / (x.n + y.n - c)::DOUBLE >= 0.3""".stripMargin,
    "q59_dedup_clusters" ->
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
        |  SELECT e.x, r.label FROM edges e JOIN reach r ON e.y = r.node)
        |SELECT node AS doc_id, min(label) AS cluster_id,
        |  node = min(label) AS is_canonical
        |FROM reach GROUP BY node""".stripMargin,
    "q104_incremental_exact_screen" ->
      """WITH batch AS (
        |  SELECT doc_id + 300000 AS batch_id, text
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 400000,
        |    text || ' q104novel' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 7 = 1),
        |store AS (
        |  SELECT text, min(doc_id) AS keep_id
        |  FROM documents WHERE text IS NOT NULL GROUP BY text)
        |SELECT b.batch_id,
        |  s.keep_id IS NOT NULL AS is_dup,
        |  coalesce(s.keep_id, -1) AS dup_of
        |FROM batch b LEFT JOIN store s ON b.text = s.text""".stripMargin,
    // q27's emitted rows are the EXACT word-3-shingle Jaccard pairs (set
    // semantics, null texts shingle to nothing); the gate booleans are
    // constants the in-query RecallGate guarantees.
    "q27_minhash_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
        |       FROM t, unnest(range(1, greatest(len(w) - 2, 1) + 1)) AS u(i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(c::DOUBLE / (x.n + y.n - c)::DOUBLE, 6) AS jaccard,
        |  TRUE AS recall_ok, TRUE AS precision_ok
        |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |WHERE c::DOUBLE / (x.n + y.n - c)::DOUBLE >= 0.5""".stripMargin,
    // q28 emits the byte-identical pair set over the dup-augmented corpus
    // (SQL text-equality join); the booleans assert SimHash banding ≡ brute
    // force (pigeonhole) and hamming-0 retrieval of every identical pair.
    "q28_simhash_pairs" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |             UNION ALL
        |             SELECT doc_id + 100000, text FROM documents
        |             WHERE doc_id % 5 = 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 0 AS hamming,
        |  TRUE AS recall_ok, TRUE AS pigeonhole_ok
        |FROM aug a JOIN aug b
        |  ON a.text = b.text AND a.doc_id < b.doc_id""".stripMargin,
    // q105 emits the text-identity pair set over the %5-augmented corpus
    // (same text ⇒ same content-seeded image ⇒ within the jitter's one-bit
    // hamming bound); the booleans assert the REAL decode→dHash→banded-join
    // retrieval matched it exactly in both directions.
    "q105_image_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |             UNION ALL
        |             SELECT doc_id + 100000, text FROM documents
        |             WHERE doc_id % 5 = 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  TRUE AS recall_ok, TRUE AS precision_ok, TRUE AS pigeonhole_ok
        |FROM aug a JOIN aug b
        |  ON a.text = b.text AND a.doc_id < b.doc_id""".stripMargin,
    // q125 emits the text-identity pair set over the %7-augmented corpus
    // (the audio twin of q105's oracle).
    "q125_audio_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |             UNION ALL
        |             SELECT doc_id + 100000, text FROM documents
        |             WHERE doc_id % 7 = 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  TRUE AS recall_ok, TRUE AS precision_ok, TRUE AS pigeonhole_ok
        |FROM aug a JOIN aug b
        |  ON a.text = b.text AND a.doc_id < b.doc_id""".stripMargin,
    "q132_video_neardup" ->
      """WITH aug AS (SELECT doc_id, text FROM documents
        |             UNION ALL
        |             SELECT doc_id + 100000, text FROM documents
        |             WHERE doc_id % 11 = 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  TRUE AS recall_ok, TRUE AS precision_ok, TRUE AS pigeonhole_ok
        |FROM aug a JOIN aug b
        |  ON a.text = b.text AND a.doc_id < b.doc_id""".stripMargin,
    "q29_cosine_topk" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
        |FROM s WHERE rank <= 10""".stripMargin,
    // q30/q45/q222 emit the exact brute-force top-k (the q29 plane) + the
    // ANN recall gate boolean; the LSH/IVF/kNN-graph retrieval runs
    // in-query as the gate subject.
    "q222_ann_knng" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    "q30_ann_lsh" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    // q238 = the q29 exact plane restricted to true negatives (different
    // label, cos < 0.95) + the IVF-arm recall-gate boolean; filters apply
    // BEFORE the rank on both sides so exclusions never hold a top-k slot.
    "q238_hard_negatives" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id),
        |f AS (SELECT s.probe_id, s.neighbor_id, s.cos_sim,
        |        row_number() OVER (PARTITION BY s.probe_id
        |          ORDER BY s.cos_sim DESC, s.neighbor_id ASC) AS rank
        |      FROM s JOIN embeddings pa ON s.probe_id = pa.vec_id
        |             JOIN embeddings ca ON s.neighbor_id = ca.vec_id
        |      WHERE pa.label <> ca.label AND s.cos_sim < 0.95)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok
        |FROM f WHERE rank <= 10""".stripMargin,
    // q240: MaxSim replayed sub-vector-wise — per (probe, doc, query-sub)
    // max of rounded sub-cosines, summed per (probe, doc), rounded, ranked.
    "q240_late_interaction" ->
      """WITH u AS (SELECT vec_id,
        |    (generate_subscripts(embedding, 1) - 1) // 16 AS sub,
        |    (generate_subscripts(embedding, 1) - 1) % 16 AS j,
        |    unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sub, sqrt(sum(v * v)) AS nrm
        |        FROM u GROUP BY 1, 2),
        |d AS (SELECT a.vec_id AS probe_id, a.sub AS qs,
        |        b.vec_id AS neighbor_id, b.sub AS ds, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.j = b.j
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2, 3, 4),
        |c AS (SELECT probe_id, qs, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cs
        |      FROM d JOIN nrm x ON d.probe_id = x.vec_id AND d.qs = x.sub
        |             JOIN nrm y ON d.neighbor_id = y.vec_id AND d.ds = y.sub),
        |mx AS (SELECT probe_id, neighbor_id, qs, max(cs) AS m
        |       FROM c GROUP BY 1, 2, 3),
        |sc AS (SELECT probe_id, neighbor_id, round(sum(m), 6) AS maxsim
        |       FROM mx GROUP BY 1, 2),
        |r AS (SELECT probe_id, neighbor_id, maxsim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY maxsim DESC, neighbor_id ASC) AS rank
        |      FROM sc)
        |SELECT probe_id, neighbor_id, maxsim, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,
    // q110 = q45's oracle plane (exact brute-force top-k + recall gate
    // boolean); the persisted-and-reloaded index probe is the gate subject.
    "q110_ivf_persisted" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    // q126 emits the exact brute-force top-k plane + the PQ recall gate
    // and compression gate booleans.
    "q126_ann_pq" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok, TRUE AS compressed_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    // q128 emits the exact brute-force top-k plane + the IVF-PQ recall,
    // compression, and cell-boundedness gate booleans.
    "q128_ann_ivfpq" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok, TRUE AS compressed_ok, TRUE AS cell_bounded_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    "q45_ann_ivf" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    // q56 emits the exact cosine near-dup pairs (the q31 plane) + both gate
    // booleans (banded retrieval recall ≥ 0.95, precision exactly 1.0).
    "q56_neardup_lsh" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
        |u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |             unnest(embedding)::DOUBLE AS v FROM e),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |  TRUE AS recall_ok, TRUE AS precision_ok
        |FROM d JOIN nrm x ON id_a = x.vec_id JOIN nrm y ON id_b = y.vec_id
        |WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.4""".stripMargin,
    "q31_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
        |u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |             unnest(embedding)::DOUBLE AS v FROM e),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot / (x.nrm * y.nrm), 6) AS cos_sim
        |FROM d JOIN nrm x ON id_a = x.vec_id JOIN nrm y ON id_b = y.vec_id
        |WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.4""".stripMargin,
    "q103_semantic_dedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
        |u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |             unnest(embedding)::DOUBLE AS v FROM e),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
        |      GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM d JOIN nrm x ON id_a = x.vec_id JOIN nrm y ON id_b = y.vec_id
        |  WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.4),
        |edges AS (SELECT id_a AS x, id_b AS y FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, label) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT g.x, r.label FROM edges g JOIN reach r ON g.y = r.node)
        |SELECT node AS vec_id, min(label) AS cluster_id,
        |  node = min(label) AS is_canonical, TRUE AS pairs_ok
        |FROM reach GROUP BY node""".stripMargin,
    "q50_quantize" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ve
        |  FROM embeddings),
        |m AS (SELECT vec_id, ve,
        |  list_max(list_transform(ve, v -> abs(v))) AS maxabs FROM e),
        |q AS (SELECT vec_id, ve, maxabs,
        |  CASE WHEN maxabs = 0 THEN list_transform(ve, v -> 0)
        |       ELSE list_transform(ve, v -> CAST(round(v * (127.0 / maxabs)) AS INTEGER))
        |  END AS qv
        |  FROM m)
        |SELECT vec_id,
        |  round(maxabs, 6) AS maxabs,
        |  list_min(qv) AS qmin,
        |  list_max(qv) AS qmax,
        |  CASE WHEN maxabs = 0 THEN 0.0 ELSE
        |  round(sqrt(list_sum(list_transform(range(1, len(ve) + 1),
        |    i -> (ve[CAST(i AS INT)] - qv[CAST(i AS INT)] / (127.0 / maxabs)) *
        |         (ve[CAST(i AS INT)] - qv[CAST(i AS INT)] / (127.0 / maxabs))))
        |    / len(ve)), 6) END AS rmse
        |FROM q""".stripMargin,
    "q32_multimodal_meta" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |p AS (SELECT doc_id, n % 3 AS m, n % 16 + 1 AS w, n % 9 + 1 AS h,
        |             n % 50 + 1 AS f FROM d)
        |SELECT doc_id AS media_id,
        |  CAST(CASE m
        |    WHEN 0 THEN 9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + w*h*3
        |    WHEN 1 THEN 54 + ((w*3 + 3) // 4) * 4 * h
        |    ELSE 44 + 2*f END AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN m = 2 THEN 0 ELSE w END AS BIGINT) AS width,
        |  CAST(CASE WHEN m = 2 THEN 0 ELSE h END AS BIGINT) AS height,
        |  CASE m WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'wav' END AS format,
        |  CAST(CASE WHEN m = 2 THEN f ELSE 1 END AS BIGINT) AS n_frames
        |FROM p""".stripMargin,
    "q36_hll_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_l_orderkey,
        |  count(DISTINCT l_partkey) AS exact_l_partkey,
        |  count(*) AS n,
        |  TRUE AS within_l_orderkey, TRUE AS within_l_partkey
        |FROM lineitem""".stripMargin,
    "q57_approx_percentile" ->
      """SELECT l_returnflag, count(*) AS n,
        |  TRUE AS within_p50, TRUE AS within_p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q102_incremental_neardup" ->
      """SELECT n.doc_id + 100000 AS new_id, s.doc_id AS store_id
        |FROM documents n JOIN documents s ON n.text = s.text
        |WHERE n.doc_id % 5 = 0""".stripMargin,
    "q100_passage_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |i AS (
        |  SELECT doc_id, w,
        |    unnest(generate_series(1, greatest(len(w) - 9, 1), 5)) AS i
        |  FROM t),
        |k AS (
        |  SELECT doc_id, md5(array_to_string(w[i:i+9], ' ')) AS wkey FROM i),
        |s AS (
        |  SELECT wkey FROM k GROUP BY wkey
        |  HAVING count(DISTINCT doc_id) > 1)
        |SELECT k.doc_id,
        |  count(*) AS n_windows,
        |  count(s.wkey) AS n_shared,
        |  round(count(s.wkey)::DOUBLE / count(*), 6) AS shared_ratio
        |FROM k LEFT JOIN s ON k.wkey = s.wkey
        |GROUP BY k.doc_id""".stripMargin,
    "q96_frame_sample" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |p AS (SELECT doc_id, n % 3 AS m, n % 16 + 1 AS w, n % 9 + 1 AS h,
        |             n % 50 + 1 AS f FROM d),
        |l AS (SELECT doc_id,
        |  CASE m WHEN 0 THEN w*3 WHEN 1 THEN ((w*3 + 3) // 4) * 4 ELSE 2 END AS fb,
        |  CASE WHEN m = 2 THEN f ELSE h END AS nf
        |  FROM p),
        |fr AS (SELECT doc_id, fb,
        |  unnest(generate_series(0, nf - 1, 2)) AS frame_no FROM l)
        |SELECT doc_id AS media_id,
        |  CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(fb AS BIGINT) AS frame_bytes,
        |  CAST(list_sum(list_transform(range(frame_no * fb, (frame_no + 1) * fb),
        |    i -> (doc_id + i) % 256)) AS BIGINT) AS byte_sum
        |FROM fr""".stripMargin,
    "q51_from_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q33_tumbling_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_epoch,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "q44_sliding_window" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w AS (SELECT ts, unnest([
        |        time_bucket(INTERVAL 30 MINUTE, ts),
        |        time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws
        |      FROM e)
        |SELECT CAST(epoch(ws) AS BIGINT) AS window_start_epoch, count(*) AS n
        |FROM w
        |WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR
        |GROUP BY 1""".stripMargin,
    "q34_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev IS NULL
        |    OR date_diff('second', prev, ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY 1""".stripMargin,
    "q35_asof_join" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id,
        |  o_orderkey AS asof_o_orderkey, o_totalprice AS asof_o_totalprice
        |FROM j WHERE rn = 1""".stripMargin,
    // q135 recomputes the whole Gopher rule battery in DuckDB from the
    // same exact-rational arithmetic (integer length sums divided once) —
    // measurements, per-rule flags, and the composite verdict all ride
    // q187: the ExactSubstr spans — identical md5 window fingerprints,
    // the >=2 occurrence HAVING, and the lag-based interval merge, all
    // recomputed in DuckDB.
    "q187_exact_substr" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |i AS (SELECT doc_id, unnest(generate_series(1, len(w) - 14, 1)) AS i, w
        |      FROM t WHERE len(w) >= 15),
        |k AS (SELECT doc_id, i - 1 AS pos,
        |        md5(array_to_string(w[i:i+14], ' ')) AS wkey FROM i),
        |d AS (SELECT wkey FROM k GROUP BY wkey HAVING count(*) >= 2),
        |p AS (SELECT k.doc_id, k.pos FROM k JOIN d USING (wkey)),
        |g AS (SELECT doc_id, pos,
        |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |               IS NULL THEN 1
        |             WHEN pos - lag(pos) OVER (PARTITION BY doc_id
        |               ORDER BY pos) > 15 THEN 1 ELSE 0 END AS ns
        |      FROM p),
        |s AS (SELECT doc_id, pos,
        |        sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
        |      FROM g)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 15 AS span_end,
        |  max(pos) + 15 - min(pos) AS span_tokens
        |FROM s GROUP BY doc_id, sid""".stripMargin,
    // q191: the incremental screen — corpus fingerprints, the same batch
    // construction, the store join, and the span merge all recomputed.
    "q191_incremental_exact_substr" ->
      """WITH corpus AS (SELECT string_split(text, ' ') AS w FROM documents),
        |ci AS (SELECT unnest(generate_series(1, len(w) - 14, 1)) AS i, w
        |       FROM corpus WHERE len(w) >= 15),
        |ck AS (SELECT DISTINCT md5(array_to_string(w[i:i+14], ' ')) AS wkey
        |       FROM ci),
        |batch AS (
        |  SELECT doc_id + 500000 AS doc_id, text FROM documents
        |  WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 600000 AS doc_id,
        |    text || ' q191novel' || doc_id AS text
        |  FROM documents WHERE doc_id % 7 = 3),
        |bt AS (SELECT doc_id, string_split(text, ' ') AS w FROM batch),
        |bi AS (SELECT doc_id, unnest(generate_series(1, len(w) - 14, 1)) AS i, w
        |       FROM bt WHERE len(w) >= 15),
        |bk AS (SELECT doc_id, i - 1 AS pos,
        |         md5(array_to_string(w[i:i+14], ' ')) AS wkey FROM bi),
        |p AS (SELECT bk.doc_id, bk.pos FROM bk JOIN ck USING (wkey)),
        |g AS (SELECT doc_id, pos,
        |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |               IS NULL THEN 1
        |             WHEN pos - lag(pos) OVER (PARTITION BY doc_id
        |               ORDER BY pos) > 15 THEN 1 ELSE 0 END AS ns
        |      FROM p),
        |s AS (SELECT doc_id, pos,
        |        sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
        |      FROM g)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 15 AS span_end,
        |  max(pos) + 15 - min(pos) AS span_tokens
        |FROM s GROUP BY doc_id, sid""".stripMargin,
    // q190: keep-one removal — canonical site via row_number over the
    // same fingerprints, coverage expansion, anti-join, ordered
    // string_agg reassembly.
    "q190_exact_substr_removal" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |i AS (SELECT doc_id, unnest(generate_series(1, len(w) - 14, 1)) AS i, w
        |      FROM t WHERE len(w) >= 15),
        |k AS (SELECT doc_id, i - 1 AS pos,
        |        md5(array_to_string(w[i:i+14], ' ')) AS wkey FROM i),
        |o AS (SELECT doc_id, pos,
        |        count(*) OVER (PARTITION BY wkey) AS occ,
        |        row_number() OVER (PARTITION BY wkey
        |          ORDER BY doc_id, pos) AS rn
        |      FROM k),
        |bad AS (SELECT DISTINCT doc_id, ti FROM (
        |  SELECT doc_id, unnest(generate_series(pos, pos + 14)) AS ti
        |  FROM o WHERE occ >= 2 AND rn > 1)),
        |toks AS (SELECT doc_id, ii - 1 AS ti, w[ii] AS tok
        |         FROM (SELECT doc_id, w,
        |                 unnest(generate_series(1, len(w), 1)) AS ii
        |               FROM t)),
        |kept AS (SELECT toks.doc_id, toks.ti, toks.tok FROM toks
        |         LEFT JOIN bad ON toks.doc_id = bad.doc_id
        |                      AND toks.ti = bad.ti
        |         WHERE bad.ti IS NULL),
        |agg AS (SELECT doc_id,
        |          string_agg(tok, ' ' ORDER BY ti) AS clean_text,
        |          count(*) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
        |  CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(len(t.w) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
        |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""".stripMargin,
    // q179: the balanced coreset — nearest-anchor assignment and the
    // 16-per-cluster quota recomputed from raw arrays.
    "q179_coreset_anchors" ->
      """WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
        |a AS (SELECT vec_id AS anchor_id, embedding FROM embeddings
        |      WHERE vec_id < 8),
        |cu AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |              unnest(embedding)::DOUBLE AS v FROM c),
        |au AS (SELECT anchor_id, generate_subscripts(embedding, 1) AS i,
        |              unnest(embedding)::DOUBLE AS v FROM a),
        |cn AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM cu GROUP BY 1),
        |an AS (SELECT anchor_id, sqrt(sum(v * v)) AS nrm FROM au GROUP BY 1),
        |d AS (SELECT cu.vec_id, au.anchor_id, sum(cu.v * au.v) AS dot
        |      FROM cu JOIN au ON cu.i = au.i GROUP BY 1, 2),
        |s AS (SELECT d.vec_id, d.anchor_id,
        |        round(dot / (cn.nrm * an.nrm), 6) AS cos_sim
        |      FROM d JOIN cn ON d.vec_id = cn.vec_id
        |             JOIN an ON d.anchor_id = an.anchor_id),
        |nearest AS (SELECT vec_id, anchor_id, cos_sim,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY cos_sim DESC, anchor_id) AS rn FROM s)
        |SELECT anchor_id, vec_id, cos_sim,
        |  CAST(row_number() OVER (PARTITION BY anchor_id
        |    ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
        |FROM nearest WHERE rn = 1
        |QUALIFY rank <= 16""".stripMargin,
    // q178: the cleaned pages — chrome lines (≥ 5% of docs) stripped,
    // unique title/ref/body lines kept in order.
    "q178_boilerplate_lines" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'COOKIE NOTICE: accept our cookies'
        |       ELSE 'Title ' || doc_id END
        |  || chr(10) || text || chr(10) ||
        |  CASE WHEN doc_id % 2 = 0 THEN '(c) 2026 Example Corp'
        |       ELSE 'ref ' || doc_id END AS page
        |FROM documents),
        |l AS (SELECT doc_id,
        |  generate_subscripts(string_split(page, chr(10)), 1) AS pos,
        |  unnest(string_split(page, chr(10))) AS ln
        |FROM d),
        |b AS (SELECT ln FROM l GROUP BY ln
        |  HAVING count(DISTINCT doc_id) >=
        |    greatest(2, ceil(0.05 * (SELECT count(*) FROM d)))),
        |k AS (SELECT doc_id, pos, ln FROM l
        |  WHERE ln NOT IN (SELECT ln FROM b))
        |SELECT d.doc_id,
        |  coalesce(string_agg(k.ln, chr(10) ORDER BY k.pos), '') AS cleaned,
        |  len(string_split(d.page, chr(10))) AS n_lines,
        |  len(string_split(d.page, chr(10))) - count(k.ln) AS n_removed
        |FROM d LEFT JOIN k ON d.doc_id = k.doc_id
        |GROUP BY d.doc_id, d.page""".stripMargin,
    // q200 retrains the identical Jelinek-Mercer bigram LM on the src0
    // slice and rescores every doc: p = 0.9·c2/c1 + 0.1·(c1(w2)+1)/(T+V),
    // cross-entropy round-6. DuckDB lists are 1-based (Spark arrays
    // 0-based): pairs are (ws[i], ws[i+1]) for i = 1..len-1.
    "q200_lm_perplexity" ->
      """WITH w AS (SELECT doc_id, source = 'src0' AS tr,
        |             string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, tr,
        |         ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
        |       FROM w, unnest(range(1, len(ws))) AS u(i)
        |       WHERE len(ws) >= 2),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg WHERE tr GROUP BY 1, 2),
        |c1 AS (SELECT tk, count(*) AS n1
        |       FROM (SELECT unnest(ws) AS tk FROM w WHERE tr) GROUP BY 1),
        |tot AS (SELECT sum(n1)::DOUBLE AS t, count(*)::DOUBLE AS v FROM c1)
        |SELECT bg.doc_id,
        |  round(-sum(ln(coalesce(0.9 * (c2.n2 / c1a.n1), 0.0) +
        |                0.1 * ((coalesce(c1b.n1, 0) + 1) /
        |                       (tot.t + tot.v)))) / count(*), 6)
        |    AS lm_score,
        |  count(*) AS n_bigrams
        |FROM bg LEFT JOIN c2 USING (w1, w2)
        |        LEFT JOIN c1 c1a ON bg.w1 = c1a.tk
        |        LEFT JOIN c1 c1b ON bg.w2 = c1b.tk, tot
        |GROUP BY 1""".stripMargin,
    // the hash compare.
    "q135_gopher_rules" ->
      s"""WITH m AS (SELECT doc_id,
         |  CAST($nTok AS BIGINT) AS n_words,
         |  list_sum(list_transform($toks, w -> length(w)))::DOUBLE
         |    / $nTok::DOUBLE AS ml,
         |  CAST(len(list_intersect(list_distinct($toks),
         |    ['the','a','to','of'])) AS BIGINT) AS stop_hits,
         |  $ttr AS ttr
         |FROM documents)
         |SELECT doc_id, n_words,
         |  round(ml, 6) AS mean_word_len, stop_hits, round(ttr, 6) AS ttr,
         |  n_words BETWEEN 40 AND 100000 AS wc_ok,
         |  ml BETWEEN 3.0 AND 4.5 AS ml_ok,
         |  stop_hits >= 2 AS stop_ok,
         |  ttr >= 0.5 AS rep_ok,
         |  (n_words BETWEEN 40 AND 100000) AND (ml BETWEEN 3.0 AND 4.5)
         |    AND stop_hits >= 2 AND ttr >= 0.5 AS passes
         |FROM m""".stripMargin,
    // q145's exact twin: brute-force top-10 over ONLY label%3=0 corpus
    // vectors (the metadata filter applied before ranking).
    "q145_ann_filtered" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |keep AS (SELECT vec_id FROM embeddings
        |         WHERE vec_id >= 5 AND label % 3 = 0),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |             sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id IN (SELECT vec_id FROM keep)
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    // q146 recomputes the one-pass profile per language.
    "q146_corpus_profile" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum($nTok) AS BIGINT) AS total_tokens,
         |  round(avg($quality), 6) AS avg_quality,
         |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
         |FROM documents GROUP BY 1""".stripMargin,
    // q147's exact twin is the full-corpus brute force (old ∪ appended
    // batch = all vec_id >= 5), plus the postings-untouched boolean.
    "q147_ann_incremental" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |             sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id >= 5
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok, TRUE AS incremental_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    // q161: the quadratic ground truth on the slice — every pair within
    // Levenshtein distance 1.
    "q161_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE a.c_custkey <= 200 AND b.c_custkey <= 200
        |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    // q163: dots/norms/cosines recomputed from unnested components.
    "q163_sql_vector_math" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v
        |           FROM embeddings WHERE vec_id < 60),
        |d AS (SELECT a.vec_id, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i AND b.vec_id = a.vec_id + 1
        |      GROUP BY 1),
        |n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1)
        |SELECT d.vec_id, round(d.dot, 6) AS dot,
        |  round(na.nrm, 6) AS norm_a, round(nb.nrm, 6) AS norm_b,
        |  round(d.dot / (na.nrm * nb.nrm), 6) AS cos,
        |  TRUE AS native_matches_ok
        |FROM d JOIN n na ON d.vec_id = na.vec_id
        |       JOIN n nb ON nb.vec_id = d.vec_id + 1""".stripMargin,
    // q165: mean inverse bigram frequency recomputed from the same
    // corpus counts.
    "q165_bigram_rarity" ->
      """WITH bg AS (SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(length(text) - 1, 1) + 1),
        |      i -> substr(text, CAST(i AS INT), 2))) AS bg
        |  FROM documents),
        |c AS (SELECT bg, count(*) AS n FROM bg GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS total FROM c)
        |SELECT doc_id, round(avg(t.total / c.n), 6) AS rarity,
        |  count(*) AS n_bigrams
        |FROM bg JOIN c USING (bg), t
        |GROUP BY 1""".stripMargin,
    // q167's exact twin: brute-force top-10 over the SURVIVOR corpus
    // (tombstoned %5 ids removed).
    // q168: the full quadratic word-Jaccard truth on the slice.
    "q168_prefix_jaccard" ->
      """WITH s AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents WHERE doc_id < 150)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / (len(a.toks) + len(b.toks)
        |       - len(list_intersect(a.toks, b.toks)))::DOUBLE, 6) AS jaccard,
        |  TRUE AS selective_ok
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
        |    / (len(a.toks) + len(b.toks)
        |       - len(list_intersect(a.toks, b.toks)))::DOUBLE >= 0.9""".stripMargin,
    "q167_ann_delete" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                  unnest(embedding)::DOUBLE AS v FROM embeddings),
        |keep AS (SELECT vec_id FROM embeddings
        |         WHERE vec_id >= 5 AND vec_id % 5 <> 0),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |             sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i
        |      WHERE a.vec_id < 5 AND b.vec_id IN (SELECT vec_id FROM keep)
        |      GROUP BY 1, 2),
        |s AS (SELECT probe_id, neighbor_id,
        |        round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, neighbor_id) AS rank
        |      FROM d JOIN nrm x ON probe_id = x.vec_id
        |             JOIN nrm y ON neighbor_id = y.vec_id)
        |SELECT probe_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank,
        |  TRUE AS recall_ok, TRUE AS untouched_ok
        |FROM s WHERE rank <= 10""".stripMargin,
    // q205: position-union coverage fractions recomputed relationally —
    // grams by list slicing, top gram by (count DESC, gram) row_number,
    // coverage as DISTINCT covered positions joined back to tokens.
    "q205_gopher_repetition" ->
      """WITH aug AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN text || ' ' ||
        |    array_to_string((string_split(text, ' '))[1:6], ' ')
        |  ELSE text END AS text FROM documents),
        |d AS (SELECT doc_id, string_split(text, ' ') AS ws,
        |  length(replace(text, ' ', '')) AS nchars FROM aug),
        |toks AS (SELECT doc_id, unnest(ws) AS tok,
        |  generate_subscripts(ws, 1) - 1 AS pos FROM d),
        |g2 AS (SELECT doc_id, CAST(i AS INT) - 1 AS pos,
        |    array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + 1], ' ') AS gram
        |  FROM d, UNNEST(range(1, len(ws))) AS r(i)),
        |top2 AS (SELECT doc_id, gram FROM (
        |  SELECT doc_id, gram, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY count(*) DESC, gram) AS rn
        |  FROM g2 GROUP BY doc_id, gram) WHERE rn = 1),
        |cov2 AS (SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
        |  FROM g2 g JOIN top2 t ON g.doc_id = t.doc_id AND g.gram = t.gram,
        |    (VALUES (0), (1)) o(o)),
        |ch2 AS (SELECT c.doc_id, sum(length(k.tok)) AS ch FROM cov2 c
        |  JOIN toks k ON c.doc_id = k.doc_id AND c.pos = k.pos GROUP BY 1),
        |g5 AS (SELECT doc_id, CAST(i AS INT) - 1 AS pos,
        |    array_to_string(ws[CAST(i AS INT) : CAST(i AS INT) + 4], ' ') AS gram
        |  FROM d, UNNEST(range(1, len(ws) - 3)) AS r(i)),
        |dup5 AS (SELECT doc_id, gram FROM g5
        |  GROUP BY doc_id, gram HAVING count(*) >= 2),
        |cov5 AS (SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
        |  FROM g5 g JOIN dup5 t ON g.doc_id = t.doc_id AND g.gram = t.gram,
        |    (VALUES (0), (1), (2), (3), (4)) o(o)),
        |ch5 AS (SELECT c.doc_id, sum(length(k.tok)) AS ch FROM cov5 c
        |  JOIN toks k ON c.doc_id = k.doc_id AND c.pos = k.pos GROUP BY 1),
        |m AS (SELECT d.doc_id, coalesce(t.gram, '') AS top_gram,
        |    round(coalesce(c2.ch, 0) / d.nchars, 6) AS top_frac,
        |    round(coalesce(c5.ch, 0) / d.nchars, 6) AS dup_frac
        |  FROM d LEFT JOIN top2 t ON d.doc_id = t.doc_id
        |    LEFT JOIN ch2 c2 ON d.doc_id = c2.doc_id
        |    LEFT JOIN ch5 c5 ON d.doc_id = c5.doc_id)
        |SELECT doc_id, top_gram, top_frac, dup_frac,
        |  top_frac <= 0.20 AS top_ok, dup_frac <= 0.15 AS dup_ok,
        |  (top_frac <= 0.20 AND dup_frac <= 0.15) AS passes
        |FROM m""".stripMargin,
    // q209: the q221 DISTILLED language gate (round 15; retrained by the
    // shared nbCte), q23 quality gate, q25 keep-first exact dedup, and
    // q69 split rule replayed as one CTE chain — each stage's
    // formulation identical to its standalone oracle.
    "q209_corpus_intake" ->
      s"""WITH ${nbCte(Some(nbVocabCap))},
         |lang AS (
         |  SELECT l.doc_id, l.text, n.pred_lang
         |  FROM lbl l JOIN nbp n USING (doc_id)),
         |q AS (SELECT doc_id, text, pred_lang, round($quality, 6) AS quality
         |      FROM lang
         |      WHERE pred_lang <> 'other'
         |        AND ($quality) >= 0.5 AND $nTok >= 20),
         |f AS (SELECT *,
         |        md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
         |      FROM q),
         |keep AS (SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY 1)
         |SELECT f.doc_id, f.pred_lang, f.quality,
         |  CASE WHEN substr(md5(CAST(f.doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
         |       WHEN substr(md5(CAST(f.doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM f JOIN keep ON f.fp = keep.fp AND f.doc_id = keep.doc_id""".stripMargin,
    // q223: the full BM25 pipeline — tf/dl/df/N/avgdl from the same
    // whitespace tokenizer, Lucene idf ln(1+(N-df+0.5)/(df+0.5)), score
    // rounded to 6 BEFORE the per-query rank (ties on doc_id) exactly as
    // the engine does.
    "q223_bm25_search" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM tk GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tk GROUP BY 1),
         |st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
         |df AS (SELECT token, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |qt AS (SELECT DISTINCT doc_id AS query_id,
         |         unnest(list_slice($toks, 1, 5)) AS token
         |       FROM documents WHERE doc_id < 3),
         |sc AS (
         |  SELECT qt.query_id, tf.doc_id,
         |    round(sum(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
         |      tf.tf * ${Search.K1 + 1.0} /
         |      (tf.tf + ${Search.K1} * (${1.0 - Search.B} + ${Search.B} * dl.dl / st.avgdl))), 6)
         |      AS bm25
         |  FROM qt JOIN tf USING (token) JOIN df USING (token)
         |    JOIN dl ON tf.doc_id = dl.doc_id, st
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, bm25,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY bm25 DESC, doc_id ASC) AS rank
         |      FROM sc)
         |SELECT query_id, doc_id, bm25, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 10""".stripMargin,
    // q224: ln(1+tf)·ln(N/df) weights over the df ≤ 0.8N token space,
    // norms in that same space, probe docs < 5 vs the corpus, cosine
    // rounded to 6 before the per-probe rank.
    "q224_tfidf_pairs" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM tk GROUP BY 1, 2),
         |st AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |df AS (SELECT token, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |w AS (SELECT tf.token, tf.doc_id,
         |        ln(1.0 + tf.tf) * ln(st.n / df.df) AS w
         |      FROM tf JOIN df USING (token), st
         |      WHERE df.df <= 0.8 * st.n),
         |nm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
         |sc AS (
         |  SELECT p.doc_id AS probe_id, w.doc_id,
         |    round(sum(p.w * w.w) / (any_value(pn.nrm) * any_value(dn.nrm)), 6) AS cos
         |  FROM w p
         |    JOIN w ON p.token = w.token AND p.doc_id <> w.doc_id
         |    JOIN nm pn ON pn.doc_id = p.doc_id
         |    JOIN nm dn ON dn.doc_id = w.doc_id
         |  WHERE p.doc_id < 5
         |  GROUP BY 1, 2),
         |r AS (SELECT probe_id, doc_id, cos,
         |        row_number() OVER (PARTITION BY probe_id
         |          ORDER BY cos DESC, doc_id ASC) AS rank
         |      FROM sc)
         |SELECT probe_id, doc_id, cos, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 5""".stripMargin,
    // q228: the same 8 BPE iterations unrolled — pair counts from the
    // two-space symbol encoding, argmax with the same tie-break, merge
    // applied via scalar-subquery literal replace (identical left-to-right
    // non-overlapping semantics in both engines).
    "q228_bpe_train" -> bpeOracle(8),
    "q229_bpe_encode" -> bpeEncodeOracle(8),
    // q231: q56's exact pair plane with the two gate booleans (the
    // cluster-partitioned generator runs in-query as the gate subject).
    "q231_semdedup_kmeans" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
        |u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |             unnest(embedding)::DOUBLE AS v FROM e),
        |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
        |d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
        |      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, round(dot / (x.nrm * y.nrm), 6) AS cos_sim,
        |  TRUE AS recall_ok, TRUE AS precision_ok
        |FROM d JOIN nrm x ON id_a = x.vec_id JOIN nrm y ON id_b = y.vec_id
        |WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.4""".stripMargin,
    // q230: both arms restated (q223's BM25 at k=50, q29's cosine plane
    // over the whole corpus), full-outer joined, 1/(60+rank) summed in
    // the same fixed order.
    "q230_hybrid_rrf" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM tk GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tk GROUP BY 1),
         |st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
         |df AS (SELECT token, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |qt AS (SELECT DISTINCT doc_id AS query_id,
         |         unnest(list_slice($toks, 1, 5)) AS token
         |       FROM documents WHERE doc_id < 3),
         |sc AS (
         |  SELECT qt.query_id, tf.doc_id,
         |    round(sum(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
         |      tf.tf * ${Search.K1 + 1.0} /
         |      (tf.tf + ${Search.K1} * (${1.0 - Search.B} + ${Search.B} * dl.dl / st.avgdl))), 6)
         |      AS bm25
         |  FROM qt JOIN tf USING (token) JOIN df USING (token)
         |    JOIN dl ON tf.doc_id = dl.doc_id, st
         |  GROUP BY 1, 2),
         |lex AS (SELECT query_id, doc_id AS id,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY bm25 DESC, doc_id ASC) AS rank
         |        FROM sc QUALIFY rank <= 50),
         |u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |             unnest(embedding)::DOUBLE AS v FROM embeddings),
         |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM u GROUP BY 1),
         |d AS (SELECT a.vec_id AS query_id, b.vec_id AS id, sum(a.v * b.v) AS dot
         |      FROM u a JOIN u b ON a.i = b.i
         |      WHERE a.vec_id < 3
         |      GROUP BY 1, 2),
         |dn AS (SELECT query_id, id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY round(dot / (x.nrm * y.nrm), 6) DESC, id ASC) AS rank
         |       FROM d JOIN nrm x ON query_id = x.vec_id
         |              JOIN nrm y ON id = y.vec_id
         |       QUALIFY rank <= 50),
         |f AS (SELECT coalesce(lex.query_id, dn.query_id) AS query_id,
         |        coalesce(lex.id, dn.id) AS id,
         |        round(coalesce(1.0 / (60.0 + lex.rank), 0.0) +
         |              coalesce(1.0 / (60.0 + dn.rank), 0.0), 6) AS rrf
         |      FROM lex FULL OUTER JOIN dn
         |        ON lex.query_id = dn.query_id AND lex.id = dn.id),
         |r AS (SELECT query_id, id, rrf,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY rrf DESC, id ASC) AS rank
         |      FROM f)
         |SELECT query_id, id, rrf, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 10""".stripMargin,
  )

  /** Unrolled-iteration SQL mirror of [[graft.ext.Bpe.train]]: s_k = the
    * word table after k merges, p_k/b_k = pair counts and the argmax of
    * iteration k. Every CTE is MATERIALIZED — s_k/b_k are each referenced
    * multiple times downstream, and DuckDB's default CTE inlining would
    * re-evaluate the chain exponentially in the merge depth. */
  private def bpeOracle(merges: Int): String = {
    val union = (1 to merges).map { k =>
      s"SELECT CAST($k AS BIGINT) AS step, lhs, rhs, CAST(cnt AS BIGINT) AS pair_count FROM b$k"
    }.mkString("\nUNION ALL\n")
    s"${bpeChain(merges)}\n$union"
  }

  /** The shared w/s0/(p_k,b_k,s_k)* CTE chain both BPE oracles build on. */
  private def bpeChain(merges: Int): String = {
    val base =
      """WITH w AS MATERIALIZED (
        |  SELECT t.word AS word, count(*) AS freq
        |  FROM documents, unnest(string_split(text, ' ')) AS t(word)
        |  WHERE length(t.word) > 0
        |  GROUP BY 1),
        |s0 AS MATERIALIZED (SELECT freq,
        |  ' ' || rtrim(regexp_replace(word, '(.)', '\1  ', 'g')) || ' ' AS repr
        |  FROM w)""".stripMargin
    val steps = (1 to merges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT q.syms[t.i] AS lhs, q.syms[t.i + 1] AS rhs,
         |    sum(q.freq) AS cnt
         |  FROM (SELECT freq, string_split(trim(repr), '  ') AS syms
         |        FROM s${k - 1}) q,
         |    unnest(range(1, len(q.syms))) AS t(i)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$k
         |        ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
         |s$k AS MATERIALIZED (SELECT freq, replace(repr,
         |    (SELECT ' ' || lhs || '  ' || rhs || ' ' FROM b$k),
         |    (SELECT ' ' || lhs || rhs || ' ' FROM b$k)) AS repr
         |  FROM s${k - 1})""".stripMargin
    }.mkString(",\n")
    s"$base,\n$steps"
  }

  /** q229's oracle: train the same `merges` chain, then re-encode the full
    * corpus word stream with the learned replaces (applied in order via
    * scalar subqueries) and aggregate compression per source. */
  private def bpeEncodeOracle(merges: Int): String = {
    val replaced = (1 to merges).foldLeft(
      "' ' || rtrim(regexp_replace(cw.word, '(.)', '\\1  ', 'g')) || ' '") {
      (acc, k) =>
        s"""replace($acc,
           |    (SELECT ' ' || lhs || '  ' || rhs || ' ' FROM b$k),
           |    (SELECT ' ' || lhs || rhs || ' ' FROM b$k))""".stripMargin
    }
    s"""${bpeChain(merges)},
       |cw AS (SELECT source, t.word AS word
       |       FROM documents, unnest(string_split(text, ' ')) AS t(word)
       |       WHERE length(t.word) > 0),
       |enc AS (SELECT source, word, $replaced AS repr FROM cw)
       |SELECT source, count(*) AS n_words,
       |  CAST(sum(length(word)) AS BIGINT) AS base_tokens,
       |  CAST(sum(len(string_split(trim(repr), '  '))) AS BIGINT) AS bpe_tokens,
       |  round(sum(length(word))::DOUBLE /
       |        sum(len(string_split(trim(repr), '  ')))::DOUBLE, 6)
       |    AS compression
       |FROM enc
       |GROUP BY source""".stripMargin
  }
}
