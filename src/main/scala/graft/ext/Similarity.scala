package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — north-star
  * extension. Brute-force cosine top-k as the exact baseline; random-
  * hyperplane LSH bucketing as the approximate scale path.
  *
  * All vector math is `zip_with` + `aggregate` over the array column in
  * double precision — codegen'd expressions, no UDFs. The fold is sequential
  * per row, so results are deterministic run-to-run.
  */
object Similarity {

  /** Dot product of two array<float|double> columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression (one pass over both
    * arrays; ~10× the throughput of the interpreted `zip_with` fold, same
    * bit-exact result). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  /** Interpreted HOF form of [[cosine]] — kept as the reference
    * implementation the native expression is tested against. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: each probe vector against the whole corpus.
    *
    * Plan shape: the probe set is broadcast (it is the small side by
    * construction — a query workload, not the corpus), the corpus streams
    * through once computing cosines in codegen, and per-probe top-k is a
    * window rank. The shuffle is keyed by probe id, so it scales with the
    * number of probes; for a huge probe batch, pre-partition both sides by a
    * probe-block key instead. Never materializes the full similarity matrix.
    *
    * Cosines are rounded to 6 decimals *before* ranking so that the ranking —
    * and therefore the result set — is stable under last-ulp summation
    * differences; ties break on corpus id.
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int,
                     probeId: String = "probe_id", corpusId: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.as("c")
      .crossJoin(broadcast(probes.as("p")))
      .select(
        col(s"p.$probeId").as("probe_id"),
        col(s"c.$corpusId").as("neighbor_id"),
        round(cosine(col(s"p.$vecCol"), col(s"c.$vecCol")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** ANCHOR-BASED CLUSTER-BALANCED CORESET — the diversity-balancing
    * subset selector of a training-data pipeline (DataComp/DeepSeek-style
    * cluster balancing, made deterministic): every corpus vector is
    * assigned to its nearest ANCHOR by cosine (the anchor set is the
    * caller's diversity frame — seed docs, per-domain exemplars — and is
    * broadcast: one streaming pass over the corpus, no corpus shuffle for
    * the assignment), then each cluster keeps only its `perCluster`
    * highest-similarity members (window top-k per anchor). A dominant
    * topic cannot flood the sample: its surplus falls off the per-cluster
    * rank, while sparse clusters keep everything they have.
    *
    * Determinism contract matches [[bruteForceTopK]]: cosines round to 6
    * decimals BEFORE both rankings, ties break on id, so the selection is
    * stable under last-ulp summation differences and oracle-reproducible.
    * Scale shape: corpus × broadcast(anchors) in codegen, one argmax
    * window keyed by vector id, one top-k window keyed by anchor —
    * shuffles track corpus size × 1, never corpus × anchors. */
  def coresetByAnchors(corpus: DataFrame, anchors: DataFrame,
                       perCluster: Int,
                       corpusId: String = "vec_id",
                       anchorId: String = "anchor_id",
                       vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.as("c")
      .crossJoin(broadcast(anchors.as("a")))
      .select(
        col(s"c.$corpusId").as("vec_id"),
        col(s"a.$anchorId").as("anchor_id"),
        round(cosine(col(s"c.$vecCol"), col(s"a.$vecCol")), 6).as("cos_sim"))
    val nearest = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("anchor_id").asc)
    val assigned = scored
      .withColumn("rn", row_number().over(nearest))
      .filter(col("rn") === 1)
      .drop("rn")
    val quota = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    assigned
      .withColumn("rank", row_number().over(quota))
      .filter(col("rank") <= perCluster)
      .select(col("anchor_id"), col("vec_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Exact near-duplicate pairs by cosine threshold — the VERIFY PRIMITIVE:
    * a non-equi pair join (BroadcastNestedLoop), O(n²) comparisons, for
    * bounded inputs only (probe batches, recall oracles, in-bucket
    * verification). The shipped scale shape is
    * [[cosineNearDupPairsBanded]] — banded LSH candidates with this exact
    * cosine as the in-bucket check.
    *
    * Pair join (a.id < b.id) with the native codegen'd cosine per pair —
    * one fused loop per pair beats both the interpreted `zip_with` fold and
    * the explode/join-on-dimension aggregation it replaced. */
  def cosineNearDupPairs(vecs: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame =
    vecs.as("a")
      .join(vecs.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)

  /** SemDeDup-shape cluster-partitioned semantic near-dup pairs (Abbas et
    * al. 2023, public): k-means-cluster the embedding space, then compare
    * pairs ONLY within a cluster — the pair fan-out is bounded by the
    * largest cluster, never n². `topAssign` > 1 multi-assigns each vector
    * to its nearest clusters (the build-side analogue of IVF's nProbe),
    * recovering pairs that straddle a cluster boundary at the cost of
    * proportionally larger lists.
    *
    * Candidates are verified with the EXACT cosine, so emitted pairs are
    * by construction a subset of the all-pairs answer (precision is exact;
    * recall is what the cluster partition trades away — callers gate it,
    * q56-style). Output matches [[cosineNearDupPairs]]: (id_a, id_b,
    * cos_sim rounded to 6).
    */
  def semDedupPairs(vecs: DataFrame, centroids: DataFrame, threshold: Double,
                    topAssign: Int = 1, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("ccos").desc, col("centroid_id").asc)
    val picked = vecs
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("v"), col("centroid_id"),
        cosine(col("v"), col("centroid").cast("array<float>")).as("ccos"))
      .withColumn("arank", row_number().over(w))
      .filter(col("arank") <= topAssign)
      .select(col("id"), col("v"), col("centroid_id"))
    picked.as("x")
      .join(picked.as("y"),
        col("x.centroid_id") === col("y.centroid_id") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(cosine(col("x.v"), col("y.v")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      // multi-assignment can surface the same pair from two shared cells
      .distinct()
  }

  /** Int8 quantization stats — `struct(maxabs, qmin, qmax, rmse)` from the
    * native one-loop codegen expression [[graft.functions.QuantizeStats]];
    * the storage scale path (4× smaller than float32; at 100 TB of
    * embeddings that is the difference between one copy and four). */
  def quantizeStats(vec: Column): Column =
    graft.functions.GraftFunctions.quantizeStats(vec)

  /** Per-vector max-abs int8 quantization — interpreted HOF reference form
    * the native [[quantizeStats]] is parity-tested against. All-zero vectors
    * quantize to all zeros (the unguarded scale would be +Inf and `0 × Inf =
    * NaN`, which ANSI mode turns into a job-killing cast error). */
  def quantizeInt8(vec: Column): Column = {
    val ve = transform(vec, v => v.cast("double"))
    val maxabs = array_max(transform(ve, v => abs(v)))
    val scale = lit(127.0) / maxabs
    when(maxabs === 0, transform(ve, _ => lit(0)))
      .otherwise(transform(ve, v => round(v * scale).cast("int")))
  }

  def maxAbs(vec: Column): Column =
    array_max(transform(vec, v => abs(v.cast("double"))))

  def dequantize(qv: Column, maxAbsVal: Column): Column =
    transform(qv, q => q.cast("double") * maxAbsVal / lit(127.0))

  /** RMSE between the original vector and its int8 round-trip — interpreted
    * HOF reference form (zero-vector guard mirrors [[quantizeInt8]]). */
  def quantizationRmse(vec: Column): Column = {
    val ve = transform(vec, v => v.cast("double"))
    val maxabs = array_max(transform(ve, v => abs(v)))
    val scale = lit(127.0) / maxabs
    val errSq = zip_with(ve, quantizeInt8(vec), (v, q) => {
      val e = v - q.cast("double") / scale
      e * e
    })
    when(maxabs === 0, lit(0.0))
      .otherwise(sqrt(aggregate(errSq, lit(0.0), (acc, v) => acc + v) / size(ve)))
  }

  /** Random-hyperplane LSH bucket id (int in [0, 2^nPlanes)) — the native
    * codegen expression [[graft.functions.LshBucket]]: all plane projections
    * in one fused loop, plane matrix a plan-time constant. Same fixed-seed
    * plane family and bit order as [[lshBucketHof]], so bucket ids are
    * identical. `dims` must match the embedding width (the testdata
    * embeddings are 64-wide). */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int = 64): Column =
    graft.functions.GraftFunctions.lshBucket(vec, nPlanes, dims)

  /** Interpreted HOF form of [[lshBucket]] — kept as the parity reference.
    * sign(v·r_p) gives bit p; bits fold MSB-first into the bucket. */
  def lshBucketHof(vec: Column, nPlanes: Int, dims: Int = 64): Column = {
    val planes = graft.functions.LshBucket.planeMatrix(nPlanes, dims)
    val bits: Seq[Column] = (0 until nPlanes).map { p =>
      val plane = array(planes(p).map(lit): _*)
      val proj = aggregate(
        zip_with(vec, plane, (x, r) => x.cast("double") * r),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1)).otherwise(lit(0))
    }
    bits.foldLeft(lit(0))((acc, b) => acc * 2 + b)
  }

  /** Banded-LSH near-duplicate pairs — the SHIPPED scale shape for embedding
    * near-dup (mirrors [[Dedup.simHashPairs]]): `bands` independent
    * hyperplane bucketings of `rowsPerBand` planes each, a pair is a
    * candidate if ANY band collides, and every candidate is verified with
    * the exact native cosine before thresholding. Precision is therefore 1.0
    * by construction (output ⊆ the exact all-pairs answer); recall for a
    * pair at angle θ is 1 − (1 − (1 − θ/π)^rowsPerBand)^bands — at the
    * default 8×2 a cosine-0.4 pair is caught with p ≈ 0.98, and recall
    * rises with similarity. The candidate join is an equi-join on
    * (band, bucket) — no nested loop — but candidate VOLUME is
    * Θ(n² · bands / 2^rowsPerBand) for uncorrelated vectors (a random pair
    * collides in a band with p = 2^−rowsPerBand), so `rowsPerBand` must
    * grow with corpus size (e.g. 16–24 planes per band at web scale) for
    * the banding to beat brute force; the 8×2 defaults are tuned for the
    * sf0.1 recall floor, not for scale. The knob trades recall for
    * candidate volume at fixed `bands × rowsPerBand` plane budget. */
  def cosineNearDupPairsBanded(vecs: DataFrame, threshold: Double,
                               bands: Int = 8, rowsPerBand: Int = 2,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               dims: Int = 64): DataFrame = {
    val allPlanes = graft.functions.LshBucket.planeMatrix(bands * rowsPerBand, dims)
    val bandBuckets = array((0 until bands).map { b =>
      graft.functions.GraftFunctions.lshBucketWithPlanes(
        col(vecCol), allPlanes.slice(b * rowsPerBand, (b + 1) * rowsPerBand))
    }: _*)
    val banded = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(bandBuckets).as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .distinct() // a pair colliding in several bands appears once
      .filter(col("cos_sim") >= threshold)
  }

  /** Approximate nearest neighbors with MULTI-PROBE hyperplane LSH: each
    * probe visits its own bucket plus every bucket within `multiProbe` bit
    * flips (a neighbor separated by a near-orthogonal plane lands one bit
    * away — classic multi-probe), and exact cosine ranks the visited
    * candidates. The bucket equi-join replaces the cross join; the corpus
    * side stays ONE row per vector (the expansion is probe-side only, ×
    * Σ C(nPlanes, i), i ≤ multiProbe), so the comparison count is
    * |corpus| × (visited buckets / 2^nPlanes) — the recall/throughput dial
    * alongside nPlanes. Raise nPlanes as the corpus grows to hold bucket
    * size constant. */
  def annTopK(probes: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 4,
              probeId: String = "probe_id", corpusId: String = "vec_id",
              vecCol: String = "embedding", dims: Int = 64,
              multiProbe: Int = 1): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col(vecCol), nPlanes, dims))
    val masks = (0 until (1 << nPlanes))
      .filter(m => Integer.bitCount(m) <= multiProbe)
    val pb = probes
      .withColumn("bucket0", lshBucket(col(vecCol), nPlanes, dims))
      .withColumn("bucket",
        explode(array(masks.map(m => col("bucket0").bitwiseXOR(lit(m))): _*)))
      .drop("bucket0")
    val scored = cb.as("c")
      .join(broadcast(pb.as("p")), col("c.bucket") === col("p.bucket"))
      .select(
        col(s"p.$probeId").as("probe_id"),
        col(s"c.$corpusId").as("neighbor_id"),
        round(cosine(col(s"p.$vecCol"), col(s"c.$vecCol")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** CONTRASTIVE HARD-NEGATIVE MINING — the offline batch job behind
    * embedding-model training (SimCSE/DPR-style): for every anchor, the
    * k corpus vectors that score HIGHEST while being semantically WRONG —
    * a different class label than the anchor (so they are true negatives)
    * and below a near-duplicate ceiling (so mislabeled twins of the anchor
    * cannot poison the negative set). These are exactly the examples a
    * contrastive loss learns the most from.
    *
    * Plan shape matches [[bruteForceTopK]]: the anchor batch is broadcast,
    * the corpus streams once through a codegen cosine + the label/ceiling
    * filters (pushed BEFORE the rank, so excluded rows never occupy a top-k
    * slot), and per-anchor top-k is a window rank keyed by anchor id. At
    * corpus scale the same filters compose with the IVF/kNN-graph
    * retrieval instead of the brute pass — retrieve k·overfetch
    * candidates, filter, re-rank (see q238's self-gated IVF arm).
    *
    * Determinism contract: cosines round to 6 decimals before ranking,
    * ties break on corpus id — oracle-reproducible. */
  /** LATE-INTERACTION retrieval (the ColBERT MaxSim contract): query and
    * document are each a BAG of token vectors; the score is
    * Σ_{query token} max_{doc token} cos(q, d) — every query token finds
    * its best-matching document token, so multi-aspect queries score
    * documents that cover all aspects above documents that nail only one.
    * This is the third production retrieval shape next to lexical BM25
    * (q223) and single-vector dense ANN (q29/q45): more precise than one
    * pooled vector, cheaper than a cross-encoder.
    *
    * Token vectors here are the `nSub` contiguous slices of the embedding
    * column (deterministic, fixture-independent); a real deployment feeds
    * per-token encoder outputs through the same plan. Plan shape: probe
    * tokens broadcast (queries × nSub rows), corpus tokens stream through
    * one codegen cosine, then two hash aggregates — max over doc tokens
    * keyed by (probe, doc, query-token), sum over query tokens keyed by
    * (probe, doc) — and a per-probe top-k window. Nothing materializes the
    * full token-interaction matrix, and at corpus scale the candidate set
    * comes from an ANN prefilter with this as the re-scorer.
    *
    * Determinism: cosines round to 6 decimals before the max, the MaxSim
    * sum rounds to 6 before ranking, ties break on doc id. */
  def lateInteractionTopK(probes: DataFrame, corpus: DataFrame, k: Int,
                          nSub: Int = 4, dims: Int = 64,
                          probeId: String = "probe_id",
                          corpusId: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val sd = dims / nSub
    def tokens(df: DataFrame, id: String, idAs: String) = df.select(
      col(id).as(idAs),
      posexplode(array((0 until nSub).map(i =>
        slice(col(vecCol), i * sd + 1, sd)): _*)).as(Seq("sub", "tok")))
    val pt = tokens(probes, probeId, "probe_id")
      .withColumnRenamed("sub", "qs").withColumnRenamed("tok", "qtok")
    val ct = tokens(corpus, corpusId, "neighbor_id")
    val mx = ct.crossJoin(broadcast(pt))
      .select(col("probe_id"), col("neighbor_id"), col("qs"),
        round(cosine(col("qtok"), col("tok")), 6).as("cs"))
      .groupBy(col("probe_id"), col("neighbor_id"), col("qs"))
      .agg(max(col("cs")).as("m"))
    val scored = mx.groupBy(col("probe_id"), col("neighbor_id"))
      .agg(round(sum(col("m")), 6).as("maxsim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("maxsim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("maxsim"),
        col("rank").cast("long").as("rank"))
  }

  def hardNegatives(probes: DataFrame, corpus: DataFrame, k: Int,
                    dupCeiling: Double,
                    probeId: String = "probe_id", corpusId: String = "vec_id",
                    vecCol: String = "embedding",
                    probeLabel: String = "probe_label",
                    corpusLabel: String = "label"): DataFrame = {
    val scored = corpus.as("c")
      .crossJoin(broadcast(probes.as("p")))
      .select(
        col(s"p.$probeId").as("probe_id"),
        col(s"c.$corpusId").as("neighbor_id"),
        round(cosine(col(s"p.$vecCol"), col(s"c.$vecCol")), 6).as("cos_sim"),
        col(s"p.$probeLabel").as("_pl"),
        col(s"c.$corpusLabel").as("_cl"))
      .filter(col("_pl") =!= col("_cl") && col("cos_sim") < dupCeiling)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }
}
