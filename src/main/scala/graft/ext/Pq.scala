package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (PQ) approximate nearest neighbor — the
  * memory-compression member of the ANN family ([[Similarity.annTopK]] =
  * hyperplane LSH, [[Ivf]] = inverted lists): each L2-normalized embedding
  * is split into `m` subspaces, each subspace k-means-quantized to one of
  * `k` centroids, and the vector stored as `m` small codes — 8 bytes
  * instead of 256 for a 64-float embedding, the 32× that decides whether a
  * 100 TB corpus's vectors fit executor memory at all (Jégou et al.,
  * "Product quantization for nearest neighbor search", TPAMI 2011).
  *
  * Search is asymmetric distance computation (ADC): a query computes one
  * `m × k` table of query-subvector · centroid dots (driver-side, the
  * probe set is bounded), the table broadcasts, and every encoded row's
  * approximate inner product is `m` table lookups — no float vectors are
  * ever read at search time. On normalized vectors inner product IS
  * cosine, so the ADC ranking approximates the exact cosine twin the
  * recall gate measures against.
  *
  * Scale shape: codebooks train on a BOUNDED deterministic sample
  * (hash-ordered `limit`, the FAISS practice — training never scans the
  * corpus), encoding is one typed pass, search is one pass over the
  * code plane with a per-probe top-k. The codebook itself is
  * `m·k·subDim` floats — KBs, broadcast everywhere.
  */
object Pq {

  /** Trained codebook: `centroids(s)(c)` is centroid `c` of subspace `s`. */
  final case class Codebook(m: Int, k: Int, subDim: Int,
                            centroids: Array[Array[Array[Float]]])
      extends Serializable {
    /** Bytes per stored code (one small int per subspace). */
    def codeBytes: Int = m
    /** Bytes per raw float vector at this dimensionality. */
    def rawBytes: Int = m * subDim * 4
  }

  private[ext] def normalize(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  private[ext] def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Deterministic driver-side Lloyd's k-means over one subspace's sample:
    * seeds are the first `k` DISTINCT subvectors in sample order (padded by
    * cycling when the sample has fewer), rounds reassign + mean; an
    * emptied cell keeps its centroid. The sample is bounded, so this is
    * milliseconds of driver CPU — no Spark jobs. */
  private def lloyd(xs: Array[Array[Float]], k: Int,
                    rounds: Int): Array[Array[Float]] = {
    val distinct = scala.collection.mutable.LinkedHashMap.empty[Seq[Float], Array[Float]]
    xs.foreach(x => if (distinct.size < k) distinct.getOrElseUpdate(x.toSeq, x))
    val seeds = distinct.values.toArray
    var cents = Array.tabulate(k)(i => seeds(i % seeds.length).clone())
    var r = 0
    while (r < rounds) {
      val sums = Array.fill(k)(new Array[Double](xs.head.length))
      val counts = new Array[Long](k)
      xs.foreach { x =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = l2(x, cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < x.length) { sums(best)(i) += x(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(xs.head.length)(i => (sums(c)(i) / counts(c)).toFloat)
      }
      r += 1
    }
    cents
  }

  /** Train a codebook on a bounded deterministic sample of the corpus
    * (hash-ordered limit — one TakeOrdered job, never a full collect).
    * Vectors are L2-normalized before quantization so ADC inner product
    * approximates cosine; [[IvfPq]] passes `normalizeInput = false` to
    * quantize residuals, which must NOT be re-normalized (the cell-anchor
    * decomposition is exact only on the raw residual). */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, k: Int, sampleCap: Int = 20000,
            rounds: Int = 8, normalizeInput: Boolean = true): Codebook = {
    val sample = corpus
      .select(col(vecCol).cast("array<float>").as("v"), col(idCol).as("id"))
      .orderBy(xxhash64(col("id")))
      .limit(sampleCap)
      .collect().map { r =>
        val a = r.getSeq[Float](0).toArray
        if (normalizeInput) normalize(a) else a
      }
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val subDim = dim / m
    val centroids = Array.tabulate(m) { s =>
      lloyd(sample.map(v =>
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim)), k, rounds)
    }
    Codebook(m, k, subDim, centroids)
  }

  /** Encode one normalized vector: per-subspace L2 argmin (lowest id wins
    * ties — deterministic). */
  private[ext] def encodeOne(v: Array[Float], cb: Codebook): Array[Int] =
    Array.tabulate(cb.m) { s =>
      val sub = java.util.Arrays.copyOfRange(v, s * cb.subDim, (s + 1) * cb.subDim)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.k) {
        val d = l2(sub, cb.centroids(s)(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

  /** The `(id, code)` plane — ONE typed pass over the corpus; the codebook
    * broadcasts with the task closure (KBs). This frame is what a 100 TB
    * deployment persists instead of raw vectors. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame = {
    import corpus.sparkSession.implicits._
    val ds: Dataset[(Long, Array[Float])] = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    ds.map { case (id, v) => (id, encodeOne(normalize(v), cb)) }
      .toDF(idCol, "code")
  }

  /** ADC top-k search: driver computes each (bounded) probe's `m × k`
    * dot table against the codebook, the tables broadcast, and one pass
    * over the code plane scores every (probe, row) pair by `m` lookups —
    * then a per-probe top-k window. Returns (probe_id, neighbor_id,
    * adc_score, rank). */
  def pqTopK(probes: DataFrame, encoded: DataFrame, probeIdCol: String,
             vecCol: String, cb: Codebook, topK: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qs = probes
      .select(col(probeIdCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect().map(r => (r.getLong(0), normalize(r.getSeq[Float](1).toArray)))
    require(qs.nonEmpty, "PQ search needs at least one probe")
    val tables: Array[(Long, Array[Array[Double]])] = qs.map { case (pid, q) =>
      pid -> Array.tabulate(cb.m) { s =>
        val sub = java.util.Arrays.copyOfRange(q, s * cb.subDim, (s + 1) * cb.subDim)
        Array.tabulate(cb.k)(c => dot(sub, cb.centroids(s)(c)))
      }
    }
    val bc = spark.sparkContext.broadcast(tables)
    encoded.as[(Long, Seq[Int])]
      .flatMap { case (nid, code) =>
        bc.value.iterator.map { case (pid, tab) =>
          var s = 0.0
          var i = 0
          while (i < code.length) { s += tab(i)(code(i)); i += 1 }
          (pid, nid, s)
        }
      }
      .toDF("probe_id", "neighbor_id", "adc_score")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("adc_score").desc, col("neighbor_id"))))
      .filter(col("rank") <= topK)
  }

  /** ADC shortlist + EXACT re-rank (the FAISS "refine" stage): [[pqTopK]]
    * retrieves `shortlist` candidates per probe from the code plane alone,
    * then ONLY those rows' raw vectors are fetched (a shortlist-bounded
    * semi-join against the corpus — at 100 TB this is the few-KB random
    * read per query that makes PQ usable at all) and exact cosine picks
    * the final `topK`. Raises recall from "quantization-error-limited" to
    * "shortlist-recall-limited" while search still never scans raw
    * vectors. Returns (probe_id, neighbor_id, cos_sim, rank). */
  def pqTopKRerank(probes: DataFrame, encoded: DataFrame, corpus: DataFrame,
                   probeIdCol: String, corpusIdCol: String, vecCol: String,
                   cb: Codebook, topK: Int, shortlist: Int): DataFrame = {
    val cand = pqTopK(probes, encoded, probeIdCol, vecCol, cb, shortlist)
      .select(col("probe_id"), col("neighbor_id"))
    val fetched = cand.join(
      corpus.select(col(corpusIdCol).cast("long").as("neighbor_id"),
        col(vecCol).as("_nv")),
      Seq("neighbor_id"))
    fetched.join(
        broadcast(probes.select(col(probeIdCol).cast("long").as("probe_id"),
          col(vecCol).as("_pv"))),
        Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(Similarity.cosine(col("_pv"), col("_nv")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= topK)
  }
}
