package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the centroid-bucketed
  * alternative to random-hyperplane LSH ([[Similarity.annTopK]]).
  *
  * Index build = a small declarative Lloyd's k-means (no MLlib): centroids
  * live in a C-row DataFrame (broadcast everywhere), assignment is a
  * broadcast join + per-vector argmax, and the update step is an
  * explode-by-dimension mean — all shuffles are keyed on (centroid, dim),
  * so the build scales with the corpus, not C×corpus. Search probes only
  * the `nProbe` nearest cells' inverted lists — the recall/throughput dial.
  * All cosines go through the native codegen'd [[Similarity.cosine]].
  */
object Ivf {

  /** (centroid_id, centroid: array<double>) — farthest-point seeding
    * (k-means++ without the probability weighting: each next seed is the
    * vector least similar to its nearest existing seed; deterministic with
    * id tiebreak) followed by `iters` Lloyd rounds. Every step is a scan +
    * broadcast of the C-row centroid table + TakeOrdered — nothing global
    * beyond C-sized frames, so the build scales with the corpus. Cells that
    * lose all members keep their previous centroid. */
  def trainCentroids(corpus: DataFrame, c: Int, iters: Int = 2,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // Seeding: collect a deterministic hash-sample of ~100×c vectors
    // (BOUNDED by construction — a few hundred KB no matter the corpus
    // size; this is a sample collect, not corpus materialization) and run
    // farthest-point selection driver-side in one pass. One Spark job for
    // the sample versus c jobs of cluster-wide argmax rounds.
    // Driver-side seeding is O(c² × sample) — fine for the coarse-quantizer
    // regime (c ≲ ~1000 cells); for larger c use a distributed k-means‖
    // seeding instead. The sample collect stays ~100×c rows regardless of
    // corpus size.
    require(c > 0, s"trainCentroids: c must be positive, got $c")
    require(c <= 1024,
      s"trainCentroids: driver-side farthest-point seeding is bounded to c <= 1024, got $c")
    val spark = corpus.sparkSession
    import spark.implicits._
    val total = corpus.count()
    require(total > 0, "trainCentroids: empty corpus")
    val sampleMod = math.max(total / (100L * c), 1L)
    val pool: Array[(Long, Array[Float])] = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
    require(pool.nonEmpty, "trainCentroids: hash sample came back empty")
    def cosArr(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val seedVecs = scala.collection.mutable.ArrayBuffer(pool.head._2)
    while (seedVecs.length < math.min(c, pool.length)) {
      // farthest = minimal similarity to its nearest existing seed; id asc tiebreak
      val next = pool.minBy { case (id, v) =>
        (seedVecs.map(s => cosArr(v, s)).max, id)
      }
      seedVecs += next._2
    }
    var centroids = seedVecs.zipWithIndex.map { case (v, i) =>
      (i, v.map(_.toDouble))
    }.toSeq.toDF("centroid_id", "centroid").localCheckpoint()
    (0 until iters).foreach { _ =>
      val assigned = assign(corpus, centroids, idCol, vecCol)
      val byDim = corpus.join(assigned, idCol)
        .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("i", "v")))
      val updated = byDim
        .groupBy(col("centroid_id"), col("i"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("dims"))
        .select(col("centroid_id"),
          transform(col("dims"), d => d.getField("m")).as("new_centroid"))
      centroids = centroids
        .join(updated, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    centroids
  }

  /** (vec_id, centroid_id): nearest centroid per vector — broadcast the
    * C-row centroid table, argmax by cosine via `max_by` on a
    * (cos, −centroid_id) struct (deterministic tiebreak to the lowest id).
    * A hash aggregate with map-side partials — no sort window. */
  def assign(corpus: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid_id"),
        Similarity.cosine(col(vecCol),
          col("centroid").cast("array<float>")).as("cos"))
      .groupBy(col(idCol))
      .agg(max_by(col("centroid_id"),
        struct(col("cos"), -col("centroid_id"))).as("centroid_id"))

  /** Build the full IVF index in one call: trained centroids plus the final
    * corpus→cell assignment, checkpointed so every search over the index
    * reuses one materialization instead of re-running the assignment scan. */
  def buildIndex(corpus: DataFrame, c: Int, iters: Int = 2,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val centroids = trainCentroids(corpus, c, iters, idCol, vecCol)
    val assignment = assign(corpus, centroids, idCol, vecCol).localCheckpoint()
    (centroids, assignment)
  }

  /** IVF search: each probe visits its `nProbe` closest cells and ranks
    * that union exactly. Pass the assignment from [[buildIndex]] to reuse
    * the already-materialized inverted lists; otherwise it is recomputed. */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nProbe: Int = 2,
              probeId: String = "probe_id", corpusId: String = "vec_id",
              vecCol: String = "embedding",
              assignment: Option[DataFrame] = None): DataFrame = {
    val assigned = assignment.getOrElse(assign(corpus, centroids, corpusId, vecCol))
    val lists = corpus.join(assigned, corpusId)
    val probeCells = {
      val w = Window.partitionBy(col(probeId))
        .orderBy(col("cos").desc, col("centroid_id").asc)
      probes.crossJoin(broadcast(centroids))
        .select(col(probeId), col(vecCol), col("centroid_id"),
          Similarity.cosine(col(vecCol),
            col("centroid").cast("array<float>")).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= nProbe)
        .select(col(probeId), col(vecCol), col("centroid_id"))
    }
    val scored = probeCells.as("p")
      .join(lists.as("c"), col("p.centroid_id") === col("c.centroid_id"))
      .select(col(s"p.$probeId").as("probe_id"),
        col(s"c.$corpusId").as("neighbor_id"),
        round(Similarity.cosine(col(s"p.$vecCol"), col(s"c.$vecCol")), 6).as("cos_sim"))
      .distinct()
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"),
        col("rank").cast("long").as("rank"))
  }
}
