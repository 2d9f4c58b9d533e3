package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters in 4d
  private def corpus = (
    (0 until 20).map(i => (i.toLong, Array(1f + i * 0.01f, 0f, 0f, 0f))) ++
      (20 until 40).map(i => (i.toLong, Array(0f, 1f + i * 0.01f, 0f, 0f)))
    ).toDF("vec_id", "embedding")

  test("trainCentroids converges to one centroid per cluster") {
    val cents = Ivf.trainCentroids(corpus, c = 2, iters = 2).collect()
    assert(cents.length == 2)
    val arrays = cents.map(_.getSeq[Double](1))
    // one centroid dominated by dim0, the other by dim1
    assert(arrays.exists(a => a.head > 0.9 && a(1) < 0.1))
    assert(arrays.exists(a => a.head < 0.1 && a(1) > 0.9))
  }

  test("assign puts each vector in its own cluster's cell") {
    val cents = Ivf.trainCentroids(corpus, c = 2, iters = 2)
    val byCell = Ivf.assign(corpus, cents)
      .groupBy("centroid_id").agg(count(lit(1)).as("n")).collect()
    assert(byCell.length == 2)
    assert(byCell.forall(_.getAs[Long]("n") == 20L))
  }

  test("persisted index (parquet roundtrip) probes identically to in-memory") {
    val (cents, lists) = Ivf.buildIndex(corpus, c = 2, iters = 1)
    val root = tmpDir("ivf_persist")
    cents.write.mode("overwrite").parquet(s"$root/centroids")
    lists.write.mode("overwrite").parquet(s"$root/lists")
    val probes = Seq((100L, Array(1f, 0.01f, 0f, 0f)),
      (101L, Array(0f, 1f, 0.02f, 0f))).toDF("probe_id", "embedding")
    val mem = Ivf.ivfTopK(probes, corpus, cents, k = 5, nProbe = 1,
      assignment = Some(lists)).orderBy("probe_id", "rank").collect()
    val disk = Ivf.ivfTopK(probes, corpus, spark.read.parquet(s"$root/centroids"),
      k = 5, nProbe = 1,
      assignment = Some(spark.read.parquet(s"$root/lists")))
      .orderBy("probe_id", "rank").collect()
    assert(mem.length == 10 && disk.length == mem.length)
    mem.zip(disk).foreach { case (a, b) => assert(a == b) }
  }

  test("ivfTopK with nProbe=1 returns in-cluster exact top-k") {
    val cents = Ivf.trainCentroids(corpus, c = 2, iters = 2)
    val probes = Seq((100L, Array(1f, 0.01f, 0f, 0f))).toDF("probe_id", "embedding")
    val hits = Ivf.ivfTopK(probes, corpus, cents, k = 5, nProbe = 1)
      .orderBy("rank").collect()
    assert(hits.length == 5)
    // all neighbors come from cluster 0 (vec_id < 20)
    assert(hits.forall(_.getAs[Long]("neighbor_id") < 20L))
    // scores match the brute-force values
    val brute = Similarity.bruteForceTopK(probes, corpus, k = 5)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos_sim")).toMap
    hits.foreach { h =>
      assert(brute(h.getAs[Long]("neighbor_id")) == h.getAs[Double]("cos_sim"))
    }
  }

  test("ivfTopKFiltered ranks only predicate-passing vectors") {
    val attrs = corpus.withColumn("label", (col("vec_id") % 2).cast("int"))
    val (cents, assignment) = Ivf.buildIndex(attrs, c = 2, iters = 1)
    val probes = Seq((100L, Array(1f, 0.01f, 0f, 0f)))
      .toDF("probe_id", "embedding")
    val hits = Ivf.ivfTopKFiltered(probes, attrs, cents,
      col("label") === 0, k = 5, nProbe = 1,
      assignment = Some(assignment)).collect()
    assert(hits.length == 5)
    // every neighbor is an even id (label 0) from the dim0 cluster
    assert(hits.forall(h => h.getAs[Long]("neighbor_id") % 2 == 0 &&
      h.getAs[Long]("neighbor_id") < 20))
  }

  test("extendIndex appends postings without touching existing ones") {
    val old = corpus.filter(col("vec_id") < 30)
    val batch = corpus.filter(col("vec_id") >= 30)
    val (cents, assignment) = Ivf.buildIndex(old, c = 2, iters = 1)
    val extended = Ivf.extendIndex(cents, assignment, batch)
    assert(extended.count() == 40L)
    // old postings byte-identical
    val before = assignment.select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getAs[Any](1))).toSet
    val after = extended.filter(col("vec_id") < 30)
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getLong(0), r.getAs[Any](1))).toSet
    assert(after == before)
    // appended dim1-cluster vectors are findable through the old centroids
    // (all dim1 vectors are colinear with the probe — cos 1.0 — so the
    // id-ascending tiebreak fills low ids first; k=15 must reach ≥30)
    val probes = Seq((100L, Array(0f, 1f, 0f, 0f))).toDF("probe_id", "embedding")
    val hits = Ivf.ivfTopK(probes, corpus, cents, k = 15, nProbe = 1,
      assignment = Some(extended)).collect()
    assert(hits.length == 15)
    assert(hits.exists(_.getAs[Long]("neighbor_id") >= 30))
  }
}
