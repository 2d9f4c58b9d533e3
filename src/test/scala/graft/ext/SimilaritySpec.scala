package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0)
    ).toDF("a", "b", "expect")
    val rows = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("expect"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val corpus = Seq(
      (10L, Array(1f, 0f)), (11L, Array(0.9f, 0.1f)),
      (12L, Array(0f, 1f)), (13L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val probes = Seq((1L, Array(1f, 0f))).toDF("probe_id", "embedding")
    val top = Similarity.bruteForceTopK(probes, corpus, k = 2)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 11L))
    assert(top.head.getAs[Double]("cos_sim") == 1.0)
  }

  test("annTopK results are a subset of brute-force with identical scores") {
    val corpus = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = Seq((0L, Array.tabulate(8)(j => math.sin(j).toFloat)))
      .toDF("probe_id", "embedding")
    val brute = Similarity.bruteForceTopK(probes, corpus, k = 50)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos_sim")).toMap
    val ann = Similarity.annTopK(probes, corpus, k = 5, nPlanes = 2, dims = 8).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      assert(brute(r.getAs[Long]("neighbor_id")) == r.getAs[Double]("cos_sim"))
    }
  }

  test("coresetByAnchors: unique assignment, per-cluster quota, flood-proof") {
    // 60 vectors clustered tightly around 3 axis anchors: vec i leans
    // toward axis (i % 3) with a small unique perturbation
    val corpus = (0 until 60).map { i =>
      val base = Array.fill(3)(0.05f + 0.001f * i)
      base(i % 3) = 1f
      (i.toLong + 100, base)
    }.toDF("vec_id", "embedding")
    val anchors = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f))).toDF("anchor_id", "embedding")
    val out = Similarity.coresetByAnchors(corpus, anchors, perCluster = 5)
      .collect()
    // quota: exactly 5 per cluster (each axis cluster has 20 candidates)
    assert(out.groupBy(_.getAs[Long]("anchor_id")).forall(_._2.length == 5))
    // a vector appears at most once (nearest-anchor assignment is unique)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == out.length)
    // assignment is to the true nearest axis
    out.foreach { r =>
      assert((r.getAs[Long]("vec_id") - 100) % 3 == r.getAs[Long]("anchor_id"))
    }
    // determinism: same selection on re-run
    val again = Similarity.coresetByAnchors(corpus, anchors, perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("lshBucket is deterministic and within [0, 2^planes)") {
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(-1f, -2f, -3f)))
      .toDF("vec_id", "embedding")
    val b1 = df.select(Similarity.lshBucket(col("embedding"), 4, dims = 3).as("b")).collect()
    val b2 = df.select(Similarity.lshBucket(col("embedding"), 4, dims = 3).as("b")).collect()
    assert(b1.map(_.getInt(0)).toSeq == b2.map(_.getInt(0)).toSeq)
    b1.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) < 16))
  }

  test("lateInteractionTopK: MaxSim rewards covering every query aspect") {
    // 4-dim vectors, 2 sub-vectors of dim 2. Probe = (1,0 | 0,1).
    // Doc 10 covers BOTH aspects (sub1 matches qsub1, sub2 matches qsub2)
    // → MaxSim 2.0. Doc 11 nails only aspect 1 twice → MaxSim 1.0 + eps.
    // Single-vector cosine would score them much closer; late interaction
    // separates them by construction.
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f, 1f)),
      (11L, Array(1f, 0f, 1f, 0f)),
      (12L, Array(0f, 1f, 0f, 1f)) // covers only aspect 2 → MaxSim 1.0
    ).toDF("vec_id", "embedding")
    val probes = Seq((1L, Array(1f, 0f, 0f, 1f)))
      .toDF("probe_id", "embedding")
    val got = Similarity.lateInteractionTopK(probes, corpus, k = 3,
      nSub = 2, dims = 4).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(10L, 11L, 12L))
    assert(got.head.getAs[Double]("maxsim") == 2.0)
    // doc 11: qsub1→best doc sub cos=1 (its sub1), qsub2→best cos=0 ⇒ 1.0
    assert(got(1).getAs[Double]("maxsim") == 1.0)
  }

  test("hardNegatives excludes same-label and near-dup vectors from top-k") {
    // probe is label 1; vec 10 is an exact twin (cos=1, above the 0.95
    // ceiling), vec 11 shares the label (a positive), vecs 12-14 are true
    // negatives at descending similarity
    val corpus = Seq(
      (10L, Array(1f, 0f, 0f), 2), // near-dup of the probe: ceiling-excluded
      (11L, Array(0.9f, 0.1f, 0f), 1), // same label: positive, excluded
      (12L, Array(0.6f, 0.4f, 0f), 2), // cos ≈ 0.832: below the ceiling
      (13L, Array(0.5f, 0.5f, 0f), 3),
      (14L, Array(0f, 0f, 1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val probes = Seq((1L, Array(1f, 0f, 0f), 1))
      .toDF("probe_id", "embedding", "probe_label")
    val got = Similarity.hardNegatives(probes, corpus, k = 2,
      dupCeiling = 0.95).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(12L, 13L))
    // ranks are contiguous from 1 and cosines descend
    assert(got.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
    val sims = got.map(_.getAs[Double]("cos_sim"))
    assert(sims.head > sims.last)
  }
}
