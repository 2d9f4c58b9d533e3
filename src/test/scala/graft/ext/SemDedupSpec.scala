package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two tight bundles around orthogonal axes + one lone vector.
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f)), (1L, Array(0.99f, 0.01f, 0f)),
    (2L, Array(0.98f, 0.02f, 0f)),
    (10L, Array(0f, 1f, 0f)), (11L, Array(0.01f, 0.99f, 0f)),
    (20L, Array(0f, 0f, 1f))
  ).toDF("vec_id", "embedding")

  test("within-cluster pairs found; output is a subset of the exact plane") {
    val cents = Ivf.trainCentroids(vecs, c = 3, iters = 2)
    val sem = Similarity.semDedupPairs(vecs, cents, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosineNearDupPairs(vecs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact))
    // the two bundles' internal pairs are same-cluster — all recovered
    assert(sem.contains((0L, 1L)) && sem.contains((0L, 2L)) &&
      sem.contains((1L, 2L)))
    assert(sem.contains((10L, 11L)))
    // nothing across bundles (cosine < 0.9 anyway)
    assert(!sem.exists { case (a, b) => a < 10L && b >= 10L })
  }

  test("multi-assignment never duplicates a pair") {
    val cents = Ivf.trainCentroids(vecs, c = 2, iters = 2)
    val sem = Similarity.semDedupPairs(vecs, cents, threshold = 0.0,
      topAssign = 2)
    val rows = sem.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length)
    // with topAssign = 2 and c = 2 every vector is in both cells → the
    // candidate set is the full pair plane: recall is exact
    val exact = Similarity.cosineNearDupPairs(vecs, threshold = 0.0).count()
    assert(rows.length.toLong == exact)
  }
}
