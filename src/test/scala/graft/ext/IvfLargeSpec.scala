package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** k-means‖ seeding for the c > 1024 regime (driver-side farthest-point is
  * refused there). Corpus is synthetic — the fixture embeddings tables are
  * far smaller than 1024 vectors — and fully deterministic (seeded RNG,
  * hash-threshold sampling), so counts are exact, not flaky. */
class IvfLargeSpec extends SparkSpec {
  import spark.implicits._

  private val n = 6000
  private val dim = 16
  private val c = 1100 // > 1024: must dispatch to k-means‖

  private lazy val corpus = {
    val rng = new scala.util.Random(42)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextFloat() * 2f - 1f))
    }
    spark.createDataset(rows).toDF("vec_id", "embedding").localCheckpoint()
  }

  test("seedCentroidsLarge returns exactly c distinct, contiguously-numbered centroids") {
    val seeds = Ivf.seedCentroidsLarge(corpus, c).collect()
    assert(seeds.length == c)
    assert(seeds.map(_.getInt(0)).sorted.toSeq == (0 until c))
    // selected centroids are distinct vectors, not repeats of one candidate
    val distinctVecs = seeds.map(_.getSeq[Double](1).toVector).distinct.length
    assert(distinctVecs == c)
  }

  test("trainCentroids dispatches past 1024 and Lloyd still runs on the k-means|| seed") {
    val centroids = Ivf.trainCentroids(corpus, c, iters = 1)
    assert(centroids.count() == c)
    // every corpus point lands in some cell, and the seed spreads the corpus
    // over many cells (a degenerate seed would funnel everything into a few)
    val assignment = Ivf.assign(corpus, centroids)
    assert(assignment.count() == n)
    val used = assignment.select(countDistinct(col("centroid_id"))).head().getLong(0)
    assert(used > c / 2, s"only $used of $c cells used — degenerate seeding")
  }

  test("seedCentroidsLarge is deterministic across runs") {
    val a = Ivf.seedCentroidsLarge(corpus, 1050).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val b = Ivf.seedCentroidsLarge(corpus, 1050).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }

  test("a corpus smaller than c fails loudly, not silently short") {
    val tiny = corpus.filter(col("vec_id") < 100)
    val e = intercept[IllegalArgumentException] {
      Ivf.seedCentroidsLarge(tiny, 1200).collect()
    }
    assert(e.getMessage.contains("candidates"))
  }
}
