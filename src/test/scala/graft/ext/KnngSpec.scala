package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 item: the graph-index ANN family (NN-descent build + beam
  * search) — [[Knng]]. */
class KnngSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic plane: `n` vectors in 8 clusters on
    * distinct axes with a small id-dependent wobble — nearest neighbors
    * are in-cluster by construction. */
  private def plane(n: Int) = {
    val rows = (0L until n.toLong).map { i =>
      val c = (i % 8).toInt
      val base = Array.fill(16)(0.01f)
      base(c * 2) = 1.0f
      base((c * 2 + 1) % 16) = 0.3f + (i % 7).toFloat / 50f
      (i, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("buildGraph: k best outgoing edges per node, in-cluster, " +
      "deterministic under repartitioning") {
    val v = plane(120)
    val g = Knng.buildGraph(v, k = 5, iters = 2, blocks = 4)
    // every node carries at least its k kNN edges (plus long links)
    val perNode = g.groupBy($"src").count().select($"count").as[Long]
      .collect()
    assert(perNode.forall(_ >= 5L), perNode.distinct.toSeq)
    // NN-descent converges: each node's top-5-by-cos edges are
    // in-cluster on a separable plane (long links rank below them)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"src")
      .orderBy($"cos".desc, $"dst".asc)
    val top5 = g.withColumn("_rk", row_number().over(w))
      .filter($"_rk" <= 5)
    val cross = top5
      .filter(pmod($"src", lit(8)) =!= pmod($"dst", lit(8))).count()
    assert(cross == 0, s"$cross cross-cluster edges survived refinement")
    val g2 = Knng.buildGraph(v.repartition(7), k = 5, iters = 2, blocks = 4)
    assert(g2.exceptAll(g).isEmpty && g.exceptAll(g2).isEmpty)
  }

  test("searchTopK recall vs brute force on the separable plane") {
    val all = plane(200)
    val probes = all.filter($"vec_id" < 8)
      .select($"vec_id".as("probe_id"), $"embedding")
    val corpus = all.filter($"vec_id" >= 8)
    val g = Knng.buildGraph(corpus, k = 6, iters = 2, blocks = 4)
    val approx = Knng.searchTopK(probes, corpus, g, k = 10, beam = 24,
      hops = 3, entries = 4)
    val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
    val hits = approx.select($"probe_id", $"neighbor_id")
      .intersect(exact.select($"probe_id", $"neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    info(f"knng recall on separable plane: $recall%.3f ($hits/$total)")
    assert(recall >= 0.9, f"recall $recall%.3f")
    // search output is schema-compatible with bruteForceTopK
    assert(approx.columns.toSeq ==
      Seq("probe_id", "neighbor_id", "cos_sim", "rank"))
  }

  test("fixture-shaped recall: real embeddings table geometry") {
    // mirrors q222's split on a deterministic pseudo-embedding plane that
    // is NOT separable (mixture of axes) — the floor the query gates
    val rows = (0L until 300L).map { i =>
      val a = new Array[Float](16)
      var j = 0
      while (j < 16) {
        a(j) = (((i * 31 + j * 17) % 97).toFloat / 97f) - 0.5f
        j += 1
      }
      (i, a)
    }
    val all = rows.toDF("vec_id", "embedding")
    val probes = all.filter($"vec_id" < 5)
      .select($"vec_id".as("probe_id"), $"embedding")
    val corpus = all.filter($"vec_id" >= 5)
    val g = Knng.buildGraph(corpus, k = 8, iters = 2, blocks = 4)
    val approx = Knng.searchTopK(probes, corpus, g, k = 10, beam = 32,
      hops = 3, entries = 4)
    val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
    val hits = approx.select($"probe_id", $"neighbor_id")
      .intersect(exact.select($"probe_id", $"neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    info(f"knng recall on hash plane: $recall%.3f")
    assert(recall >= 0.5, f"recall $recall%.3f")
  }
}
