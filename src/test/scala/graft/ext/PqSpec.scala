package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-embeddings: 16-dim, values from a hash mix so the
  // space has real structure-free spread (the hard case for PQ)
  private def corpus(n: Int) = spark.range(n)
    .select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / lit(500.0) - 1.0)
          .cast("float")).as("embedding"))

  test("train is deterministic and codebook shapes are right") {
    val c = corpus(200)
    val cb1 = Pq.train(c, "vec_id", "embedding", m = 4, k = 8)
    val cb2 = Pq.train(c, "vec_id", "embedding", m = 4, k = 8)
    assert(cb1.m == 4 && cb1.k == 8 && cb1.subDim == 4)
    assert(cb1.centroids.flatten.flatten.toSeq == cb2.centroids.flatten.flatten.toSeq)
    assert(cb1.rawBytes == 16 * 4 && cb1.codeBytes == 4)
  }

  test("encode emits one bounded code per vector") {
    val c = corpus(200)
    val cb = Pq.train(c, "vec_id", "embedding", m = 4, k = 8)
    val codes = Pq.encode(c, "vec_id", "embedding", cb).collect()
    assert(codes.length == 200)
    assert(codes.forall { r =>
      val code = r.getSeq[Int](1)
      code.length == 4 && code.forall(x => x >= 0 && x < 8)
    })
  }

  test("a byte-identical vector is its own nearest neighbor through ADC") {
    val c = corpus(300)
    val cb = Pq.train(c, "vec_id", "embedding", m = 4, k = 16)
    val encoded = Pq.encode(c, "vec_id", "embedding", cb)
    // probes ARE corpus members: the code path must rank the member itself
    // (identical code, maximal ADC self-score within its cell) in the top
    // shortlist and exact re-rank must then put it at rank 1 (cos = 1)
    val probes = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val top = Pq.pqTopKRerank(probes, encoded, c,
      "probe_id", "vec_id", "embedding", cb, topK = 1, shortlist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("rerank recall beats raw ADC recall against the exact twin") {
    val c = corpus(400).localCheckpoint()
    val probes = c.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val rest = c.filter(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(probes, rest, k = 10)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = Pq.train(rest, "vec_id", "embedding", m = 4, k = 16)
    val encoded = Pq.encode(rest, "vec_id", "embedding", cb).localCheckpoint()
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("probe_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val raw = recall(Pq.pqTopK(probes, encoded, "probe_id", "embedding", cb, 10))
    val rr = recall(Pq.pqTopKRerank(probes, encoded, rest,
      "probe_id", "vec_id", "embedding", cb, topK = 10, shortlist = 60))
    assert(rr >= raw, s"refine must not lose recall: raw=$raw rerank=$rr")
    assert(rr >= 0.5, s"rerank recall $rr below sanity floor")
  }
}
