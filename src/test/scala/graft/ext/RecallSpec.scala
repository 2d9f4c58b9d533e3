package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Recall floors for the approximate (rows-only-checked) operators against
  * their exact counterparts at sf0.01 — so the driver's rows-only check can
  * never mask a silent recall collapse. All inputs and hash seeds are fixed,
  * so these recalls are deterministic, not flaky statistics.
  *
  * Floors are set ~5–10 points below the measured value at sf0.01 to absorb
  * benign plan changes while still catching a collapse.
  */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def recallOf(approx: DataFrame, exact: DataFrame,
                       keyCols: Seq[String]): Double = {
    val e = exact.select(keyCols.map(col): _*).distinct()
    val a = approx.select(keyCols.map(col): _*).distinct()
    val hits = e.join(a, keyCols, "left_semi").count()
    val total = e.count()
    assert(total > 0, "exact ground truth is empty — recall undefined")
    hits.toDouble / total
  }

  test("q56 banded-LSH near-dup: subset of exact, recall >= 0.95") {
    val vecs = emb.filter(col("vec_id") < 500)
    val exact = Similarity.cosineNearDupPairs(vecs, threshold = 0.4)
    val banded = Similarity.cosineNearDupPairsBanded(vecs, threshold = 0.4)
    // precision 1.0 by construction: every banded pair is exact-verified
    assert(banded.join(exact, Seq("id_a", "id_b"), "left_anti").count() == 0)
    val r = recallOf(banded, exact, Seq("id_a", "id_b"))
    info(f"banded near-dup recall = $r%.3f")
    assert(r >= 0.95, f"recall $r%.3f below floor")
  }

  test("q30 LSH ANN top-k: recall vs exact brute-force top-k") {
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
    val ann = Similarity.annTopK(probes, corpus, k = 10, nPlanes = 4)
    val r = recallOf(ann, exact, Seq("probe_id", "neighbor_id"))
    info(f"LSH ANN recall@10 = $r%.3f")
    assert(r >= 0.30, f"recall $r%.3f below floor")
  }

  test("q45 IVF ANN top-k: recall vs exact brute-force top-k") {
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 5)
    val exact = Similarity.bruteForceTopK(probes, corpus, k = 10)
    val (centroids, assignment) = Ivf.buildIndex(corpus, c = 10, iters = 1)
    val ivf = Ivf.ivfTopK(probes, corpus, centroids, k = 10, nProbe = 3,
      assignment = Some(assignment))
    val r = recallOf(ivf, exact, Seq("probe_id", "neighbor_id"))
    info(f"IVF ANN recall@10 = $r%.3f")
    assert(r >= 0.30, f"recall $r%.3f below floor")
  }

  test("q27 MinHash near-dup: recall vs exact word-shingle Jaccard") {
    // Exact ground truth: distinct word-3-gram inverted index, all pairs
    // with true Jaccard >= 0.5 (bounded corpus — fine in a spec).
    val sh = docs
      .select(col("doc_id").as("doc"), split(col("text"), " ").as("w"))
      .select(col("doc"), col("w"),
        explode(sequence(lit(1), greatest(size(col("w")) - 2, lit(1)))).as("i"))
      .select(col("doc"), concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("s"))
      .distinct()
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val exact = inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")).as("j"))
      .filter(col("j") >= 0.5)
    val approx = Dedup.minHashDedupPairs(docs, "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.5)
    val r = recallOf(approx, exact, Seq("doc_a", "doc_b"))
    info(f"MinHash near-dup recall = $r%.3f")
    assert(r >= 0.80, f"recall $r%.3f below floor")
  }

  test("q28 SimHash banding is exact for hamming <= 3 (pigeonhole recall 1.0)") {
    val sk = Dedup.simHashSketches(docs, "doc_id", "text")
    val exact = sk.as("a")
      .join(sk.as("b"), col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.sk").bitwiseXOR(col("b.sk"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
    val banded = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
    val r = recallOf(banded, exact, Seq("doc_a", "doc_b"))
    info(f"SimHash recall = $r%.3f")
    assert(r == 1.0, "pigeonhole banding must have perfect recall")
    assert(banded.count() == exact.count())
  }
}
