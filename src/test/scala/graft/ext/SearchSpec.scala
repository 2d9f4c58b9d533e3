package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "cat sat on the mat"),
    (1L, "cat cat dog"),
    (2L, "dog runs fast"),
    (3L, "the mat is red"),
    (4L, "fast red cat")
  ).toDF("doc_id", "text")

  test("postings carries exact term frequencies") {
    val p = Search.postings(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p(("cat", 1L)) == 2.0)
    assert(p(("cat", 0L)) == 1.0)
    assert(!p.contains(("dog", 0L)))
  }

  test("bm25TopK: a query matching one doc's unique terms ranks it first") {
    val q = Seq((100L, "runs"), (100L, "fast")).toDF("query_id", "token")
    val top = Search.bm25TopK(q, docs, "doc_id", "text", k = 3)
      .orderBy("rank").collect()
    // doc 2 matches both terms (one of them unique to it); doc 4 matches one.
    assert(top.head.getAs[Long]("doc_id") == 2L)
    assert(top.map(_.getAs[Long]("doc_id")).contains(4L))
    // scores strictly ordered by (rounded score desc, doc_id asc)
    val scores = top.map(r => (r.getAs[Double]("bm25"), r.getAs[Long]("doc_id")))
    assert(scores.sortBy { case (s, d) => (-s, d) }.toSeq == scores.toSeq)
  }

  test("bm25 score matches the closed form on a handmade corpus") {
    // Corpus of 2 docs; query term "a" appears twice in doc 0 (len 3) and
    // not in doc 1 (len 1): N=2, df=1, avgdl=2.
    val d2 = Seq((0L, "a a b"), (1L, "c")).toDF("doc_id", "text")
    val q = Seq((9L, "a")).toDF("query_id", "token")
    val r = Search.bm25TopK(q, d2, "doc_id", "text", k = 1).collect().head
    val idf = math.log(1.0 + (2.0 - 1.0 + 0.5) / (1.0 + 0.5))
    val tfPart = 2.0 * (Search.K1 + 1.0) /
      (2.0 + Search.K1 * (1.0 - Search.B + Search.B * 3.0 / 2.0))
    assert(r.getAs[Long]("doc_id") == 0L)
    assert(math.abs(r.getAs[Double]("bm25") -
      BigDecimal(idf * tfPart).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("tfidfTopK drops ubiquitous tokens and excludes self-pairs") {
    // "cat" is in 3/5 docs (df=0.6N) → dropped at maxDfFrac=0.5; doc 1 and
    // doc 2 then share only "dog".
    val pairs = Search.tfidfTopK(docs, "doc_id", "text",
      probeFilter = col("doc_id") === 1L, maxDfFrac = 0.5, k = 5).collect()
    assert(pairs.forall(_.getAs[Long]("probe_id") == 1L))
    assert(pairs.forall(r => r.getAs[Long]("doc_id") != 1L))
    val neigh = pairs.map(_.getAs[Long]("doc_id")).toSet
    assert(neigh.contains(2L)) // shares "dog"
    assert(!neigh.contains(4L)) // only shared token was the dropped "cat"
    assert(pairs.forall(r => r.getAs[Double]("cos") > 0.0 &&
      r.getAs[Double]("cos") <= 1.0))
  }

  test("rrfFuse: ids in both arms outrank single-arm ids; scores exact") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "id", "rank")
    val dense = Seq((1L, 10L, 3L), (1L, 12L, 1L)).toDF("query_id", "id", "rank")
    val f = Search.rrfFuse(lex, dense, k = 10)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("rrf"), r.getAs[Long]("rank"))).toMap
    def rr(r: Long) = 1.0 / (60.0 + r)
    def rnd(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(f(10L) == ((rnd(rr(1) + rr(3)), 1L))) // in both arms → top
    assert(f(12L)._1 == rnd(rr(1))) // dense-only
    assert(f(11L)._1 == rnd(rr(2))) // lex-only
    assert(f(12L)._2 == 2L && f(11L)._2 == 3L)
  }

  test("tfidf cosine of token-disjoint docs never appears") {
    val pairs = Search.tfidfTopK(docs, "doc_id", "text",
      probeFilter = col("doc_id") === 3L, maxDfFrac = 1.0, k = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!pairs.contains(2L)) // "the mat is red" vs "dog runs fast": disjoint
  }
}
