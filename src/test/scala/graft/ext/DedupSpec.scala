package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different words appear here now indeed")
  ).toDF("doc_id", "text")

  test("exactGroups keeps min id per fingerprint and counts copies") {
    val g = Dedup.exactGroups(docs, "doc_id", TextAnalysis.fingerprint(col("text")))
      .orderBy("keep_id").collect()
    assert(g.length == 3)
    val dup = g.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("jaccardPairs computes exact n-gram jaccard") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical text => jaccard 1
    assert(pairs((1L, 3L)) > 0.8 && pairs((1L, 3L)) < 1.0)
    assert(pairs((1L, 4L)) < 0.2)
  }

  test("minHashDedupPairs surfaces exact and near dups, not distinct docs") {
    val pairs = Dedup.minHashDedupPairs(docs, "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical docs have hamming 0; sketches are 64-bit stable") {
    val sk = Dedup.simHashSketches(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) == sk(2L))
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
  }

  test("minhash LSH candidate generation never cross-joins: bands bound work") {
    // 2 docs with zero shared shingles land in disjoint buckets
    val d = Seq((1L, "aaaa bbbb cccc"), (2L, "xxxx yyyy zzzz")).toDF("doc_id", "text")
    val cands = Dedup.minHashCandidates(d, "doc_id", "text", n = 4, k = 16, bands = 4)
    assert(cands.count() == 0)
  }

  test("clusters: chains, cycles, and separate components get min-id labels") {
    // chain 1-2-3-4, cycle 7-8-9-7, pair 5-6; transitivity must cross hops
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L),
      (7L, 8L), (8L, 9L), (9L, 7L)).toDF("doc_a", "doc_b")
    val cl = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cl(_) == 1L))
    assert(Seq(5L, 6L).forall(cl(_) == 5L))
    assert(Seq(7L, 8L, 9L).forall(cl(_) == 7L))
  }

  test("dedupByPairs: singletons keep themselves; exactly one canonical per cluster") {
    val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 7L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupByPairs(docs, pairs, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.length == 8)
    // cluster {2,5,7} → 2 canonical; everyone else is their own cluster
    assert(out.filter(t => Set(2L, 5L, 7L)(t._1)).forall(_._2 == 2L))
    assert(out.count(_._3) == 6) // 5 singletons + doc 2
    assert(out.find(_._1 == 5L).get._3 == false)
  }

  test("clusters auto-dispatches to star-contraction past maxIters") {
    // a 6-node chain has diameter 5: 2 min-propagation rounds cannot
    // converge, so the call must fall through to star-contraction and
    // still return the right labels instead of failing
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ok = Dedup.clusters(chain, maxIters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(ok(_) == 1L))
  }

  test("starContraction: 10^4-node chain collapses to one min-labeled component") {
    // diameter 10^4 — min-propagation would need 10^4 rounds; star
    // contraction must finish within its O(log^2 n) round budget
    val n = 10000L
    val chain = spark.range(1L, n).select(
      col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
    val labels = Dedup.starContraction(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n.toInt)
    assert(labels.forall(_._2 == 1L))
  }

  test("incrementalNearDupPairs screens new batch against the signature store") {
    val corpus = Seq(
      (101L, "the quick brown fox jumps over the lazy dog and runs away fast"),
      (102L, "completely unrelated corpus content about databases and indexes here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (201L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup of 101
      (202L, "the quick brown fox jumps over the lazy cat and runs away fast"), // near dup of 101
      (203L, "entirely novel text with no relation to anything stored before now")
    ).toDF("doc_id", "text")
    val store = Dedup.minHashSignatures(corpus, "doc_id", "text", n = 3, k = 64)
    val fresh = Dedup.minHashSignatures(batch, "doc_id", "text", n = 3, k = 64)
    val hits = Dedup.incrementalNearDupPairs(fresh, store, k = 64, bands = 16,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(hits((201L, 101L)) == 1.0) // exact dup: all slots agree
    assert(hits.contains((202L, 101L)) && hits((202L, 101L)) < 1.0)
    assert(!hits.keys.exists { case (n, s) => n == 203L || s == 102L })
    // never store x store: no pair of two store docs can appear
    assert(hits.keys.forall { case (n, s) => n >= 200L && s < 200L })
  }

  test("word-shingle signatures: identical texts agree on every slot, " +
    "disjoint vocabularies share none (q102's signature family)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // identical
      (3L, "one two three four five six seven eight nine")   // disjoint
    ).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignaturesWords(docs, "doc_id", "text",
      n = 3, k = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "identical text must yield identical sigs")
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree < 8, s"disjoint vocab should agree on ~0/32 slots, got $agree")
    // and the incremental screen works end-to-end on the word family
    val hits = Dedup.incrementalNearDupPairs(
      Dedup.minHashSignaturesWords(
        docs.filter(col("doc_id") === 2L), "doc_id", "text", n = 3, k = 32),
      Dedup.minHashSignaturesWords(
        docs.filter(col("doc_id") =!= 2L), "doc_id", "text", n = 3, k = 32),
      k = 32, bands = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((2L, 1L)))
  }

  test("daily incremental-dedup loop: screen, append signatures, screen " +
    "tomorrow against the grown store — corpus never re-sketched") {
    val storeDir = tmpDir("sig_store")
    val day0 = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    Dedup.minHashSignaturesWords(day0, "doc_id", "text", n = 3, k = 32)
      .write.mode("append").parquet(storeDir)
    // day 1: one re-fetch of doc 1, one novel doc; screen then append
    val day1 = Seq(
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "novel content about distributed query engines and shuffles")
    ).toDF("doc_id", "text")
    val sigs1 = Dedup.minHashSignaturesWords(day1, "doc_id", "text", n = 3, k = 32)
    val hits1 = Dedup.incrementalNearDupPairs(sigs1,
      spark.read.parquet(storeDir), k = 32, bands = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits1.toSet == Set((11L, 1L)))
    sigs1.write.mode("append").parquet(storeDir)
    // day 2: a re-fetch of day-1's NOVEL doc must now hit the grown store
    val day2 = Seq(
      (21L, "novel content about distributed query engines and shuffles"))
      .toDF("doc_id", "text")
    val sigs2 = Dedup.minHashSignaturesWords(day2, "doc_id", "text", n = 3, k = 32)
    val hits2 = Dedup.incrementalNearDupPairs(sigs2,
      spark.read.parquet(storeDir), k = 32, bands = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits2.toSet == Set((21L, 12L)))
  }

  test("repeatedPassageStats flags cross-doc shared windows, not unique text") {
    val passage = (1 to 10).map(i => s"tok$i").mkString(" ") // one full window
    val corpus = Seq(
      (1L, passage + " unique tail one two three four five six seven"),
      (2L, passage + " other ending alpha beta gamma delta epsilon zeta eta"),
      (3L, "completely different words with no overlap at all in this doc")
    ).toDF("doc_id", "text")
    val stats = Dedup.repeatedPassageStats(corpus, "doc_id", "text",
      window = 10, stride = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1 and 2 share exactly the first window (tokens 1-10); their
    // stride-5 second/third windows diverge after the passage
    assert(stats(1L)._2 == 1L && stats(2L)._2 == 1L)
    assert(stats(1L)._3 > 0.0 && stats(1L)._3 < 1.0)
    assert(stats(3L)._2 == 0L && stats(3L)._3 == 0.0)
  }

  // The exact twins behind the q27/q28 gates are now load-bearing for
  // CORRECTNESS (they ARE the emitted rows): pin them against independent
  // collapse-free computations so a bug in the collapse/expand path cannot
  // hide inside a gate that compares two frames sharing that path.
  test("jaccardPairsWords equals the collapse-free direct computation") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val direct = {
      val sh = d.select(col("doc_id").as("doc"), split(col("text"), " ").as("w"))
        .select(col("doc"), col("w"),
          explode(sequence(lit(1), greatest(size(col("w")) - 2, lit(1)))).as("i"))
        .select(col("doc"),
          concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("s"))
        .distinct()
      val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
      sh.as("a")
        .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
        .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc"))
        .select(col("doc_a"), col("doc_b"),
          (col("inter").cast("double") /
            (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }
    val viaCollapse = Dedup.jaccardPairsWords(d, "doc_id", "text",
      n = 3, threshold = 0.5)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6))
    assert(viaCollapse.collect().map(key).toSet == direct.collect().map(key).toSet)
    assert(direct.count() > 0) // ground truth non-empty at sf0.01
  }

  test("exactDupPairs equals the direct text-equality self-join") {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    // augment with verbatim copies (the base table has no exact dups)
    val d = base.unionByName(base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val direct = d.as("a")
      .join(d.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val viaFp = Dedup.exactDupPairs(d, "doc_id", "text")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    assert(viaFp.collect().map(key).toSet == direct.collect().map(key).toSet)
    assert(direct.count() == 100)
  }

  test("gated q27/q28 forms emit TRUE verdict booleans on real data") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val g27 = Dedup.minHashGatedExactPairs(d, "doc_id", "text")
    assert(g27.select(col("recall_ok"), col("precision_ok")).distinct()
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq == Seq((true, true)))
    val aug = d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
    val g28 = Dedup.simHashGatedExactDupPairs(aug, "doc_id", "text")
    assert(g28.select(col("recall_ok"), col("pigeonhole_ok")).distinct()
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq == Seq((true, true)))
  }

  test("starContraction matches min-propagation on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    val viaProp = Dedup.clusters(pairs, maxIters = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val viaStar = Dedup.starContraction(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(viaStar == viaProp)
  }

  test("prefix-filtered Jaccard join equals the brute-force truth") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),     // J(1,2)=4/6
      (3L, "alpha beta gamma delta epsilon"),  // J(1,3)=1.0
      (4L, "omega psi chi phi upsilon"),
      (5L, "omega psi chi phi upsilon tau"),   // J(4,5)=5/6
      (6L, "alpha omega")                      // low overlap with all
    ).toDF("doc_id", "text")
    def truth(t: Double): Set[(Long, Long)] = {
      val sets = docs.collect()
        .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet)
      (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= t
      } yield (ia, ib)).toSet
    }
    for (t <- Seq(0.5, 0.8, 0.99)) {
      val got = Dedup.prefixJaccardPairsWords(docs, "doc_id", "text", t)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == truth(t), s"threshold $t")
    }
  }
}
