package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines (north-star
  * extension): exact (hash groupBy), n-gram Jaccard (inverted shingle index),
  * MinHash+LSH (banded signature bucketing), and SimHash (shuffle-free
  * per-document sketch + banded pairing).
  *
  * Scale stance (100 TB): MinHash/SimHash signatures are computed per-row in
  * codegen (no shuffle); the only shuffles are the groupBy on the dedup key
  * and the candidate-pair joins, whose volume is controlled by banding —
  * never an all-pairs cross join. Exact-Jaccard verification runs only on
  * LSH candidates. Signature/hash arrays are materialized once in a named
  * column so Catalyst's CollapseProject does not duplicate the (expensive)
  * shingling expression per signature slot.
  */
object Dedup {

  /** Exact dedup: group by a content fingerprint, keep the minimum id per
    * group (deterministic keep-first). One hash-aggregate shuffle on the
    * fingerprint — the canonical scalable exact-dedup plan. */
  def exactGroups(docs: DataFrame, idCol: String, fp: Column): DataFrame =
    docs
      .select(col(idCol), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard similarity pairs via an inverted shingle index:
    * explode distinct shingles, self-join on shingle (co-occurrence count =
    * intersection size), then |A∪B| = |A|+|B|−|A∩B|. All joins are
    * shuffle-hash on the shingle / id keys; intersection counts use map-side
    * partial aggregation. Exact but quadratic in the worst case — at scale,
    * run it only on candidates from [[minHashCandidates]], or bound the
    * input set. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc"),
        explode(TextAnalysis.shingles(col(textCol), n)).as("s"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** (doc, sig) frame: k-permutation MinHash signature (array<long>) over
    * character n-gram shingles. Permutation i re-hashes the base shingle hash
    * with the slot index (`xxhash64(h, i)`) — k independent hash families
    * with no overflowing affine arithmetic (Spark 4 ANSI mode rejects
    * wrapping multiplies). The shingle-hash array is materialized in its own
    * projection so the k signature slots each fold over a cheap column
    * reference, not k copies of the shingling expression. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame = {
    val hashed = docs.select(col(idCol).as("doc"),
      transform(TextAnalysis.shingles(col(textCol), n), s => xxhash64(s)).as("hs"))
    val sig = array((0 until k).map { i =>
      array_min(transform(col("hs"), h => xxhash64(h, lit(i))))
    }: _*)
    hashed.select(col("doc"), sig.as("sig"))
  }

  /** MinHash + LSH candidate pairs: split the k-long signature into `bands`
    * bands of k/bands slots, hash each band, and join documents that share
    * any (band index, band hash) bucket. Probability a pair with Jaccard j
    * becomes a candidate: 1 − (1 − j^(k/bands))^bands — the standard
    * S-curve. The join is on the band bucket, so work is proportional to
    * bucket collisions, not |docs|². */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    val sig = minHashSignatures(docs, idCol, textCol, n, k)
    val bandHashes = array((0 until bands).map { b =>
      xxhash64(slice(col("sig"), b * rows + 1, rows))
    }: _*)
    val banded = sig.select(col("doc"),
      posexplode(bandHashes).as(Seq("band", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  /** MinHash LSH near-dup pairs, verified: candidates from banded LSH, then
    * exact n-gram Jaccard on just those pairs (computed from the two shingle
    * arrays directly — no inverted index needed at candidate volume). */
  def minHashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 5, k: Int = 32, bands: Int = 8,
                        threshold: Double = 0.5): DataFrame = {
    val cands = minHashCandidates(docs, idCol, textCol, n, k, bands)
    val sh = docs.select(col(idCol).as("id"),
      TextAnalysis.shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.as("x"), col("doc_a") === col("x.id"))
      .join(sh.as("y"), col("doc_b") === col("y.id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(array_union(col("x.sh"), col("y.sh"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** (doc, sk) frame: 64-bit SimHash over whitespace tokens, computed
    * entirely with array expressions — no explode, no shuffle. For bit j the
    * signed vote is 2·|{tokens with bit j set}| − |tokens|; bit j of the
    * sketch is 1 iff the vote is positive. Token hashes are materialized once
    * (named column) and the 64 bit-votes fold over that reference. */
  def simHashSketches(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs.select(col(idCol).as("doc"),
      transform(TextAnalysis.tokens(col(textCol)), t => xxhash64(t)).as("hs"))
    val n = size(col("hs"))
    val sk = (0 until 64).map { j =>
      when(size(filter(col("hs"),
        h => shiftright(h, j).bitwiseAND(lit(1L)) === 1L)) * 2 > n,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _) // disjoint bit values: sum == bitwise OR
    hashed.select(col("doc"), sk.as("sk"))
  }

  /** SimHash near-dup pairs: band the 64-bit sketch into four 16-bit chunks
    * (a pair within Hamming distance 3 shares ≥1 exact chunk — pigeonhole),
    * join on (chunk index, chunk value), verify `bit_count(xor) <= maxHamming`. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sk = simHashSketches(docs, idCol, textCol)
    val chunks = array((0 until 4).map { b =>
      shiftright(col("sk"), b * 16).bitwiseAND(lit(0xFFFFL))
    }: _*)
    val banded = sk.select(col("doc"), col("sk"),
      posexplode(chunks).as(Seq("chunk", "v")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.v") === col("b.v") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.sk").bitwiseXOR(col("b.sk"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
