package graft.ext

import graft.SparkSpec

class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  // texts(0) deliberately one whose jitter flips a dHash bit (hamming 1 to
  // its base) — the gate-failure test samples doc 0's group, so the slice
  // must contain a pair that maxHamming = 0 genuinely loses
  private val texts = Seq(
    "sphinx of black quartz judge my vow",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",
    "how vexingly quick daft zebras jump")

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash64 is deterministic and decodes the rendered PPM") {
    val img = ImageDedup.renderTextImage(texts.head, jitter = false)
    // the fixture is a real image the container decoder recognizes
    assert(Multimodal.decodeHeader(MediaRecord(1L, img)).format == "ppm")
    val h1 = ImageDedup.dHash64(img)
    val h2 = ImageDedup.dHash64(ImageDedup.renderTextImage(texts.head, jitter = false))
    assert(h1.isDefined && h1 == h2)
  }

  test("jitter moves the hash by at most one bit") {
    texts.foreach { t =>
      val base = ImageDedup.dHash64(ImageDedup.renderTextImage(t, jitter = false)).get
      val jit = ImageDedup.dHash64(ImageDedup.renderTextImage(t, jitter = true)).get
      assert(hamming(base, jit) <= 1, s"jitter moved hash by ${hamming(base, jit)} bits")
    }
    // the gate-failure test depends on texts(0) genuinely flipping a bit
    val b0 = ImageDedup.dHash64(ImageDedup.renderTextImage(texts(0), jitter = false)).get
    val j0 = ImageDedup.dHash64(ImageDedup.renderTextImage(texts(0), jitter = true)).get
    assert(hamming(b0, j0) == 1)
  }

  test("distinct texts hash far apart; non-images emit no hash") {
    val hs = texts.map(t =>
      ImageDedup.dHash64(ImageDedup.renderTextImage(t, jitter = false)).get)
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i), hs(j)) > 10,
        s"texts $i/$j hash within ${hamming(hs(i), hs(j))} bits")
    // WAV and garbage payloads must be skipped, not fail
    assert(ImageDedup.dHash64(Multimodal.syntheticPayload(7L, 2)).isEmpty) // WAV
    assert(ImageDedup.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    val media = Seq(
      MediaRecord(1L, ImageDedup.renderTextImage(texts.head, jitter = false)),
      MediaRecord(2L, Array[Byte](9, 9, 9))).toDS()
    assert(ImageDedup.dHashes(media).count() == 1)
  }

  test("imageNearDupPairs pairs jittered copies, not distinct images") {
    val media = Seq(
      MediaRecord(1L, ImageDedup.renderTextImage(texts(0), jitter = false)),
      MediaRecord(2L, ImageDedup.renderTextImage(texts(0), jitter = true)),
      MediaRecord(3L, ImageDedup.renderTextImage(texts(1), jitter = false)),
      MediaRecord(4L, ImageDedup.renderTextImage(texts(1), jitter = false))).toDS()
    val pairs = ImageDedup.imageNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("gatedTextDupImagePairs emits the text-identity plane with true gates") {
    val docs = (0L until 20L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    val out = ImageDedup.gatedTextDupImagePairs(spark, docs,
      copyMod = 5, copyIdOffset = 1000L, maxHamming = 3)
    val rows = out.collect()
    // 24 rows in 4 text groups of 6 (5 bases + 1 jittered copy of the %5
    // member) -> 4 * C(6,2) pairs
    assert(rows.length == 4 * 15)
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)))
  }

  test("pigeonhole gate sampling rejects a mod that loses the copy plane") {
    val docs = (0L until 20L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    // 7 does not divide copyIdOffset=1000: every base↔jittered-copy pair
    // would straddle the slice boundary and the gate would verify nothing
    val ex = intercept[IllegalArgumentException] {
      ImageDedup.gatedTextDupImagePairs(spark, docs,
        copyMod = 5, copyIdOffset = 1000L, maxHamming = 3, gateSampleMod = 7)
    }
    assert(ex.getMessage.contains("gateSampleMod"))
  }

  test("the sampled pigeonhole slice still contains a hamming-1 pair") {
    // reps in the mod-10 slice of the spec corpus: {0, 1000, 1010}; the
    // (0, 1000) pair is the jittered copy of texts(0), hamming exactly 1 —
    // so the sampled gate still exercises a pair the banded join must find
    val b0 = ImageDedup.dHash64(ImageDedup.renderTextImage(texts(0), jitter = false)).get
    val j0 = ImageDedup.dHash64(ImageDedup.renderTextImage(texts(0), jitter = true)).get
    assert(hamming(b0, j0) == 1)
    val slice = Seq((0L, b0), (1000L, j0)).toDF("doc", "sk")
    val banded = Dedup.hammingPairsBanded(slice, maxHamming = 3).collect()
    assert(banded.length == 1 && banded.head.getInt(2) == 1)
  }

  test("a broken retrieval fails the gate, not just the spec") {
    // maxHamming 0 drops the (doc 0, jittered copy) pair whose hash moved
    // one bit -> sampled recall over the text-identity plane falls below
    // 1.0 and the in-query require must throw
    val docs = (0L until 20L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      ImageDedup.gatedTextDupImagePairs(spark, docs,
        copyMod = 5, copyIdOffset = 1000L, maxHamming = 0).collect()
    }
    assert(ex.getMessage.contains("recall"))
  }
}
