package graft.ext

import graft.SparkSpec

class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "sphinx of black quartz judge my vow",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",
    "how vexingly quick daft zebras jump")

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash64 is deterministic and decodes the rendered WAV") {
    val wav = AudioDedup.renderTextWav(texts.head, jitter = false)
    val meta = Multimodal.decodeHeader(MediaRecord(1L, wav))
    assert(meta.format == "wav" && meta.n_frames == 65 * 8)
    val h1 = AudioDedup.aHash64(wav)
    val h2 = AudioDedup.aHash64(AudioDedup.renderTextWav(texts.head, jitter = false))
    assert(h1.isDefined && h1 == h2)
  }

  test("jitter moves the hash by at most one bit") {
    texts.foreach { t =>
      val base = AudioDedup.aHash64(AudioDedup.renderTextWav(t, jitter = false)).get
      val jit = AudioDedup.aHash64(AudioDedup.renderTextWav(t, jitter = true)).get
      assert(hamming(base, jit) <= 1, s"jitter moved hash by ${hamming(base, jit)} bits")
    }
  }

  test("distinct texts hash far apart; non-WAV payloads emit no hash") {
    val hs = texts.map(t =>
      AudioDedup.aHash64(AudioDedup.renderTextWav(t, jitter = false)).get)
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i), hs(j)) > 10,
        s"texts $i/$j hash within ${hamming(hs(i), hs(j))} bits")
    // image and garbage payloads must be skipped, not fail
    assert(AudioDedup.aHash64(ImageDedup.renderTextImage(texts.head, jitter = false)).isEmpty)
    assert(AudioDedup.aHash64(Array[Byte](1, 2, 3)).isEmpty)
    val media = Seq(
      MediaRecord(1L, AudioDedup.renderTextWav(texts.head, jitter = false)),
      MediaRecord(2L, Array[Byte](9, 9, 9))).toDS()
    assert(AudioDedup.aHashes(media).count() == 1)
  }

  test("audioNearDupPairs pairs jittered copies, not distinct clips") {
    val media = Seq(
      MediaRecord(1L, AudioDedup.renderTextWav(texts(0), jitter = false)),
      MediaRecord(2L, AudioDedup.renderTextWav(texts(0), jitter = true)),
      MediaRecord(3L, AudioDedup.renderTextWav(texts(1), jitter = false)),
      MediaRecord(4L, AudioDedup.renderTextWav(texts(1), jitter = false))).toDS()
    val pairs = AudioDedup.audioNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("gatedTextDupAudioPairs emits the text-identity plane with true gates") {
    val docs = (0L until 21L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    val out = AudioDedup.gatedTextDupAudioPairs(spark, docs,
      copyMod = 7, copyIdOffset = 1000L, maxHamming = 3)
    val rows = out.collect()
    // 21 docs in 4 text groups (sizes 6,5,5,5) + a jittered copy of each
    // %7 doc (ids 0,7,14 -> texts 0,3,2): group sizes 7,5,6,6
    val expected = Seq(7, 5, 6, 6).map(n => n * (n - 1) / 2).sum
    assert(rows.length == expected, s"got ${rows.length}, want $expected")
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)))
  }

  test("a broken retrieval fails the gate, not just the spec") {
    // find a text whose jitter flips exactly one bit, key it to doc 0 (in
    // both sample slices); maxHamming = 0 must then lose its copy pair and
    // the in-query recall require must throw
    val flipping = texts.find { t =>
      val b = AudioDedup.aHash64(AudioDedup.renderTextWav(t, jitter = false)).get
      val j = AudioDedup.aHash64(AudioDedup.renderTextWav(t, jitter = true)).get
      hamming(b, j) == 1
    }
    assume(flipping.nonEmpty, "no spec text flips a bit under jitter")
    val docs = (0L until 21L).map(i =>
      (i, if (i == 0L) flipping.get else texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      AudioDedup.gatedTextDupAudioPairs(spark, docs,
        copyMod = 7, copyIdOffset = 1000L, maxHamming = 0).collect()
    }
    assert(ex.getMessage.contains("recall"))
  }
}
