package graft.ext

import graft.SparkSpec

class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "sphinx of black quartz judge my vow",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",
    "how vexingly quick daft zebras jump")

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("vHash64 is deterministic and walks the rendered Y4M's frames") {
    val clip = VideoDedup.renderTextY4m(texts.head, jitter = false)
    val parsed = VideoDedup.parseY4m(clip)
    assert(parsed.nonEmpty)
    val (w, h, frames) = parsed.get
    assert(w == 36 && h == 32 && frames.length == 6)
    // frame offsets land on distinct marker-delimited pictures
    assert(frames == frames.sorted && frames.distinct.length == 6)
    val h1 = VideoDedup.vHash64(clip)
    val h2 = VideoDedup.vHash64(VideoDedup.renderTextY4m(texts.head, jitter = false))
    assert(h1.isDefined && h1 == h2)
  }

  test("first-frame jitter moves the clip signature by at most one bit") {
    texts.foreach { t =>
      val base = VideoDedup.vHash64(VideoDedup.renderTextY4m(t, jitter = false)).get
      val jit = VideoDedup.vHash64(VideoDedup.renderTextY4m(t, jitter = true)).get
      assert(hamming(base, jit) <= 1, s"jitter moved signature by ${hamming(base, jit)} bits")
    }
  }

  test("frame ORDER matters: a reordered clip signs differently") {
    // same frames, swapped order — XOR-of-rotations must not collapse them
    val a = VideoDedup.renderTextY4m(texts(0), jitter = false)
    val (w, h, offs) = VideoDedup.parseY4m(a).get
    val frameBytes = w * h + 2 * ((w / 2) * (h / 2))
    val b = a.clone()
    // swap pictures of sampled frames 0 and 2 (stride 2 samples both)
    var i = 0
    while (i < frameBytes) {
      val x = b((offs(0) + i).toInt)
      b((offs(0) + i).toInt) = b((offs(2) + i).toInt)
      b((offs(2) + i).toInt) = x
      i += 1
    }
    val ha = VideoDedup.vHash64(a).get
    val hb = VideoDedup.vHash64(b).get
    assert(ha != hb, "reordering sampled frames must change the signature")
  }

  test("distinct texts sign far apart; non-video payloads emit no hash") {
    val hs = texts.map(t =>
      VideoDedup.vHash64(VideoDedup.renderTextY4m(t, jitter = false)).get)
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i), hs(j)) > 10,
        s"texts $i/$j sign within ${hamming(hs(i), hs(j))} bits")
    assert(VideoDedup.vHash64(
      ImageDedup.renderTextImage(texts.head, jitter = false)).isEmpty)
    assert(VideoDedup.vHash64(
      AudioDedup.renderTextWav(texts.head, jitter = false)).isEmpty)
    assert(VideoDedup.vHash64(Array[Byte](1, 2, 3)).isEmpty)
    // truncated clip: frames clamp to what the payload holds, no throw
    val whole = VideoDedup.renderTextY4m(texts.head, jitter = false)
    val cut = java.util.Arrays.copyOf(whole, whole.length / 2)
    assert(VideoDedup.parseY4m(cut).forall(_._3.length < 6))
    val media = Seq(
      MediaRecord(1L, VideoDedup.renderTextY4m(texts.head, jitter = false)),
      MediaRecord(2L, Array[Byte](9, 9, 9))).toDS()
    assert(VideoDedup.vHashes(media).count() == 1)
  }

  test("videoNearDupPairs pairs jittered copies, not distinct clips") {
    val media = Seq(
      MediaRecord(1L, VideoDedup.renderTextY4m(texts(0), jitter = false)),
      MediaRecord(2L, VideoDedup.renderTextY4m(texts(0), jitter = true)),
      MediaRecord(3L, VideoDedup.renderTextY4m(texts(1), jitter = false)),
      MediaRecord(4L, VideoDedup.renderTextY4m(texts(1), jitter = false))).toDS()
    val pairs = VideoDedup.videoNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("gatedTextDupVideoPairs emits the text-identity plane with true gates") {
    val docs = (0L until 23L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    val out = VideoDedup.gatedTextDupVideoPairs(spark, docs,
      copyMod = 11, copyIdOffset = 1000L, maxHamming = 3)
    val rows = out.collect()
    // 23 docs in 4 text groups (sizes 6,6,6,5) + a jittered copy of each
    // %11 doc (ids 0,11,22 -> texts 0,3,2): group sizes 7,6,7,6
    val expected = Seq(7, 6, 7, 6).map(n => n * (n - 1) / 2).sum
    assert(rows.length == expected, s"got ${rows.length}, want $expected")
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)))
  }

  test("a broken retrieval fails the gate, not just the spec") {
    // search a deterministic candidate pool for a text whose jitter flips
    // exactly one bit (roughly half do — the mean shift must cross the
    // adjacent block's mean), so the broken-retrieval path is always
    // exercised rather than assumed away
    val flipping = (texts ++ (0 until 64).map(i => s"flip probe text $i"))
      .find { t =>
        val b = VideoDedup.vHash64(VideoDedup.renderTextY4m(t, jitter = false)).get
        val j = VideoDedup.vHash64(VideoDedup.renderTextY4m(t, jitter = true)).get
        hamming(b, j) == 1
      }
    assert(flipping.nonEmpty, "no candidate text flips a bit under jitter")
    val docs = (0L until 23L).map(i =>
      (i, if (i == 0L) flipping.get else texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      VideoDedup.gatedTextDupVideoPairs(spark, docs,
        copyMod = 11, copyIdOffset = 1000L, maxHamming = 0).collect()
    }
    assert(ex.getMessage.contains("recall"))
  }
}
