package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeHeader parses real PPM/BMP/WAV headers and hashes the payload") {
    // hand-built PPM with a comment line in the header
    val ppm = "P6\n# a comment\n3 2\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](3 * 2 * 3)(1)
    val mPpm = Multimodal.decodeHeader(MediaRecord(1L, ppm))
    assert(mPpm.format == "ppm" && mPpm.width == 3 && mPpm.height == 2 &&
      mPpm.n_frames == 1 && mPpm.n_bytes == ppm.length)

    val mPgm = Multimodal.decodeHeader(
      MediaRecord(2L, "P5\n4 5\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](20)(0)))
    assert(mPgm.format == "pgm" && mPgm.width == 4 && mPgm.height == 5)

    val bmp = Multimodal.syntheticPayload(3L, 1)  // n%3==1 -> BMP, w=2, h=2
    val mBmp = Multimodal.decodeHeader(MediaRecord(3L, bmp))
    assert(mBmp.format == "bmp" && mBmp.width == 2 && mBmp.height == 2 &&
      mBmp.n_frames == 1)

    val wav = Multimodal.syntheticPayload(4L, 5)  // n%3==2 -> WAV, f=6 frames
    val mWav = Multimodal.decodeHeader(MediaRecord(4L, wav))
    assert(mWav.format == "wav" && mWav.width == 0 && mWav.height == 0 &&
      mWav.n_frames == 6)

    // garbage decodes as unknown, never throws (poison rows at 100 TB)
    val mBad = Multimodal.decodeHeader(MediaRecord(5L, "hello".getBytes("UTF-8")))
    assert(mBad.format == "unknown" && mBad.width == 0 && mBad.n_frames == 0)
    // openssl-verified sha256("hello")
    assert(mBad.sha256 ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")

    // truncated magic-only payloads must not throw either
    for (junk <- Seq("P6", "BM", "RIFF", "P6\n#", "RIFFxxxxWAVE"))
      assert(Multimodal.decodeHeader(
        MediaRecord(9L, junk.getBytes("US-ASCII"))).format == "unknown")
  }

  test("adversarial headers degrade to unknown instead of lying or throwing") {
    // netpbm dimension token that would overflow Long
    val overflow = "P6\n12345678901234567890 1\n255\n".getBytes("US-ASCII")
    assert(Multimodal.decodeHeader(MediaRecord(1L, overflow)).format == "unknown")

    // WAV whose data chunk declares far more bytes than the payload holds
    val b = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(40)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(0x7FFFFFF0)
    b.putInt(0) // only 4 real data bytes
    val corrupt = Multimodal.decodeHeader(MediaRecord(2L, b.array()))
    assert(corrupt.format == "unknown" && corrupt.n_frames == 0,
      s"corrupt data size must not become a frame count: $corrupt")

    // legacy BITMAPCOREHEADER (12-byte DIB): u16 dims at different offsets —
    // must be rejected, not parsed as INFOHEADER garbage
    val core = java.nio.ByteBuffer.allocate(26 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    core.put('B'.toByte).put('M'.toByte)
      .putInt(32).putInt(0).putInt(26)
      .putInt(12).putShort(7).putShort(9).putShort(1).putShort(24)
    assert(Multimodal.decodeHeader(MediaRecord(3L, core.array())).format == "unknown")
  }

  test("decodeMeta runs the real decode distributed via mapPartitions") {
    val media = Seq(
      MediaRecord(1L, Multimodal.syntheticPayload(1L, 3)),  // ppm w=4 h=4
      MediaRecord(2L, Multimodal.syntheticPayload(2L, 7)),  // bmp w=8 h=8
      MediaRecord(3L, Multimodal.syntheticPayload(3L, 2))   // wav f=3
    ).toDS()
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).format == "ppm" && meta(1L).width == 4 && meta(1L).height == 4)
    assert(meta(2L).format == "bmp" && meta(2L).width == 8 && meta(2L).height == 8)
    assert(meta(3L).format == "wav" && meta(3L).n_frames == 3)
  }

  test("syntheticPayload round-trips: decode recovers exactly the synthesized shape") {
    for (n <- 0 to 120; id <- Seq(0L, 17L)) {
      val m = Multimodal.decodeHeader(MediaRecord(id, Multimodal.syntheticPayload(id, n)))
      val (w, h, f) = (n % 16 + 1, n % 9 + 1, n % 50 + 1)
      n % 3 match {
        case 0 => assert(m.format == "ppm" && m.width == w && m.height == h && m.n_frames == 1)
        case 1 => assert(m.format == "bmp" && m.width == w && m.height == h && m.n_frames == 1)
        case _ => assert(m.format == "wav" && m.width == 0 && m.n_frames == f)
      }
    }
  }

  // fill(k) inside every synthetic payload is ((mediaId + k) % 256) — the
  // analytic frame-sum the oracle (q96) also predicts
  private def expectedSum(mediaId: Long, from: Long, until: Long): Long =
    (from until until).map(k => (mediaId + k) % 256).sum

  test("sampleFrames extracts real container frames with exact byte sums") {
    // id=5, n=3 → PPM w=4 h=4: frameBytes=12, 4 pixel rows; stride 2 → rows 0,2
    // id=6, n=4 → BMP w=5 h=5: stride=(5*3+3)/4*4=16, 5 rows; stride 2 → 0,2,4
    // id=7, n=5 → WAV f=6: frameBytes=2 (mono 16-bit), 6 PCM frames → 0,2,4
    val media = Seq(
      MediaRecord(5L, Multimodal.syntheticPayload(5L, 3)),
      MediaRecord(6L, Multimodal.syntheticPayload(6L, 4)),
      MediaRecord(7L, Multimodal.syntheticPayload(7L, 5)),
      MediaRecord(8L, "not a media file".getBytes("UTF-8"))  // unknown → no rows
    ).toDS()
    val got = Multimodal.sampleFrames(media, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val want =
      (for (j <- Seq(0L, 2L)) yield (5L, j) -> (12L, expectedSum(5L, j * 12, j * 12 + 12))) ++
      (for (j <- Seq(0L, 2L, 4L)) yield (6L, j) -> (16L, expectedSum(6L, j * 16, j * 16 + 16))) ++
      (for (j <- Seq(0L, 2L, 4L)) yield (7L, j) -> (2L, expectedSum(7L, j * 2, j * 2 + 2)))
    assert(got == want.toMap)
  }

  test("sampleFrames clips truncated payloads and survives adversarial headers") {
    // PPM w=4 h=4 truncated mid-row-2: frame 2 clips to the remaining bytes
    val full = Multimodal.syntheticPayload(5L, 3)
    val headerLen = full.length - 4 * 4 * 3
    val truncated = full.take(headerLen + 12 * 2 + 5) // rows 0,1 + 5 bytes of row 2
    val clipped = Multimodal.sampleFrames(
      Seq(MediaRecord(1L, truncated)).toDS(), stride = 2)
      .orderBy("frame_no").collect()
    assert(clipped.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 12L), (2L, 5L)))
    assert(clipped(1).getLong(3) == expectedSum(5L, 24, 29))

    // BMP whose pixel-offset field is 0x80000000 (wraps negative as Int):
    // must emit nothing, not throw ArrayIndexOutOfBounds
    val evil = Multimodal.syntheticPayload(1L, 1).clone()
    evil(10) = 0; evil(11) = 0; evil(12) = 0; evil(13) = 0x80.toByte
    // netpbm declaring a ~10^18-row image over a 10-byte payload: the frame
    // count must clamp to what the bytes hold (terminates fast, 1 clipped row)
    val huge = "P5\n3 999999999999999999\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](10)(1)
    val adversarial = Multimodal.sampleFrames(
      Seq(MediaRecord(1L, evil), MediaRecord(2L, huge)).toDS(), stride = 1).collect()
    assert(adversarial.forall(_.getLong(0) == 2L), "evil BMP must emit nothing")
    assert(adversarial.length == 4 && adversarial.map(_.getLong(2)).sum == 10L,
      s"huge-height netpbm must clamp to the 10 real bytes: ${adversarial.toSeq}")

    // 16-bit PGM (maxval 65535): 2 bytes/sample, so a 2x2 row is 4 bytes
    val p16 = "P5\n2 2\n65535\n".getBytes("US-ASCII") ++
      Array.tabulate[Byte](8)(i => (i + 1).toByte)
    val rows16 = Multimodal.sampleFrames(
      Seq(MediaRecord(3L, p16)).toDS(), stride = 1).orderBy("frame_no").collect()
    assert(rows16.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 4L, 1L + 2 + 3 + 4), (1L, 4L, 5L + 6 + 7 + 8)))
  }

  test("documentsAsMedia carries a true binary payload column") {
    val docs = Seq((7L, "abc")).toDF("doc_id", "text")
    val ds = Multimodal.documentsAsMedia(spark, docs)
    assert(ds.schema("payload").dataType.typeName == "binary")
    assert(ds.collect().head.payload.toSeq == "abc".getBytes("UTF-8").toSeq)
  }

  test("documentsAsSyntheticMedia synthesizes executor-side from text length") {
    val docs = Seq((1L, "abc"), (2L, "abcd")).toDF("doc_id", "text") // n=3 ppm, n=4 bmp
    val metas = Multimodal.decodeMeta(
      Multimodal.documentsAsSyntheticMedia(spark, docs))
      .collect().map(m => m.media_id -> m.format).toMap
    assert(metas == Map(1L -> "ppm", 2L -> "bmp"))
  }
}
