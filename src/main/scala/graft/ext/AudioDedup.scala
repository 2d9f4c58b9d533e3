package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Audio near-duplicate detection over binary media columns — the PCM face
  * of the [[MediaNearDup]] family. A crawl's audio repeats with re-encodes
  * (gain shifts, container churn, clipped leaders) the way its images
  * repeat with brightness drift; the standard screen is a per-clip
  * acoustic fingerprint + hamming-bounded pairing. This module produces a
  * 64-bit ENERGY-DELTA hash from real WAV container decode
  * ([[Multimodal]]'s RIFF/fmt/data chunk walk) — the time-axis analogue of
  * [[ImageDedup]]'s dHash — and hands pairing to the same banded join; at
  * 100 TB the cost profile is identical to the measured image/SimHash
  * behavior because everything past the hash plane is shared code.
  *
  * aHash (65-cell energy-delta hash): split the clip's PCM frames into 65
  * contiguous time cells, average the sample bytes in each, emit one bit
  * per adjacent cell pair — bit c = mean(c) > mean(c+1). Energy GRADIENTS
  * survive uniform gain shifts, which is what makes the fingerprint
  * perceptual rather than cryptographic.
  *
  * Reference scope: the reference pipeline (run_transform.py:1) is
  * text/ledger-only; this is a north-star extension of the multimodal tier
  * (SURVEY §2 [N] rows) alongside q32/q96/q105.
  */
object AudioDedup {

  /** 64-bit energy-delta hash of an audio payload; None for payloads that
    * are not decodable WAV clips (images, garbage — poison rows skip, not
    * kill). Cell boundaries are integer `c·n/65` over the clip's PCM
    * frames; clips shorter than the grid yield empty cells with mean 0,
    * still deterministic. Byte-mean over a cell's frames is the |sample|
    * energy proxy for the synthetic fixtures' uniform bytes — a codec-
    * backed pipeline would swap in RMS over decoded samples behind the
    * same signature. */
  def aHash64(p: Array[Byte]): Option[Long] = {
    val isWav = p.length >= 4 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
    if (!isWav) None
    else Multimodal.frameLayout(p).map { case (dataOff, frameBytes, nFrames) =>
      val means = new Array[Double](65)
      var c = 0
      while (c < 65) {
        val f0 = c * nFrames / 65
        val f1 = (c + 1) * nFrames / 65
        var sum = 0L
        var cnt = 0L
        var f = f0
        while (f < f1) {
          val start = dataOff + f * frameBytes
          val end = math.min(start + frameBytes, p.length.toLong)
          var i = start
          while (i < end) { sum += (p(i.toInt) & 0xFF); cnt += 1; i += 1 }
          f += 1
        }
        means(c) = if (cnt == 0) 0.0 else sum.toDouble / cnt
        c += 1
      }
      var h = 0L
      c = 0
      while (c < 64) {
        if (means(c) > means(c + 1)) h |= 1L << c
        c += 1
      }
      h
    }
  }

  /** (doc, sk) fingerprint plane of a media corpus — non-WAV payloads emit
    * nothing. */
  def aHashes(media: Dataset[MediaRecord]): DataFrame =
    MediaNearDup.hashes(media, aHash64)

  /** Audio near-dup pairs: fingerprint plane → identical-hash collapse →
    * banded hamming join over unique clips → member expansion. */
  def audioNearDupPairs(media: Dataset[MediaRecord],
                        maxHamming: Int = 3): DataFrame =
    MediaNearDup.nearDupPairs(media, aHash64, maxHamming)

  // --- Deterministic text-derived audio corpus (oracle fixture) -----------

  /** Frames per rendered clip: 8 frames per hash cell so every cell mean
    * is populated, 1040 payload bytes at mono 16-bit. */
  private val Frames = 65 * 8

  /** Render a complete valid mono 16-bit PCM WAV whose samples are a pure
    * function of the TEXT CONTENT: byte-identical texts render to
    * byte-identical clips. With `jitter` set, every byte of the FIRST hash
    * cell's frames is wrap-shifted by +64 — a deterministic stand-in for a
    * re-encode's leading-edge gain drift that perturbs exactly ONE cell
    * mean, so it moves the hash by AT MOST one bit (only the
    * mean(0)>mean(1) comparison can flip): jittered copies stay within any
    * hamming tolerance ≥ 1 of their base clip while remaining
    * byte-distinct payloads. */
  def renderTextWav(text: String, jitter: Boolean): Array[Byte] = {
    val dataSize = 2 * Frames
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000) // PCM, mono, rate
      .putShort(2).putShort(16)                           // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    val pcm = new Array[Byte](dataSize)
    var s = MediaNearDup.textSeed(text)
    var i = 0
    while (i < dataSize) {
      s = MediaNearDup.mix64(s)
      var k = 0
      while (k < 8 && i < dataSize) {
        pcm(i) = ((s >>> (8 * k)) & 0xFF).toByte
        i += 1
        k += 1
      }
    }
    if (jitter) {
      // first hash cell = frames [0, Frames/65) = bytes [0, 2·Frames/65)
      var j = 0
      val end = 2 * (Frames / 65)
      while (j < end) { pcm(j) = (pcm(j) + 64).toByte; j += 1 }
    }
    b.put(pcm)
    b.array()
  }

  /** The documents table as a corpus of real WAV clips keyed by text
    * content; rows with id ≥ `jitterIdFloor` render with the one-bit
    * jitter. */
  def documentsAsTextWavs(spark: SparkSession, docs: DataFrame,
                          jitterIdFloor: Long): Dataset[MediaRecord] =
    MediaNearDup.textCorpus(spark, docs, renderTextWav, jitterIdFloor)

  /** q125's SELF-GATING form — the q105 gate structure on the audio plane
    * (see `ImageDedup.gatedTextDupImagePairs` for the full rationale).
    * Emits the text-identity pair set with the three verdict booleans. */
  def gatedTextDupAudioPairs(spark: SparkSession, docs: DataFrame,
                             copyMod: Int = 5, copyIdOffset: Long = 100000L,
                             maxHamming: Int = 3,
                             sampleMod: Int = 101,
                             gateSampleMod: Int = 10): DataFrame =
    MediaNearDup.gatedTextDupPairs(spark, docs, renderTextWav, aHash64,
      "q125 audio aHash", copyMod, copyIdOffset, maxHamming, sampleMod,
      gateSampleMod)
}
