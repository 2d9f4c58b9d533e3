package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Video near-duplicate detection over binary media columns — the
  * MOTION-PICTURE face of the [[MediaNearDup]] family, closing the
  * image (q105) / audio (q125) / video modality matrix on the same shared
  * machinery. A crawl's video repeats with re-encodes and leading-edge
  * drift the way its images repeat with brightness shifts; the standard
  * screen is per-frame perceptual hashes folded into a clip signature +
  * hamming-bounded pairing (the video analogue of the dHash screen).
  *
  * Container: YUV4MPEG2 ("Y4M", the mjpegtools uncompressed interchange
  * format — plain "YUV4MPEG2 W.. H.." header, then per-frame "FRAME\n"
  * markers each followed by a raw 4:2:0 picture: a w×h LUMA plane + two
  * quarter-size chroma planes). Real header/marker walk with the same
  * adversarial-input contract as [[Multimodal.frameLayout]]: declared
  * dimensions are clamped to what the payload physically holds, garbage
  * decodes to None, poison rows skip rather than kill the stage.
  *
  * Clip signature: SAMPLED frames (every `stride`-th — hashing every frame
  * of a 100 TB corpus is the cost the sampling dial exists to avoid) each
  * get the 8×9 block-mean dHash of their LUMA plane ([[ImageDedup]]'s
  * grid, applied to the Y bytes), and the per-frame hashes fold by
  * XOR-of-rotations (`rotl(h_i, i mod 64)`) — order-SENSITIVE (a reordered
  * clip signs differently) while keeping the hamming bound: a k-bit
  * perturbation confined to one sampled frame moves the clip signature by
  * at most k bits, so frame-local re-encode drift stays within the pairing
  * tolerance exactly as it does for single images.
  *
  * Reference scope: the reference pipeline (run_transform.py:1) is
  * text/ledger-only; this is a north-star extension of the multimodal tier
  * alongside q32/q96/q105/q125.
  */
object VideoDedup {

  /** Parsed Y4M layout: luma width/height and the byte offset of each
    * frame's picture data (after its FRAME marker line), clamped to frames
    * the payload can actually hold a full luma plane for. */
  private[ext] def parseY4m(p: Array[Byte]): Option[(Int, Int, Seq[Long])] = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    if (p.length < magic.length ||
      !magic.indices.forall(i => p(i) == magic(i))) return None
    var hdrEnd = magic.length
    while (hdrEnd < p.length && p(hdrEnd) != '\n') hdrEnd += 1
    if (hdrEnd >= p.length) return None
    val header = new String(p, 0, hdrEnd, "US-ASCII")
    def tok(t: Char): Option[Long] =
      header.split(' ').collectFirst {
        case s if s.nonEmpty && s.head == t && s.drop(1).forall(_.isDigit) =>
          s.drop(1).toLong
      }
    val (w, h) = (tok('W'), tok('H')) match {
      case (Some(wv), Some(hv))
        if wv > 0 && hv > 0 && wv <= (1 << 16) && hv <= (1 << 16) =>
        (wv.toInt, hv.toInt)
      case _ => return None
    }
    // 4:2:0 picture: luma + 2 quarter chroma planes (w,h even in C420;
    // odd dims round the chroma up, matching the renderer's layout)
    val frameBytes = w.toLong * h + 2L * ((w + 1) / 2) * ((h + 1) / 2)
    val marker = "FRAME".getBytes("US-ASCII")
    val offs = Seq.newBuilder[Long]
    var pos = hdrEnd + 1L
    var ok = true
    while (ok && pos + marker.length <= p.length) {
      if (!marker.indices.forall(i => p((pos + i).toInt) == marker(i))) ok = false
      else {
        var lineEnd = pos + marker.length
        while (lineEnd < p.length && p(lineEnd.toInt) != '\n') lineEnd += 1
        if (lineEnd >= p.length) ok = false
        else {
          val dataOff = lineEnd + 1
          // clamp: only frames whose LUMA plane fits entirely count — a
          // truncated trailing picture is dropped, never half-hashed
          if (dataOff + w.toLong * h <= p.length) {
            offs += dataOff
            pos = dataOff + frameBytes
          } else ok = false
        }
      }
    }
    val frames = offs.result()
    if (frames.isEmpty) None else Some((w, h, frames))
  }

  /** 8×9 block-mean dHash of one frame's LUMA plane — [[ImageDedup]]'s
    * grid over the Y bytes at `off` (row r = bytes [off + r·w, off +
    * (r+1)·w)). */
  private def lumaDHash(p: Array[Byte], off: Long, w: Int, h: Int): Long = {
    val means = Array.ofDim[Double](8, 9)
    var r = 0
    while (r < 8) {
      val r0 = r.toLong * h / 8
      val r1 = (r + 1).toLong * h / 8
      var c = 0
      while (c < 9) {
        val c0 = c * w / 9
        val c1 = (c + 1) * w / 9
        var sum = 0L
        var cnt = 0L
        var rr = r0
        while (rr < r1) {
          var i = off + rr * w + c0
          val end = math.min(off + rr * w + c1, p.length.toLong)
          while (i < end) { sum += (p(i.toInt) & 0xFF); cnt += 1; i += 1 }
          rr += 1
        }
        means(r)(c) = if (cnt == 0) 0.0 else sum.toDouble / cnt
        c += 1
      }
      r += 1
    }
    var hsh = 0L
    var bit = 0
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (means(r)(c) > means(r)(c + 1)) hsh |= 1L << bit
        bit += 1
        c += 1
      }
      r += 1
    }
    hsh
  }

  /** 64-bit clip signature of a video payload; None for payloads that are
    * not decodable Y4M clips. Frames are SAMPLED every `stride`-th
    * (deterministic 0, stride, 2·stride, …); each sampled frame's luma
    * dHash folds in as `rotl(hash, sampledIndex mod 64)`. */
  def vHash64(p: Array[Byte], stride: Int = 2): Option[Long] = {
    require(stride > 0, s"stride must be positive, got $stride")
    parseY4m(p).map { case (w, h, frames) =>
      var sig = 0L
      var k = 0
      var f = 0
      while (f < frames.length) {
        sig ^= java.lang.Long.rotateLeft(
          lumaDHash(p, frames(f), w, h), k % 64)
        k += 1
        f += stride
      }
      sig
    }
  }

  /** (doc, sk) signature plane of a media corpus — non-Y4M payloads emit
    * nothing. */
  def vHashes(media: Dataset[MediaRecord]): DataFrame =
    MediaNearDup.hashes(media, vHash64(_))

  /** Video near-dup pairs: signature plane → identical-hash collapse →
    * banded hamming join over unique clips → member expansion. */
  def videoNearDupPairs(media: Dataset[MediaRecord],
                        maxHamming: Int = 3): DataFrame =
    MediaNearDup.nearDupPairs(media, vHash64(_), maxHamming)

  // --- Deterministic text-derived video corpus (oracle fixture) -----------

  private val W = 36
  private val H = 32
  private val Frames = 6

  /** Render a complete valid Y4M clip (6 frames of 36×32 4:2:0) whose
    * pixels are a pure function of the TEXT CONTENT. With `jitter`, frame
    * 0's top-left dHash block (luma rows [0, H/8), cols [0, W/9)) is
    * wrap-shifted by +64 — a deterministic stand-in for a re-encode's
    * first-frame drift that can flip at most ONE comparison of frame 0's
    * hash, hence at most one bit of the clip signature (frame 0 is always
    * sampled): jittered copies stay within any hamming tolerance ≥ 1 while
    * remaining byte-distinct payloads. */
  def renderTextY4m(text: String, jitter: Boolean): Array[Byte] = {
    val frameBytes = W * H + 2 * ((W / 2) * (H / 2))
    val header = s"YUV4MPEG2 W$W H$H F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + Frames * (marker.length + frameBytes))
    out.put(header)
    var s = MediaNearDup.textSeed(text)
    val frame = new Array[Byte](frameBytes)
    var f = 0
    while (f < Frames) {
      var i = 0
      while (i < frameBytes) {
        s = MediaNearDup.mix64(s)
        var k = 0
        while (k < 8 && i < frameBytes) {
          frame(i) = ((s >>> (8 * k)) & 0xFF).toByte
          i += 1
          k += 1
        }
      }
      if (jitter && f == 0) {
        var r = 0
        while (r < H / 8) {
          var c = 0
          while (c < W / 9) {
            val idx = r * W + c
            frame(idx) = (frame(idx) + 64).toByte
            c += 1
          }
          r += 1
        }
      }
      out.put(marker).put(frame)
      f += 1
    }
    out.array()
  }

  /** The documents table as a corpus of real Y4M clips keyed by text
    * content; rows with id ≥ `jitterIdFloor` render with the one-bit
    * first-frame jitter. */
  def documentsAsTextVideos(spark: SparkSession, docs: DataFrame,
                            jitterIdFloor: Long): Dataset[MediaRecord] =
    MediaNearDup.textCorpus(spark, docs, renderTextY4m, jitterIdFloor)

  /** q132's SELF-GATING form — the q105/q125 gate structure on the video
    * plane (see `ImageDedup.gatedTextDupImagePairs` for the full
    * rationale). copyMod=11 keeps the fixture disjoint from image's %5 and
    * audio's %7 so the three modalities cannot mask each other's failures.
    * Emits the text-identity pair set with the three verdict booleans. */
  def gatedTextDupVideoPairs(spark: SparkSession, docs: DataFrame,
                             copyMod: Int = 11, copyIdOffset: Long = 100000L,
                             maxHamming: Int = 3,
                             sampleMod: Int = 101,
                             gateSampleMod: Int = 10): DataFrame =
    MediaNearDup.gatedTextDupPairs(spark, docs, renderTextY4m, vHash64(_),
      "q132 video vHash", copyMod, copyIdOffset, maxHamming, sampleMod,
      gateSampleMod)
}
