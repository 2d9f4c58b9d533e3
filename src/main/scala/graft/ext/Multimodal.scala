package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media payload: opaque bytes + id. In a real pipeline the payload is an
  * image/audio/video blob read from object storage. */
final case class MediaRecord(media_id: Long, payload: Array[Byte])

/** Typed metadata produced by the decode stage. For audio (wav) width and
  * height are 0 and `n_frames` is the PCM frame count; for still images
  * `n_frames` is 1; unrecognized payloads decode as format "unknown". */
final case class MediaMeta(
    media_id: Long,
    n_bytes: Long,
    width: Long,
    height: Long,
    format: String,
    n_frames: Long,
    sha256: String)

/** Multimodal-column plumbing (north-star extension): treat image/audio/video
  * as opaque `binary` columns with typed metadata, decoded batch-wise on the
  * executors.
  *
  * The decoder is REAL header parsing — no codec libraries needed for
  * uncompressed container formats:
  *   - PPM/PGM (netpbm P5/P6): ASCII magic + whitespace/comment-tolerant
  *     dimension tokens,
  *   - BMP (BITMAPINFOHEADER): "BM" magic, little-endian dims at 18/22,
  *   - WAV (RIFF/WAVE): chunk walk to `fmt ` (block align) and `data`
  *     (byte size) → PCM frame count.
  * Anything else decodes to format "unknown" rather than erroring — a 100 TB
  * media crawl always contains garbage rows, and a poison payload must not
  * kill the stage.
  *
  * The Spark-side shape is what matters at scale: binary column in parquet →
  * `mapPartitions` batch decode on executors (the Scala analogue of
  * `mapInPandas`: one iterator per partition, decoder state initialized once
  * per partition, no per-row task overhead, no driver materialization) →
  * typed `Dataset` with an explicit schema.
  */
object Multimodal {

  /** Real header decode of one payload. Total function: malformed or
    * unrecognized bytes yield format "unknown" (width/height/frames 0). */
  def decodeHeader(r: MediaRecord): MediaMeta = {
    val p = r.payload
    val base = MediaMeta(r.media_id, p.length.toLong, 0L, 0L, "unknown", 0L,
      sha256Hex(p))
    // belt-and-suspenders on the total-function contract: ANY decoder bug on
    // adversarial bytes degrades to "unknown" instead of killing the stage
    try {
      decodeNetpbm(p).orElse(decodeBmp(p)).orElse(decodeWav(p))
        .map { case (w, h, fmt, frames) =>
          base.copy(width = w, height = h, format = fmt, n_frames = frames)
        }
        .getOrElse(base)
    } catch { case scala.util.control.NonFatal(_) => base }
  }

  /** netpbm P5 (PGM) / P6 (PPM): "P5"/"P6", then width, height, maxval as
    * ASCII tokens separated by whitespace, with '#'-to-EOL comments legal
    * anywhere between tokens. Returns (w, h, isP6, bytesPerSample, dataOff) —
    * pixel data starts one whitespace byte after the maxval token (netpbm
    * spec); maxval > 255 means two big-endian bytes per sample, and maxval
    * outside 1..65535 is illegal (rejected, not guessed at). */
  private def parseNetpbm(p: Array[Byte]): Option[(Long, Long, Boolean, Int, Int)] = {
    if (p.length < 2 || p(0) != 'P' || (p(1) != '5' && p(1) != '6')) return None
    var i = 2
    def nextInt(): Option[Long] = {
      // skip whitespace and comments
      while (i < p.length &&
             (p(i).toChar.isWhitespace || p(i) == '#')) {
        if (p(i) == '#') while (i < p.length && p(i) != '\n') i += 1
        else i += 1
      }
      val start = i
      while (i < p.length && p(i) >= '0' && p(i) <= '9') i += 1
      // > 18 digits would overflow Long (and is no real dimension)
      if (i == start || i - start > 18) None
      else Some(new String(p, start, i - start, "US-ASCII").toLong)
    }
    for (w <- nextInt(); h <- nextInt(); maxval <- nextInt()
         if w > 0 && h > 0 && maxval >= 1 && maxval <= 65535)
      yield (w, h, p(1) == '6', if (maxval > 255) 2 else 1, i + 1)
  }

  private def decodeNetpbm(p: Array[Byte]): Option[(Long, Long, String, Long)] =
    parseNetpbm(p).map { case (w, h, isP6, _, _) =>
      (w, h, if (isP6) "ppm" else "pgm", 1L)
    }

  private def leU16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
  private def leU32(p: Array[Byte], off: Int): Long =
    (leU16(p, off).toLong) | (leU16(p, off + 2).toLong << 16)

  /** BMP with the 40-byte BITMAPINFOHEADER: "BM" magic; signed little-endian
    * width/height at byte 18/22 (negative height = top-down rows).
    * Returns (w, h, dataOff, rowStride) — pixel offset is the u32 at byte
    * 10, rows are stored 4-byte-aligned. A pixel offset pointing outside
    * the payload is corrupt and rejects the whole header: `.toInt` on a
    * u32 like 0x80000000 would wrap negative and index the array out of
    * bounds downstream. rowStride stays Long — u31 width × u16 bpp
    * overflows Int. */
  private def parseBmp(p: Array[Byte]): Option[(Long, Long, Int, Long)] = {
    if (p.length < 30 || p(0) != 'B' || p(1) != 'M') return None
    // the DIB header-size field distinguishes layouts: only INFOHEADER and
    // its V2-V5 extensions keep i32 dims at 18/22 (the 12-byte CORE header
    // stores u16 dims at 18/20 — parsing it here would yield garbage)
    val dib = leU32(p, 14)
    if (!Set(40L, 52L, 56L, 108L, 124L).contains(dib)) return None
    val w = leU32(p, 18).toInt // i32: BMP dims are signed
    // abs(Int.MinValue) stays negative, so reject non-positive (not just 0)
    val h = math.abs(leU32(p, 22).toInt)
    if (w <= 0 || h <= 0) return None
    val dataOff = leU32(p, 10) // u32: unvalidated field from the wire
    if (dataOff > p.length.toLong) return None
    val bpp = leU16(p, 28)
    val stride = (w.toLong * bpp + 31) / 32 * 4
    Some((w.toLong, h.toLong, dataOff.toInt, stride))
  }

  private def decodeBmp(p: Array[Byte]): Option[(Long, Long, String, Long)] =
    parseBmp(p).map { case (w, h, _, _) => (w, h, "bmp", 1L) }

  /** RIFF/WAVE: walk the chunk list for `fmt ` (block align = bytes per PCM
    * frame) and `data` (payload byte count); frames = dataSize / blockAlign.
    * Chunks are word-aligned (odd sizes padded by one byte). */
  private def parseWav(p: Array[Byte]): Option[(Long, Long, Int)] = {
    if (p.length < 12) return None
    def tag(off: Int): String = new String(p, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var blockAlign = 0L
    var dataSize = -1L
    var dataOff = -1
    while (i + 8 <= p.length && (blockAlign == 0 || dataSize < 0)) {
      val id = tag(i)
      val size = leU32(p, i + 4)
      if (id == "fmt " && i + 8 + 14 <= p.length)
        blockAlign = leU16(p, i + 8 + 12).toLong
      // accept the data size only when the declared bytes actually fit —
      // a corrupt size must not flow into the frame count
      if (id == "data" && size <= p.length.toLong - i - 8) {
        dataSize = size
        dataOff = i + 8
      }
      // a corrupt size field must terminate the walk, not loop or go back
      if (size > p.length) i = p.length
      else i += 8 + size.toInt + (size.toInt & 1)
    }
    if (blockAlign <= 0 || dataSize < 0) None
    else Some((blockAlign, dataSize, dataOff))
  }

  private def decodeWav(p: Array[Byte]): Option[(Long, Long, String, Long)] =
    parseWav(p).map { case (blockAlign, dataSize, _) =>
      (0L, 0L, "wav", dataSize / blockAlign)
    }

  def sha256Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  /** Executor-side batch decode: binary DataFrame → typed metadata Dataset.
    * `mapPartitions` keeps the codec call amortized over a whole partition
    * (codec init once per partition, not per row) — the batch shape a real
    * decoder needs. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec handles, buffers)
      it.map(decodeHeader)
    }
  }

  /** Content frame layout of a payload: (data offset, bytes per frame,
    * frame count). A "frame" is one stored pixel row for images — netpbm
    * row = w·channels·bytesPerSample bytes starting one whitespace past the
    * maxval token; BMP row = the 4-byte-aligned stride starting at the u32
    * pixel offset, in storage (bottom-up) order — and one PCM frame
    * (blockAlign bytes at the data-chunk payload) for WAV. Unknown formats
    * have no frames.
    *
    * Adversarial-input contract: the header's declared frame count is
    * clamped to what the payload can physically hold — a 30-byte BMP
    * declaring 2^31−1 rows yields at most one (clipped) frame, never a
    * multi-billion-iteration loop; a data offset outside the payload (or a
    * frame size that can't fit a single byte of content) yields no frames
    * at all. */
  def frameLayout(p: Array[Byte]): Option[(Int, Long, Long)] =
    try {
      parseNetpbm(p).map { case (w, h, isP6, bps, off) =>
        (off, w * (if (isP6) 3L else 1L) * bps, h)
      }.orElse(parseBmp(p).map { case (_, h, off, stride) =>
        (off, stride, h)
      }).orElse(parseWav(p).map { case (blockAlign, dataSize, off) =>
        (off, blockAlign, dataSize / blockAlign)
      }).flatMap { case (dataOff, frameBytes, declared) =>
        if (dataOff < 0 || dataOff > p.length || frameBytes <= 0) None
        else {
          val avail = (p.length - dataOff).toLong
          val maxFrames = (avail + frameBytes - 1) / frameBytes // ceil
          val n = math.min(declared, maxFrames)
          if (n <= 0) None else Some((dataOff, frameBytes, n))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real frame sampler: decode the container layout executor-side, then
    * extract every `stride`-th content frame (pixel row / PCM frame) and
    * its byte statistics — (media_id, frame_no, frame_bytes, byte_sum)
    * where byte_sum is the exact unsigned sum of the frame's bytes.
    * Frames that overrun a truncated payload are clipped; unknown payloads
    * emit nothing (poison rows must not kill the stage). Pure per-row
    * generate — zero shuffle, schema-stable, same `flatMap` batch shape a
    * codec-backed sampler would use. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      // same poison-row contract as decodeHeader: any sampling bug on
      // adversarial bytes degrades to zero frames, never a dead stage
      try {
        val p = r.payload
        frameLayout(p).toSeq.flatMap { case (dataOff, frameBytes, nFrames) =>
          (0L until nFrames).by(stride.toLong).flatMap { frameNo =>
            val start = dataOff + frameNo * frameBytes
            val end = math.min(start + frameBytes, p.length.toLong)
            if (start >= end) None
            else {
              var sum = 0L
              var i = start.toInt
              while (i < end.toInt) { sum += (p(i) & 0xFF); i += 1 }
              Some((r.media_id, frameNo, end - start, sum))
            }
          }
        }
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    }.toDF("media_id", "frame_no", "frame_bytes", "byte_sum")
  }

  /** Build a MediaRecord dataset from the documents table, using the UTF-8
    * bytes of `text` as a stand-in payload (the container has no media
    * files). The column is a true BinaryType — the schema a real pipeline
    * would carry. */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  // --- Deterministic synthetic media (test/oracle fixtures) ---------------

  /** A complete, VALID media file whose kind and dimensions derive from
    * (`n`, `mediaId`) — so a SQL oracle can predict the decoded metadata
    * analytically while the decoder genuinely parses the bytes:
    * n%3==0 → P6 PPM (w=n%16+1, h=n%9+1), ==1 → 24-bit BMP (same dims),
    * ==2 → mono 16-bit PCM WAV with n%50+1 frames. Pixel/sample bytes are
    * a deterministic function of `mediaId`. */
  def syntheticPayload(mediaId: Long, n: Int): Array[Byte] = {
    val w = n % 16 + 1
    val h = n % 9 + 1
    val f = n % 50 + 1
    def fill(len: Int): Array[Byte] =
      Array.tabulate(len)(i => ((mediaId + i) % 256).toByte)
    (n % 3: @unchecked) match {
      case 0 =>
        val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
        header ++ fill(w * h * 3)
      case 1 =>
        val rowSize = (w * 3 + 3) / 4 * 4
        val imageSize = rowSize * h
        val b = java.nio.ByteBuffer.allocate(54 + imageSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte)
          .putInt(54 + imageSize).putInt(0).putInt(54) // file size, rsvd, offset
          .putInt(40).putInt(w).putInt(h)              // info header, dims
          .putShort(1).putShort(24).putInt(0)          // planes, bpp, no compression
          .putInt(imageSize).putInt(0).putInt(0).putInt(0).putInt(0)
        b.put(fill(imageSize))
        b.array()
      case 2 =>
        val dataSize = 2 * f // mono 16-bit
        val b = java.nio.ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1).putInt(8000).putInt(16000) // PCM, mono, rate
          .putShort(2).putShort(16)                           // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(dataSize)
        b.put(fill(dataSize))
        b.array()
    }
  }

  /** The documents table as a corpus of real (synthetic) media files: each
    * doc becomes a valid PPM/BMP/WAV whose shape is determined by its text
    * length. Payload synthesis runs executor-side in the same typed map
    * that a storage fetch would. */
  def documentsAsSyntheticMedia(spark: SparkSession,
                                docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        octet_length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) => MediaRecord(id, syntheticPayload(id, n)) }
  }
}
