package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media payload: opaque bytes + id. In a real pipeline the payload is an
  * image/audio/video blob read from object storage. */
final case class MediaRecord(media_id: Long, payload: Array[Byte])

/** Typed metadata produced by the decode stage. */
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
  * The decode itself is a STUB — no image/audio codecs exist in this
  * container — but it is a *deterministic* function of the bytes, so the
  * Spark-side plumbing that matters at 100 TB is real and testable:
  * binary column in parquet → `mapPartitions` batch decode on executors
  * (the Scala analogue of `mapInPandas`: one iterator per partition, no
  * per-row task overhead, no driver materialization) → typed `Dataset`
  * with an explicit schema.
  */
object Multimodal {

  /** STUB decoder standing in for a real codec (e.g. JPEG dimensions from the
    * SOF marker, video frame count from the container index). Deterministic
    * arithmetic on the payload so tests and oracles can reproduce it. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val n = r.payload.length.toLong
    MediaMeta(
      media_id = r.media_id,
      n_bytes = n,
      width = (n % 16) * 64 + 64,
      height = (n % 9) * 64 + 64,
      format = (n % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "webp"
      },
      n_frames = n / 100 + 1,
      sha256 = sha256Hex(r.payload))
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
      it.map(decodeStub)
    }
  }

  /** Frame-sampling stub: every `stride`-th byte of the payload stands in for
    * a sampled frame; emits (media_id, frame_no, frame byte). Shows the
    * explode-shaped output schema of a real frame sampler. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.indices.by(stride).zipWithIndex.map { case (off, frameNo) =>
        (r.media_id, frameNo.toLong, r.payload(off).toLong & 0xFF)
      }
    }.toDF("media_id", "frame_no", "frame_byte")
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
}
