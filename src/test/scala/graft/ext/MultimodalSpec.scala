package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeMeta: deterministic stub metadata via mapPartitions batch decode") {
    val media = Seq(
      MediaRecord(1L, "hello".getBytes("UTF-8")),
      MediaRecord(2L, Array.fill[Byte](300)(7))
    ).toDS()
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    val m1 = meta(1L)
    assert(m1.n_bytes == 5L)
    assert(m1.width == (5 % 16) * 64 + 64)
    assert(m1.height == (5 % 9) * 64 + 64)
    assert(m1.format == "webp") // 5 % 3 == 2
    assert(m1.n_frames == 1L)
    // openssl-verified sha256("hello")
    assert(m1.sha256 ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(meta(2L).n_frames == 4L)
  }

  test("sampleFrames emits stride-sampled frame rows") {
    val media = Seq(MediaRecord(1L, Array[Byte](10, 20, 30, 40, 50))).toDS()
    val frames = Multimodal.sampleFrames(media, stride = 2).orderBy("frame_no").collect()
    assert(frames.map(_.getLong(2)).toSeq == Seq(10L, 30L, 50L))
  }

  test("documentsAsMedia carries a true binary payload column") {
    val docs = Seq((7L, "abc")).toDF("doc_id", "text")
    val ds = Multimodal.documentsAsMedia(spark, docs)
    assert(ds.schema("payload").dataType.typeName == "binary")
    assert(ds.collect().head.payload.toSeq == "abc".getBytes("UTF-8").toSeq)
  }
}
