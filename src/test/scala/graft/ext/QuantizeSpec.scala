package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (2L, Array(-2.0f, 1.0f, 0.1f, 0.9f))
  ).toDF("vec_id", "embedding")

  test("quantized values are within int8 range and extremes hit ±127") {
    val rows = vecs.select(col("vec_id"),
      Similarity.quantizeInt8(col("embedding")).as("q")).collect()
    rows.foreach { r =>
      val q = r.getSeq[Int](1)
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(q.exists(v => math.abs(v) == 127)) // the max-abs element
    }
  }

  test("dequantize round-trip error is bounded by half a quantization step") {
    val out = vecs.select(col("embedding"),
      Similarity.dequantize(
        Similarity.quantizeInt8(col("embedding")),
        Similarity.maxAbs(col("embedding"))).as("back"),
      Similarity.maxAbs(col("embedding")).as("ma")).collect()
    out.foreach { r =>
      val orig = r.getSeq[Float](0)
      val back = r.getSeq[Double](1)
      val step = r.getDouble(2) / 127.0
      orig.zip(back).foreach { case (o, b) =>
        assert(math.abs(o - b) <= step / 2 + 1e-9)
      }
    }
  }

  test("rmse is small relative to vector magnitude") {
    val rmse = vecs.select(Similarity.quantizationRmse(col("embedding")))
      .collect().map(_.getDouble(0))
    assert(rmse.forall(e => e >= 0.0 && e < 0.01))
  }
}
