package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

/** Parity of the native one-loop [[QuantizeStats]] expression against the
  * interpreted HOF reference forms — bit-for-bit on real embeddings, plus the
  * edge cases the data doesn't contain (all-zero vector, negative ties,
  * empty array, nulls). */
class QuantizeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def real = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native matches HOF forms bit-for-bit on real embeddings") {
    val qv = Similarity.quantizeInt8(col("embedding"))
    val rows = real.select(
      Similarity.quantizeStats(col("embedding")).as("qs"),
      Similarity.maxAbs(col("embedding")).as("h_maxabs"),
      array_min(qv).as("h_qmin"),
      array_max(qv).as("h_qmax"),
      Similarity.quantizationRmse(col("embedding")).as("h_rmse")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qs = r.getStruct(0)
      assert(qs.getDouble(0) == r.getDouble(1), "maxabs")
      assert(qs.getInt(1) == r.getInt(2), "qmin")
      assert(qs.getInt(2) == r.getInt(3), "qmax")
      assert(qs.getDouble(3) == r.getDouble(4), "rmse")
    }
  }

  test("all-zero vector quantizes to zeros with rmse 0 (no NaN under ANSI)") {
    val df = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val qs = df.select(Similarity.quantizeStats(col("embedding"))).collect().head.getStruct(0)
    assert(qs.getDouble(0) == 0.0 && qs.getInt(1) == 0 && qs.getInt(2) == 0 &&
      qs.getDouble(3) == 0.0)
    // HOF guard agrees
    val hof = df.select(
      Similarity.quantizeInt8(col("embedding")).as("q"),
      Similarity.quantizationRmse(col("embedding")).as("r")).collect().head
    assert(hof.getSeq[Int](0).forall(_ == 0) && hof.getDouble(1) == 0.0)
  }

  test("negative half-ties round HALF_UP (away from zero), matching Spark round") {
    // v*scale = -63.5 for the middle element: HALF_UP gives -64, Math.round
    // would give -63.
    val df = Seq((1L, Array(-1.0f, -0.5f, 0.25f))).toDF("vec_id", "embedding")
    val r = df.select(
      Similarity.quantizeStats(col("embedding")).as("qs"),
      Similarity.quantizeInt8(col("embedding")).as("hof")).collect().head
    val hof = r.getSeq[Int](1)
    assert(r.getStruct(0).getInt(1) == hof.min)
    assert(r.getStruct(0).getInt(2) == hof.max)
    assert(hof.min == -127)
  }

  test("empty array yields null; null yields null") {
    val df = Seq((1L, Some(Array.empty[Float])), (2L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val rows = df.select(Similarity.quantizeStats(col("embedding"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("SQL registration: quantize_stats resolves in spark.sql") {
    GraftFunctions.registerAll(spark)
    real.limit(5).createOrReplaceTempView("qs_emb")
    // the max-abs element quantizes to ±127 — which extreme depends on sign
    val r = spark.sql(
      "SELECT quantize_stats(embedding).qmin AS qmin, quantize_stats(embedding).qmax AS qmax FROM qs_emb").collect()
    assert(r.forall(x => x.getInt(0) == -127 || x.getInt(1) == 127))
  }
}
