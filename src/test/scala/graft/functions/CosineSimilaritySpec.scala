package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1f, 0f, 2f), Array(0f, 1f, 0.5f)),
    (2L, Array(0.3f, -0.7f, 0.1f), Array(0.3f, -0.7f, 0.1f)),
    (3L, Array(1f, 1f, 1f), Array(-1f, -1f, -1f))
  ).toDF("id", "a", "b")

  test("native expression matches the interpreted HOF fold bit-for-bit") {
    val rows = vecs.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null array yields null (nullIntolerant)") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("SQL registration: cosine_sim resolves in spark.sql") {
    GraftFunctions.registerAll(spark)
    vecs.createOrReplaceTempView("cs_vecs")
    val r = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c FROM cs_vecs ORDER BY id").collect()
    assert(math.abs(r(1).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r(2).getDouble(1) + 1.0) < 1e-12)
  }

  test("length mismatch raises") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("mismatch"))
  }
}
