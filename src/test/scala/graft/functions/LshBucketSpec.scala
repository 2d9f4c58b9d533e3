package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

/** Parity of the native [[LshBucket]] expression against the interpreted
  * HOF fold it replaced — bucket ids must be identical (same plane family,
  * same bit order, same summation order). */
class LshBucketSpec extends SparkSpec {
  import spark.implicits._

  private def real = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native bucket ids equal the HOF reference on real embeddings") {
    val rows = real.select(
      Similarity.lshBucket(col("embedding"), nPlanes = 4).as("native"),
      Similarity.lshBucketHof(col("embedding"), nPlanes = 4).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("bucket ids cover [0, 2^nPlanes) and use multiple buckets") {
    val buckets = real
      .select(Similarity.lshBucket(col("embedding"), nPlanes = 4).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(buckets.forall(b => b >= 0 && b < 16))
    assert(buckets.size > 1, "all vectors hashed to one bucket")
  }

  test("null vector yields null; length mismatch raises") {
    val df = Seq(Option.empty[Array[Float]]).toDF("embedding")
    assert(df.select(Similarity.lshBucket(col("embedding"), 4)).collect().head.isNullAt(0))
    val bad = Seq(Array(1f, 2f)).toDF("embedding")
    val e = intercept[Exception] {
      bad.select(Similarity.lshBucket(col("embedding"), 4, dims = 64)).collect()
    }
    assert(e.getMessage.contains("dims") ||
      (e.getCause != null && e.getCause.getMessage.contains("dims")))
  }

  test("banded buckets from sliced planes differ across bands") {
    val planes = LshBucket.planeMatrix(4, 64)
    val df = real.limit(20).select(
      GraftFunctions.lshBucketWithPlanes(col("embedding"), planes.slice(0, 2)).as("b0"),
      GraftFunctions.lshBucketWithPlanes(col("embedding"), planes.slice(2, 4)).as("b1"))
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
    assert(rows.exists(r => r.getInt(0) != r.getInt(1)))
  }
}
