package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

      Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 4)
      Bucketing.writeBucketed(ord, "b_orders", "l_orderkey", 4)

      val joined = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join, got:\n$plan")
      // and it computes the same rows as the shuffle join over raw files
      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
