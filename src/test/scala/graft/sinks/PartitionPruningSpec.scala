package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.TableRef

class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("run_date-partitioned lake reads prune to the filtered partition") {
    val root = tmpDir("lake")
    val ref = TableRef("silver", "core", "events_p")
    val df = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"),
      (3L, "2024-01-02"), (4L, "2024-01-03")
    ).toDF("id", "run_date")
    Sinks.writePartitionedByRunDate(df, root, ref)

    val read = Sinks.readLakeTable(spark, root, ref)
      .filter(col("run_date") === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    // the partition filter must hit the scan (pruning), not a post-scan Filter
    assert(plan.contains("PartitionFilters") && plan.contains("run_date"),
      s"expected partition filters in scan:\n$plan")
    assert(read.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // and the files actually read: exactly the one partition directory
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("2024-01-01"))
  }
}
