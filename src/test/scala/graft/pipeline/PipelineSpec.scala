package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.model.TableRef
import graft.sinks.Sinks

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeBronze(root: String, domain: String, table: String,
      runDate: String, jsonl: String): Unit = {
    val dir = Paths.get(Pipeline.bronzeRef(domain, table).path(root, runDate))
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("data.jsonl"), jsonl)
  }

  test("end-to-end bronze -> silver -> gold with domain routing") {
    val root = tmpDir("lake")
    val runDate = "2026-01-05"
    writeBronze(root, "superoperator", "customers", runDate,
      """{"id": 1, "name": "Ada", "email": "ada@x.com", "created_at": "2026-01-03T10:00:00Z", "updated_at": "2026-01-05T09:30:00Z"}
        |{"id": 1, "name": "Ada-dup", "email": "d@x.com", "created_at": "2026-01-03T10:00:00Z", "updated_at": "2026-01-05T09:30:00Z"}
        |{"id": 2, "name": "Bob", "email": null, "created_at": "nope", "updated_at": null}
        |""".stripMargin)
    writeBronze(root, "superoperator", "payments", runDate,
      """{"payment_id": 77, "customer_id": 1, "amount": "19.99", "created_at": "2026-01-05T11:00:00Z", "paid_at": "2026-01-05T11:00:04Z"}
        |{"payment_id": 78, "customer_id": 2, "amount": "5.00", "created_at": "2026-01-05T12:00:00Z", "paid_at": null}
        |""".stripMargin)

    val gold = Pipeline.transformStage(spark, Pipeline.LakeConfig(root, runDate))

    // silver written, deduped, audit-stamped
    val silver = spark.read.parquet(
      Pipeline.silverRef("superoperator", "customers").path(root, runDate))
    assert(silver.count() == 2)
    assert(silver.columns.contains("etl_loaded_at"))

    // gold dim: no audit col; routed to core domain
    val dimPath = Pipeline.goldRef("dim_customers").path(root, runDate)
    assert(dimPath.contains("/gold/core/"))
    val dim = spark.read.parquet(dimPath)
    assert(!dim.columns.contains("etl_loaded_at"))
    assert(dim.count() == 2)

    // gold fact: routed to finance; amount typed double
    val factPath = Pipeline.goldRef("fact_payments").path(root, runDate)
    assert(factPath.contains("/gold/finance/"))
    val fact = spark.read.parquet(factPath)
    assert(fact.schema("amount").dataType.typeName == "double")
    assert(fact.count() == 2)
    assert(gold.keySet == Set("dim_customers", "fact_payments"))
  }

  test("re-running the same run_date is idempotent (partition overwrite)") {
    val root = tmpDir("lake2")
    val runDate = "2026-01-06"
    writeBronze(root, "superoperator", "customers", runDate,
      """{"id": 1, "name": "Ada"}
        |""".stripMargin)
    writeBronze(root, "superoperator", "payments", runDate,
      """{"payment_id": 1, "amount": "1.0"}
        |""".stripMargin)
    Pipeline.transformStage(spark, Pipeline.LakeConfig(root, runDate))
    Pipeline.transformStage(spark, Pipeline.LakeConfig(root, runDate))
    val silver = spark.read.parquet(
      Pipeline.silverRef("superoperator", "customers").path(root, runDate))
    assert(silver.count() == 1)
  }

  test("dynamic partition overwrite touches only the written run_date") {
    val root = tmpDir("lake3")
    val ref = TableRef("silver", "d", "t")
    val d1 = Seq((1L, "2026-01-01"), (2L, "2026-01-02")).toDF("id", "run_date")
    Sinks.writePartitionedByRunDate(d1, root, ref)
    // overwrite only 2026-01-02
    val d2 = Seq((99L, "2026-01-02")).toDF("id", "run_date")
    Sinks.writePartitionedByRunDate(d2, root, ref)
    val back = Sinks.readLakeTable(spark, root, ref)
    val ids = back.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 99L), s"got $ids")
  }
}
