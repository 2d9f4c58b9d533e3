package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.model.TableRef
import graft.ops.Cleaning
import graft.sinks.Sinks
import graft.sources.Json

/** Medallion transform orchestration — the engine form of the reference's
  * `run_transform.py:95-122`: bronze JSONL → silver clean → parquet, then
  * gold star-schema derivation with `dim_`-prefix domain routing
  * (reference `run_transform.py:118-120`: `dim_*` → core, else finance).
  *
  * Fix over the reference: gold is derived from the silver *lineage*, which
  * re-runs the whole clean once per write (SURVEY §3.1 step 6). We persist
  * silver before the first write so each clean executes once.
  */
object Pipeline {

  final case class LakeConfig(root: String, runDate: String)

  def bronzeRef(domain: String, table: String): TableRef = TableRef("bronze", domain, table)
  def silverRef(domain: String, table: String): TableRef = TableRef("silver", domain, table)

  /** Gold domain routing (reference `run_transform.py:118-120`). */
  def goldRef(table: String): TableRef =
    TableRef("gold", if (table.startsWith("dim_")) "core" else "finance", table)

  /** One silver table: read bronze JSONL, clean, write, return the
    * (persisted) silver frame for gold derivation. */
  def toSilver(
      spark: SparkSession,
      cfg: LakeConfig,
      domain: String,
      table: String,
      clean: DataFrame => DataFrame): DataFrame = {
    val bronze = Json.readJsonl(spark, bronzeRef(domain, table).path(cfg.root, cfg.runDate))
    val silver = clean(bronze).persist(StorageLevel.MEMORY_AND_DISK)
    Sinks.writeParquetPartition(silver, cfg.root, silverRef(domain, table), cfg.runDate)
    silver
  }

  /** Full transform stage for the reference's two domains
    * (reference `run_transform.py:104-120`). Returns gold frames by name. */
  def transformStage(spark: SparkSession, cfg: LakeConfig): Map[String, DataFrame] = {
    val customersSilver =
      toSilver(spark, cfg, "superoperator", "customers", Cleaning.cleanCustomers)
    val paymentsSilver =
      toSilver(spark, cfg, "superoperator", "payments", Cleaning.cleanPayments)

    val gold = Map(
      "dim_customers" -> Cleaning.goldDim(customersSilver),
      "fact_payments" -> Cleaning.goldFact(paymentsSilver))

    gold.foreach { case (table, df) =>
      Sinks.writeParquetPartition(df, cfg.root, goldRef(table), cfg.runDate)
    }
    Seq(customersSilver, paymentsSilver).foreach(_.unpersist())
    gold
  }
}
