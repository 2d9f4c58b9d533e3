package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Core relational operator surface (SURVEY.md §2.3-§2.9): scans,
  * projections/filters, joins, aggregations, windows, sorts/limits, set ops,
  * scalar functions. Each query has a matching DuckDB oracle in
  * [[CoreQueries.oracle]] with identical column aliases (driver compares by
  * sorted column name).
  *
  * Scale notes (100 TB stance): every query here is a declarative
  * DataFrame plan — filters/projections reach the parquet scan via Catalyst
  * pushdown, small dimensions (region/nation/supplier) are broadcast
  * explicitly, and aggregations use partial (map-side) aggregation natively.
  * Nothing is collected to the driver.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Aggregations (SURVEY §2.5) -------------------------------------
    // TPC-H Q1 shape: the flagship pricing-summary aggregate on lineitem.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // --- Filter/projection pushdown (SURVEY §2.3) -----------------------
    "q2_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.05 && col("l_quantity") < 25.0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_quantity < 25.0""".stripMargin
  )
}
