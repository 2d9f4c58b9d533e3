package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.plans.PlanGuard

/** Core relational operator surface (SURVEY.md §2.3-§2.9): scans,
  * projections/filters, joins, aggregations, windows, sorts/limits, set ops,
  * scalar functions. Each query has a matching DuckDB oracle in
  * [[CoreQueries.oracle]] with identical column aliases (driver compares by
  * sorted column name).
  *
  * Scale notes (100 TB stance): every query here is a declarative
  * DataFrame plan — filters/projections reach the parquet scan via Catalyst
  * pushdown, small dimensions (region/nation/supplier) are broadcast
  * explicitly, aggregations use map-side partial aggregation natively, and
  * top-k compiles to TakeOrderedAndProject (no global sort). Nothing is
  * collected to the driver.
  *
  * Float parity: final double aggregates are wrapped in `round(x, n)` in both
  * the Spark plan and the oracle SQL — cross-engine double sums differ in the
  * last ulp otherwise. Ordered-window running sums are order-deterministic but
  * rounded anyway.
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
    }),

    // --- Joins (SURVEY §2.4) --------------------------------------------
    // Fact-fact join shuffles on the key; the 25-row nation dim is broadcast
    // — plan-guarded in-query, so losing the broadcast (hint dropped, AQE
    // demotion) fails CORRECTNESS, not just the offline explain audit.
    "q3_join_agg" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val nat = t(s, dir, "nation")
      PlanGuard.requireInPlan(
        cust
          .join(ord, cust("c_custkey") === ord("o_custkey"))
          .join(li, ord("o_orderkey") === li("l_orderkey"))
          .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items")),
        "BroadcastHashJoin", "the 25-row nation dim must broadcast")
    }),

    // TPC-H Q3 shape: selective filters pushed to both scans, then top-k.
    "q4_join_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // --- Sorts / top-k (SURVEY §2.7): plans as TakeOrderedAndProject
    // (per-partition heaps + driver merge), guarded in-query against
    // regressing to a global range-partitioned sort.
    "q5_topk" -> ((s, dir) => {
      PlanGuard.requireNotInPlan(
        PlanGuard.requireInPlan(
          t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
            .limit(10),
          "TakeOrderedAndProject", "top-k must plan as per-partition heaps"),
        "Exchange rangepartitioning", "top-k must not global-sort")
    }),

    // --- Windows (SURVEY §2.6): deterministic latest-row-per-key --------
    "q6_window_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey"),
          col("o_orderkey").as("latest_orderkey"),
          col("o_totalprice").as("latest_totalprice"))
    }),

    "q7_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("running_value",
          round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("running_value"),
          col("prev_type"), col("next_type"))
    }),

    // --- Semi/anti joins (SURVEY §2.4 [N]) ------------------------------
    "q8_semi_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    "q9_anti_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // --- Set operations (SURVEY §2.8) -----------------------------------
    "q10_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_name").as("name"), lit("customer").as("kind"))
      val sup = t(s, dir, "supplier")
        .select(col("s_name").as("name"), lit("supplier").as("kind"))
      c.unionByName(sup)
    }),

    "q11_intersect" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    }),

    "q12_except" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
          .select(col("o_custkey").as("custkey")))
    }),

    // --- Grouping sets (SURVEY §2.5 [N]) --------------------------------
    "q13_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
    }),

    "q14_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))
    }),

    // --- HAVING / post-aggregation filter -------------------------------
    "q15_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .filter(col("n_orders") >= 3)
    }),

    // --- Scalar functions: strings (SURVEY §2.9) ------------------------
    "q16_string_funcs" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_name").like("%19%"))
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          lower(col("c_mktsegment")).as("seg_lower"),
          substring(col("c_name"), 1, 8).as("name_pre"),
          length(col("c_name")).cast("long").as("name_len"),
          concat(col("c_name"), lit("#"), col("c_mktsegment")).as("tagged"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
          trim(lit("  pad  ")).as("trimmed"),
          base64(col("c_mktsegment").cast("binary")).as("seg_b64"),
          format_string("cust_%d", col("c_custkey")).as("cust_tag"))
    }),

    // --- Scalar functions: dates ----------------------------------------
    "q17_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAY"), "yyyy-MM-dd").as("plus30"),
          datediff(lit("2001-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_2001"))
    }),

    // --- CASE WHEN / null handling --------------------------------------
    "q18_case_when" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 400000.0, "big")
            .when(col("o_totalprice") > 200000.0, "med")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_norm"))
    }),

    // --- JSON extraction (SURVEY §2.9 F7, events.props) -----------------
    "q19_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
    }),

    // --- Distinct aggregates (exact; HLL variant in LlmQueries) ---------
    "q20_count_distinct" -> ((s, dir) => {
      t(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("n"))
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
        |WHERE l_discount >= 0.05 AND l_quantity < 25.0""".stripMargin,
    "q3_join_agg" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q4_join_topk" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q6_window_latest" ->
      """SELECT o_custkey,
        |  o_orderkey AS latest_orderkey,
        |  o_totalprice AS latest_totalprice
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q7_window_running" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events""".stripMargin,
    "q8_semi_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q9_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q10_union" ->
      """SELECT c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS kind FROM supplier""".stripMargin,
    "q11_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q12_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS total, count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q15_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 3""".stripMargin,
    "q16_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  lower(c_mktsegment) AS seg_lower,
        |  substring(c_name, 1, 8) AS name_pre,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat(c_name, '#', c_mktsegment) AS tagged,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
        |  trim('  pad  ') AS trimmed,
        |  base64(encode(c_mktsegment)) AS seg_b64,
        |  printf('cust_%d', c_custkey) AS cust_tag
        |FROM customer
        |WHERE c_name LIKE '%19%'""".stripMargin,
    "q17_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS BIGINT) AS days_to_2001
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'""".stripMargin,
    "q18_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 400000.0 THEN 'big'
        |       WHEN o_totalprice > 200000.0 THEN 'med'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm
        |FROM orders""".stripMargin,
    "q19_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""".stripMargin,
    "q20_count_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  count(*) AS n
        |FROM orders""".stripMargin
  )
}
