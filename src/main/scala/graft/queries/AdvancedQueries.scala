package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.plans.MatView

/** Typed row for the Dataset[T] query path (q48). */
final case class LineitemSlim(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** Advanced relational shapes beyond the core surface: scalar-subquery
  * aggregation, outer-join histograms, pivot, exact percentiles, range
  * joins, and ranking-window breadth. Each has a DuckDB oracle.
  *
  * Scale notes: the scalar subquery is expressed as an aggregate + re-join
  * (what Catalyst rewrites correlated subqueries to anyway); the range join
  * is keyed on user_id so the time-range comparison only runs within a
  * key's partition, never as a global cross product.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Correlated EXISTS + NOT EXISTS through the SQL surface: Catalyst must
    // decorrelate both into semi/anti joins (plan has no per-row subquery
    // execution — the scale difference between O(n) joins and O(n·m) loops).
    "q84_correlated_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v84")
      t(s, dir, "orders").createOrReplaceTempView("orders_v84")
      s.sql(
        """SELECT c.c_custkey, c.c_name
          |FROM customer_v84 c
          |WHERE EXISTS (SELECT 1 FROM orders_v84 o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 300000)
          |  AND NOT EXISTS (SELECT 1 FROM orders_v84 o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderstatus = 'F')""".stripMargin)
    }),

    // TPC-H Q21 shape: DOUBLE-correlated EXISTS + NOT EXISTS against the
    // same fact table ("this supplier's line was returned on a finished
    // multi-supplier order, and no OTHER supplier's line on it was").
    // Catalyst must decorrelate both subqueries into hash-partitioned
    // LeftSemi/LeftAnti joins on the equi-key, carrying the <> predicate as
    // a join-condition filter — NEVER a BroadcastNestedLoopJoin, which is
    // the O(n·m) scale-killer this query plan-guards against.
    "q99_double_correlated" -> ((s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier_v99")
      t(s, dir, "orders").createOrReplaceTempView("orders_v99")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v99")
      val df = s.sql(
        """SELECT s.s_name, count(*) AS numwait
          |FROM supplier_v99 s
          |JOIN lineitem_v99 l1 ON s.s_suppkey = l1.l_suppkey
          |JOIN orders_v99 o ON o.o_orderkey = l1.l_orderkey
          |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem_v99 l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem_v99 l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s_name ASC
          |LIMIT 20""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("LeftSemi"),
        s"EXISTS did not decorrelate to a semi join:\n$plan")
      require(plan.contains("LeftAnti"),
        s"NOT EXISTS did not decorrelate to an anti join:\n$plan")
      require(!plan.contains("BroadcastNestedLoop"),
        s"nested-loop join in the Q21 plan — O(n*m) at scale:\n$plan")
      df
    }),

    // Schema evolution at the union: the v2 frame added columns; v1 rows
    // must surface with NULLs for them (unionByName + allowMissingColumns —
    // the lake-native answer to appended-schema files).
    "q85_union_evolved" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val v1 = cust.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
      val v2 = cust.filter(col("c_custkey") % 2 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit("v2").as("schema_ver"))
      v1.unionByName(v2, allowMissingColumns = true)
    }),

    // TPC-H Q17 shape: rows below half their group's average.
    // l_quantity is integral, so group sums are exact in double and the
    // strict `<` compares identically across engines.
    "q37_scalar_subquery" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val halfAvg = li.groupBy(col("l_partkey").as("ap"))
        .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
      li.join(halfAvg, col("l_partkey") === col("ap"))
        .filter(col("l_quantity") < col("half_avg"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q13 shape: orders-per-customer histogram including zero-order
    // customers (left outer join + two-level aggregation).
    "q38_outer_histogram" -> ((s, dir) => {
      val ord = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      t(s, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Pivot: order totals by priority × status (fixed value list so the
    // output schema is static — required for both oracle and sinks).
    "q39_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
        .select(col("o_orderpriority"), col("O").as("status_o"),
          col("F").as("status_f"), col("P").as("status_p"))
    }),

    // Exact percentiles (not approx): median and p90 account balance per
    // market segment. Spark `percentile` and DuckDB `quantile_cont` both
    // use linear interpolation.
    "q40_percentile" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          round(expr("percentile(c_acctbal, 0.5)"), 4).as("p50"),
          round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
    }),

    // Range join: per purchase event, how many same-user events follow
    // within 5 minutes. Keyed on user_id — the range predicate evaluates
    // only within a user's partition.
    "q41_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      e.as("a").filter(col("a.event_type") === "purchase")
        .join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.ts") > col("a.ts") &&
            col("b.ts") <= col("a.ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("a.event_id").as("event_id"))
        .agg(count(lit(1)).as("n_next_5m"))
    }),

    // TPC-H Q19 shape: disjunction of conjunctive predicates with IN lists —
    // Catalyst must push the common l_partkey join key through the OR and
    // keep the residual as a join filter.
    "q46_disjunctive_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Typed Dataset[T] path: case-class Encoder, typed groupByKey with
    // TypedColumn aggregates (still codegen'd, map-side partial). The typed
    // filter lambda is opaque to Catalyst (no pushdown) — the column-API
    // queries are the scale path; this covers the type-safe surface.
    "q48_typed_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .as[LineitemSlim]
        .filter((l: LineitemSlim) => l.l_quantity < 25.0)
        .groupByKey(_.l_returnflag)
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty").as[Double],
          count(lit(1)).as("n").as[Long])
        .toDF("l_returnflag", "sum_qty", "n")
    }),

    // SQL entry path: the same engine drives plain SQL over registered
    // views — arbitrary GROUPING SETS (beyond rollup/cube) with grouping()
    // null-vs-group disambiguation.
    "q47_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          |  round(sum(o_totalprice), 2) AS total, count(*) AS n
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    }),

    // Statistical aggregates: correlation, sample stddev/variance,
    // covariance, and argmin/argmax (min_by/max_by on a UNIQUE ordering
    // expression — ties would be nondeterministic in both engines).
    "q43_stats_aggs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"),
          min_by(col("l_suppkey"), col("l_orderkey") * 100 + col("l_linenumber")).as("first_supp"),
          max_by(col("l_suppkey"), col("l_orderkey") * 100 + col("l_linenumber")).as("last_supp"))
    }),

    // Ranking-window breadth: ntile / percent_rank / first & last value
    // frames, deterministic under the (value, key) tiebreak ordering.
    "q42_ranking_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          first(col("c_custkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("richest_custkey"))
    }),

    // TIME-SERIES RESAMPLE + FORWARD FILL (q148): per-user daily activity
    // on a complete calendar grid, gaps carried forward — the shape every
    // metrics/feature pipeline needs before a model can consume irregular
    // events. Grid = per-user `sequence(lo, hi)` explode (shuffle-free
    // generate, like chunking); fill = `last(_, ignoreNulls)` over an
    // unbounded-preceding row frame — one window, no self-join, no
    // driver loop. Days before a user's first activity stay NULL in both
    // engines.
    "q148_resample_ffill" -> ((s, dir) => {
      val all = t(s, dir, "events")
      val ev = all.filter(col("user_id") < 30)
      val daily = ev
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 2).as("day_value"))
      val bounds = all.agg(to_date(min(col("ts"))).as("lo"),
        to_date(max(col("ts"))).as("hi"))
      val grid = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          last(col("day_value"), ignoreNulls = true).over(w).as("filled"))
    }),

    // FUNNEL ANALYSIS (q149): the ordered-sequence product question —
    // which users did view → click → purchase IN ORDER, completing
    // within 7 days of the first view. Three conditional min-aggregations
    // over one scan each stage (no per-user driver loops, no exploding
    // self-joins): first view, first click strictly after it, first
    // purchase strictly after that.
    "q149_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), Seq("user_id"))
        .filter(col("e.ts") > col("view_ts"))
        .groupBy(col("user_id")).agg(min(col("e.ts")).as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), Seq("user_id"))
        .filter(col("e.ts") > col("click_ts"))
        .groupBy(col("user_id")).agg(min(col("e.ts")).as("purchase_ts"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          (col("purchase_ts").isNotNull &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 7 DAYS"))
            .as("completed_7d"))
    }),

    // COHORT RETENTION (q150): users bucketed by first-activity week;
    // for each (cohort week, week offset), how many distinct cohort
    // members were active — the retention matrix. All week arithmetic is
    // integer day-diffs from the global epoch (floor division — exact in
    // both engines); two hash aggregations, one distinct count.
    "q150_cohort_retention" -> ((s, dir) => {
      val all = t(s, dir, "events")
      val lo = all.agg(to_date(min(col("ts"))).as("lo"))
      val days = all.select(col("user_id"), to_date(col("ts")).as("day"))
        .crossJoin(broadcast(lo))
        .select(col("user_id"),
          floor(datediff(col("day"), col("lo")) / 7.0).cast("int").as("week"))
        .distinct()
      val cohort = days.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      days.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // ROLLING TIME-RANGE WINDOW (q151): per-customer 7-day rolling spend
    // — a RANGE frame over event time (`RANGE BETWEEN INTERVAL 6 DAY
    // PRECEDING AND CURRENT ROW`), the frame ROWS windows cannot express
    // when a key has gaps or same-day ties. One window, one shuffle on
    // the customer key; ties on (custkey, date) enter the frame
    // identically in both engines by RANGE semantics.
    "q151_rolling_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("long"))
        .rangeBetween(-6L * 86400L, 0L)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          round(sum(col("o_totalprice")).over(w), 2).as("rolling_7d"),
          count(lit(1)).over(w).as("n_orders_7d"))
    }),

    // NESTED DOCUMENT MODELING (q152): lineitems collected into a sorted
    // array-of-structs under their order (the document shape), written
    // and re-read through parquet (nested IO, struct codegen), then
    // flattened back — the oracle checks the round trip reproduces the
    // flat relation exactly. Collect + explode are both shuffle-once,
    // shuffle-free-generate shapes; `sort_array` pins the intra-document
    // order so the nested form is deterministic.
    "q152_nested_roundtrip" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
      val nested = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice")))).as("lines"))
      val out = QueryTmp.dir("q152")
      nested.write.mode("overwrite").parquet(s"$out/docs")
      s.read.parquet(s"$out/docs")
        .select(col("l_orderkey"), explode(col("lines")).as("ln"))
        .select(col("l_orderkey"),
          col("ln.l_linenumber").as("l_linenumber"),
          col("ln.l_quantity").as("l_quantity"),
          round(col("ln.l_extendedprice"), 2).as("l_extendedprice"))
    }),

    // DYNAMIC PARTITION PRUNING (q154): the fact table is partitioned on
    // the join key; the dimension's selective filter is on a DERIVED
    // column (its leading-digit class), so no static partition filter
    // exists — only Spark's runtime DPP subquery can prune, by executing
    // the broadcast dim side first and injecting the surviving keys as a
    // partition filter. The plan gate requires the `dynamicpruning`
    // expression in the scan — at 100 TB this is reading one partition
    // instead of the fact table. Emits the joined rows.
    "q154_dynamic_partition_pruning" -> ((s, dir) => {
      val root = QueryTmp.dir("q154")
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
      orders.write.mode("overwrite").partitionBy("o_orderpriority")
        .parquet(s"$root/fact")
      val fact = s.read.parquet(s"$root/fact")
      val dim = orders.select(col("o_orderpriority").as("p")).distinct()
        .withColumn("cls", substring(col("p"), 1, 1))
      val q = fact
        .join(dim.filter(col("cls") === "1").hint("broadcast"),
          col("o_orderpriority") === col("p"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
      val plan = q.queryExecution.executedPlan.toString
      val dppOk = plan.contains("dynamicpruning")
      require(dppOk, s"q154 no dynamic partition pruning in the scan:\n$plan")
      q.withColumn("dpp_ok", lit(dppOk))
    }),

    // MATERIALIZED-VIEW QUERY REWRITE (q155): a registered gold summary
    // (per (returnflag, linestatus) partial sums + counts, materialized
    // to parquet) transparently answers a coarser aggregation over the
    // BASE scan via a custom `Rule[LogicalPlan]` — `sum(x) → sum(sum_x)`,
    // `count(*) → sum(cnt)`, grouping subset checked, output attribute
    // ids preserved (graft.plans.MatView). Gates in-query: the rewritten
    // plan scans the SUMMARY path and not the base file; a NEGATIVE
    // CONTROL with a row-level filter must NOT rewrite (the summary
    // cannot replay predicates — semantics must never widen). The oracle
    // recomputes from the raw table, so a wrong rewrite hash-mismatches.
    "q155_matview_rewrite" -> ((s, dir) => {
      val root = QueryTmp.dir("q155")
      val base = s.read.parquet(s"$dir/lineitem.parquet")
      base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$root/summary")
      val d = MatView.SummaryDef(s"$dir/lineitem.parquet",
        s.read.parquet(s"$root/summary"),
        dims = Seq("l_returnflag", "l_linestatus"),
        sums = Map("l_quantity" -> "sum_qty"), cnt = "cnt")
      MatView.withRewrite(s, d) {
        val q = base.groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .select(col("l_returnflag"), round(col("sum_qty"), 2).as("sum_qty"),
            col("n_rows"))
        val plan = q.queryExecution.executedPlan.toString
        val rewrittenOk =
          plan.contains(root) && !plan.contains("lineitem.parquet")
        require(rewrittenOk,
          s"q155 aggregation was not rewritten onto the summary:\n$plan")
        val ctrl = base.filter(col("l_quantity") > 10)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        val guardOk = ctrl.queryExecution.executedPlan.toString
          .contains("lineitem.parquet")
        require(guardOk,
          "q155 rewrite fired through a filter — semantics widened")
        q.withColumn("rewritten_ok", lit(rewrittenOk))
          .withColumn("guard_ok", lit(guardOk))
      }
    }),

    // UNPIVOT (q162): the reshaping inverse of q39's pivot — the wide
    // status columns melt back to (priority, status, total) rows via
    // `stack` (a Generate node: shuffle-free, codegen'd, the same
    // economics as explode). Null cells (status absent for a priority)
    // drop, so pivot∘unpivot round-trips to the sparse grouped relation.
    "q162_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
      wide.select(col("o_orderpriority"),
          expr("stack(3, 'O', O, 'F', F, 'P', P) AS (o_orderstatus, total)"))
        .filter(col("total").isNotNull)
    }),

    // GROUPING SETS + grouping_id (q158): the explicit multi-grain form
    // rollup/cube compile to — three grains in ONE pass (Expand + single
    // hash aggregate, not three scans), with the bitmask distinguishing
    // which NULLs are structural. Both engines share the Postgres
    // grouping_id bit convention (first column = MSB), which the hash
    // compare pins.
    "q158_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v158")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          |  count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM orders_v158
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          |  (o_orderstatus), ())""".stripMargin)
    }),

    // GROUPED LINEAR REGRESSION (q225, round 15): per-event-type value
    // trend (slope/intercept/corr of value vs time-in-days) in ONE hash
    // aggregate from moment sums — the closed-form OLS both engines can
    // reproduce term-for-term (Spark/DuckDB native regr_* differ in
    // internal accumulation, so the moments are spelled out). One pass,
    // no joins; the group count is bounded by the event-type cardinality.
    "q225_grouped_regression" -> ((s, dir) => {
      // cast(ts as double) = epoch seconds incl. fractional micros — the
      // same value DuckDB's epoch(ts) yields (unix_timestamp would truncate)
      val x = col("ts").cast("double") / lit(86400.0)
      val y = col("value")
      t(s, dir, "events")
        .select(col("event_type"), x.as("x"), y.as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          avg(col("x")).as("ax"), avg(col("y")).as("ay"),
          avg(col("x") * col("y")).as("axy"),
          avg(col("x") * col("x")).as("axx"),
          avg(col("y") * col("y")).as("ayy"))
        .select(col("event_type"), col("n"),
          round((col("axy") - col("ax") * col("ay")) /
            (col("axx") - col("ax") * col("ax")), 6).as("slope"),
          round(col("ay") - (col("axy") - col("ax") * col("ay")) /
            (col("axx") - col("ax") * col("ax")) * col("ax"), 6).as("intercept"),
          round((col("axy") - col("ax") * col("ay")) /
            (sqrt(col("axx") - col("ax") * col("ax")) *
              sqrt(col("ayy") - col("ay") * col("ay"))), 6).as("corr"))
    }),

    // PAGERANK (q226, round 15): graph analytics over the trade graph —
    // nodes are customers ('c<id>') and suppliers ('s<id>'), a distinct
    // edge each way per observed trade (customer bought from supplier via
    // orders⋈lineitem). 3 fixed iterations, damping 0.85, no dangling
    // redistribution — exactly reproducible as unrolled SQL. Per
    // iteration: one vertex-keyed join + one hash agg (see
    // [[graft.ext.GraphOps]] for the 100 TB shape). Emits the top 30 by
    // rounded rank.
    "q226_pagerank" -> ((s, dir) => {
      val trade = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("sn"))
        .distinct()
      val edges = trade.select(col("c").as("src"), col("sn").as("dst"))
        .union(trade.select(col("sn").as("src"), col("c").as("dst")))
      val pr = graft.ext.GraphOps.pageRank(edges, iters = 3, damping = 0.85)
      pr.select(col("node"), round(col("rank"), 6).as("pagerank"))
        .orderBy(col("pagerank").desc, col("node").asc)
        .limit(30)
    }),

    // FIRST-TOUCH FUNNEL (q234, round 15): the product-analytics
    // conversion funnel (view → click → purchase, strictly time-ordered
    // first touches) in ONE hash aggregate per user plus one global agg —
    // no self-joins, no windows: per-user stage timestamps via
    // conditional-min, stage membership via ordered comparisons (NULL
    // stages fail the comparison in both engines identically).
    "q234_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val stages = ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      stages.agg(
        count(col("t_view")).as("n_view"),
        sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L))
          .as("n_view_click"),
        sum(when(col("t_click") > col("t_view") &&
          col("t_purchase") > col("t_click"), 1L).otherwise(0L))
          .as("n_full_funnel"))
    }),

    // COHORT RETENTION (q235, round 15): users bucketed by first-active
    // ISO week; per (cohort, weeks-since) distinct active users — the
    // standard retention matrix. Two hash-aggs (distinct user-weeks, then
    // the matrix) + one join back to the per-user cohort; week arithmetic
    // stays in exact epoch-second integers so both engines agree
    // bit-for-bit.
    "q235_cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val weeks = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("week")).distinct()
      val cohort = weeks.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      weeks.join(cohort, "user_id")
        .select(col("cohort_week"),
          ((unix_timestamp(col("week")) -
            unix_timestamp(col("cohort_week"))) / 604800L).cast("long")
            .as("week_n"))
        .groupBy(col("cohort_week"), col("week_n"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // RELY PK/FK JOIN ELIMINATION (q232, round 15): informational
    // constraints the optimizer is licensed to trust (the Databricks/
    // Snowflake RELY contract). With nation.n_nationkey declared PRIMARY
    // KEY RELY and customer.c_nationkey a RELY foreign key to it, the
    // BI-tool-shaped star join below reads only customer columns — the
    // injected [[graft.plans.EliminateRelyJoins]] optimizer rule removes
    // the dim scan AND the join from the plan (plan-guarded in-query:
    // a rule regression fails the correctness gate loudly). The oracle is
    // the semantically equal fact-only projection.
    "q232_join_elimination" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      graft.plans.RelyConstraints.declarePrimaryKey(nat, "n_nationkey")
      graft.plans.RelyConstraints.declareForeignKey(
        cust, "c_nationkey", nat, "n_nationkey")
      val q = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .select(cust("c_custkey"), cust("c_name"), cust("c_nationkey"))
      graft.plans.PlanGuard.requireNotInPlan(q, "Join",
        "q232: RELY fk→pk join with a fact-only projection must plan " +
          "without the dim join")
    }),

    // MARKOV TRANSITION MATRIX (q237, round 15): the next-event model over
    // the event stream — P(next | prev) for every observed event-type pair,
    // the user-journey analysis behind "what do users do after X".
    // One shuffle keyed on user_id for the lead() window (consecutive
    // pairs form inside a user's partition — never a self-join on the
    // stream), then a hash-agg whose output is bounded by |event types|²
    // (25 rows here) regardless of corpus size; the probability
    // normalization is a window over that tiny matrix. Both engines
    // compute p as exact-integer division in doubles.
    "q237_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val counts = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("prev_event"))
        .withColumn("next_event", lead(col("prev_event"), 1).over(w))
        .filter(col("next_event").isNotNull)
        .groupBy(col("prev_event"), col("next_event"))
        .agg(count(lit(1)).as("n"))
      counts.withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy(col("prev_event"))), 6))
    }),

    // SESSION PATH ANALYSIS (q241, round 15): the top user journeys —
    // sessionize by a 4-hour inactivity gap (classic gap-and-islands:
    // session id = running count of gap-breaks, one lag + one running-sum
    // window over the same user_id partitioning, so ONE shuffle), then
    // the ordered event-type path per session and the most common paths.
    // Path assembly sorts each session's events locally
    // (array_sort(collect_list(struct))) — per-session work, bounded by
    // session length, never a global sort; gap arithmetic stays in exact
    // epoch microseconds so both engines break sessions identically.
    "q241_session_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val gapUs = 4L * 3600L * 1000000L
      val sess = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(w) >= gapUs ||
            lag(col("us"), 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("session_n", sum(col("brk")).over(w))
      sess.groupBy(col("user_id"), col("session_n"))
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(us, event_id, " +
            "event_type))), x -> x.event_type)"), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path").asc)
        .limit(20)
    }),

    // RECURSIVE CTE (q243, round 15): hierarchy traversal through the SQL
    // front door — Spark 4's WITH RECURSIVE (iterative union execution:
    // each step is one distributed join of the frontier against the base
    // relation, depth-bounded, never a driver loop). The hierarchy is the
    // halving tree over customer keys (parent(k) = k DIV 2 — every key
    // reachable from root 1, depth = ⌊log₂ k⌋), rolled up per depth: the
    // org-chart/BOM rollup shape.
    "q243_recursive_hierarchy" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v243")
      s.sql(
        """WITH RECURSIVE walk(c_custkey, c_acctbal, depth) AS (
          |  SELECT c_custkey, c_acctbal, CAST(0 AS BIGINT)
          |  FROM customer_v243 WHERE c_custkey = 1
          |  UNION ALL
          |  SELECT c.c_custkey, c.c_acctbal, w.depth + 1
          |  FROM customer_v243 c JOIN walk w ON c.c_custkey DIV 2 = w.c_custkey
          |)
          |SELECT depth, count(*) AS n, round(sum(c_acctbal), 2) AS bal
          |FROM walk GROUP BY depth""".stripMargin)
    }),

    // LATERAL correlated subquery (q244, round 15): top-3 customers by
    // balance PER REGION via LATERAL — the "top-n per group through the
    // SQL front door" shape BI tools emit. Catalyst decorrelates the
    // correlated ORDER BY ... LIMIT into a ranked window join — never a
    // per-row subquery execution.
    "q244_lateral_topn" -> ((s, dir) => {
      t(s, dir, "region").createOrReplaceTempView("region_v244")
      t(s, dir, "nation").createOrReplaceTempView("nation_v244")
      t(s, dir, "customer").createOrReplaceTempView("customer_v244")
      val df = s.sql(
        """SELECT r.r_name, l.c_name, l.c_acctbal
          |FROM region_v244 r,
          |LATERAL (
          |  SELECT c.c_name, c.c_acctbal
          |  FROM customer_v244 c JOIN nation_v244 n
          |    ON c.c_nationkey = n.n_nationkey
          |  WHERE n.n_regionkey = r.r_regionkey
          |  ORDER BY c.c_acctbal DESC, c.c_name ASC LIMIT 3) l""".stripMargin)
      graft.plans.PlanGuard.requireNotInPlan(df, "BroadcastNestedLoopJoin",
        "q244: the lateral top-n must decorrelate to a ranked window " +
          "join, never a per-outer-row nested loop")
    }),

    // EXPONENTIAL SMOOTHING per key (q245, round 15): the ordered-fold
    // primitive — each user's event values fold left-to-right through
    // s' = ½s + ½x (simple exponential smoothing, α = ½: every multiply
    // is an exact binary rescale, and a left fold gives both engines the
    // IDENTICAL operation sequence — no sum-reorder ulp drift). The fold
    // runs inside one hash aggregate (collect per key, sort locally,
    // aggregate() HOF) — per-key work bounded by that key's history,
    // never a global sort.
    "q245_exp_smoothing" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("value"))
        .groupBy(col("user_id"))
        .agg(expr("transform(array_sort(collect_list(struct(us, event_id, " +
          "value))), x -> x.value)").as("vs"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          round(expr("aggregate(slice(vs, 2, size(vs) - 1), vs[0], " +
            "(s, x) -> 0.5d * s + 0.5d * x)"), 6).as("smoothed"))
    }),

    // TIME-SERIES RESAMPLE + FORWARD FILL (q246, round 15): each user's
    // sparse event values regularized onto an hourly grid — the
    // gap-filling step before any per-key time-series model. The grid is
    // GENERATED per key (sequence() from that key's own min to max hour —
    // grid size tracks each key's span, never a global calendar cross
    // join); observed hours average their values; gaps forward-fill via a
    // running last(ignoreNulls) frame. One shuffle keyed on user_id
    // serves the hourly agg, the bounds agg, and the fill window.
    "q246_resample_ffill" -> ((s, dir) => {
      // a deterministic user band keeps the emitted grid result-sized at
      // every sf (the operator itself is per-key-bounded at any scale)
      val hourly = t(s, dir, "events").filter(col("user_id") % 7 === 0)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(round(avg(col("value")), 6).as("v"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
        .select(col("user_id"), explode(
          expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), unix_micros(col("hour")).as("hour_us"),
          col("v").isNull.as("is_gap"),
          last(col("v"), ignoreNulls = true).over(w).as("v_ffill"))
    }),

    // PERSISTED MERGEABLE DISTINCT SKETCHES (the Datasketches HLL column
    // pattern every production warehouse ships for distinct-over-
    // arbitrary-windows): a gold table stores one HLL sketch of
    // o_custkey per (priority, month) — built in ONE hash-agg pass —
    // and any later consumer answers "distinct customers per priority
    // across ALL months" by UNIONING the stored sketches
    // (`hll_union_agg`), never rescanning the fact table. At 100 TB the
    // re-aggregation touches KB of sketch bytes instead of the raw
    // scan; sketches merge associatively, so the same column serves
    // daily/monthly/yearly rollups. SELF-GATING like q36: the estimate
    // runs alongside its exact twin and must land within the HLL
    // (lgK=12) error envelope; the emitted row carries the EXACT counts
    // the oracle recomputes.
    "q252_hll_sketch_columns" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val gold = orders.groupBy(col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("cust_sk"),
          count(lit(1)).as("order_rows"))
      val goldPath = QueryTmp.dir("q252gold")
      gold.write.mode("overwrite").parquet(goldPath)
      // the consumer: stored sketches only — no fact-table rescan
      val rolled = s.read.parquet(goldPath)
        .groupBy(col("o_orderpriority"))
        .agg(hll_sketch_estimate(hll_union_agg(col("cust_sk")))
          .as("approx_cust"), count(lit(1)).as("months"))
      val exact = orders.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_cust"))
      val joined = rolled.join(exact, Seq("o_orderpriority"))
      val offBound = joined.filter(
        abs(col("approx_cust") - col("exact_cust")) >
          col("exact_cust") * 0.05).count()
      require(offBound == 0,
        s"q252: $offBound priorities outside the 5% HLL envelope")
      joined.select(col("o_orderpriority"), col("exact_cust"),
        col("months"), lit(true).as("within_bound"))
    }),

    // A/B EXPERIMENT READOUT (the two-proportion z-test every
    // experimentation platform computes): users hash-assign to variants
    // (user_id parity — the deterministic stand-in for bucket hashing),
    // conversion = purchase spend over a threshold, and the readout is
    // the closed-form pooled z. Money sums in EXACT integer cents
    // (round(value*100)) so the conversion flag can never flip on
    // engine-order FP drift. One user-level hash-agg + a 2-row rollup —
    // the whole readout is one shuffle at any scale, and the z arithmetic
    // is a driver-free literal expression over the 2-row frame.
    "q253_ab_test_ztest" -> ((s, dir) => {
      val users = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long")).otherwise(0L))
          .as("pv_cents"))
        .select(when(col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"),
          (col("pv_cents") > 60000L).cast("int").as("converted"))
      val per = users.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("converted")).as("converters"))
      per.createOrReplaceTempView("q253_per")
      s.sql("""
        SELECT variant, n_users, converters,
          round(converters / CAST(n_users AS DOUBLE), 6) AS rate,
          round((pa - pb) / sqrt(p * (1 - p) * (1.0/na + 1.0/nb)), 6)
            AS z_score,
          abs((pa - pb) / sqrt(p * (1 - p) * (1.0/na + 1.0/nb))) > 1.96
            AS significant
        FROM q253_per CROSS JOIN (
          SELECT
            max(CASE WHEN variant = 'A' THEN converters / CAST(n_users AS DOUBLE) END) AS pa,
            max(CASE WHEN variant = 'B' THEN converters / CAST(n_users AS DOUBLE) END) AS pb,
            max(CASE WHEN variant = 'A' THEN n_users END) AS na,
            max(CASE WHEN variant = 'B' THEN n_users END) AS nb,
            sum(converters) / CAST(sum(n_users) AS DOUBLE) AS p
          FROM q253_per)""")
    }),

    // ROBUST ANOMALY DETECTION over the event stream's daily volumes:
    // median/MAD per event type (the outlier-immune location/scale pair —
    // a real traffic spike cannot drag its own baseline the way mean/
    // stddev lets it), robust z = (n - med) / (1.4826·MAD), 3σ flag.
    // Exact medians via percentile(0.5) — at 100 TB the daily-count
    // frame this runs over is days×types rows, so exactness costs
    // nothing; the only full-data pass is the first groupBy. */
    "q254_mad_anomaly" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy(col("event_type"))
        .agg(expr("percentile(n, 0.5)").as("med"))
      val mad = daily.join(med, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
      val scored = daily.join(med, Seq("event_type"))
        .join(mad, Seq("event_type"))
      require(scored.filter(col("mad") <= 0).isEmpty,
        "q254: a type's MAD collapsed to zero — the score is vacuous")
      scored.select(col("event_type"), col("day"), col("n"),
        round(col("med"), 2).as("med"), round(col("mad"), 2).as("mad"),
        round((col("n") - col("med")) / (lit(1.4826) * col("mad")), 6)
          .as("robust_z"),
        (abs(col("n") - col("med")) > lit(3 * 1.4826) * col("mad"))
          .as("is_anomaly"))
    }),

    // MARKETING TOUCH ATTRIBUTION (first-touch / last-touch, the readout
    // every attribution pipeline computes): for each purchase, the clicks
    // by the same user inside a 7-day lookback window; last touch = most
    // recent such click, first touch = earliest. The join is an interval
    // join KEYED on user_id (the q41/q80 range-join discipline: the time
    // comparison only runs within a user's partition, never as a global
    // cross product), and the per-purchase windows are bounded by that
    // purchase's own touch count. Ties broken by click id — deterministic
    // at any scale.
    "q257_touch_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      val joined = purch.join(clicks, Seq("user_id"))
        .filter(col("cts") <= col("pts") &&
          col("cts") > col("pts") - expr("INTERVAL 7 DAYS"))
      val wLast = Window.partitionBy(col("purchase_id"))
        .orderBy(col("cts").desc, col("click_id").desc)
      val wFirst = Window.partitionBy(col("purchase_id"))
        .orderBy(col("cts").asc, col("click_id").asc)
      joined
        .withColumn("rl", row_number().over(wLast))
        .withColumn("rf", row_number().over(wFirst))
        .groupBy(col("purchase_id"), col("user_id"))
        .agg(count(lit(1)).as("n_touches"),
          max(when(col("rl") === 1, col("click_id"))).as("last_click"),
          max(when(col("rf") === 1, col("click_id"))).as("first_click"))
    }),

    // CORPUS DIVERSITY (distinct-n, Li et al. 2016 — the curation metric
    // that catches a TEMPLATED source before training does): per source,
    // the distinct/total ratio of 1/2/3-grams. N-grams are built INSIDE
    // the token array (`transform(sequence(...))` — pure codegen, no
    // per-gram shuffle; the only shuffles are the per-source hash-aggs),
    // the same window machinery ExactSubstr rides. Linear at 100 TB.
    "q258_corpus_diversity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("toks"))
      def grams(n: Int) = docs.select(col("source"), explode(
        when(size(col("toks")) >= n, expr(
          s"transform(sequence(0, size(toks) - $n), " +
            s"i -> concat_ws(' ', ${(0 until n)
              .map(k => s"toks[i + $k]").mkString(", ")}))"))
          .otherwise(expr("array()"))).as("gram"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as(s"total_$n"),
          countDistinct(col("gram")).as(s"uniq_$n"))
      grams(1).join(grams(2), Seq("source")).join(grams(3), Seq("source"))
        .select(col("source"), col("total_1").as("n_tokens"),
          round(col("uniq_1") / col("total_1").cast("double"), 6)
            .as("distinct_1"),
          round(col("uniq_2") / col("total_2").cast("double"), 6)
            .as("distinct_2"),
          round(col("uniq_3") / col("total_3").cast("double"), 6)
            .as("distinct_3"))
    }),

    // TIME-TO-CONVERT per experiment variant (the latency readout an A/B
    // platform pairs with q253's rate readout): conversion lag = purchase
    // time minus the FIRST touch in the 7-day lookback, exact integer
    // seconds (epoch-µs arithmetic — never a float timestamp diff), then
    // exact linear-interpolation percentiles per hash-assigned variant.
    // Same user-keyed interval join as q257; percentiles run over the
    // conversions frame, already result-sized.
    "q259_time_to_convert" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      val lags = purch.join(clicks, Seq("user_id"))
        .filter(col("cts") <= col("pts") &&
          col("cts") > col("pts") - expr("INTERVAL 7 DAYS"))
        .groupBy(col("user_id"), col("purchase_id"), col("pts"))
        .agg(min(col("cts")).as("first_cts"))
        .select(when(col("user_id") % 2 === 0, "A").otherwise("B")
          .as("variant"),
          ((unix_micros(col("pts")) - unix_micros(col("first_cts"))) /
            lit(1000000L)).cast("long").as("lag_s"))
      lags.groupBy(col("variant"))
        .agg(count(lit(1)).as("conversions"),
          round(expr("percentile(lag_s, 0.5)"), 4).as("p50_s"),
          round(expr("percentile(lag_s, 0.9)"), 4).as("p90_s"),
          max(col("lag_s")).as("max_s"))
    }),

    // MARKET BASKET (association rules over order lines — the retail
    // co-occurrence readout): part pairs co-bought in one order, scored
    // by support / confidence / lift. Pair generation is a SELF-JOIN ON
    // THE ORDER KEY — fan-out bounded by each order's own line count
    // (TPC-H ≤ 7), never an all-parts product; the part-level brands
    // keep the rule table result-sized (pairing raw part keys would be
    // support-1 noise). Counts are exact integers; lift division is one
    // deterministic double op, rounded.
    "q260_market_basket" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val parts = t(s, dir, "part").select(col("p_partkey"),
        col("p_brand"))
      val items = li.join(parts, li("l_partkey") === parts("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
      val nOrders = li.select(col("l_orderkey")).distinct().count()
      val single = items.groupBy(col("brand"))
        .agg(count(lit(1)).as("n_brand"))
      val pairs = items.as("a").join(items.as("b"),
          col("a.ok") === col("b.ok") &&
            col("a.brand") < col("b.brand"))
        .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 5)
      pairs
        .join(single.withColumnRenamed("brand", "brand_a")
          .withColumnRenamed("n_brand", "n_a"), Seq("brand_a"))
        .join(single.withColumnRenamed("brand", "brand_b")
          .withColumnRenamed("n_brand", "n_b"), Seq("brand_b"))
        .select(col("brand_a"), col("brand_b"), col("n_pair"),
          col("n_a"), col("n_b"),
          round(col("n_pair") / col("n_a").cast("double"), 6)
            .as("confidence"),
          round(col("n_pair") * lit(nOrders.toDouble) /
            (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
    }),

    // REVENUE CONCENTRATION per nation (the Pareto readout every revenue
    // dashboard carries): per-customer spend in EXACT integer cents, the
    // Gini coefficient by the rank formula G = (2·Σ i·xᵢ − (n+1)·Σx) /
    // (n·Σx) over the ascending-sorted spends (integer numerators —
    // the only double op is the final division), and the top-decile
    // share. One customer-level hash-agg + one per-nation window; both
    // keyed shuffles, group fan-in bounded by customers-per-nation.
    "q263_revenue_concentration" -> ((s, dir) => {
      val spend = t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
          .as("cents"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("cents").asc, col("c_custkey").asc)
      val ranked = spend
        .withColumn("i", row_number().over(w))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("cents")).as("total_cents"),
          sum(col("i") * col("cents")).as("iws"))
      // top decile = the ceil(n/10) highest spends; rank is ascending,
      // so that is i > n − ceil(n/10)
      val n = spend.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("nc"))
      val dec = spend.withColumn("i", row_number().over(w))
        .join(n, Seq("c_nationkey"))
        .filter(col("i") > col("nc") - ceil(col("nc") / lit(10.0)))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("cents")).as("top_cents"))
      ranked.join(dec, Seq("c_nationkey"))
        .select(col("c_nationkey"), col("n_cust"), col("total_cents"),
          round((lit(2.0) * col("iws") -
            (col("n_cust") + 1) * col("total_cents")) /
            (col("n_cust") * col("total_cents")).cast("double"), 6)
            .as("gini"),
          round(col("top_cents") / col("total_cents").cast("double"), 6)
            .as("top_decile_share"))
    }),

    // ZIPF FIT of the token-frequency curve (the corpus-linguistics
    // sanity readout a text pipeline checks after heavy filtering —
    // natural text slopes near −1, templated or over-deduped corpora
    // drift): closed-form OLS of ln(count) on ln(rank) over the top
    // 1000 ranks, the q225 moment discipline (never the engines'
    // internal regr_* accumulators). The count table is one hash-agg;
    // the 1000-row fit frame is driver-free TakeOrdered work.
    "q264_zipf_fit" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val wr = Window.orderBy(col("n").desc, col("tok").asc)
      val top = counts.withColumn("r", row_number().over(wr))
        .filter(col("r") <= 1000)
        .select(log(col("r").cast("double")).as("x"),
          log(col("n").cast("double")).as("y"))
      top.agg(count(lit(1)).as("n_ranks"),
          avg(col("x")).as("ax"), avg(col("y")).as("ay"),
          avg(col("x") * col("y")).as("axy"),
          avg(col("x") * col("x")).as("axx"))
        .select(col("n_ranks"),
          round((col("axy") - col("ax") * col("ay")) /
            (col("axx") - col("ax") * col("ax")), 4).as("zipf_slope"),
          round(col("ay") - (col("axy") - col("ax") * col("ay")) /
            (col("axx") - col("ax") * col("ax")) * col("ax"), 4)
            .as("zipf_intercept"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q99_double_correlated" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 20""".stripMargin,
    "q84_correlated_exists" ->
      """SELECT c.c_custkey, c.c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')""".stripMargin,
    "q85_union_evolved" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal,
        |  CAST(NULL AS VARCHAR) AS schema_ver
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal, 'v2'
        |FROM customer WHERE c_custkey % 2 <> 0""".stripMargin,
    "q37_scalar_subquery" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l1
        |WHERE l_quantity < (
        |  SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q38_outer_histogram" ->
      """WITH c AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM c GROUP BY 1""".stripMargin,
    "q39_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS status_o,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS status_f,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS status_p
        |FROM orders
        |GROUP BY 1""".stripMargin,
    "q40_percentile" ->
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
        |  round(quantile_cont(c_acctbal, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM customer
        |GROUP BY 1""".stripMargin,
    "q41_range_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  event_type FROM events)
        |SELECT a.event_id AS event_id, count(*) AS n_next_5m
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |WHERE a.event_type = 'purchase'
        |GROUP BY 1""".stripMargin,
    "q46_disjunctive_join" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 40)""".stripMargin,
    "q48_typed_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_quantity < 25.0
        |GROUP BY 1""".stripMargin,
    "q47_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  round(sum(o_totalprice), 2) AS total, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q43_stats_aggs" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_discount), 6) AS var_disc,
        |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
        |  min_by(l_suppkey, l_orderkey * 100 + l_linenumber) AS first_supp,
        |  max_by(l_suppkey, l_orderkey * 100 + l_linenumber) AS last_supp
        |FROM lineitem
        |GROUP BY 1""".stripMargin,
    "q42_ranking_windows" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  first_value(c_custkey) OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_custkey
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin,
    "q148_resample_ffill" ->
      """WITH b AS (SELECT CAST(min(ts) AS DATE) AS lo,
        |                  CAST(max(ts) AS DATE) AS hi FROM events),
        |u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 30),
        |g AS (SELECT u.user_id,
        |        CAST(unnest(generate_series(CAST(b.lo AS TIMESTAMP),
        |          CAST(b.hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |      FROM u, b),
        |d AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |        round(sum(value), 2) AS day_value
        |      FROM events WHERE user_id < 30 GROUP BY 1, 2)
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM g LEFT JOIN d ON g.user_id = d.user_id AND g.day = d.day""".stripMargin,
    "q149_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS click_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
        |SELECT v.user_id,
        |  epoch_us(CAST(view_ts AS TIMESTAMP)) AS view_us,
        |  epoch_us(CAST(click_ts AS TIMESTAMP)) AS click_us,
        |  epoch_us(CAST(purchase_ts AS TIMESTAMP)) AS purchase_us,
        |  purchase_ts IS NOT NULL
        |    AND purchase_ts <= view_ts + INTERVAL 7 DAY AS completed_7d
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q150_cohort_retention" ->
      """WITH lo AS (SELECT CAST(min(ts) AS DATE) AS lo FROM events),
        |wk AS (SELECT DISTINCT user_id,
        |         CAST(floor(datediff('day', lo.lo, CAST(ts AS DATE)) / 7.0)
        |           AS INT) AS week
        |       FROM events, lo),
        |coh AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1)
        |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
        |  CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
        |FROM wk w JOIN coh c ON w.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q151_rolling_range" ->
      """SELECT o_orderkey, o_custkey,
        |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  round(sum(o_totalprice) OVER w, 2) AS rolling_7d,
        |  count(*) OVER w AS n_orders_7d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""".stripMargin,
    "q152_nested_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice, 2) AS l_extendedprice
        |FROM lineitem WHERE l_orderkey % 7 = 0""".stripMargin,
    // q154 emits the DPP-pruned join result: orders whose priority class
    // is '1' (the fact partitions the runtime filter kept).
    "q154_dynamic_partition_pruning" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  o_orderpriority, TRUE AS dpp_ok
        |FROM orders
        |WHERE substr(o_orderpriority, 1, 1) = '1'""".stripMargin,
    // q155's oracle recomputes the aggregation from the RAW table — a
    // rewrite that dropped rows, double-counted a partial, or matched
    // the wrong grain hash-mismatches.
    "q155_matview_rewrite" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n_rows, TRUE AS rewritten_ok, TRUE AS guard_ok
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q158_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())""".stripMargin,
    // q162: unpivot round-trips to the sparse grouped relation.
    "q162_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderstatus IN ('O', 'F', 'P')
        |GROUP BY 1, 2""".stripMargin,
    // q225: the same closed-form OLS moments, term for term (epoch(ts)
    // matches Spark's cast(ts as double) including fractional seconds).
    "q225_grouped_regression" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    avg(x) AS ax, avg(y) AS ay, avg(x*y) AS axy,
        |    avg(x*x) AS axx, avg(y*y) AS ayy
        |  FROM (SELECT event_type, epoch(ts) / 86400.0 AS x, value AS y
        |        FROM events)
        |  GROUP BY 1)
        |SELECT event_type, n,
        |  round((axy - ax*ay) / (axx - ax*ax), 6) AS slope,
        |  round(ay - (axy - ax*ay) / (axx - ax*ax) * ax, 6) AS intercept,
        |  round((axy - ax*ay) / (sqrt(axx - ax*ax) * sqrt(ayy - ay*ay)), 6)
        |    AS corr
        |FROM m""".stripMargin,
    "q226_pagerank" -> pageRankOracle(iters = 3, damping = 0.85, top = 30),
    // q232: the eliminated join is the identity on the fact side — the
    // oracle IS the fact projection (fk integrity holds in the testdata).
    "q232_join_elimination" ->
      "SELECT c_custkey, c_name, c_nationkey FROM customer",
    // q234: identical conditional-min stage table; NULL stages fail the
    // ordered comparisons in both engines.
    "q234_funnel" ->
      """WITH st AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT count(t_view) AS n_view,
        |  CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view_click,
        |  CAST(sum(CASE WHEN t_click > t_view AND t_purchase > t_click
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM st""".stripMargin,
    // q235: same distinct user-week plane; week arithmetic in exact
    // epoch-second integers.
    "q235_cohort_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        |            FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1)
        |SELECT c.cohort_week,
        |  CAST((epoch(wk.week) - epoch(c.cohort_week)) / 604800 AS BIGINT)
        |    AS week_n,
        |  count(*) AS n_users
        |FROM wk JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // q237: consecutive-pair counts via the same lead() window; p is
    // BIGINT/BIGINT division — float division in both engines — of exact
    // integers, rounded to 6.
    "q237_markov_transitions" ->
      """WITH st AS (
        |  SELECT event_type AS prev_event,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS next_event
        |  FROM events),
        |c AS (SELECT prev_event, next_event, count(*) AS n
        |      FROM st WHERE next_event IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_event, next_event, n,
        |  round(n / sum(n) OVER (PARTITION BY prev_event), 6) AS p
        |FROM c""".stripMargin,
    // q241: the gap-and-islands rewrite with exact microsecond arithmetic;
    // string_agg with an ORDER BY replays the per-session path assembly.
    "q241_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |             epoch_us(ts) AS us FROM events),
        |b AS (SELECT *, CASE WHEN us - lag(us) OVER
        |          (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
        |          >= 14400000000
        |        OR lag(us) OVER (PARTITION BY user_id
        |          ORDER BY us ASC, event_id ASC) IS NULL
        |        THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |        ORDER BY us ASC, event_id ASC) AS session_n FROM b),
        |p AS (SELECT user_id, session_n,
        |        string_agg(event_type, '>' ORDER BY us ASC, event_id ASC)
        |          AS path
        |      FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path ASC
        |LIMIT 20""".stripMargin,
    "q243_recursive_hierarchy" ->
      """WITH RECURSIVE walk(c_custkey, c_acctbal, depth) AS (
        |  SELECT c_custkey, c_acctbal, CAST(0 AS BIGINT)
        |  FROM customer WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT c.c_custkey, c.c_acctbal, w.depth + 1
        |  FROM customer c JOIN walk w ON c.c_custkey // 2 = w.c_custkey
        |)
        |SELECT depth, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM walk GROUP BY depth""".stripMargin,
    "q244_lateral_topn" ->
      """SELECT r.r_name, l.c_name, l.c_acctbal
        |FROM region r,
        |LATERAL (
        |  SELECT c.c_name, c.c_acctbal
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY c.c_acctbal DESC, c.c_name ASC LIMIT 3) l""".stripMargin,
    // q245: list_reduce seeds from the first element, matching the Spark
    // side's aggregate(tail, head, fold) — identical operation order, so
    // the ½-weighted fold is bit-reproducible before the final round.
    "q245_exp_smoothing" ->
      """WITH a AS (
        |  SELECT user_id, count(*) AS n_events,
        |    list(value ORDER BY epoch_us(ts) ASC, event_id ASC) AS vs
        |  FROM events GROUP BY 1)
        |SELECT user_id, n_events,
        |  round(list_reduce(vs, (s, x) -> 0.5 * s + 0.5 * x), 6) AS smoothed
        |FROM a""".stripMargin,
    // q246: generate_series replays the per-key grid; last_value IGNORE
    // NULLS over the running frame is the forward fill.
    "q246_resample_ffill" ->
      """WITH h AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    round(avg(value), 6) AS v
        |  FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2),
        |b AS (SELECT user_id, min(hour) AS lo, max(hour) AS hi
        |      FROM h GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(lo, hi,
        |        INTERVAL 1 HOUR)) AS hour FROM b)
        |SELECT g.user_id, epoch_us(g.hour) AS hour_us,
        |  h.v IS NULL AS is_gap,
        |  last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.hour ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
        |FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hour = h.hour""".stripMargin,
    // q252 emits exact distincts + the sketch gate; months = distinct
    // (priority, month) groups the gold sketch table carries.
    "q252_hll_sketch_columns" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS exact_cust,
        |  count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS months,
        |  TRUE AS within_bound
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin,
    // q253: identical closed-form pooled z recomputed over exact cents.
    "q253_ab_test_ztest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    (sum(CASE WHEN event_type = 'purchase'
        |         THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
        |     > 60000) AS converted
        |  FROM events GROUP BY user_id),
        |per AS (
        |  SELECT variant, count(*) AS n_users,
        |    CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
        |      AS converters
        |  FROM u GROUP BY variant),
        |tot AS (
        |  SELECT
        |    max(CASE WHEN variant = 'A'
        |        THEN converters / CAST(n_users AS DOUBLE) END) AS pa,
        |    max(CASE WHEN variant = 'B'
        |        THEN converters / CAST(n_users AS DOUBLE) END) AS pb,
        |    max(CASE WHEN variant = 'A' THEN n_users END) AS na,
        |    max(CASE WHEN variant = 'B' THEN n_users END) AS nb,
        |    sum(converters) / CAST(sum(n_users) AS DOUBLE) AS p
        |  FROM per)
        |SELECT variant, n_users, converters,
        |  round(converters / CAST(n_users AS DOUBLE), 6) AS rate,
        |  round((pa - pb) / sqrt(p * (1 - p) * (1.0/na + 1.0/nb)), 6)
        |    AS z_score,
        |  abs((pa - pb) / sqrt(p * (1 - p) * (1.0/na + 1.0/nb))) > 1.96
        |    AS significant
        |FROM per CROSS JOIN tot""".stripMargin,
    // q254: same median/MAD arithmetic; DuckDB's median interpolates the
    // even-count middle pair exactly like percentile(0.5).
    "q254_mad_anomaly" ->
      """WITH d AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, median(n) AS med FROM d GROUP BY 1),
        |s AS (SELECT d.event_type, median(abs(d.n - m.med)) AS mad
        |      FROM d JOIN m ON d.event_type = m.event_type GROUP BY 1)
        |SELECT d.event_type, d.day, d.n,
        |  round(m.med, 2) AS med, round(s.mad, 2) AS mad,
        |  round((d.n - m.med) / (1.4826 * s.mad), 6) AS robust_z,
        |  abs(d.n - m.med) > 3 * 1.4826 * s.mad AS is_anomaly
        |FROM d JOIN m ON d.event_type = m.event_type
        |       JOIN s ON d.event_type = s.event_type""".stripMargin,
    // q257: identical interval join + tie-broken windows.
    "q257_touch_attribution" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, c.click_id, c.cts,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY c.cts DESC, c.click_id DESC) AS rl,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |      ORDER BY c.cts ASC, c.click_id ASC) AS rf
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 7 DAY)
        |SELECT purchase_id, user_id, count(*) AS n_touches,
        |  max(CASE WHEN rl = 1 THEN click_id END) AS last_click,
        |  max(CASE WHEN rf = 1 THEN click_id END) AS first_click
        |FROM j GROUP BY purchase_id, user_id""".stripMargin,
    // q258: n-grams via 1-based list lambdas; generate_series(1, 0) is
    // empty, so short docs contribute nothing — same as the Spark guard.
    "q258_corpus_diversity" ->
      """WITH d AS (SELECT source, string_split(text, ' ') AS l
        |           FROM documents),
        |g1 AS (SELECT source, count(*) AS total_1,
        |         count(DISTINCT g) AS uniq_1
        |       FROM d, unnest(l) AS u(g) GROUP BY source),
        |g2 AS (SELECT source, count(*) AS total_2,
        |         count(DISTINCT g) AS uniq_2
        |       FROM d, unnest(list_transform(
        |         generate_series(1, len(l) - 1),
        |         i -> l[i] || ' ' || l[i + 1])) AS u(g)
        |       GROUP BY source),
        |g3 AS (SELECT source, count(*) AS total_3,
        |         count(DISTINCT g) AS uniq_3
        |       FROM d, unnest(list_transform(
        |         generate_series(1, len(l) - 2),
        |         i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS u(g)
        |       GROUP BY source)
        |SELECT g1.source, total_1 AS n_tokens,
        |  round(uniq_1 / CAST(total_1 AS DOUBLE), 6) AS distinct_1,
        |  round(uniq_2 / CAST(total_2 AS DOUBLE), 6) AS distinct_2,
        |  round(uniq_3 / CAST(total_3 AS DOUBLE), 6) AS distinct_3
        |FROM g1 JOIN g2 ON g1.source = g2.source
        |        JOIN g3 ON g1.source = g3.source""".stripMargin,
    // q259: integer-seconds lags (floor division — both engines truncate
    // the nonnegative diff identically), exact interpolated percentiles.
    "q259_time_to_convert" ->
      """WITH c AS (SELECT user_id, ts AS cts FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
        |      FROM events WHERE event_type = 'purchase'),
        |l AS (
        |  SELECT p.user_id, p.purchase_id, p.pts, min(c.cts) AS first_cts
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 7 DAY
        |  GROUP BY p.user_id, p.purchase_id, p.pts),
        |v AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |    (epoch_us(pts) - epoch_us(first_cts)) // 1000000 AS lag_s
        |  FROM l)
        |SELECT variant, count(*) AS conversions,
        |  round(quantile_cont(lag_s, 0.5), 4) AS p50_s,
        |  round(quantile_cont(lag_s, 0.9), 4) AS p90_s,
        |  max(lag_s) AS max_s
        |FROM v GROUP BY variant""".stripMargin,
    // q260: identical exact counts; lift arithmetic in the same
    // left-to-right double order.
    "q260_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |no AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem),
        |s AS (SELECT brand, count(*) AS n_brand FROM items GROUP BY 1),
        |pr AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b,
        |    count(*) AS n_pair
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT brand_a, brand_b, n_pair,
        |  sa.n_brand AS n_a, sb.n_brand AS n_b,
        |  round(n_pair / CAST(sa.n_brand AS DOUBLE), 6) AS confidence,
        |  round(n_pair * CAST((SELECT n FROM no) AS DOUBLE)
        |        / CAST(sa.n_brand * sb.n_brand AS DOUBLE), 6) AS lift
        |FROM pr JOIN s sa ON pr.brand_a = sa.brand
        |        JOIN s sb ON pr.brand_b = sb.brand""".stripMargin,
    // q263: same integer-cent rank formula; only the final divisions are
    // doubles.
    "q263_revenue_concentration" ->
      """WITH sp AS (
        |  SELECT c.c_nationkey, c.c_custkey,
        |    CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT c_nationkey, c_custkey, cents,
        |        row_number() OVER (PARTITION BY c_nationkey
        |          ORDER BY cents ASC, c_custkey ASC) AS i
        |      FROM sp),
        |a AS (SELECT c_nationkey, count(*) AS n_cust,
        |        CAST(sum(cents) AS BIGINT) AS total_cents,
        |        CAST(sum(i * cents) AS BIGINT) AS iws
        |      FROM r GROUP BY 1),
        |nn AS (SELECT c_nationkey, count(*) AS nc FROM sp GROUP BY 1),
        |d AS (SELECT r.c_nationkey,
        |        CAST(sum(r.cents) AS BIGINT) AS top_cents
        |      FROM r JOIN nn ON r.c_nationkey = nn.c_nationkey
        |      WHERE r.i > nn.nc - ceil(nn.nc / 10.0) GROUP BY 1)
        |SELECT a.c_nationkey, a.n_cust, a.total_cents,
        |  round((2.0 * a.iws - (a.n_cust + 1) * a.total_cents)
        |        / CAST(a.n_cust * a.total_cents AS DOUBLE), 6) AS gini,
        |  round(d.top_cents / CAST(a.total_cents AS DOUBLE), 6)
        |    AS top_decile_share
        |FROM a JOIN d ON a.c_nationkey = d.c_nationkey""".stripMargin,
    // q264: identical ln-moment OLS (q225 discipline) over the same
    // deterministic rank order.
    "q264_zipf_fit" ->
      """WITH c AS (SELECT tok, count(*) AS n
        |           FROM documents, unnest(string_split(text, ' '))
        |             AS u(tok)
        |           GROUP BY 1),
        |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC)
        |        AS rnk FROM c),
        |t AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x,
        |        ln(CAST(n AS DOUBLE)) AS y
        |      FROM r WHERE rnk <= 1000),
        |m AS (SELECT count(*) AS n_ranks, avg(x) AS ax, avg(y) AS ay,
        |        avg(x*y) AS axy, avg(x*x) AS axx FROM t)
        |SELECT n_ranks,
        |  round((axy - ax*ay) / (axx - ax*ax), 4) AS zipf_slope,
        |  round(ay - (axy - ax*ay) / (axx - ax*ax) * ax, 4)
        |    AS zipf_intercept
        |FROM m""".stripMargin
  )

  /** Unrolled-iteration SQL mirror of [[graft.ext.GraphOps.pageRank]] over
    * the q226 trade graph: rank_k CTEs chained `iters` deep, identical
    * formula ((1-d)/N + d·Σ rank/outdeg, no dangling redistribution). */
  private def pageRankOracle(iters: Int, damping: Double, top: Int): String = {
    val d = damping
    val base =
      s"""WITH trade AS (
         |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS sn
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT c AS src, sn AS dst FROM trade
         |      UNION SELECT sn AS src, c AS dst FROM trade),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |outdeg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""c$k AS (
         |  SELECT e.dst, sum(r.rank / o.outdeg) AS mass
         |  FROM r${k - 1} r JOIN outdeg o ON r.node = o.src
         |    JOIN e ON e.src = o.src
         |  GROUP BY 1),
         |r$k AS (
         |  SELECT nodes.node,
         |    (1.0 - $d) / nn.n + $d * coalesce(c$k.mass, 0.0) AS rank
         |  FROM nodes LEFT JOIN c$k ON nodes.node = c$k.dst, nn)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$steps
       |SELECT node, round(rank, 6) AS pagerank
       |FROM r$iters
       |ORDER BY pagerank DESC, node ASC
       |LIMIT $top""".stripMargin
  }
}
