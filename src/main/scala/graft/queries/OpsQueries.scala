package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{BloomJoin, Cleaning, Skew, Upsert}
import graft.qc.Checks
import graft.sinks.JdbcUpsert
import graft.sources.Json

/** Driver queries that put the previously spec-only operators under the
  * DuckDB oracle: MERGE upsert (K4), SCD2, variant-shape JSON extraction
  * (S7), and the fused QC aggregate (A2–A4). Each builds a deterministic
  * update/payload set from the sf-dir tables so the oracle can reproduce
  * the exact semantics in ANSI SQL.
  */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared SCD2 fixture (q55 + the q90 as-of read): 2026-01-01 current
    * versions + pre-existing history for %11 keys, updated by a 2026-06-01
    * batch of changed (%7), unchanged (%13) and brand-new (%97) rows. */
  private def scd2Fixture(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val current = cust
      .withColumn("valid_from", lit("2026-01-01"))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))
    val history = cust.filter(col("c_custkey") % 11 === 0)
      .withColumn("c_mktsegment", lit("OLD"))
      .withColumn("valid_from", lit("2025-01-01"))
      .withColumn("valid_to", lit("2026-01-01"))
      .withColumn("is_current", lit(false))
    val target = current.unionByName(history)
    val updates = cust.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_mktsegment", lit("MOVED"))
      .unionByName( // unchanged rows: must be kept untouched
        cust.filter(col("c_custkey") % 13 === 0 && col("c_custkey") % 7 =!= 0))
      .unionByName( // brand-new keys: opened
        cust.filter(col("c_custkey") % 97 === 0)
          .withColumn("c_custkey", col("c_custkey") + lit(2000000L)))
    Upsert.scd2(target, updates, Seq("c_custkey"), batchDate = "2026-06-01")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K4 lake-native MERGE (reference run_load.py:75-90 semantics): updates
    // overwrite every non-key column on match, insert on no-match, unmatched
    // target rows pass through. Updates = modified existing keys + new keys.
    "q52_upsert" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val mods = cust.filter(col("c_custkey") % 5 === 0)
        .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2))
        .withColumn("c_mktsegment", lit("UPSERTED"))
      val inserts = cust.filter(col("c_custkey") % 97 === 0)
        .withColumn("c_custkey", col("c_custkey") + lit(1000000L))
      Upsert.upsert(cust, mods.unionByName(inserts), Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
    }),

    // SCD2 dimension history (the history-keeping sibling of K4): changed
    // rows close the current version and append a new one; unchanged update
    // rows are no-ops (idempotent re-runs); new keys open fresh versions;
    // pre-existing history passes through untouched.
    "q55_scd2" -> ((s, dir) => scd2Fixture(s, dir)),

    // Point-in-time dimension read over the SCD2 history built by q55:
    // "the dimension as it WAS on 2026-03-01" — before the 2026-06-01 batch
    // closed/opened versions, after the 2026-01-01 versions opened. The
    // as-of filter must reconstruct exactly the pre-update current set from
    // the versioned frame (validity windows, not is_current flags).
    "q90_scd2_asof" -> ((s, dir) => {
      Upsert.asOf(scd2Fixture(s, dir), lit("2026-03-01"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // S7 variant-shape extraction (reference rest_api.py:42-55): each nation
    // row becomes a real JSON payload in the wrapper shape
    // {"items":[{...}]}; parse, probe the wrapper field, explode the record
    // array. Oracle = identity on nation (wrap ∘ extract = id).
    "q53_variant_shape" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
      val payload = nat.select(to_json(struct(
        array(struct(col("n_nationkey"), col("n_name"), col("n_regionkey")))
          .as("items"))).as("payload"))
      val parsed = payload.select(from_json(col("payload"),
        lit("items ARRAY<STRUCT<n_nationkey: INT, n_name: STRING, n_regionkey: INT>>"))
        .as("p")).select(col("p.*"))
      Json.extractItems(parsed)
    }),

    // Full SQL-text entry path over a star join (the reference's users live
    // in SQL — databricks-sql): TPC-H Q3-shaped revenue top-k through
    // spark.sql over registered views. Catalyst still broadcasts the pruned
    // customer dim and plans the top-k as TakeOrderedAndProject.
    "q58_sql_star" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v58")
      t(s, dir, "orders").createOrReplaceTempView("orders_v58")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v58")
      s.sql(
        """SELECT o.o_orderkey,
          |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
          |  count(*) AS n_lines
          |FROM customer_v58 c
          |JOIN orders_v58 o ON c.c_custkey = o.o_custkey
          |JOIN lineitem_v58 l ON l.l_orderkey = o.o_orderkey
          |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
          |GROUP BY o.o_orderkey
          |ORDER BY revenue DESC, o_orderkey ASC
          |LIMIT 10""".stripMargin)
    }),

    // A2-A4 fused QC aggregate as one-row SELECT (reference checks.py:16-28,
    // fused into a single scan instead of the reference's pass-per-check):
    // row count, null rate of a derived JSON field, duplicate rate of
    // user_id, with inclusive-bound verdicts. Bounds chosen so the data
    // exercises both pass and fail verdicts.
    "q54_qc_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k"))
      Checks.summaryFrame(ev, minRows = 1000,
        nullCol = "k", maxNullRate = 0.6,
        dupKeys = Seq("user_id"), maxDupRate = 0.9)
    }),

    // Skew-aware equi-join (ops/Skew.joinSkewAware): dispatches per the
    // MEASURED preference order (SCALE.md skew smoke) — on an AQE-skew-
    // capable session (the default) this is the PLAIN join, split at
    // runtime by AQE; the static salt is the fallback when the runtime
    // split is unavailable. Either path must be ANSWER-PRESERVING — the
    // oracle is the plain left join. Left join over a filtered right side
    // exercises the trickiest allowed salt path (unmatched left rows must
    // survive exactly once despite the right side being exploded factor×);
    // SkewSpec proves both dispatch branches.
    "q60_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      Skew.joinSkewAware(li, ord, Seq("l_orderkey"), factor = 8, joinType = "left")
        .groupBy(coalesce(col("o_orderpriority"), lit("UNMATCHED"))
          .as("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Skew-salted two-phase aggregation (ops/Skew.saltedAgg): partial agg on
    // (key, salt), final merge on key — the one-dominant-group fallback when
    // AQE can't split (aggregations, not joins). Oracle is the plain GROUP BY.
    "q61_salted_agg" -> ((s, dir) => {
      Skew.saltedAgg(t(s, dir, "events"), Seq("event_type"), factor = 16,
        partial = Seq(sum(col("value")).as("s"), count(lit(1)).as("c")),
        fin = Seq(round(sum(col("s")), 2).as("total_value"),
          sum(col("c")).as("n_events")))
    }),

    // Bloom-pre-filtered semi join (ops/BloomJoin): the build side's key set
    // rides a native bloom_might_contain predicate that trims the probe side
    // BEFORE its shuffle; the exact semi join on survivors makes the answer
    // identical to the plain IN-subquery oracle (false positives re-checked,
    // false negatives impossible).
    "q76_bloom_semi_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      BloomJoin.semiJoin(li, "l_orderkey", urgent, "o_orderkey",
        expectedItems = 1L << 17)
    }),

    // One-pass table profile: null rates, exact distinct counts, numeric
    // min/max/avg — all columns in a single aggregation (one scan at any
    // scale; plan-asserted in PlanSpec).
    "q91_profile" -> ((s, dir) => {
      Checks.profile(t(s, dir, "events"),
        cols = Seq("user_id", "event_type"), numeric = Seq("value"))
    }),

    // P1-P3 silver cleaning under the gate: exact-duplicate rows deduped,
    // ISO timestamps parsed (unparseable -> NULL via try_to_timestamp, the
    // reference's coerce-errors behavior), defensive cast, audit column
    // stamped then dropped by the gold projection. Duplicates are EXACT
    // copies so dropDuplicates' arbitrary survivor is still deterministic.
    "q82_silver_clean" -> ((s, dir) => {
      val raw0 = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        when(col("c_custkey") % 7 === 0, lit("not-a-date"))
          .otherwise(concat(lit("2024-01-"),
            lpad(((col("c_custkey") % 28) + 1).cast("string"), 2, "0"),
            lit(" 10:30:00"))).as("created_at"),
        concat(col("c_name"), lit("@example.com")).as("email"))
      val raw = raw0.unionAll(raw0.filter(col("c_custkey") % 3 === 0))
      Cleaning.goldDim(Cleaning.cleanCustomers(raw))
        .select(col("id"), col("name"),
          unix_micros(col("created_at")).as("created_us"), col("email"))
    }),

    // K4 warehouse leg, exercised END-TO-END against embedded Derby (the
    // in-harness stand-in for the reference's SQL warehouse,
    // run_load.py:57-96): land the base dimension via executor-parallel
    // spark JDBC write, stage the update batch the same way, run the
    // generated transactional MERGE (update non-keys on match, insert on
    // no-match), drop the stage, and read the warehouse table back through
    // spark.read.jdbc. The oracle recomputes the post-MERGE state in SQL.
    "q97_jdbc_merge" -> ((s, dir) => {
      // keep Derby's boot log out of the repo root
      System.setProperty("derby.stream.error.file",
        QueryTmp.dir("derby_log") + "/derby.log")
      val url = "jdbc:derby:memory:graft_q97;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      // Derby ingest is round-trip-bound: 10x the default JDBC batch size
      // cuts executeBatch calls 10x (same dial a real warehouse load tunes)
      props.setProperty("batchsize", "10000")
      val cust = t(s, dir, "customer").select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
      // a tiny dim doesn't need 32 JDBC connections; a real one sizes this
      // to the warehouse's ingest parallelism
      cust.coalesce(4).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .jdbc(url, "customer_t", props)
      // key index = the PK a real warehouse table has; MERGE nested-loops
      // without it (measured 5x at 15k rows)
      JdbcUpsert.ensureKeyIndex(url, "customer_t", Seq("c_custkey"), props,
        JdbcUpsert.Derby)
      val mods = cust.filter(col("c_custkey") % 6 === 0)
        .withColumn("c_acctbal", round(col("c_acctbal") + 200, 2))
        .withColumn("c_mktsegment", lit("WAREHOUSED"))
      val inserts = cust.filter(col("c_custkey") % 89 === 0)
        .withColumn("c_custkey", col("c_custkey") + lit(3000000L))
      JdbcUpsert.upsert(mods.unionByName(inserts).coalesce(4), url,
        "customer_t", Seq("c_custkey"), props, JdbcUpsert.Derby)
      s.read.jdbc(url, "customer_t", props)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
    }),

    // The reference's WHOLE production loop composed end-to-end: the
    // incremental re-pull (rest_api.py:70-72) arrives as a STREAM of
    // micro-batches (file source, one file per trigger), each micro-batch
    // foreachBatch-MERGEs into the embedded-Derby warehouse
    // (run_load.py:57-96), and the result is the warehouse table read back
    // after the stream drains. Every update key occurs exactly once across
    // the whole update set (mods and offset inserts are disjoint), so the
    // final warehouse state is independent of the file stream's
    // nondeterministic batch order — deterministic under the oracle while
    // still exercising per-micro-batch staged MERGEs through a real
    // checkpointed stream.
    "q101_stream_warehouse" -> ((s, dir) => {
      System.setProperty("derby.stream.error.file",
        QueryTmp.dir("derby_log") + "/derby.log")
      val url = "jdbc:derby:memory:graft_q101;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      // Derby ingest is round-trip-bound: 10x the default JDBC batch size
      // cuts executeBatch calls 10x (same dial a real warehouse load tunes)
      props.setProperty("batchsize", "10000")
      val cust = t(s, dir, "customer").select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
      cust.coalesce(4).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .jdbc(url, "customer_s", props)
      JdbcUpsert.ensureKeyIndex(url, "customer_s", Seq("c_custkey"), props,
        JdbcUpsert.Derby)
      val mods = cust.filter(col("c_custkey") % 6 === 0)
        .withColumn("c_acctbal", round(col("c_acctbal") + 300, 2))
        .withColumn("c_mktsegment", lit("RESTREAMED"))
      val inserts = cust.filter(col("c_custkey") % 83 === 0)
        .withColumn("c_custkey", col("c_custkey") + lit(5000000L))
      val tmp = QueryTmp.dir("q101")
      mods.unionByName(inserts).repartition(3).write.parquet(s"$tmp/in")
      val schema = s.read.parquet(s"$tmp/in").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      // replay-scale state/shuffle sizing — same rationale as StreamQueries
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        math.min(prevParts.toInt, 8).toString)
      try {
        val q = graft.streaming.Streaming.jdbcUpsertStream(stream, url,
          "customer_s", Seq("c_custkey"), props, JdbcUpsert.Derby,
          s"$tmp/ckpt").start()
        require(q.awaitTermination(300000), s"stream drain timed out: $tmp")
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.jdbc(url, "customer_s", props)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
    }),

    // K5 load plan: the declarative per-run upsert loop over two tables,
    // driven end-to-end through parquet targets; both tables' final states
    // are unioned (tagged) so the oracle checks the whole plan's effect.
    "q83_load_plan" -> ((s, dir) => {
      val root = QueryTmp.dir("q83")
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      cust.write.parquet(s"$root/cust")
      ord.write.parquet(s"$root/ord")
      val updates = Map(
        "cust" -> cust.filter(col("c_custkey") % 5 === 0)
          .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2)),
        "ord" -> ord.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", round(col("o_totalprice") + 50, 2)))
      Upsert.runLoadPlan(
        Seq(Upsert.LoadSpec("cust", Seq("c_custkey")),
          Upsert.LoadSpec("ord", Seq("o_orderkey"))),
        readTarget = n => s.read.parquet(s"$root/$n"),
        readUpdates = n => updates(n),
        writeTarget = (n, df) => df.write.parquet(s"$root/${n}_out"))
      s.read.parquet(s"$root/cust_out")
        .select(lit("cust").as("tbl"), col("c_custkey").as("k"),
          round(col("c_acctbal"), 2).as("v"))
        .unionAll(s.read.parquet(s"$root/ord_out")
          .select(lit("ord").as("tbl"), col("o_orderkey").as("k"),
            round(col("o_totalprice"), 2).as("v")))
    })
  )

  val oracle: Map[String, String] = Map(
    "q52_upsert" ->
      """WITH mods AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    round(c_acctbal + 100, 2) AS c_acctbal, 'UPSERTED' AS c_mktsegment
        |  FROM customer WHERE c_custkey % 5 = 0),
        |ins AS (
        |  SELECT c_custkey + 1000000 AS c_custkey, c_name, c_nationkey,
        |    c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 97 = 0),
        |u AS (SELECT * FROM mods UNION ALL SELECT * FROM ins)
        |SELECT coalesce(t.c_custkey, u.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        |  round(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END, 2) AS c_acctbal,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM customer t FULL OUTER JOIN u ON t.c_custkey = u.c_custkey""".stripMargin,
    "q97_jdbc_merge" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    round(c_acctbal, 2) AS c_acctbal, c_mktsegment
        |  FROM customer),
        |mods AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    round(c_acctbal + 200, 2) AS c_acctbal, 'WAREHOUSED' AS c_mktsegment
        |  FROM base WHERE c_custkey % 6 = 0),
        |ins AS (
        |  SELECT c_custkey + 3000000 AS c_custkey, c_name, c_nationkey,
        |    c_acctbal, c_mktsegment
        |  FROM base WHERE c_custkey % 89 = 0),
        |u AS (SELECT * FROM mods UNION ALL SELECT * FROM ins)
        |SELECT coalesce(t.c_custkey, u.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        |  round(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END, 2) AS c_acctbal,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM base t FULL OUTER JOIN u ON t.c_custkey = u.c_custkey""".stripMargin,
    "q101_stream_warehouse" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    round(c_acctbal, 2) AS c_acctbal, c_mktsegment
        |  FROM customer),
        |mods AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    round(c_acctbal + 300, 2) AS c_acctbal, 'RESTREAMED' AS c_mktsegment
        |  FROM base WHERE c_custkey % 6 = 0),
        |ins AS (
        |  SELECT c_custkey + 5000000 AS c_custkey, c_name, c_nationkey,
        |    c_acctbal, c_mktsegment
        |  FROM base WHERE c_custkey % 83 = 0),
        |u AS (SELECT * FROM mods UNION ALL SELECT * FROM ins)
        |SELECT coalesce(t.c_custkey, u.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        |  round(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END, 2) AS c_acctbal,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM base t FULL OUTER JOIN u ON t.c_custkey = u.c_custkey""".stripMargin,
    "q55_scd2" ->
      """WITH cust AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
        |cur AS (SELECT c_custkey, c_name, c_mktsegment,
        |  '2026-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
        |  TRUE AS is_current FROM cust),
        |hist AS (SELECT c_custkey, c_name, 'OLD' AS c_mktsegment,
        |  '2025-01-01' AS valid_from, '2026-01-01' AS valid_to,
        |  FALSE AS is_current FROM cust WHERE c_custkey % 11 = 0),
        |upd AS (
        |  SELECT c_custkey, c_name, 'MOVED' AS c_mktsegment
        |  FROM cust WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_mktsegment
        |  FROM cust WHERE c_custkey % 13 = 0 AND c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 2000000 AS c_custkey, c_name, c_mktsegment
        |  FROM cust WHERE c_custkey % 97 = 0),
        |j AS (SELECT cur.c_custkey AS tk, cur.c_name AS tn, cur.c_mktsegment AS tm,
        |             cur.valid_from AS vf, cur.valid_to AS vt, cur.is_current AS ic,
        |             upd.c_custkey AS uk, upd.c_name AS un, upd.c_mktsegment AS um,
        |             (cur.c_custkey IS NOT NULL) AS in_t, (upd.c_custkey IS NOT NULL) AS in_u
        |      FROM cur FULL OUTER JOIN upd ON cur.c_custkey = upd.c_custkey),
        |chg AS (SELECT *,
        |  ((tn IS DISTINCT FROM un) OR (tm IS DISTINCT FROM um)) AS changed FROM j)
        |SELECT c_custkey, c_name, c_mktsegment, valid_from, valid_to, is_current FROM hist
        |UNION ALL
        |SELECT tk, tn, tm, vf, '2026-06-01', FALSE FROM chg
        |WHERE in_t AND in_u AND changed
        |UNION ALL
        |SELECT tk, tn, tm, vf, vt, ic FROM chg
        |WHERE in_t AND (NOT in_u OR NOT changed)
        |UNION ALL
        |SELECT uk, un, um, '2026-06-01', CAST(NULL AS VARCHAR), TRUE FROM chg
        |WHERE in_u AND (NOT in_t OR changed)""".stripMargin,
    "q53_variant_shape" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q58_sql_star" ->
      """SELECT o.o_orderkey,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
        |GROUP BY o.o_orderkey
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q54_qc_agg" ->
      """WITH x AS (SELECT json_extract_string(props, '$.k') AS k, user_id FROM events),
        |a AS (SELECT count(*) AS n_rows,
        |  avg(CASE WHEN k IS NULL THEN 1.0 ELSE 0.0 END) AS nr,
        |  count(DISTINCT user_id) AS nd FROM x)
        |SELECT n_rows,
        |  round(coalesce(nr, 0.0), 6) AS null_rate,
        |  round(CASE WHEN n_rows = 0 THEN 0.0 ELSE (n_rows - nd)::DOUBLE / n_rows END, 6) AS dup_rate,
        |  n_rows >= 1000 AS min_rows_ok,
        |  coalesce(nr, 0.0) <= 0.6 AS null_rate_ok,
        |  (CASE WHEN n_rows = 0 THEN 0.0 ELSE (n_rows - nd)::DOUBLE / n_rows END) <= 0.9 AS dup_rate_ok
        |FROM a""".stripMargin,
    "q60_salted_join" ->
      """SELECT coalesce(o.o_orderpriority, 'UNMATCHED') AS o_orderpriority,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o
        |  ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q61_salted_agg" ->
      """SELECT event_type,
        |  round(sum(value), 2) AS total_value,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY 1""".stripMargin,
    "q76_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q91_profile" ->
      """SELECT count(*) AS n_rows,
        |  round(avg(CASE WHEN user_id IS NULL THEN 1.0 ELSE 0.0 END), 6) AS user_id_null_rate,
        |  count(DISTINCT user_id) AS user_id_nd,
        |  round(avg(CASE WHEN event_type IS NULL THEN 1.0 ELSE 0.0 END), 6) AS event_type_null_rate,
        |  count(DISTINCT event_type) AS event_type_nd,
        |  round(min(value), 6) AS value_min,
        |  round(max(value), 6) AS value_max,
        |  round(avg(value), 6) AS value_avg
        |FROM events""".stripMargin,
    // as-of 2026-03-01: every original key's pre-update current version —
    // i.e. exactly the customer table (history windows ended 2026-01-01,
    // the update batch opened 2026-06-01)
    "q90_scd2_asof" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "q82_silver_clean" ->
      """SELECT c_custkey AS id, c_name AS name,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL
        |       ELSE epoch_us(CAST('2024-01-' ||
        |         lpad(CAST((c_custkey % 28) + 1 AS VARCHAR), 2, '0') ||
        |         ' 10:30:00' AS TIMESTAMP)) END AS created_us,
        |  c_name || '@example.com' AS email
        |FROM customer""".stripMargin,
    "q83_load_plan" ->
      """SELECT 'cust' AS tbl, c_custkey AS k,
        |  round(CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 100, 2)
        |             ELSE c_acctbal END, 2) AS v
        |FROM customer
        |UNION ALL
        |SELECT 'ord', o_orderkey,
        |  round(CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 50, 2)
        |             ELSE o_totalprice END, 2)
        |FROM orders""".stripMargin
  )
}
