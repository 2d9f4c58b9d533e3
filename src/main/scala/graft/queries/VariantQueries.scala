package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.VariantShred
import graft.ext.VariantShred.ShredSpec
import graft.model.Tables

/** Round-16 VARIANT surface: open-schema semi-structured columns end to
  * end — `parse_json` ingestion of the reference's variant-shape JSON
  * (`rest_api.py:42-55` accepts a raw object, `{"data": [...]}`, or
  * `{"items": [...]}`), `variant_get` typed path extraction,
  * `schema_of_variant` shape discovery, LATERAL `variant_explode` key
  * enumeration, and [[graft.ext.VariantShred]] shredded-stats file
  * pruning for a hot extraction path.
  *
  * All three shapes are DERIVED deterministically from the `events`
  * table (event_type selects the wrapper; the payload carries `props.k`
  * and integer cents from `value`), so the DuckDB oracle reconstructs
  * every answer from the raw columns with `json_extract` — exactly the
  * "switch engines, same answers" contract.
  */
object VariantQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def tmp(name: String): String = QueryTmp.dir(name)

  /** The multi-shape variant column over events: click rows arrive as
    * `{"data": [payload]}`, view rows as `{"items": [payload]}`, the rest
    * as the raw payload object `{"cents": C, "k": K}` — the three API
    * response shapes the reference's `_parse_items` normalizes
    * (`rest_api.py:42-55`). Integer-only payloads keep
    * `schema_of_variant` value-independent (BIGINT, never a
    * value-sized DECIMAL). */
  private[queries] def variantEvents(s: SparkSession, dir: String,
                                     uniform: Boolean = false): DataFrame = {
    val ev = t(s, dir, "events")
    val k = get_json_object(col("props"), "$.k").cast("long")
    val cents = round(col("value") * 100).cast("long")
    val body = concat(lit("{\"cents\": "), cents, lit(", \"k\": "), k,
      lit("}"))
    val js =
      if (uniform) body
      else when(col("event_type") === "click",
          concat(lit("{\"data\": ["), body, lit("]}")))
        .when(col("event_type") === "view",
          concat(lit("{\"items\": ["), body, lit("]}")))
        .otherwise(body)
    ev.withColumn("v", parse_json(js))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // VARIANT EXTRACTION (q265): parse_json over the three wire shapes,
    // schema_of_variant naming each row's discovered shape, and one
    // coalesce of variant_get typed path extractions normalizing all
    // three into (k, cents) — the reference's _parse_items semantics
    // expressed as open-schema paths instead of static from_json
    // schemas. Columnar end to end: parse_json/variant_get are codegen
    // expressions, no UDF, no shuffle.
    "q265_variant_extract" -> ((s, dir) => {
      val ve = variantEvents(s, dir)
      ve.select(
        col("event_id"),
        schema_of_variant(col("v")).as("v_schema"),
        coalesce(
          variant_get(col("v"), "$.k", "bigint"),
          variant_get(col("v"), "$.data[0].k", "bigint"),
          variant_get(col("v"), "$.items[0].k", "bigint")).as("k_norm"),
        coalesce(
          variant_get(col("v"), "$.cents", "bigint"),
          variant_get(col("v"), "$.data[0].cents", "bigint"),
          variant_get(col("v"), "$.items[0].cents", "bigint"))
          .as("cents_norm"))
    }),

    // SHREDDED-STATS PRUNING (q266): the normalized variant table is
    // written range-clustered on the hot path `$.k` with physical
    // shredded columns ([[VariantShred.shredWrite]]), the per-file
    // min/max manifest comes from parquet FOOTERS (zero data scan), and
    // a path predicate k ∈ [25, 34] plans a scan over only the
    // intersecting files. Gate: the pruned read touched strictly fewer
    // files than the layout holds — a path predicate SKIPS files on
    // shredded stats alone. Exactness never depends on the stats: the
    // physical-column residual filter re-checks every surviving row.
    "q266_variant_shred_prune" -> ((s, dir) => {
      val root = tmp("q266")
      val shreds = Seq(ShredSpec("k", "$.k", "bigint"),
        ShredSpec("cents", "$.cents", "bigint"))
      FixtureCache.layout(s, s"q266:$dir", s"$root/shred") { d =>
        VariantShred.shredWrite(
          variantEvents(s, dir, uniform = true).select("event_id", "v"),
          "v", shreds, d, nFiles = 16)
      }
      val mf = VariantShred.manifest(s, s"$root/shred", shreds)
        .localCheckpoint()
      val pr = VariantShred.prunedRead(s, s"$root/shred", mf, "k", 25L, 34L)
      require(pr.filesRead < pr.filesTotal,
        s"q266 shredded stats pruned nothing: read ${pr.filesRead} of " +
          s"${pr.filesTotal} files")
      pr.df.select(
        col("event_id"),
        variant_get(col("v"), "$.k", "bigint").as("k"),
        variant_get(col("v"), "$.cents", "bigint").as("cents"),
        lit(true).as("shred_pruned_ok"))
    }),

    // VARIANT THROUGH THE LAKE STACK (q272): a VARIANT column as a
    // first-class lake table column — declared in CREATE TABLE (the
    // schema JSON round-trips VariantType), loaded by a schema-on-write
    // INSERT, carried byte-faithfully through a typed DELETE's survivor
    // rewrite, pinned by time travel, and served back through
    // variant_get path extraction — the open-schema column composing
    // with every versioned-table guarantee instead of living outside
    // them. Gates: the DELETE removed exactly the band (ids are dense
    // from 0), and the pre-delete version still serves every row.
    "q272_variant_lake_table" -> ((s, dir) => {
      import graft.sql.LakeSql
      val root = tmp("q272")
      LakeSql.unregister("ev272")
      LakeSql.sql(s,
        s"""CREATE TABLE ev272 (event_id BIGINT, v VARIANT)
           |USING lake LOCATION '$root'
           |TBLPROPERTIES ('stats_cols' = 'event_id', 'files' = '8')"""
          .stripMargin)
      variantEvents(s, dir).select(col("event_id"), col("v"))
        .createOrReplaceTempView("q272_src")
      LakeSql.sql(s, "INSERT INTO ev272 SELECT event_id, v FROM q272_src")
      val n = t(s, dir, "events").count()
      val cut = n / 10
      val d = LakeSql.sql(s,
        s"DELETE FROM ev272 WHERE event_id < $cut").head()
      val deleteOk = d.getAs[Long]("rows_deleted") == cut
      require(deleteOk, s"q272 band delete removed " +
        s"${d.getAs[Long]("rows_deleted")} rows, expected $cut: $d")
      val travelOk = LakeSql.sql(s,
        "SELECT count(*) AS c FROM ev272 VERSION AS OF 2")
        .head().getLong(0) == n
      require(travelOk, "q272 pre-delete version lost rows")
      LakeSql.sql(s,
        """SELECT event_id,
          |  coalesce(variant_get(v, '$.k', 'bigint'),
          |           variant_get(v, '$.data[0].k', 'bigint'),
          |           variant_get(v, '$.items[0].k', 'bigint')) AS k,
          |  coalesce(variant_get(v, '$.cents', 'bigint'),
          |           variant_get(v, '$.data[0].cents', 'bigint'),
          |           variant_get(v, '$.items[0].cents', 'bigint')) AS cents
          |FROM ev272""".stripMargin)
        .withColumn("delete_ok", lit(deleteOk))
        .withColumn("travel_ok", lit(travelOk))
    }),

    // GENERATED SHRED COLUMN (q275): the q266 shredding idea expressed
    // as TABLE SCHEMA — a `GENERATED ALWAYS AS (variant_get(...))`
    // column materializes the hot path at every write (engine-assigned:
    // an INSERT supplying it is rejected), and because it is also a
    // stats column, the TYPED DML COMPILER prunes on it: a DELETE WHERE
    // on the shredded value rewrites only manifest-intersecting files.
    // This is the declarative end-state of variant shredding — the
    // schema says which path is hot, every writer keeps it materialized,
    // every reader/DML prunes on it. Gates: explicit k rejected;
    // the DELETE's touch set was pruned; row count exact.
    "q275_variant_generated_shred" -> ((s, dir) => {
      import graft.sql.LakeSql
      val root = tmp("q275")
      LakeSql.unregister("ev275")
      LakeSql.sql(s,
        s"""CREATE TABLE ev275 (event_id BIGINT, v VARIANT,
           |  k BIGINT GENERATED ALWAYS AS (variant_get(v, '$$.k', 'bigint')),
           |  cents BIGINT GENERATED ALWAYS AS
           |    (variant_get(v, '$$.cents', 'bigint')))
           |USING lake LOCATION '$root'
           |TBLPROPERTIES ('stats_cols' = 'k,event_id', 'files' = '8')"""
          .stripMargin)
      variantEvents(s, dir, uniform = true).select(col("event_id"), col("v"))
        .createOrReplaceTempView("q275_src")
      // engine-assigned: a batch supplying k is rejected loudly
      val rejectOk = scala.util.Try(LakeSql.sql(s,
        "INSERT INTO ev275 SELECT event_id, v, 0L AS k FROM q275_src"))
        .isFailure
      require(rejectOk, "q275 explicit GENERATED column landed")
      LakeSql.sql(s, "INSERT INTO ev275 SELECT event_id, v FROM q275_src")
      // typed DML prunes on the shredded stats column
      val d = LakeSql.sql(s,
        "DELETE FROM ev275 WHERE k BETWEEN 90 AND 99").head()
      val prunedOk = d.getAs[Long]("files_rewritten") > 0 &&
        d.getAs[Long]("files_rewritten") < d.getAs[Long]("files_total")
      require(prunedOk, s"q275 shred-column delete did not prune: $d")
      LakeSql.sql(s, "SELECT event_id, k, cents FROM ev275")
        .withColumn("reject_ok", lit(rejectOk))
        .withColumn("pruned_ok", lit(prunedOk))
    }),

    // SCHEMA DISCOVERY (q267): LATERAL variant_explode through plain
    // spark.sql enumerates every top-level key of the open-schema
    // column — the "what shapes are in this feed?" question asked
    // before committing to a static schema. Map-side generate + one
    // hash aggregation; key cardinality is shape-bounded, never
    // row-bounded.
    "q267_variant_keys" -> ((s, dir) => {
      val view = s"v267_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      variantEvents(s, dir).createOrReplaceTempView(view)
      val out = s.sql(
        s"""SELECT t.key, count(*) AS n
           |FROM $view, LATERAL variant_explode(v) AS t
           |GROUP BY t.key""".stripMargin)
      out.localCheckpoint() // pin rows before the view name is dropped
      s.catalog.dropTempView(view)
      out
    })
  )

  val oracle: Map[String, String] = Map(
    // q265: the three schema strings are deterministic per shape
    // (integer-only payload, lexical key order in schema_of_variant),
    // so the oracle maps event_type straight to the literal; paths
    // replay with json_extract. round(value*100) is the identical IEEE
    // double op in both engines (the q120 discipline).
    "q265_variant_extract" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'click'
        |         THEN 'OBJECT<data: ARRAY<OBJECT<cents: BIGINT, k: BIGINT>>>'
        |       WHEN event_type = 'view'
        |         THEN 'OBJECT<items: ARRAY<OBJECT<cents: BIGINT, k: BIGINT>>>'
        |       ELSE 'OBJECT<cents: BIGINT, k: BIGINT>' END AS v_schema,
        |  json_extract(props, '$.k')::BIGINT AS k_norm,
        |  round(value * 100)::BIGINT AS cents_norm
        |FROM events""".stripMargin,
    // q266: the pruned scan's residual makes the answer the plain
    // band filter; the gate column asserts files were skipped.
    "q266_variant_shred_prune" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::BIGINT AS k,
        |  round(value * 100)::BIGINT AS cents,
        |  TRUE AS shred_pruned_ok
        |FROM events
        |WHERE json_extract(props, '$.k')::BIGINT BETWEEN 25 AND 34""".stripMargin,
    // q272: dense ids from 0 make the band the first count//10 ids; the
    // emitted table is everything above the cut, paths replayed with
    // json_extract.
    "q272_variant_lake_table" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::BIGINT AS k,
        |  round(value * 100)::BIGINT AS cents,
        |  TRUE AS delete_ok, TRUE AS travel_ok
        |FROM events
        |WHERE event_id >= (SELECT count(*) // 10 FROM events)""".stripMargin,
    // q275: the generated columns are the json paths; the delete removes
    // the top k band.
    "q275_variant_generated_shred" ->
      """SELECT event_id,
        |  json_extract(props, '$.k')::BIGINT AS k,
        |  round(value * 100)::BIGINT AS cents,
        |  TRUE AS reject_ok, TRUE AS pruned_ok
        |FROM events
        |WHERE json_extract(props, '$.k')::BIGINT NOT BETWEEN 90 AND 99"""
        .stripMargin,
    // q267: key frequencies follow the shape mix exactly — wrapper keys
    // from the wrapped rows, payload keys from the raw rows.
    "q267_variant_keys" ->
      """SELECT 'data' AS key, count(*) AS n FROM events
        |WHERE event_type = 'click'
        |UNION ALL
        |SELECT 'items', count(*) FROM events WHERE event_type = 'view'
        |UNION ALL
        |SELECT 'cents', count(*) FROM events
        |WHERE event_type NOT IN ('click', 'view')
        |UNION ALL
        |SELECT 'k', count(*) FROM events
        |WHERE event_type NOT IN ('click', 'view')""".stripMargin
  )
}
