package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config-driven paginated REST source (SURVEY §2.1 S4/S5/S6).
  *
  * Models the reference's extraction layer — page-numbered pagination with
  * empty-page / short-page / max-pages stop conditions (reference
  * `rest_api.py:58-93`) and the `updated_since` incremental pull (reference
  * `rest_api.py:20-26,70-72`, `endpoints.yml:26-29`) — with the transport
  * injected as a function, so the engine stays network-free (the harness has
  * zero egress) and tests drive it with fixtures.
  *
  * Two execution shapes:
  *  - [[RestSource.fetchAll]]: sequential driver-side page loop, the
  *    reference's own shape (fine for small config-table pulls).
  *  - [[RestSource.toDF]]: distributed — the page-numbered protocol is
  *    splittable, so page ranges become Spark partitions and each executor
  *    pulls its own range in parallel. This removes the reference's
  *    ≤2,500 rows/s sequential bound (BASELINE.md) — with P parallel
  *    partitions throughput scales ~P× until the API rate-limits.
  */
final case class PagePagination(
    pageParam: String = "page",
    perPageParam: String = "per_page",
    pageSize: Int = 500,
    maxPages: Int = 10000)

final case class IncrementalConfig(
    param: String = "updated_since",
    fromDaysAgo: Int = 7) {
  /** ISO date n days back (reference `rest_api.py:70-72`). */
  def sinceDate(today: LocalDate): String = today.minusDays(fromDaysAgo.toLong).toString
}

/** One endpoint of a config catalog (reference `endpoints.yml:4-52`). */
final case class EndpointSpec(
    name: String,
    pagination: PagePagination = PagePagination(),
    incremental: Option[IncrementalConfig] = None)

final class RestSource(
    spec: EndpointSpec,
    fetchPage: Map[String, String] => Seq[String], // params => page of JSON record strings
    today: LocalDate = LocalDate.now()) extends Serializable {

  private def params(page: Int): Map[String, String] = {
    val base = Map(
      spec.pagination.pageParam -> page.toString,
      spec.pagination.perPageParam -> spec.pagination.pageSize.toString)
    spec.incremental.fold(base)(inc => base + (inc.param -> inc.sinceDate(today)))
  }

  /** Sequential page loop with the reference's stop conditions
    * (`rest_api.py:82-83,88-90`): stop on empty page, after a short page,
    * or at maxPages. */
  def fetchAll(): Iterator[String] =
    Iterator.from(1)
      .takeWhile(_ <= spec.pagination.maxPages)
      .map(p => fetchPage(params(p)))
      .takeWhile(_.nonEmpty)
      .flatMap { page =>
        // short page = last page: emit it, then the next (empty) fetch stops us.
        page
      }

  /** Distributed read: split `pageCount` pages across `parallelism` Spark
    * partitions; each executor fetches its own page range. `fetchPage` must
    * be serializable (it closes over connection config, not connections). */
  def toDF(spark: SparkSession, pageCount: Int, parallelism: Int = 8): DataFrame = {
    import spark.implicits._
    // Params are pure config — compute them driver-side per page so the
    // closure ships only (params, fetchPage), never `this`.
    val pageParams = (1 to math.min(pageCount, spec.pagination.maxPages)).map(params)
    val pages = spark.sparkContext.parallelize(pageParams, parallelism)
    val fetch = fetchPage
    val lines = pages.flatMap(fetch)
    spark.read.json(lines.toDS())
  }

  /** JSONL serialization of a record batch, byte-compatible with the
    * reference's bronze landing format: one JSON per line, trailing newline,
    * empty batch → empty string (reference `rest_api.py:96-100`). */
}

object RestSource {
  def toJsonl(records: Seq[String]): String =
    if (records.isEmpty) "" else records.mkString("", "\n", "\n")
}
