package graft.sources

import java.time.LocalDate

import graft.SparkSpec

class RestSpec extends SparkSpec {

  private def record(i: Int) = RestSpec.record(i)

  /** Fake transport: `total` records served in pageSize chunks. Built in the
    * companion so the closure is serializable (no suite capture). */
  private def pagedFetcher(total: Int, pageSize: Int): Map[String, String] => Seq[String] =
    RestSpec.pagedFetcher(total, pageSize)

  test("S4: stops on empty page; collects all records") {
    val spec = EndpointSpec("customers", PagePagination(pageSize = 10))
    val src = new RestSource(spec, pagedFetcher(25, 10))
    val got = src.fetchAll().toSeq
    assert(got.size == 25)
    assert(got.head == record(0) && got.last == record(24))
  }

  test("S4: exact multiple of page size terminates (empty page stop)") {
    val spec = EndpointSpec("customers", PagePagination(pageSize = 10))
    val src = new RestSource(spec, pagedFetcher(20, 10))
    assert(src.fetchAll().size == 20)
  }

  test("S4: maxPages guard bounds the pull") {
    val spec = EndpointSpec("customers", PagePagination(pageSize = 10, maxPages = 2))
    val src = new RestSource(spec, pagedFetcher(1000, 10))
    assert(src.fetchAll().size == 20)
  }

  test("S5: incremental config adds updated_since = today - n days") {
    var seen: Map[String, String] = Map.empty
    val spec = EndpointSpec("payments",
      PagePagination(pageSize = 10),
      incremental = Some(IncrementalConfig(fromDaysAgo = 7)))
    val src = new RestSource(spec,
      params => { seen = params; Seq.empty },
      today = LocalDate.of(2026, 1, 10))
    src.fetchAll().size
    assert(seen("updated_since") == "2026-01-03")
    assert(seen("per_page") == "10")
  }

  test("S4 distributed: page ranges parallelize across partitions") {
    val spec = EndpointSpec("customers", PagePagination(pageSize = 10))
    val src = new RestSource(spec, pagedFetcher(100, 10))
    val df = src.toDF(spark, pageCount = 10, parallelism = 4)
    assert(df.count() == 100)
    assert(df.columns.toSet == Set("id"))
  }

  test("JSONL serialization: trailing newline, empty batch is empty string") {
    assert(RestSource.toJsonl(Seq.empty) == "")
    assert(RestSource.toJsonl(Seq("""{"a":1}""", """{"b":2}""")) ==
      "{\"a\":1}\n{\"b\":2}\n")
  }
}

object RestSpec {
  def record(i: Int): String = s"""{"id": $i}"""

  def pagedFetcher(total: Int, pageSize: Int): Map[String, String] => Seq[String] =
    params => {
      val page = params("page").toInt
      val start = (page - 1) * pageSize
      (start until math.min(start + pageSize, total)).map(record)
    }
}
