package graft.sources.v2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Fixture transport: 3 pages × 4 records, deterministic; records echo the
  * incremental param so pushdown is observable. Must be a top-level class
  * (instantiated by name on executors). */
class FixtureFetcher extends PageFetcher {
  override def fetch(params: Map[String, String]): Seq[String] = {
    val page = params("page").toInt
    val since = params.get("updated_since")
    if (page > 3) Seq.empty
    else (1 to 4).map { i =>
      val id = (page - 1) * 4 + i
      s"""{"id":$id,"page":$page,"since":"${since.getOrElse("")}"}"""
    }
  }
}

/** Counts pages actually fetched (static so executor + driver share in
  * local mode). */
object CountingFetcher { @volatile var pagesFetched: Int = 0 }
class CountingFetcher extends PageFetcher {
  override def fetch(params: Map[String, String]): Seq[String] = {
    CountingFetcher.pagesFetched += 1
    val page = params("page").toInt
    if (page > 100) Seq.empty
    else (1 to 2).map(i => s"""{"id":${(page - 1) * 2 + i}}""")
  }
}

class RestDataSourceSpec extends SparkSpec {

  private def read(extra: (String, String)*) = {
    val base = spark.read.format(classOf[RestDataSource].getName)
      .option("fetcher", classOf[FixtureFetcher].getName)
      .option("pages", "6")
      .option("pagesPerPartition", "2")
      .option("pageSize", "4")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("reads all pages across partitioned page ranges; empty page stops") {
    val df = read()
    val parsed = df.select(from_json(col("value"),
      StructType(Seq(StructField("id", LongType), StructField("page", LongType))))
      .as("r")).select("r.id", "r.page")
    val ids = parsed.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (1L to 12L)) // 3 real pages x 4 records; pages 4-6 empty
  }

  test("incremental option threads updated_since into every page request") {
    val df = read("updatedSince" -> "2024-01-05")
    val sinces = df.select(get_json_object(col("value"), "$.since").as("s"))
      .distinct().collect().map(_.getString(0)).toSeq
    assert(sinces == Seq("2024-01-05"))
  }

  test("limit pushdown plans only the pages the limit needs") {
    CountingFetcher.pagesFetched = 0
    val df = spark.read.format(classOf[RestDataSource].getName)
      .option("fetcher", classOf[CountingFetcher].getName)
      .option("pages", "100")
      .option("pagesPerPartition", "1")
      .option("pageSize", "2")
      .load()
      .limit(4) // 4 records / 2 per page => 2 pages
    assert(df.count() == 4)
    assert(CountingFetcher.pagesFetched <= 4) // 2 planned pages (+ slack), not 100
  }

  test("multiple input partitions are planned from page ranges") {
    val df = read()
    assert(df.rdd.getNumPartitions == 3) // 6 pages / 2 per partition
  }
}
