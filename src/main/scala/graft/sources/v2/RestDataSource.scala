package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Transport for one page pull: params → raw JSON record strings. The
  * implementing class is named in the `fetcher` option and instantiated
  * per executor (no-arg constructor) — connections are opened executor-side,
  * never serialized from the driver. The harness is zero-egress, so tests
  * plug in fixture fetchers; a production HTTP fetcher is one class. */
trait PageFetcher extends Serializable {
  def fetch(params: Map[String, String]): Seq[String]
}

/** A [[PageFetcher]] that needs reader options (base URL, auth profile,
  * fixture path, …). `configure` is called executor-side right after the
  * no-arg instantiation, with the full option map of the scan. */
trait ConfigurablePageFetcher extends PageFetcher {
  def configure(opts: Map[String, String]): Unit
}

/** DataSource V2 REST source (SURVEY §2.1 S4/S5): the page-numbered
  * pagination protocol of the reference extractor (reference
  * `rest_api.py:58-93`) is splittable, so each Spark `InputPartition` owns a
  * page RANGE and executors pull ranges in parallel — removing the
  * reference's sequential ≤2,500 rows/s bound. Output schema is one string
  * column `value` (the raw record), parsed downstream with `from_json` —
  * bronze stays schema-free exactly like the reference's JSONL landing.
  *
  * Supported options: `fetcher` (class name, required), `pages` (total page
  * count to plan, default 64), `pagesPerPartition` (default 8), `pageParam`,
  * `perPageParam`, `pageSize`, and `updatedSince`/`updatedSinceParam` for
  * the incremental pull (reference `rest_api.py:70-72`).
  *
  * Limit pushdown: `df.limit(n)` plans only ceil(n/pageSize) pages — the
  * engine-side form of the reference's `maxresults` cap
  * (`endpoints.yml:49`).
  *
  * Usage: `spark.read.format("graft.sources.v2.RestDataSource")
  *   .option("fetcher", classOf[MyFetcher].getName).load()`.
  */
class RestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestTable(properties.asScala.toMap)
}

object RestDataSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType, nullable = false)))
}

final class RestTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"rest(${props.getOrElse("fetcher", "?")})"
  override def schema(): StructType = RestDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(props ++ options.asScala)
}

final class RestScanBuilder(opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Option[Int] = None

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  override def build(): Scan = {
    val pageSize = opts.getOrElse("pageSize", "500").toInt
    val pages = opts.getOrElse("pages", "64").toInt
    val planned = limit match {
      case Some(l) => math.min(pages, (l + pageSize - 1) / pageSize)
      case None => pages
    }
    new RestScan(opts, planned, pageSize)
  }
}

final class RestScan(opts: Map[String, String], pages: Int, pageSize: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = RestDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val perPart = opts.getOrElse("pagesPerPartition", "8").toInt
    (1 to pages by perPart).map { start =>
      RestInputPartition(start, math.min(start + perPart - 1, pages))
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(opts)
}

final case class RestInputPartition(startPage: Int, endPage: Int) extends InputPartition

final class RestReaderFactory(opts: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RestInputPartition]
    new RestPartitionReader(opts, part.startPage, part.endPage)
  }
}

final class RestPartitionReader(opts: Map[String, String], startPage: Int, endPage: Int)
    extends PartitionReader[InternalRow] {

  private val fetcher: PageFetcher = {
    val f = Class.forName(opts("fetcher"))
      .getDeclaredConstructor().newInstance().asInstanceOf[PageFetcher]
    f match {
      case c: ConfigurablePageFetcher => c.configure(opts)
      case _ => ()
    }
    f
  }

  private def params(page: Int): Map[String, String] = {
    val base = Map(
      opts.getOrElse("pageParam", "page") -> page.toString,
      opts.getOrElse("perPageParam", "per_page") -> opts.getOrElse("pageSize", "500"))
    opts.get("updatedSince") match {
      case Some(since) =>
        base + (opts.getOrElse("updatedSinceParam", "updated_since") -> since)
      case None => base
    }
  }

  private var page = startPage
  private var current: Iterator[String] = Iterator.empty
  private var exhausted = false

  override def next(): Boolean = {
    while (!current.hasNext && !exhausted) {
      if (page > endPage) { exhausted = true }
      else {
        val batch = fetcher.fetch(params(page))
        page += 1
        // empty page ⇒ no further pages have data (reference rest_api.py:82-83)
        if (batch.isEmpty) exhausted = true else current = batch.iterator
      }
    }
    current.hasNext
  }

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current.next()))

  override def close(): Unit = ()
}
