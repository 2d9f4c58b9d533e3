package graft.sources.v2

import scala.io.Source

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Fixture transport for the DSv2 REST source: serves a JSONL directory
  * (e.g. a [[graft.sinks.Sinks.writeJsonl]] output) as a paginated API.
  * Stands in for an HTTP fetcher in the zero-egress harness — the page
  * protocol, partition planning, and executor-side instantiation under test
  * are exactly those a production fetcher would ride.
  *
  * Every reader instance lists the part files SORTED BY NAME so page slices
  * are identical across the parallel partition readers (each executor pages
  * independently — consistent ordering is what makes page ranges disjoint).
  * Bounded by construction: a fixture file, not a table.
  */
final class JsonlFilePageFetcher extends ConfigurablePageFetcher {
  private var path: String = _
  private var pageSize: Int = 500
  private var pageParam: String = "page"

  override def configure(opts: Map[String, String]): Unit = {
    path = opts.getOrElse("fixturePath",
      throw new IllegalArgumentException("JsonlFilePageFetcher needs fixturePath"))
    pageSize = opts.getOrElse("pageSize", "500").toInt
    pageParam = opts.getOrElse("pageParam", "page")
  }

  /** All records in deterministic (file-name, line) order; read once per
    * reader via Hadoop FS so any lake scheme works. */
  private lazy val records: Vector[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val files = fs.listStatus(p).map(_.getPath)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .sortBy(_.getName)
    files.iterator.flatMap { f =>
      val in = fs.open(f)
      try Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    }.toVector
  }

  override def fetch(params: Map[String, String]): Seq[String] = {
    val page = params(pageParam).toInt
    records.slice((page - 1) * pageSize, page * pageSize)
  }
}
