package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of wall seconds.
  *
  * Each query is fully materialized via the `noop` sink — a `count()` would
  * let Catalyst prune every projection and undercount the real work. One
  * warm-up query runs first (uncounted) so JVM/codegen warm-up isn't charged
  * to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    try run("q1_agg") catch { case _: Throwable => () } // warm-up
    // A failing query must be VISIBLE, not a near-zero wall time that
    // silently improves the total: each failure is reported per query and
    // in a "failed" list.
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val err = try { run(name); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Some(e)
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
