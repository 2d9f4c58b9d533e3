package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sinks.Layout

/** The per-JVM fixture cache must hand out ISOLATED copies: a rep that
  * mutates its layout (deletes staging survivors into it, appends) can
  * never corrupt the cached source or a sibling rep's copy. */
class FixtureCacheSpec extends SparkSpec {

  private def data = spark.range(2000)
    .select(col("id"), pmod(xxhash64(col("id")), lit(100)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(100)).as("y"))

  private def files(dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_"))
      .map(st => st.getPath.getName).toSet
  }

  test("copies are byte-equivalent and mutation-isolated; build runs once") {
    var builds = 0
    val key = "spec_fixture_" + System.nanoTime() // unique per test run
    def materialize(dest: String): Unit =
      FixtureCache.layout(spark, key, dest) { d =>
        builds += 1
        Layout.zorderWrite(data, Seq("x", "y"), d, nFiles = 4)
      }
    val a = tmpDir("fc_a") + "/z"
    val b = tmpDir("fc_b") + "/z"
    materialize(a)
    materialize(b)
    assert(builds == 1) // second call copies, never rebuilds
    assert(files(a) == files(b) && files(a).size == 4)
    assert(spark.read.parquet(a).count() == 2000L)
    // mutate copy A: drop a data file — copy B and a FRESH copy are intact
    val pa = new org.apache.hadoop.fs.Path(a)
    val fs = pa.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(pa, files(a).head), false)
    assert(files(a).size == 3)
    assert(files(b).size == 4)
    assert(spark.read.parquet(b).count() == 2000L)
    val c = tmpDir("fc_c") + "/z"
    materialize(c)
    assert(builds == 1)
    assert(files(c).size == 4)
    assert(spark.read.parquet(c).count() == 2000L)
  }
}
