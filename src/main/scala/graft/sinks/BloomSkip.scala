package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL BLOOM FILTERS for point lookups on UNCLUSTERED columns —
  * the file-skipping axis min/max stats cannot provide.
  *
  * A z-ordered layout prunes range queries on its clustered columns, but a
  * point lookup on any OTHER high-cardinality column (an id, a hash, a
  * foreign key) defeats interval stats: every file's [min,max] on an
  * unclustered column spans nearly the whole domain, so the stats planner
  * reads the whole table for one key. Table formats answer this with
  * per-file bloom filters (Delta's bloom index, Parquet's bloom pages);
  * here the bloom rides the same manifest as the stats: one extra column,
  * `bloom_<col>`, the SORTED DISTINCT SET of k hash positions
  * (`pmod(xxhash64(value, seed_i), bits)`) present in the file.
  *
  * Membership is the classic test — a key may be in the file iff ALL k of
  * its positions are set — evaluated DISTRIBUTED: the (tiny) probe-position
  * set is broadcast against the manifest and the `forall`/`array_contains`
  * membership test runs executor-side, so the per-file bloom arrays (the
  * heavy column) NEVER travel to the driver; only the surviving files'
  * `(file, dv)` rows are collected, file-count-bounded like every other
  * planning decision here. Probe positions are computed by a
  * one-row-per-key Spark job with the SAME hash expressions that built the
  * blooms, so builder and prober can never drift.
  *
  * Scale shape: the bloom column is bounded by `min(distinct·k, bits)`
  * ints per file (bits=2^18 default ⇒ ≤1 MB/file worst case, typically
  * ~60 KB for ~5k distinct values at a 1.4e-4 per-key false-positive
  * rate); build cost is one column-pruned scan with a per-file
  * `collect_set` whose buffer is bits-bounded. The read side composes
  * with deletion vectors: candidate files are read through
  * [[Dv.readLive]], so a masked row can never resurface via a point
  * lookup. */
object BloomSkip {

  val DefaultBits = 1 << 18
  val DefaultK = 3

  private def posExprs(colName: String, bits: Int, k: Int) =
    (0 until k).map(i =>
      pmod(xxhash64(col(colName), lit(i)), lit(bits)).cast("int"))

  /** Per-file bloom column over the given files: one row per file,
    * `(file, bloom_<col>)`. Join onto the stats manifest by `file`. */
  def buildBloom(spark: SparkSession, files: Seq[String], colName: String,
                 bits: Int = DefaultBits, k: Int = DefaultK): DataFrame =
    spark.read.parquet(files: _*)
      .select(col("_metadata.file_path").as("file"),
        explode(array(posExprs(colName, bits, k): _*)).as("p"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("p"))).as(s"bloom_$colName"))

  /** Stats manifest + bloom column in one pass-pair (stats scan and bloom
    * scan are both column-pruned over the same files). */
  def manifestWithBloom(spark: SparkSession, files: Seq[String],
                        statsCols: Seq[String], bloomCol: String,
                        bits: Int = DefaultBits,
                        k: Int = DefaultK): DataFrame =
    Layout.buildManifestFor(spark, files, statsCols)
      .join(buildBloom(spark, files, bloomCol, bits, k), Seq("file"))

  /** Point-lookup read planned by the bloom: keep a file iff SOME probe
    * key has ALL its k positions in the file's bloom set, then read only
    * those files (deletion-vector-aware) with the exact IN-filter as the
    * residual — the bloom can only over-include, so correctness never
    * depends on it. Returns the scan plus its pruning evidence. */
  def pointRead(spark: SparkSession, manifest: DataFrame, bloomCol: String,
                keys: DataFrame, bits: Int = DefaultBits,
                k: Int = DefaultK): Layout.PrunedScan = {
    val total = manifest.count()
    val keyVals = keys.select(col(bloomCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val candidates = survivingEntries(manifest, bloomCol, keys, bits, k)
      .collect().toSeq
      .map(r => Dv.Entry(r.getString(0), Option(r.getString(1))))
    val df =
      if (candidates.isEmpty || keyVals.isEmpty)
        Dv.readLive(spark, Dv.entries(manifest)).filter(lit(false))
      else Dv.readLive(spark, candidates)
        .filter(col(bloomCol).isInCollection(keyVals))
    Layout.PrunedScan(df, candidates.size.toLong, total)
  }

  /** The distributed candidate plan behind [[pointRead]]: broadcast the
    * (key-count-bounded) probe-position arrays against the manifest,
    * evaluate `∃ probe. ∀ position ∈ probe. position ∈ bloom` executor-side
    * with `forall`/`array_contains`, and return ONLY the surviving files'
    * `(file, dv)` rows. The bloom arrays — ~k·distinct ints per file, the
    * column that made a whole-manifest collect a driver-memory scale-killer
    * — are consumed inside the join and pruned before anything reaches the
    * driver. A left-semi join (not inner+distinct) so a file matching
    * several probe keys still yields one row. A manifest row WITHOUT a
    * bloom set (null `bloom_<col>` — e.g. a stats-only generation unioned
    * with a bloom generation) is a MANDATORY candidate: the bloom may only
    * ever over-include, and a null would otherwise evaluate the membership
    * condition to null ⇒ silently prune a file that can hold matches. */
  private[sinks] def survivingEntries(manifest: DataFrame, bloomCol: String,
                                      keys: DataFrame, bits: Int = DefaultBits,
                                      k: Int = DefaultK): DataFrame = {
    val probes = keys
      .select(array(posExprs(bloomCol, bits, k): _*).as("_probe_ps"))
      .distinct()
    val m = Dv.ensureDv(manifest)
      .select(col("file"), col("dv"), col(s"bloom_$bloomCol").as("_bloom"))
    m.join(broadcast(probes),
        col("_bloom").isNull ||
          forall(col("_probe_ps"), p => array_contains(col("_bloom"), p)),
        "left_semi")
      .select(col("file"), col("dv"))
  }

  /** The interval-stats control for the same lookup: how many files the
    * min/max planner would read. On an unclustered column this approaches
    * the whole table — the number the bloom exists to beat. */
  def statsCandidates(manifest: DataFrame, colName: String,
                      keys: DataFrame): Long = {
    val vals = keys.select(col(colName).cast("double")).distinct()
      .collect().map(_.getDouble(0))
    manifest
      .filter(vals.map(v =>
          col(s"min_$colName").cast("double") <= lit(v) &&
            col(s"max_$colName").cast("double") >= lit(v))
        .reduce(_ || _))
      .count()
  }
}
