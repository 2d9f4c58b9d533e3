package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions.col

import graft.functions.BloomMightContain

/** Bloom-filter pre-filtered joins — the shuffle-reduction lever for the
  * mid-size build side: too big to broadcast as a hash relation, but whose
  * KEY SET fits a few-MB bloom sketch.
  *
  * Shape: build a bloom filter over the small side's join keys (distributed
  * `treeAggregate` via `DataFrameStatFunctions.bloomFilter`; only the
  * fixed-size sketch reaches the driver), bake it into a native
  * [[BloomMightContain]] predicate on the probe side, then run the exact
  * join on the survivors. At 100 TB the win is that the probe side is
  * trimmed BEFORE its shuffle — with a 1% selective build side and 1% fpp,
  * ~98% of probe-side shuffle bytes disappear while the exact join
  * guarantees the output is identical to the plain join (bloom false
  * positives are re-checked, false negatives are impossible).
  *
  * This is the explicit, deterministic form of Spark's runtime semi-join
  * reduction (`spark.sql.optimizer.runtime.bloomFilter.*`), usable when the
  * optimizer's heuristics don't fire or the build side is reused across
  * many probe queries (build once, probe many).
  */
object BloomJoin {

  /** Exact left-semi join of `probe` against `build`, bloom-pre-filtered.
    * Output equals `probe.join(build, keys, "left_semi")` exactly. */
  def semiJoin(probe: DataFrame, probeKey: String,
               build: DataFrame, buildKey: String,
               expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val pre = preFilter(probe, probeKey, build, buildKey, expectedItems, fpp)
    val keys = build.select(col(buildKey).as("__bloom_build_key"))
    pre.join(keys, pre(probeKey) === keys("__bloom_build_key"), "left_semi")
  }

  /** `probe` rows whose key MIGHT be in `build`'s key set (false positives
    * at ~`fpp`, no false negatives) — compose with any exact join type. */
  def preFilter(probe: DataFrame, probeKey: String,
                build: DataFrame, buildKey: String,
                expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(col(buildKey), expectedItems, fpp)
    probe.filter(mightContain(col(probeKey), bf))
  }

  def mightContain(key: Column, bf: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(key), bf))
}
