package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Final Misra-Gries summary: exact total item count `n` plus the surviving
  * candidate keys with their (under-)estimated residual counts, key-sorted
  * for determinism.
  *
  * Guarantee (Misra-Gries with `k` counters, mergeable-summaries merge):
  * every key whose true count exceeds `n / k` is present, and each present
  * key's residual undercounts its true count by at most `n / k`. Keys with
  * true count ≤ n/k may or may not appear — callers needing an EXACT answer
  * re-count the candidates in a second pass (see
  * [[graft.ext.Curation.heavyHitters]]).
  */
final case class HeavyHitterSketch(n: Long, keys: Array[String], residuals: Array[Long])

/** Mutable aggregation buffer: exact stream length + at most k−1 counters.
  * Kept as a plain JVM object by Spark's object-hash aggregation; it is
  * serialized (kryo) only at partial-aggregate shuffle boundaries. */
final class MisraGriesState extends Serializable {
  var n: Long = 0L
  val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
}

/** Typed Misra-Gries heavy-hitter `Aggregator`: fixed `k`-counter state per
  * partial aggregate regardless of input size — the frequent-items shape
  * that works at 100 TB, where an exact `groupBy(key).count()` would shuffle
  * one row per DISTINCT key just to find the handful of frequent ones.
  *
  * `reduce` is the classic decrement-all step (amortized O(1)); `merge` is
  * the mergeable-summaries combine — add counters, then subtract the k-th
  * largest value and drop the non-positive — which preserves the n/k error
  * bound under Spark's partial-aggregation tree (Agarwal et al., Mergeable
  * Summaries, PODS '12).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MisraGriesState, HeavyHitterSketch] {
  require(k >= 2, s"misra-gries needs k >= 2 counters, got $k")

  override def zero: MisraGriesState = new MisraGriesState

  override def reduce(st: MisraGriesState, key: String): MisraGriesState = {
    st.n += 1
    val c = st.counters
    c.get(key) match {
      case Some(v) => c.update(key, v + 1)
      case None if c.size < k - 1 => c.update(key, 1L)
      case None =>
        // counters full and key absent: decrement every counter, evict zeros
        c.mapValuesInPlace((_, v) => v - 1)
        c.filterInPlace((_, v) => v > 0)
    }
    st
  }

  override def merge(a: MisraGriesState, b: MisraGriesState): MisraGriesState = {
    a.n += b.n
    b.counters.foreach { case (key, v) =>
      a.counters.update(key, a.counters.getOrElse(key, 0L) + v)
    }
    val c = a.counters
    if (c.size > k - 1) {
      // subtract the k-th largest residual from all; at most k−1 values are
      // strictly greater than it, so at most k−1 survive
      val sorted = c.values.toArray
      java.util.Arrays.sort(sorted)
      val threshold = sorted(sorted.length - k)
      c.mapValuesInPlace((_, v) => v - threshold)
      c.filterInPlace((_, v) => v > 0)
    }
    a
  }

  override def finish(st: MisraGriesState): HeavyHitterSketch = {
    val ordered = st.counters.toArray.sortBy(_._1)
    HeavyHitterSketch(st.n, ordered.map(_._1), ordered.map(_._2))
  }

  override def bufferEncoder: Encoder[MisraGriesState] =
    Encoders.kryo[MisraGriesState]
  override def outputEncoder: Encoder[HeavyHitterSketch] =
    ExpressionEncoder[HeavyHitterSketch]()
}

object MisraGriesAggregator {
  def apply(k: Int): MisraGriesAggregator = new MisraGriesAggregator(k)
}
