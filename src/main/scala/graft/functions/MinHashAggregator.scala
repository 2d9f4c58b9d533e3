package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` form of MinHash — the user-facing
  * aggregate-extension surface (the expression-tree form used by the dedup
  * queries lives in [[graft.ext.Dedup.minHashSignatures]]; this one is for
  * `Dataset.groupByKey(...).agg(MinHashAggregator.toColumn)`-style typed
  * pipelines and for merging signatures ACROSS rows — e.g. a per-source or
  * per-day MinHash sketch whose union estimates cross-partition overlap).
  *
  * The buffer is the k-slot signature; `merge` is elementwise min, so the
  * aggregate is associative + commutative and Spark computes it with
  * map-side partial aggregation — constant state per group at any scale.
  */
class MinHashAggregator(n: Int, k: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], text: String): Array[Long] = {
    var off = 0
    val last = math.max(text.length - n, 0)
    while (off <= last) {
      val base = MinHashAggregator.hashShingle(text, off, math.min(n, text.length - off))
      var i = 0
      while (i < k) {
        val h = MinHashAggregator.mix(base, i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      off += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = MinHashAggregator.arrayLongEncoder
  override def outputEncoder: Encoder[Array[Long]] = MinHashAggregator.arrayLongEncoder
}

object MinHashAggregator {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  val arrayLongEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  def apply(n: Int, k: Int): MinHashAggregator = new MinHashAggregator(n, k)

  /** FNV-1a over the shingle's chars — cheap, allocation-free. */
  private[functions] def hashShingle(s: String, off: Int, len: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < len) {
      h ^= s.charAt(off + i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** splitmix64-style per-slot remix. */
  private[functions] def mix(v: Long, slot: Int): Long = {
    var z = v + 0x9E3779B97F4A7C15L * (slot + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Estimated Jaccard similarity of two signatures: fraction of agreeing
    * slots. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }
}
