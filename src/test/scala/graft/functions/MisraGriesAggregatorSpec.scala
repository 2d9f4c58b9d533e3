package graft.functions

import org.apache.spark.sql.Encoders

import graft.SparkSpec

class MisraGriesAggregatorSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic skewed stream: key `k$i` appears `freq(i)` times. */
  private def stream(freqs: Seq[(String, Int)]): Seq[String] =
    freqs.flatMap { case (k, f) => Seq.fill(f)(k) }
      // interleave deterministically so heavy keys aren't contiguous
      .zipWithIndex.sortBy { case (s, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)

  test("sketch keeps every key with count > n/k (superset guarantee)") {
    val freqs = Seq("a" -> 500, "b" -> 300, "c" -> 120) ++
      (1 to 400).map(i => s"t$i" -> 2)
    val data = stream(freqs)
    val n = data.size
    val k = 16
    val ds = spark.createDataset(data)(Encoders.STRING).repartition(7)
    val sk = ds.select(new MisraGriesAggregator(k).toColumn).head()
    assert(sk.n == n)
    assert(sk.keys.length <= k - 1)
    val mustKeep = freqs.collect { case (key, f) if f > n / k => key }
    mustKeep.foreach(key => assert(sk.keys.contains(key),
      s"$key (count > n/$k) evicted from ${sk.keys.mkString(",")}"))
    // residuals undercount by at most n/k
    sk.keys.zip(sk.residuals).foreach { case (key, r) =>
      val truth = freqs.toMap.getOrElse(key, 0).toLong
      assert(r <= truth && truth - r <= n / k,
        s"$key residual $r vs truth $truth (n/k=${n / k})")
    }
  }

  test("merge across many partitions preserves the guarantee") {
    val freqs = Seq("x" -> 900, "y" -> 250) ++ (1 to 300).map(i => s"z$i" -> 3)
    val data = stream(freqs)
    val k = 8
    // partition count >> k forces deep merge trees
    for (parts <- Seq(1, 4, 32)) {
      val sk = spark.createDataset(data)(Encoders.STRING).repartition(parts)
        .select(new MisraGriesAggregator(k).toColumn).head()
      assert(sk.n == data.size)
      assert(sk.keys.contains("x") && sk.keys.contains("y"),
        s"parts=$parts kept ${sk.keys.mkString(",")}")
    }
  }

  test("reduce path: decrement-all evicts zeros and stays under k-1 counters") {
    val agg = new MisraGriesAggregator(3)
    var st = agg.zero
    "abcabcax".foreach(c => st = agg.reduce(st, c.toString))
    assert(st.n == 8)
    assert(st.counters.size <= 2)
  }
}
