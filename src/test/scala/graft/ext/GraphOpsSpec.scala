package graft.ext

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    GraphOps.pageRank(edges.toDF("src", "dst"), iters, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("two-node cycle is the uniform fixed point") {
    val r = ranks(Seq("a" -> "b", "b" -> "a"), iters = 3)
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("dangling sink: hand-computed two-iteration values") {
    // a→b, N=2: r1(a)=0.075, r1(b)=0.5; r2(b)=0.075+0.85·0.075=0.13875
    val r = ranks(Seq("a" -> "b"), iters = 2)
    assert(math.abs(r("a") - 0.075) < 1e-12)
    assert(math.abs(r("b") - 0.13875) < 1e-12)
  }

  test("in-degree hub outranks leaves; mass is bounded by 1") {
    val r = ranks(Seq("a" -> "hub", "b" -> "hub", "c" -> "hub",
      "hub" -> "a"), iters = 3)
    assert(r("hub") > r("a")) // hub has in-degree 3
    assert(r("a") > r("b")) // a is fed by the hub; b only gets (1-d)/N
    assert(r("hub") > r("b") && r("hub") > r("c"))
    assert(r.values.sum <= 1.0 + 1e-9)
    // b and c are symmetric — identical rank
    assert(math.abs(r("b") - r("c")) < 1e-12)
  }

  test("duplicate edges collapse before outdegree is computed") {
    val once = ranks(Seq("a" -> "b", "a" -> "c"), iters = 2)
    val dup = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c"), iters = 2)
    assert(once == dup)
  }
}
