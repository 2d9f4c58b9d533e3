package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge-list DataFrames — PageRank as the canonical
  * iterative-propagation operator (the same join+agg skeleton as the dedup
  * family's min-label propagation in [[Dedup]], with rank mass instead of
  * labels).
  *
  * Scale shape (per iteration): one shuffle join of the rank vector to the
  * edge list on `src`, one hash aggregate on `dst` — both partition on the
  * vertex key, so a cluster reuses the edge partitioning across iterations
  * (edges are repartitioned by `src` ONCE up front and cached by the
  * caller if iterating many times). Iteration count is driver-bounded and
  * fixed (a hyperparameter, not data-dependent); at production depths the
  * caller should checkpoint every ~10 iterations to truncate lineage —
  * with the small fixed depths used here the declarative plan is fine.
  *
  * Determinism: rank sums are hash-agg double sums (order varies in the
  * last ulp); consumers round before ranking, as everywhere else in the
  * engine.
  */
object GraphOps {

  /** PageRank over a directed edge list (`src`, `dst` string columns),
    * uniform init 1/N, fixed iteration count, no dangling-mass
    * redistribution (dangling nodes keep contributing nothing — the
    * simple/classic formulation, chosen because it is exactly
    * reproducible in plain SQL):
    *
    *   rank0(v)   = 1/N
    *   rank_k+1(v) = (1-d)/N + d * Σ_{u→v} rank_k(u) / outdeg(u)
    *
    * Returns (node, rank) over ALL nodes (sources and sinks).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // N as a one-row broadcast frame: keeps the whole plan declarative.
    val n = nodes.agg(count(lit(1)).cast("double").as("n"))
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    var rank = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = rank
        .join(outdeg, rank("node") === outdeg("src"))
        .join(e, "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("mass"))
      rank = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("mass"), lit(0.0))).as("rank"))
    }
    rank
  }
}
