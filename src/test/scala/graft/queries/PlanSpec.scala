package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression guards: the properties that make these queries
  * viable at 100 TB (pushdown reaching the scan, broadcast of small dims,
  * top-k as TakeOrderedAndProject, no cartesian products anywhere). Plans
  * are asserted at sf0.001 — the shapes, not the sizes, are under test. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q2: filters and column pruning reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)") ||
      p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    // pruned read schema: none of the unused columns appear in the scan
    assert(!p.contains("l_returnflag"))
  }

  test("q3: small dimension joins are broadcast") {
    assert(plan("q3_join_agg").contains("BroadcastHashJoin"))
  }

  // PlanGuard's static check sees the plan BEFORE execution; AQE may
  // re-plan at runtime (e.g. demote a broadcast whose build side measured
  // larger than the threshold). Where the property is load-bearing, assert
  // it on the FINAL adaptive plan too — after the action has run.
  test("q3: broadcast survives AQE runtime re-planning (final adaptive plan)") {
    val df = SparkEntry.queries("q3_join_agg")(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"broadcast demoted at runtime:\n$p")
  }

  test("q5: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q5_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("q35: as-of join costs exactly one shuffle exchange") {
    val p = plan("q35_asof_join")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1, s"expected 1 shuffle, plan:\n$p")
  }

  test("q50: quantize stats is a pure scan+project — zero exchanges") {
    val p = plan("q50_quantize")
    assert(p.contains("quantize_stats"))
    assert(!p.contains("Exchange"), s"quantization must not shuffle:\n$p")
  }

  // q56/q30 now return the gated EXACT frame (RecallGate — a checkpoint
  // scan), so the scale-path plan properties are asserted on the banded /
  // ANN operators themselves, exactly as they run inside the gate.
  test("q56 operator: banded near-dup candidates come from an equi-join, never a nested loop") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 500)
    val p = graft.ext.Similarity.cosineNearDupPairsBanded(vecs, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"expected equi-join plan:\n$p")
    assert(p.contains("lsh_bucket"))
  }

  test("q30 operator: multi-probe ANN broadcasts the probe side, corpus unexploded") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.ext.Similarity.annTopK(
      probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding")),
      corpus = emb.filter(col("vec_id") >= 5), k = 10, nPlanes = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("lsh_bucket"))
  }

  test("q54: fused QC reads the events table exactly once") {
    val p = plan("q54_qc_agg")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one fused scan, got $scans:\n$p")
  }

  test("q52: upsert is a single full-outer sort-merge join, no driver path") {
    val p = plan("q52_upsert")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"))
  }

  test("q68: PII redaction is a pure scan+project — zero exchanges") {
    val p = plan("q68_pii_redact")
    assert(!p.contains("Exchange"), s"redaction must not shuffle:\n$p")
  }

  test("q77: stratified sampling is a pure scan+filter — zero exchanges") {
    val p = plan("q77_stratified_sample")
    assert(!p.contains("Exchange"), s"hash sampling must not shuffle:\n$p")
  }

  test("q71: packing windows are bucket-partitioned; only the offset table is single-partition") {
    val p = plan("q71_seq_pack")
    assert(p.contains("Exchange hashpartitioning(bucket"),
      s"inner prefix window must partition by bucket:\n$p")
    val single = "Exchange SinglePartition".r.findAllIn(p).length
    assert(single == 1,
      s"exactly the per-bucket offset table may be single-partition, got $single:\n$p")
  }

  test("q72: contamination joins via broadcast with no corpus-side pre-shuffle") {
    val p = plan("q72_contamination")
    assert(p.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus side must not shuffle to join:\n$p")
  }

  test("q78: per-source cap costs one shuffle (window on the quota key)") {
    val p = plan("q78_source_cap")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"no global window allowed:\n$p")
  }

  test("q91: one-pass profile reads the table exactly once despite multi-distinct") {
    val p = plan("q91_profile")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one fused scan, got $scans:\n$p")
  }

  test("q87: chunking is a shuffle-free generate — zero exchanges") {
    val p = plan("q87_chunking")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected explode-based generate:\n$p")
  }

  test("q84: correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = plan("q84_correlated_exists")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
  }

  // --- PlanGuard failure paths: the in-query guards (q3/q5/q81/q99) must
  // THROW on a regressed plan, not silently pass it through -----------------

  test("PlanGuard.requireInPlan throws when the broadcast is lost") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val nat = spark.read.parquet(s"$dir/nation.parquet")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // no broadcast() hint + threshold off => sort-merge join
      val df = li.join(nat, li("l_suppkey") % 25 === nat("n_nationkey"))
      val e = intercept[IllegalArgumentException] {
        graft.plans.PlanGuard.requireInPlan(df, "BroadcastHashJoin", "dim must broadcast")
      }
      assert(e.getMessage.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("PlanGuard catches top-k regressing to a global sort") {
    import org.apache.spark.sql.functions.col
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    // no limit => global range-partitioned sort, no TakeOrderedAndProject
    val sorted = ord.orderBy(col("o_totalprice").desc)
    intercept[IllegalArgumentException] {
      graft.plans.PlanGuard.requireInPlan(sorted, "TakeOrderedAndProject",
        "top-k must plan as per-partition heaps")
    }
    intercept[IllegalArgumentException] {
      graft.plans.PlanGuard.requireNotInPlan(sorted, "Exchange rangepartitioning",
        "top-k must not global-sort")
    }
  }

  test("PlanGuard.requirePlanMatches throws when pruning never happens") {
    import org.apache.spark.sql.functions.col
    // an unpartitioned read has no PartitionFilters entry to match
    val flat = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") > 100)
    intercept[IllegalArgumentException] {
      graft.plans.PlanGuard.requirePlanMatches(flat,
        "PartitionFilters: \\[[^\\]]*run_date#\\d+ = 1995-06".r,
        "filter did not reach partition pruning")
    }
  }

  test("no query plans a cartesian product") {
    SparkEntry.queries.keys.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q contains a cartesian product")
    }
  }
}
