package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-embeddings with CLUSTER structure: 16-dim, each
  // vector = a cell-anchor direction plus small hash noise — the regime
  // where coarse cells are coherent and residuals are short (the IVF-PQ
  // design point; structure-free spread is PqSpec's hard case)
  private def corpus(n: Int) = spark.range(n)
    .select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), i =>
        (when(pmod(col("id"), lit(8)) === pmod(i, lit(8)), 4.0).otherwise(0.0)
          + pmod(xxhash64(col("id"), i), lit(1000)) / lit(1000.0))
          .cast("float")).as("embedding"))

  test("build shapes: anchors unit-norm, codes bounded, one row per vector") {
    val c = corpus(300)
    val (index, codes) = IvfPq.build(c, "vec_id", "embedding",
      c = 8, m = 4, k = 16, iters = 1)
    assert(index.c == 8)
    index.anchors.foreach { a =>
      val n = math.sqrt(a.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"anchor norm $n not unit")
    }
    val rows = codes.collect()
    assert(rows.length == 300)
    assert(rows.forall { r =>
      val code = r.getSeq[Int](2)
      code.length == 4 && code.forall(x => x >= 0 && x < 16) &&
        r.getInt(1) >= 0 && r.getInt(1) < 8
    })
  }

  test("search is cell-bounded and recall-comparable to flat PQ") {
    val c = corpus(800).localCheckpoint()
    val probes = c.filter(col("vec_id") < 2)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val rest = c.filter(col("vec_id") >= 2)
    val exact = Similarity.bruteForceTopK(probes, rest, k = 10)
      .select(col("probe_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (index, codes) = IvfPq.build(rest, "vec_id", "embedding",
      c = 8, m = 4, k = 16, iters = 1)
    val codesCk = codes.localCheckpoint()
    // cell-boundedness: the probed-cell union is a strict subset of cells,
    // and the scan the shortlist runs touches only those cells' rows
    val cells = IvfPq.probedCells(probes, index, "probe_id", "embedding",
      nProbe = 3)
    assert(cells.size < index.c, s"probed ${cells.size} of ${index.c} cells")
    val scanned = codesCk
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*)).count()
    assert(scanned < codesCk.count())
    val got = IvfPq.search(probes, index, codesCk, rest,
      "probe_id", "vec_id", "embedding", topK = 10, nProbe = 3,
      shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall below 0.5 on clustered data")
  }

  test("persisted cell-partitioned code plane partition-prunes the probe scan") {
    val dir = tmpDir("ivfpq")
    val c = corpus(400).localCheckpoint()
    val probes = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val rest = c.filter(col("vec_id") >= 3)
    val (index, codes) = IvfPq.build(rest, "vec_id", "embedding",
      c = 8, m = 4, k = 16, iters = 1)
    codes.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    val stored = spark.read.parquet(s"$dir/codes")
    val cells = IvfPq.probedCells(probes, index, "probe_id", "embedding",
      nProbe = 2)
    // the search's probed-cell filter reaches the scan as a PARTITION
    // filter — nProbe cells' directories read, the rest never opened
    val pruned = stored.filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"probe filter did not partition-prune:\n$scan")
    // and search from the store matches search from the in-memory plane
    val fromStore = IvfPq.search(probes, index, stored, rest,
      "probe_id", "vec_id", "embedding", topK = 5, nProbe = 2, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromMem = IvfPq.search(probes, index, codes, rest,
      "probe_id", "vec_id", "embedding", topK = 5, nProbe = 2, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromStore == fromMem)
  }

  test("anchor decomposition is exact: ADC with perfect codebook = true dot") {
    // with k >= distinct residuals per subspace the PQ table lookup is the
    // exact residual dot, so adc_score must equal q̂·v̂ to float precision —
    // proving score = q̂·ĉ + q̂·(v̂−ĉ) carries no systematic error
    val c = corpus(40).localCheckpoint()
    val probes = c.filter(col("vec_id") < 2)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val rest = c.filter(col("vec_id") >= 2).localCheckpoint()
    val n = rest.count().toInt
    val (index, codes) = IvfPq.build(rest, "vec_id", "embedding",
      c = 2, m = 4, k = n, iters = 1, sampleCap = n)
    val adc = IvfPq.adcShortlist(probes, index, codes, "probe_id",
      "embedding", shortlist = n, nProbe = 2)
      .select(col("probe_id"), col("neighbor_id"), col("adc_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val truth = Similarity.bruteForceTopK(probes, rest, k = n)
      .select(col("probe_id"), col("neighbor_id"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(adc.nonEmpty)
    adc.foreach { case (key, score) =>
      assert(math.abs(score - truth(key)) < 1e-4,
        s"$key: adc $score vs exact ${truth(key)}")
    }
  }
}
