package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth smoke: run the heaviest driver queries at sf0.1 and at a
  * synthetic 10× of it, and report the wall-time ratio per query.
  *
  * The 10× dataset is built by unioning `copies` re-keyed copies of each
  * sf0.1 table: every key AND foreign-key column is offset by
  * `copy * 100M`, so referential integrity, join fan-outs, and group
  * cardinalities scale together the way real growth scales them (10× the
  * orders ⇒ 10× the customers, not 10× the lines per order). `region` and
  * `nation` stay single-copy — dimensions don't grow with fact volume.
  * Document text is copied verbatim: cross-copy exact duplicates are what
  * a dedup pipeline exists to find, so q27/q59/q92 see 10-deep duplicate
  * groups — a harder, not easier, input.
  *
  * Usage: runMain graft.ScaleSmoke [srcSfDir] [scaledDir] [copies]
  * Prints one JSON line per query: name, wall at sf0.1, wall at the
  * scaled dir, and the ratio; a final line aggregates. The scaled dir is
  * built once and reused if present (delete it to rebuild).
  */
object ScaleSmoke {

  /** Per-table key/FK columns to offset per copy. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val dims = Seq("region", "nation")

  /** The bench tail (the queries whose sf0.1 medians dominate BENCH_r06)
    * plus three data-bound baselines (scan-agg, star join, bloom semi join
    * over the 6M-row scaled lineitem) whose wall SHOULD track data volume —
    * they separate fixed replay/iteration overhead from real scan cost. */
  private val heavy = Seq(
    "q80_stream_interval_join", "q62_stream_dedup", "q63_stream_stateful",
    "q86_medallion_e2e", "q92_leakage_safe_split", "q59_dedup_clusters",
    "q27_minhash_pairs", "q65_partition_overwrite", "q45_ann_ivf",
    "q83_load_plan", "q1_agg", "q3_join_agg", "q76_bloom_semi_join",
    "q28_simhash_pairs", "q100_passage_dedup")

  def buildScaled(s: SparkSession, src: String, target: String,
                  copies: Int): Unit = {
    val offset = 100000000L
    dims.foreach { t =>
      graft.model.Tables.load(s, src, t)
        .write.mode("overwrite").parquet(s"$target/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      // Tables.load normalizes the nanos-timestamp events table; the scaled
      // copy is re-landed with plain µs timestamps (loadEvents passes those
      // through)
      val base = graft.model.Tables.load(s, src, t)
      val scaled = (0 until copies).map { i =>
        keys.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * offset))
        }
      }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$target/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).getOrElse("/tmp/graft_scale/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$target/lineitem.parquet").exists()) {
      System.err.println(s"[scale] building ${copies}x of $src at $target")
      buildScaled(spark, src, target, copies)
    }

    def wall(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    try wall("q1_agg", src) catch { case _: Throwable => () } // warm-up

    var sumSmall = 0.0
    var sumBig = 0.0
    heavy.foreach { name =>
      val small = wall(name, src)
      val big = wall(name, target)
      sumSmall += small; sumBig += big
      println(f"""{"query":"$name","sf01_sec":$small%.2f,"sf1_sec":$big%.2f,"ratio":${big / small}%.2f}""")
    }
    println(f"""{"query":"TOTAL","sf01_sec":$sumSmall%.2f,"sf1_sec":$sumBig%.2f,"ratio":${sumBig / sumSmall}%.2f,"copies":$copies}""")
    spark.stop()
  }
}
