package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.sinks.{Layout, Snapshots}

/** The version-log streaming source: version offsets, manifest-exact file
  * delivery, append-only enforcement, exactly-once restart. */
class TableCommitsSourceSpec extends SparkSpec {

  private def data = spark.range(6000)
    .select(col("id"),
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"))

  private def freshTable(): String = {
    val dir = tmpDir("tcs")
    Layout.zorderWrite(data.filter(col("id") % 3 === 0), Seq("x", "y"),
      s"$dir/z", nFiles = 4)
    Snapshots.commit(spark,
      Layout.buildManifest(spark, s"$dir/z", Seq("x", "y")), s"$dir/m")
    (1 to 2).foreach { d =>
      Snapshots.appendCommit(spark, data.filter(col("id") % 3 === d),
        Seq("x", "y"), s"$dir/z", s"$dir/m", nFiles = 2)
    }
    dir
  }

  private def drain(dir: String, extra: Map[String, String] = Map.empty): Unit = {
    var b = spark.readStream.format("graft.sources.v2.TableCommitsSource")
      .option("manifestRoot", s"$dir/m")
    extra.foreach { case (k, v) => b = b.option(k, v) }
    val q = b.load().writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.coalesce(1).write.mode("append").parquet(s"$dir/captured")
        ()
      }.start()
    assert(q.awaitTermination(300000))
  }

  test("streams each commit's added files exactly, resumes exactly-once") {
    val dir = freshTable()
    drain(dir)
    val captured = spark.read.parquet(s"$dir/captured")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    def files(v: Int): Set[String] =
      if (v < 1) Set.empty
      else Snapshots.manifestAt(spark, s"$dir/m", v)
        .select("file").collect().map(_.getString(0)).toSet
    val expected = (1 to 3).map(v => v -> (files(v) -- files(v - 1))).toMap
    assert(captured.groupBy(_._1).map { case (v, rs) =>
      v -> rs.map(_._2).toSet } == expected)
    // reading the streamed files reassembles the table
    assert(spark.read.parquet(captured.map(_._2).distinct: _*)
      .count() == 6000L)
    // restart: the checkpointed version offset re-emits nothing
    drain(dir)
    assert(spark.read.parquet(s"$dir/captured").count() ==
      captured.length.toLong)
    // new commit after restart: exactly its files stream next
    Snapshots.appendCommit(spark,
      spark.range(6000, 6500).select(col("id"), lit(1L).as("x"),
        lit(2L).as("y")),
      Seq("x", "y"), s"$dir/z", s"$dir/m", nFiles = 2)
    drain(dir)
    val after = spark.read.parquet(s"$dir/captured")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(after.filter(_._1 == 4).map(_._2).toSet == (files(4) -- files(3)))
  }

  test("a non-append commit fails the stream loudly") {
    val dir = freshTable()
    drain(dir)
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("x", "y"),
      Seq(("x", 100.0, 199.0)))
    val e = intercept[Exception] { drain(dir) }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
    assert(causes(e).exists(m => m != null && m.contains("non-append")))
  }

  test("ignoreDeletes streams past a delete commit, delivering only adds") {
    val dir = freshTable()
    Snapshots.deleteWhere(spark, s"$dir/z", s"$dir/m", Seq("x", "y"),
      Seq(("x", 100.0, 199.0)))
    drain(dir, Map("ignoreDeletes" -> "true"))
    val captured = spark.read.parquet(s"$dir/captured")
    // v4 (the delete) contributed only its survivor-rewrite adds
    val v4files = captured.filter(col("version") === 4).count()
    assert(v4files > 0)
    assert(captured.select("version").distinct().count() == 4L)
  }
}
