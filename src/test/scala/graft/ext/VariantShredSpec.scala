package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.VariantShred.ShredSpec

/** Variant shredding: clustered write with physical shred columns,
  * footer-stats manifest, path-predicate file pruning with residual
  * exactness, empty-intersection reads, and null-path (heterogeneous
  * shape) handling. */
class VariantShredSpec extends SparkSpec {
  import spark.implicits._

  private val shreds =
    Seq(ShredSpec("k", "$.k", "bigint"), ShredSpec("c", "$.c", "bigint"))

  private def mkVariant(n: Int) =
    spark.range(n).select($"id",
      parse_json(concat(lit("{\"c\": "), $"id" * 3 % 1000,
        lit(", \"k\": "), $"id" % 100, lit("}"))).as("v"))

  test("shredWrite + manifest: one stats row per file, tight disjoint " +
      "k ranges from the clustered layout, footer types are BIGINT") {
    val dir = tmpDir("vshred1")
    VariantShred.shredWrite(mkVariant(4000), "v", shreds, dir, nFiles = 8)
    val mf = VariantShred.manifest(spark, dir, shreds)
    val rows = mf.orderBy("min__shred_k").collect()
    assert(rows.length == 8)
    // clustered: consecutive files cover increasing, non-overlapping bands
    val bands = rows.map(r => (r.getAs[Long]("min__shred_k"),
      r.getAs[Long]("max__shred_k")))
    bands.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping shred bands: $hi vs $lo")
    }
    assert(bands.head._1 == 0L && bands.last._2 == 99L)
  }

  test("prunedRead skips files on shredded stats, keeps exactness via " +
      "the physical-column residual, and hides the _shred_ columns") {
    val dir = tmpDir("vshred2")
    VariantShred.shredWrite(mkVariant(4000), "v", shreds, dir, nFiles = 8)
    val mf = VariantShred.manifest(spark, dir, shreds).localCheckpoint()
    val pr = VariantShred.prunedRead(spark, dir, mf, "k", 30L, 39L)
    assert(pr.filesTotal == 8 && pr.filesRead < pr.filesTotal)
    assert(!pr.df.columns.exists(_.startsWith("_shred_")))
    val got = pr.df
      .select(variant_get($"v", "$.k", "bigint").as("k")).as[Long].collect()
    assert(got.nonEmpty && got.forall(k => k >= 30 && k <= 39))
    // exact row parity with the unpruned filter
    val expected = mkVariant(4000)
      .filter(variant_get($"v", "$.k", "bigint").between(30, 39)).count()
    assert(pr.df.count() == expected)
  }

  test("an empty stats intersection plans no scan and returns zero rows " +
      "with the layout schema intact") {
    val dir = tmpDir("vshred3")
    VariantShred.shredWrite(mkVariant(500), "v", shreds, dir, nFiles = 4)
    val mf = VariantShred.manifest(spark, dir, shreds)
    val pr = VariantShred.prunedRead(spark, dir, mf, "k", 1000L, 2000L)
    assert(pr.filesRead == 0 && pr.df.count() == 0)
    assert(pr.df.columns.contains("v") && pr.df.columns.contains("id"))
  }

  test("heterogeneous shapes: rows missing the clustered path sort into " +
      "the null band and prune away from any finite range") {
    val dir = tmpDir("vshred4")
    val mixed = spark.range(1000).select($"id",
      parse_json(when($"id" % 5 === 0, lit("{\"tag\": \"bare\"}"))
        .otherwise(concat(lit("{\"c\": 1, \"k\": "), $"id" % 100,
          lit("}")))).as("v"))
    VariantShred.shredWrite(mixed, "v", shreds, dir, nFiles = 8)
    val mf = VariantShred.manifest(spark, dir, shreds).localCheckpoint()
    val pr = VariantShred.prunedRead(spark, dir, mf, "k", 0L, 99L)
    // the full range still excludes at least the all-null file(s)
    assert(pr.filesRead < pr.filesTotal)
    assert(pr.df.count() == 800L)
  }
}
