package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-based checks (SURVEY §5.3): upsert idempotence, dedup ⇒ key
  * uniqueness, untouched-rows preservation — over ScalaCheck-generated
  * tables. Generators are sampled with fixed seeds (the scalatest↔scalacheck
  * bridge artifact isn't available offline), so runs are reproducible. */
class UpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0L, 20L)
    v <- Gen.choose(-100, 100)
    s <- Gen.oneOf("a", "b", "c")
  } yield (id, v, s)

  private val tableGen = Gen.listOfN(25, rowGen)

  private def samples(n: Int): Seq[List[(Long, Int, String)]] =
    (0 until n).map(i => tableGen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id", "v", "s").collect().map(_.toSeq).toSeq

  test("property: upsert(upsert(t,u),u) == upsert(t,u)") {
    samples(10).grouped(2).foreach { case Seq(t, u) =>
      val target = t.toDF("id", "v", "s").dropDuplicates("id")
      val updates = u.toDF("id", "v", "s").dropDuplicates("id")
      val once = Upsert.upsert(target, updates, Seq("id"))
      val twice = Upsert.upsert(once, updates, Seq("id"))
      assert(sortedRows(twice) == sortedRows(once))
    }
  }

  test("property: upsert result has unique keys") {
    samples(10).grouped(2).foreach { case Seq(t, u) =>
      val out = Upsert.upsert(
        t.toDF("id", "v", "s").dropDuplicates("id"),
        u.toDF("id", "v", "s"), Seq("id"))
      assert(out.groupBy("id").count().filter(col("count") > 1).isEmpty)
    }
  }

  test("property: update keys all present; non-updated target rows unchanged") {
    samples(10).grouped(2).foreach { case Seq(t, u) =>
      val target = t.toDF("id", "v", "s").dropDuplicates("id")
      val updates = u.toDF("id", "v", "s").dropDuplicates("id")
      val out = Upsert.upsert(target, updates, Seq("id"))
      val updatedKeys = updates.select("id").distinct()
      assert(updatedKeys.join(out, Seq("id"), "left_anti").isEmpty)
      val untouched = out.join(updatedKeys, Seq("id"), "left_anti")
      val expected = target.join(updatedKeys, Seq("id"), "left_anti")
      assert(sortedRows(untouched) == sortedRows(expected))
    }
  }

  test("property: dedupKeepFirst yields unique keys and rows from the input") {
    samples(6).foreach { t =>
      val df = t.toDF("id", "v", "s")
      val deduped = SchemaTolerant.dedupKeepFirst(
        Seq("id"), Seq(col("v").desc, col("s").asc))(df)
      assert(deduped.groupBy("id").count().filter(col("count") > 1).isEmpty)
      assert(deduped.join(df, Seq("id", "v", "s"), "left_anti").isEmpty)
    }
  }
}
