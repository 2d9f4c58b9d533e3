package graft.sql

import org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.sql.LakeSql.LakeTableSpec

/** Property check for the SQL-predicate → manifest-stats-box compiler:
  * for ANY conjunction of comparison predicates over stats columns — both
  * operand orders, strict and inclusive bounds, equalities, repeated
  * columns — the compiled inclusive box must select EXACTLY the rows the
  * SQL predicate selects on integer-valued data (the strict-bound
  * one-ulp nudge is exact for every stored integer). A divergence here is
  * a DELETE/UPDATE that silently touches the wrong rows. Generators use
  * fixed seeds (the scalatest↔scalacheck bridge isn't available offline). */
class BoxCompilerPropertySpec extends SparkSpec {

  private val spec = LakeTableSpec("/none", "/none", Seq("x", "y"))

  /** The same inclusive-box membership deleteWhere/updateWhere filter on
    * (Layout.inBoxExpr is private to the sinks package). */
  private def inBox(box: Seq[(String, Double, Double)]) =
    box.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)

  private val data = spark.range(2000).select(
    col("id"),
    pmod(xxhash64(col("id")), lit(100)).as("x"),
    pmod(xxhash64(col("id"), lit(1)), lit(100)).as("y")).localCheckpoint()

  private val predGen: Gen[String] = for {
    colName <- Gen.oneOf("x", "y")
    op <- Gen.oneOf("<", "<=", ">", ">=", "=")
    v <- Gen.choose(-5, 105)
    mirrored <- Gen.oneOf(true, false)
  } yield if (mirrored) s"$v $op $colName" else s"$colName $op $v"

  private val conjGen: Gen[List[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, predGen))

  test("property: compiled box ≡ SQL predicate on integer data") {
    (0 until 60).foreach { i =>
      val preds = conjGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val where = preds.mkString(" AND ")
      val cond = spark.sessionState.sqlParser
        .parsePlan(s"DELETE FROM t WHERE $where") match {
          case DeleteFromTable(_, c) => c
          case other => fail(s"unexpected parse: $other")
        }
      val box = LakeSql.toBox(cond, spec)
      val viaBox = data.filter(inBox(box))
        .agg(count(lit(1)), coalesce(sum(col("id")), lit(0L))).head()
      val viaSql = data.filter(expr(where))
        .agg(count(lit(1)), coalesce(sum(col("id")), lit(0L))).head()
      assert(viaBox == viaSql,
        s"box diverges from predicate for: $where (box=$box)")
    }
  }

  test("property: a contradictory conjunction compiles to an empty box") {
    val cond = spark.sessionState.sqlParser
      .parsePlan("DELETE FROM t WHERE x > 50 AND x < 40") match {
        case DeleteFromTable(_, c) => c
      }
    val box = LakeSql.toBox(cond, spec)
    assert(data.filter(inBox(box)).isEmpty)
  }
}
