package graft.sql

import org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.sql.LakeSql.LakeTableSpec

/** Property check for the TYPED SQL-predicate → (manifest-prune, row
  * predicate) compiler: for ANY conjunction of comparison / IN /
  * prefix-LIKE predicates over numeric AND string stats columns — both
  * operand orders, strict and inclusive bounds, residual conjuncts on
  * non-stats columns — the compiled row predicate must select EXACTLY the
  * rows the SQL predicate selects, and the compiled prune expression must
  * select a SUPERSET of the files containing matching rows (stats can
  * over-include, never under-include — an under-inclusion is a
  * DELETE/UPDATE that silently misses rows). Generators use fixed seeds
  * (the scalatest↔scalacheck bridge isn't available offline). */
class BoxCompilerPropertySpec extends SparkSpec {

  private val spec = LakeTableSpec("/none", "/none", Seq("x", "y", "s", "d"))

  // columns: x,y numeric stats; s string stats (20 categories c00..c19);
  // d timestamp stats (100 distinct days from 1995-05-09); id non-stats
  private val data = spark.range(2000).select(
    col("id"),
    pmod(xxhash64(col("id")), lit(100)).as("x"),
    pmod(xxhash64(col("id"), lit(1)), lit(100)).as("y"),
    concat(lit("c"), lpad(pmod(xxhash64(col("id"), lit(2)), lit(20))
      .cast("string"), 2, "0")).as("s"),
    timestamp_seconds(lit(800000000L) +
      pmod(xxhash64(col("id"), lit(3)), lit(100)) * 86400).as("d"))
    .withColumn("fid", (col("x") / 10).cast("int"))
    .localCheckpoint()

  // simulated file manifest: files bucketed by x-range, native-typed
  // min_/max_ stats per stats column (string boxes lexical, timestamp
  // boxes native — exactly what the scan-built manifest collects)
  private val manifest = data.groupBy(col("fid"))
    .agg(min("x").as("min_x"), max("x").as("max_x"),
      min("y").as("min_y"), max("y").as("max_y"),
      min("s").as("min_s"), max("s").as("max_s"),
      min("d").as("min_d"), max("d").as("max_d"))
    .localCheckpoint()

  private def compile(where: String) = {
    val cond = spark.sessionState.sqlParser
      .parsePlan(s"DELETE FROM t WHERE $where") match {
        case DeleteFromTable(_, c) => c
        case other => fail(s"unexpected parse: $other")
      }
    LakeSql.compileWhere(cond, spec)
  }

  private val numPred: Gen[String] = for {
    c <- Gen.oneOf("x", "y")
    op <- Gen.oneOf("<", "<=", ">", ">=", "=")
    v <- Gen.choose(-5, 105)
    mirrored <- Gen.oneOf(true, false)
  } yield if (mirrored) s"$v $op $c" else s"$c $op $v"

  private val strPred: Gen[String] = Gen.oneOf(
    for {
      op <- Gen.oneOf("<", "<=", ">", ">=", "=")
      v <- Gen.choose(-2, 21)
      mirrored <- Gen.oneOf(true, false)
    } yield {
      val s = f"'c$v%02d'"
      if (mirrored) s"$s $op s" else s"s $op $s"
    },
    Gen.oneOf("s LIKE 'c0%'", "s LIKE 'c1%'",
      "s IN ('c03', 'c07', 'c11')", "s IN ('c00', 'c19', 'c42')"))

  private val resPred: Gen[String] =
    Gen.oneOf("id % 3 = 0", "id % 2 = 1", "x % 5 < 3")

  private val conjGen: Gen[List[String]] = for {
    lead <- Gen.oneOf(numPred, strPred)
    n <- Gen.choose(0, 3)
    rest <- Gen.listOfN(n, Gen.frequency(
      4 -> numPred, 3 -> strPred, 2 -> resPred))
  } yield lead :: rest

  test("property: row predicate ≡ SQL predicate; prune ⊇ matching files") {
    (0 until 80).foreach { i =>
      val preds = conjGen.pureApply(Gen.Parameters.default, Seed(2000L + i))
      val where = preds.mkString(" AND ")
      val (prune, pred) = compile(where)
      val viaPred = data.filter(pred)
        .agg(count(lit(1)), coalesce(sum(col("id")), lit(0L))).head()
      val viaSql = data.filter(expr(where))
        .agg(count(lit(1)), coalesce(sum(col("id")), lit(0L))).head()
      assert(viaPred == viaSql,
        s"row predicate diverges from SQL for: $where")
      val matchFiles = data.filter(expr(where)).select(col("fid"))
        .distinct().collect().map(_.getInt(0)).toSet
      val prunedFiles = manifest.filter(prune).select(col("fid"))
        .collect().map(_.getInt(0)).toSet
      assert(matchFiles.subsetOf(prunedFiles),
        s"prune under-included for: $where — matching files " +
          s"${matchFiles -- prunedFiles} not selected")
    }
  }

  test("property: cover ⊆ all-rows-matching files (whole-file drop sound)") {
    // dual of the prune property: the whole-file drop proof must
    // UNDER-include — a file it selects must have EVERY row matching the
    // SQL predicate (an over-inclusion is a DELETE that silently removes
    // surviving rows with the file). Residual conjuncts must disable it
    // outright. (Null handling is the footer half of the proof, covered
    // with real files in LakeSurfaceR14Spec — this data is null-free.)
    var fired = 0
    (0 until 80).foreach { i =>
      val preds = conjGen.pureApply(Gen.Parameters.default, Seed(9000L + i))
      val where = preds.mkString(" AND ")
      val cond = spark.sessionState.sqlParser
        .parsePlan(s"DELETE FROM t WHERE $where") match {
          case DeleteFromTable(_, c) => c
          case other => fail(s"unexpected parse: $other")
        }
      LakeSql.compileCover(cond, spec) match {
        case None => () // residual/unsupported conjunct — rewrite path
        case Some((cov, needCols)) =>
          assert(needCols.nonEmpty, s"cover with no null-proof cols: $where")
          val covFiles = manifest.filter(cov).select(col("fid"))
            .collect().map(_.getInt(0)).toSet
          val fullFiles = data.groupBy(col("fid"))
            .agg(count(lit(1)).as("n"),
              sum(when(expr(where), 1).otherwise(0)).as("m"))
            .filter(col("n") === col("m")).select(col("fid"))
            .collect().map(_.getInt(0)).toSet
          assert(covFiles.subsetOf(fullFiles),
            s"cover OVER-included for: $where — files " +
              s"${covFiles -- fullFiles} have surviving rows")
          fired += covFiles.size
      }
    }
    assert(fired > 0, "cover never selected a file in 80 cases — vacuous")
  }

  test("64-bit keys never round-trip through double (2^53 + 1 is exact)") {
    val big = spark.range(2).select(
      (lit(9007199254740992L) + col("id")).as("x"), // 2^53, 2^53+1
      col("id"), lit("c00").as("s"),
      timestamp_seconds(lit(800000000L)).as("d"))
      .withColumn("y", col("x"))
    val (prune, pred) = compile("x = 9007199254740993")
    assert(big.filter(pred).count() == 1L,
      "pred must match exactly the 2^53+1 row, not its double-collapsed twin")
    val m = big.agg(min("x").as("min_x"), max("x").as("max_x"))
    assert(m.filter(prune).count() == 1L, "stats box must intersect")
  }

  test("timestamp range WHERE compiles typed and prunes soundly") {
    val where =
      "d >= TIMESTAMP '1995-06-01 00:00:00' AND d < TIMESTAMP '1995-07-01 00:00:00'"
    val (prune, pred) = compile(where)
    val exact = data.filter(expr(where)).select(col("id"))
    val viaPred = data.filter(pred).select(col("id"))
    assert(exact.exceptAll(viaPred).isEmpty && viaPred.exceptAll(exact).isEmpty)
    val matchFiles = data.filter(expr(where)).select(col("fid"))
      .distinct().collect().map(_.getInt(0)).toSet
    val prunedFiles = manifest.filter(prune).select(col("fid"))
      .collect().map(_.getInt(0)).toSet
    assert(matchFiles.subsetOf(prunedFiles))
  }

  test("a contradictory conjunction selects no rows") {
    val (_, pred) = compile("x > 50 AND x < 40")
    assert(data.filter(pred).isEmpty)
  }

  test("residual-only WHERE (nothing prunable) is rejected loudly") {
    val e1 = intercept[IllegalArgumentException](compile("id = 3"))
    assert(e1.getMessage.contains("prune"))
    val e2 = intercept[IllegalArgumentException](compile("x % 2 = 0"))
    assert(e2.getMessage.contains("prune"))
  }

  test("LIKE prunes only on literal-prefix patterns") {
    // prefix form prunes; mid-pattern wildcard must NOT count as pruning
    val (_, _) = compile("s LIKE 'c1%'")
    val e = intercept[IllegalArgumentException](compile("s LIKE '%c1'"))
    assert(e.getMessage.contains("prune"))
  }
}
