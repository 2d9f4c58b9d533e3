package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deletion-neighborhood fuzzy matching: complete for distance ≤ 1 (the
  * theorem the bucketing rests on), exact-verified (no false pairs). */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("finds exactly the planted one-edit pairs, never distance-2 ones") {
    val rows = Seq(
      (1L, "warehouse"), (2L, "warehouze"),  // substitution: dist 1
      (3L, "warehous"),                      // deletion of 1: dist 1
      (4L, "xwarehouse"),                    // insertion into 1: dist 1
      (5L, "warehouze!"),                    // dist 1 of 2, dist 2 of 1
      (6L, "completely-different"),
      (7L, "warehXuze")                      // dist 1 of 2, dist 2 of 1
    ).toDF("id", "name")
    val pairs = Fuzzy.editDistance1Pairs(rows, "id", "name")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth (self-contained DP levenshtein)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val all = rows.collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(pairs == truth)
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((1L, 4L)) && pairs.contains((2L, 5L)) &&
      pairs.contains((2L, 7L)))
    assert(!pairs.contains((1L, 5L)) && !pairs.exists(p =>
      p._1 == 6L || p._2 == 6L))
  }
}
