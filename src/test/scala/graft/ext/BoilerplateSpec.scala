package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  test("strips frequent lines, keeps unique lines in order") {
    val docs = (1 to 20).map { i =>
      (i.toLong, s"HEADER\nbody line $i\nmore $i\nFOOTER")
    }.toDF("id", "page")
    val out = TextAnalysis.removeBoilerplateLines(docs, "id", "page",
        minDocFrac = 0.5)
      .orderBy("id").collect()
    assert(out.length == 20)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == s"body line $id\nmore $id")
      assert(r.getLong(2) == 4L && r.getLong(3) == 2L)
    }
  }

  test("a document of pure boilerplate survives as empty text") {
    val docs = ((1 to 9).map(i => (i.toLong, s"CHROME\nunique $i")) :+
      (10L, "CHROME")).toDF("id", "page")
    val out = TextAnalysis.removeBoilerplateLines(docs, "id", "page",
      minDocFrac = 0.5)
    val pure = out.filter(col("id") === 10).head()
    assert(pure.getString(1) == "" && pure.getLong(2) == 1L &&
      pure.getLong(3) == 1L)
    assert(out.count() == 10)
  }

  test("minDocs floor: tiny corpora never strip a merely-shared line") {
    // 3 docs, frac 0.5 → ceil = 2, but minDocs = 4 dominates: nothing goes
    val docs = Seq((1L, "X\na"), (2L, "X\nb"), (3L, "X\nc"))
      .toDF("id", "page")
    val out = TextAnalysis.removeBoilerplateLines(docs, "id", "page",
      minDocFrac = 0.5, minDocs = 4)
    assert(out.agg(sum("n_removed")).head().getLong(0) == 0L)
  }
}
