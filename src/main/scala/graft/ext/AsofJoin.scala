package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * For each left row, attach the most recent right row with the same key and
  * `rightTs <= leftTs`. Implemented with the union-sentinel pattern: tag both
  * sides, union them, sort within key by (ts, side, tie-break), and carry the
  * right side's payload forward with `last(_, ignoreNulls = true)` over a
  * running window. This costs ONE shuffle (hash by key) + an in-partition
  * sort — versus the naive `left join right ON key AND rightTs <= leftTs`
  * which explodes to |matches| rows per left row before re-aggregating.
  * At 100 TB this is the difference between a linear merge and a quadratic
  * join; it is the same plan a native as-of physical operator would produce.
  *
  * Determinism: right rows tie-broken by `rightTieBreak` (ascending order +
  * `last()` ⇒ the max tie-break wins), and a right row at exactly leftTs
  * sorts before the left row, giving `<=` semantics.
  */
object AsofJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           rightPayload: Seq[String],
           rightTieBreak: String): DataFrame = {
    val lCols = left.columns
    // left rows: payload columns null; side=1 so they sort after right rows
    // that share the same timestamp (inclusive <= semantics).
    val lTagged = left
      .withColumn("_key", col(leftKey))
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast(right.schema(rightTieBreak).dataType))
    val lShaped = rightPayload.foldLeft(lTagged) { (df, c) =>
      df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rTagged = right
      .withColumn("_key", col(rightKey))
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_tb", col(rightTieBreak))
    val rShaped = {
      val withPayload = rightPayload.foldLeft(rTagged) { (df, c) =>
        df.withColumn(s"_r_$c", col(c))
      }
      // null out the left schema so unionByName aligns
      lCols.foldLeft(withPayload) { (df, c) =>
        if (right.columns.contains(c) || c == "_key") df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val unionCols = (lCols.toSeq ++ Seq("_key", "_ts", "_side", "_tb") ++
      rightPayload.map(c => s"_r_$c")).map(col)
    val unioned = lShaped.select(unionCols: _*)
      .unionByName(rShaped.select(unionCols: _*))

    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .select(lCols.map(col) ++
        rightPayload.map(c => col(s"_asof_$c").as(s"asof_$c")): _*)
  }
}
