package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelyJoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  private def mkTables(): (DataFrame, DataFrame) = {
    val dir = tmpDir("rely")
    Seq((1L, "us"), (2L, "de"), (3L, "jp"))
      .toDF("nat_id", "nat_name").write.parquet(s"$dir/dim")
    Seq((10L, 1L, 5.0), (11L, 1L, 7.0), (12L, 3L, 9.0))
      .toDF("id", "nat_fk", "amount").write.parquet(s"$dir/fact")
    (spark.read.parquet(s"$dir/fact"), spark.read.parquet(s"$dir/dim"))
  }

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  test("declared RELY fk->pk join with fact-only projection is eliminated") {
    RelyConstraints.clear()
    val (fact, dim) = mkTables()
    RelyConstraints.declarePrimaryKey(dim, "nat_id")
    RelyConstraints.declareForeignKey(fact, "nat_fk", dim, "nat_id")
    val q = fact.join(dim, fact("nat_fk") === dim("nat_id"))
      .select(fact("id"), fact("amount"), fact("nat_fk"))
    assert(!hasJoin(q))
    assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(10L, 11L, 12L))
  }

  test("without declarations the join survives") {
    RelyConstraints.clear()
    val (fact, dim) = mkTables()
    val q = fact.join(dim, fact("nat_fk") === dim("nat_id"))
      .select(fact("id"))
    assert(hasJoin(q))
  }

  test("projection touching dim columns blocks elimination") {
    RelyConstraints.clear()
    val (fact, dim) = mkTables()
    RelyConstraints.declarePrimaryKey(dim, "nat_id")
    RelyConstraints.declareForeignKey(fact, "nat_fk", dim, "nat_id")
    val q = fact.join(dim, fact("nat_fk") === dim("nat_id"))
      .select(fact("id"), dim("nat_name"))
    assert(hasJoin(q))
    assert(q.count() == 3)
  }

  test("a filter on the dim side blocks elimination (it can drop rows)") {
    RelyConstraints.clear()
    val (fact, dim) = mkTables()
    RelyConstraints.declarePrimaryKey(dim, "nat_id")
    RelyConstraints.declareForeignKey(fact, "nat_fk", dim, "nat_id")
    val q = fact.join(dim.filter(col("nat_id") =!= 3L),
        fact("nat_fk") === dim("nat_id"))
      .select(fact("id"))
    assert(hasJoin(q))
    assert(q.count() == 2)
  }

  test("a different dim with the same pk column name is not confused") {
    RelyConstraints.clear()
    val (fact, dim) = mkTables()
    val dir2 = tmpDir("rely2")
    Seq((1L, "x")).toDF("nat_id", "other").write.parquet(s"$dir2/dim2")
    val dim2 = spark.read.parquet(s"$dir2/dim2")
    RelyConstraints.declarePrimaryKey(dim2, "nat_id")
    RelyConstraints.declareForeignKey(fact, "nat_fk", dim2, "nat_id")
    // fk points at dim2, not dim → the dim join must survive
    val q = fact.join(dim, fact("nat_fk") === dim("nat_id"))
      .select(fact("id"))
    assert(hasJoin(q))
  }
}
