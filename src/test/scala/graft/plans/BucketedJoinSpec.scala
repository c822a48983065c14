package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The bucketed co-located join (q42) must actually deliver what it
  * promises: joining the two bucketed tables plans NO exchange on either
  * side — the bucket layout satisfies the join's distribution
  * requirement — while producing exactly the rows of the plain parquet
  * join. */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q42's bucketed tables join with zero Exchange and match the " +
    "plain parquet join") {
    // Running the query creates the bucketed tables (idempotent).
    val agg = SparkEntry.queries("q42_bucketed_join")(spark, sf)
    val tag = "sf0_001"
    val joined = spark.table(s"graft_orders_b_$tag").hint("MERGE")
      .join(
        spark.table(s"graft_lineitem_b_$tag"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_linenumber"))
    joined.collect() // finalize any adaptive planning before reading the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")

    // Same rows as the unbucketed formulation.
    val expected = graft.Tables.orders(spark, sf)
      .join(
        graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(agg.collect().toSeq == expected)
  }
}
