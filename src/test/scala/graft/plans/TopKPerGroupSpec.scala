package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom bounded-heap top-k operator must match the window
  * formulation exactly (same rows, ties broken by the same keys) and
  * plan as advertised: one hash exchange on the group key, a
  * TopKPerGroupExec, and NO Window or per-group Sort operator. */
class TopKPerGroupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def customers = graft.Tables.customer(spark, sf)

  private def windowTopK(k: Int) = {
    val w = Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customers
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  private def customTopK(k: Int) =
    TopK.perGroup(
      spark, customers,
      Seq(col("c_nationkey")),
      Seq(col("c_acctbal").desc, col("c_custkey").asc),
      k)

  test("matches the window row_number formulation for several k") {
    for (k <- Seq(1, 3, 10, 1000)) {
      val expected = windowTopK(k)
        .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
        .collect().toSeq
      val got = customTopK(k)
        .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
        .collect().toSeq
      assert(got == expected, s"mismatch at k=$k")
    }
  }

  test("plans partial heaps below the hash shuffle and a final heap above " +
    "it, with no Window/Sort") {
    val plan = customTopK(3).queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings. The tree
    // prints top-down: final TopKPerGroup, then the exchange, then the
    // map-side partial — the partial-aggregation shape for top-k.
    assert(plan.contains("TopKPerGroup "))
    assert(plan.contains("TopKPerGroupPartial"))
    assert(plan.contains("hashpartitioning(c_nationkey"))
    val iFinal    = plan.indexOf("TopKPerGroup ")
    val iExchange = plan.indexOf("Exchange")
    val iPartial  = plan.indexOf("TopKPerGroupPartial")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"want final<exchange<partial, got $iFinal/$iExchange/$iPartial:\n$plan")
    assert(!plan.contains("Window"))
    assert(!plan.contains("Sort "))
  }

  test("k larger than every group returns all rows") {
    assert(customTopK(100000).count() == customers.count())
  }

  test("rejects non-positive k") {
    intercept[IllegalArgumentException](customTopK(0).collect())
  }
}
