package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q123 (EXCEPT ALL / INTERSECT ALL multiset reconcile) checked against a
  * sequential replay of the bag algebra from the raw order/customer keys,
  * plus the structural invariants the multiset semantics promise: for a
  * customer with n ≥ 1 orders the except row carries n − 1 copies (absent
  * when n = 1), the intersect row exactly 1, and order-less customers
  * appear in neither rollup.
  */
class ExceptAllSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q123 multiplicities match the bag algebra replay and its " +
    "invariants") {
    val orderKeys = graft.Tables.orders(spark, sf)
      .selectExpr("o_custkey").collect().map(_.getLong(0))
    val custKeys = graft.Tables.customer(spark, sf)
      .selectExpr("c_custkey").collect().map(_.getLong(0)).toSet

    val perCust = orderKeys.groupBy(identity).map { case (k, g) =>
      k -> g.length.toLong
    }
    val expected = (
      perCust.collect {
        case (k, n) if custKeys(k) && n > 1 => ("except_all", k, n - 1)
        case (k, n) if !custKeys(k) => ("except_all", k, n)
      } ++
      perCust.collect {
        case (k, _) if custKeys(k) => ("intersect_all", k, 1L)
      }
    ).toSeq.sorted

    val got = SparkEntry.queries("q123_except_all")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(got.toSeq === expected)
    // Both ops populated; every fixture order references a real customer
    // (so except multiplicities are exactly n − 1, never the orphan arm).
    assert(expected.exists(_._1 == "except_all"))
    assert(expected.exists(_._1 == "intersect_all"))
    assert(orderKeys.forall(custKeys), "fixture grew orphan orders")
  }
}
