package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q121 (linear multi-touch attribution) checked against a sequential
  * per-user replay of the binding + largest-remainder split, plus the
  * conservation invariant the operator exists for: every purchase cent
  * lands in exactly one channel row (attributed or '(direct)'), so the
  * channel totals sum EXACTLY to total purchase cents.
  */
class LinearAttributionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val DayUs = 86400000000L

  test("q121 channel totals match a sequential replay and conserve " +
    "purchase cents exactly") {
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(ts)", "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))

    // Bind each touch to the smallest (tsu, event_id) purchase in
    // [touch.tsu, touch.tsu + 24h] for the same user.
    val byUser = evs.groupBy(_._1)
    val allocs = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long)] // channel,user,pId,tsu,eId
    val pCents = scala.collection.mutable.Map.empty[Long, Long]
    for ((_, us) <- byUser) {
      val purchases = us.filter(_._3 == "purchase")
      purchases.foreach(p => pCents(p._2) = p._5)
      for (t <- us if t._3 == "view" || t._3 == "click") {
        val cands = purchases
          .filter(p => p._4 >= t._4 && p._4 <= t._4 + DayUs)
        if (cands.nonEmpty) {
          val p = cands.minBy(p => (p._4, p._2))
          allocs += ((t._3, t._1, p._2, t._4, t._2))
        }
      }
    }
    // Largest-remainder equal split per purchase, extras to the earliest
    // touches in (tsu, event_id) order.
    val expected = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((pid, ts) <- allocs.groupBy(_._3)) {
      val k = ts.size
      val cents = pCents(pid)
      val ordered = ts.sortBy(t => (t._4, t._5))
      ordered.zipWithIndex.foreach { case (t, i) =>
        val share = cents / k + (if (i < cents % k) 1L else 0L)
        val (n, c) = expected.getOrElse(t._1, (0L, 0L))
        expected(t._1) = (n + 1, c + share)
      }
    }
    val chosen = allocs.map(_._3).toSet
    val direct = pCents.filter { case (id, _) => !chosen(id) }
    expected("(direct)") = (direct.size.toLong, direct.values.sum)

    val got = SparkEntry.queries("q121_linear_attribution")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    assert(got === expected.toMap)
    // Conservation: every purchase cent lands exactly once.
    assert(got.values.map(_._2).sum === pCents.values.sum,
      "attribution lost or invented money")
    // Both populated branches exist at this SF.
    assert(got.contains("view") && got.contains("click")
      && got("(direct)")._1 > 0)
  }
}
