package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q115 (per-user EWMA fold) checked against a sequential driver-side
  * replay of the integer-cents recurrence — the fold's order dependence
  * makes this the test that would catch a wrong sort or a wrong seed
  * (both invisible to count/sum-style invariants). */
class EwmaFoldSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q115 matches a sequential replay of e0=v0, et=floor((e+v)/2) " +
    "over each user's (ts, event_id)-ordered purchases") {
    val rows = graft.Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (u, ps) =>
        val ordered = ps.sortBy(p => (p._2, p._3)).map(_._4)
        val ewma = ordered.tail.foldLeft(ordered.head)((a, v) => (a + v) / 2)
        (u, ordered.length.toLong, ordered.last, ewma)
    }

    val got = SparkEntry.queries("q115_ewma_fold")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"user ${e._1}: got $g expected $e")
    }
    // The recurrence must actually recurse somewhere (a user with >= 3
    // purchases whose EWMA differs from both first and last value).
    assert(expected.exists(e => e._2 >= 3), "no user folds >= 3 steps")
  }
}
