package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q118 (rolling exact median) checked against a driver-side sliding-
  * window replay — the test that would catch a wrong frame bound (RANGE
  * vs ROWS, 10 vs 9 preceding) or an interpolation convention mismatch,
  * both of which still produce plausible-looking numbers. */
class RollingMedianSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q118 matches a sliding 10-row replay: med_x2 = 2*mid (odd frame) " +
    "or lowmid+highmid (even frame) over each user's ordered purchases") {
    val rows = graft.Tables.events(spark, sf)
      .filter("event_type = 'purchase'")
      .selectExpr("user_id", "unix_micros(ts)", "event_id",
        "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, ps) =>
      val ordered = ps.sortBy(p => (p._2, p._3))
      ordered.zipWithIndex.map { case ((_, tsu, eid, cents), i) =>
        val frame = ordered.slice(math.max(0, i - 9), i + 1).map(_._4).sorted
        val n = frame.length
        val medX2 =
          if (n % 2 == 1) 2 * frame(n / 2)
          else frame(n / 2 - 1) + frame(n / 2)
        (u, eid, tsu, cents, n.toLong, medX2)
      }
    }.sortBy(e => (e._1, e._2))

    val got = SparkEntry.queries("q118_rolling_median")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"user ${e._1} event ${e._2}: got $g expected $e")
    }
    // Both interpolation branches must be exercised: some full frames
    // (even, n=10) and some odd frames.
    assert(expected.exists(_._5 == 10L), "no full 10-row frame reached")
    assert(expected.exists(e => e._5 % 2 == 1), "no odd frame")
  }
}
