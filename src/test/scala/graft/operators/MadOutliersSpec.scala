package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q120 (grouped MAD outlier monitor) checked against a sequential replay
  * of the doubled-median arithmetic: med2 = lower+upper discrete median
  * pair of cents, dev2 = |2·cents − med2|, mad2 = the same pair over
  * dev2, outlier ⇔ 2·dev2 > 3·mad2 — the test that would catch an
  * off-by-one in either rank pair or a wrong doubling factor in the
  * threshold (all invisible to a rows>0 gate).
  */
class MadOutliersSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q120 med/MAD pairs, outlier counts, and ppm match a sequential " +
    "replay of the integer doubling arithmetic") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    def pair2(sorted: IndexedSeq[Long]): Long = {
      val n = sorted.length
      sorted((n + 1) / 2 - 1) + sorted(n / 2 + 1 - 1)
    }

    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, vs) =>
        val cents = vs.map(_._2).sorted.toIndexedSeq
        val n = cents.length
        val med2 = pair2(cents)
        val dev2 = cents.map(c => math.abs(2 * c - med2))
        val mad2 = pair2(dev2.sorted)
        val nOut = dev2.count(d => 2 * d > 3 * mad2).toLong
        (t, n.toLong, med2, mad2, nOut, dev2.max,
          (1000000L * nOut) / n)
    }

    val got = SparkEntry.queries("q120_mad_outliers")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

    assert(got.toSeq === expected)
    // The robust rule must actually flag something, and never everything.
    assert(expected.exists(_._5 > 0), "no outliers flagged anywhere")
    assert(expected.forall(e => e._5 < e._2), "a group flagged all rows")
  }
}
