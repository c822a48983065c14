package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q116 (grouped winsorization) checked against a driver-side replay of
  * the discrete-rank boundary selection and the integer-cents clip — the
  * test that would catch an off-by-one in the rank arithmetic or a clip
  * that uses the wrong boundary side (both invisible to a rows>0 gate).
  */
class WinsorizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q116 boundaries, clip counts, and means match a sequential " +
    "replay of rank ceil(q*n/100) + least/greatest in integer cents") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, vs) =>
        val sorted = vs.map(_._2).sorted
        val n = sorted.length
        def rank(q: Int) = ((q * n) + 99) / 100
        val lo = sorted(rank(5) - 1)
        val hi = sorted(rank(95) - 1)
        val clipped = sorted.map(c => math.min(math.max(c, lo), hi))
        (t, n.toLong, lo, hi,
          sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong,
          sorted.sum / n, clipped.sum / n)
    }

    val got = SparkEntry.queries("q116_winsorize")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

    assert(got.toSeq === expected)
    // The clip must actually bite somewhere, on both tails.
    assert(expected.exists(_._5 > 0), "no low tail clipped anywhere")
    assert(expected.exists(_._6 > 0), "no high tail clipped anywhere")
  }
}
