package graft.operators

import graft.{SparkEntry, SparkSpec}

/** p10 (snapshot drift / TVD monitor) checked against a sequential replay
  * of the md5-parity split, the capped width-64 binning, and the
  * floor-ppm share arithmetic — plus the TVD identity (half the L1 gap,
  * identical on every row) and the well-formedness of both share columns.
  */
class SnapshotDriftSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("p10 per-bin shares and TVD match a sequential replay of the " +
    "md5-parity split + width-64 binning") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val tagged = docs.map { case (id, nc) =>
      val side = Integer.parseInt(md5hex(id.toString).substring(0, 1), 16) % 2
      (math.min(nc / 64, 8L), side)
    }
    val refTotal = tagged.count(_._2 == 0).toLong
    val curTotal = tagged.count(_._2 == 1).toLong
    val bins = tagged.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, g) =>
        val rn = g.count(_._2 == 0).toLong
        val cn = g.count(_._2 == 1).toLong
        val rp = 1000000L * rn / refTotal
        val cp = 1000000L * cn / curTotal
        (bin, rn, cn, rp, cp, math.abs(rp - cp))
    }
    val tvd = bins.map(_._6).sum / 2
    val expected = bins.map(b => (b._1, b._2, b._3, b._4, b._5, b._6, tvd))

    val got = SparkEntry.queries("p10_snapshot_drift")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

    assert(got.toSeq === expected)
    // Shares are ppm-valid and both snapshots are populated.
    assert(refTotal > 0 && curTotal > 0)
    assert(expected.map(_._4).sum <= 1000000L)
    assert(expected.map(_._5).sum <= 1000000L)
  }
}
