package graft.operators

import graft.{SparkEntry, SparkSpec}

/** s14 (JL random projection) checked against a driver-side recompute of
  * the milli-quantized projection and both distances, plus the
  * concentration property the projection exists for — E[d16] = 16·d64
  * for ±1 rows, so the ratio_ppm population must center near 10⁶. */
class JlProjectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s14 matches a driver-side recompute of the md5-sign projection " +
    "and the pair distances, and ratios concentrate near 1e6") {
    val signs = Similarity.JlSigns
    // The sign matrix itself: 16 distinct ±1 rows, each mixing both signs
    // (a constant or duplicated row would silently weaken the JL bound).
    assert(signs.size == 16 && signs.forall(_.size == 64))
    assert(signs.distinct.size == 16)
    assert(signs.forall(r => r.contains(1L) && r.contains(-1L)))

    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong)))
      .sortBy(_._1)

    def proj(m: Seq[Long]): Seq[Long] =
      signs.map(row => row.zip(m).map { case (r, q) => r * q }.sum)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    val expected = vecs.zip(vecs.drop(1)).flatMap { case ((id, am), (bid, bm)) =>
      if (bid != id + 1) None
      else {
        val (d64, d16) = (d2(am, bm), d2(proj(am), proj(bm)))
        if (d64 == 0) None
        else {
          val ap = proj(am)
          Some((id, ap.head, ap.last, d64, d16, (1000000L * d16) / (16L * d64)))
        }
      }
    }

    val got = SparkEntry.queries("s14_jl_projection")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"pair ${e._1}: got $g expected $e")
    }
    // JL concentration: the median distance-preservation ratio sits in a
    // generous band around 1e6 (16 projected dims → ~35% per-pair sd).
    val ratios = expected.map(_._6).sorted
    val median = ratios(ratios.length / 2)
    assert(median > 600000L && median < 1500000L,
      s"median ratio_ppm $median outside the JL concentration band")
  }
}
