package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t19 (cross-source vocabulary overlap) checked against a driver-side
  * set-arithmetic replay — Scala Sets compute the same intersections the
  * distinct-grid join must produce, so a dedup bug in the grid (e.g.
  * per-document instead of per-source distinct) fails here loudly. */
class SourceOverlapSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t19 matches a Set-based replay of pairwise vocabulary Jaccard " +
    "and reports each unordered pair once") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap(_._2.split(" ", -1)).toSet
    }
    val expected = (for {
      (a, va) <- vocab; (b, vb) <- vocab if a < b
      inter = (va & vb).size.toLong if inter > 0
    } yield (a, b, va.size.toLong, vb.size.toLong, inter,
      inter * 1000000L / (va.size + vb.size - inter)))
      .toSeq.sortBy(e => (e._1, e._2))

    val got = SparkEntry.queries("t19_source_overlap")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))

    assert(got.toSeq === expected)
    // The matrix must be informative: full k(k-1)/2 coverage on this
    // word-soup fixture and non-degenerate similarity values.
    val k = vocab.size
    assert(expected.size == k * (k - 1) / 2)
    assert(expected.exists(_._6 > 0))
  }
}
