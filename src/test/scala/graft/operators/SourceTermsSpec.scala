package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t20 (contrastive source vocabulary) checked against a sequential
  * replay of the two ppm rates and the top-3 ranking — the test that
  * would catch a rest-rate computed against the WHOLE corpus instead of
  * the complement, or a signed division sneaking into the lift.
  */
class SourceTermsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t20 lifts and top-3 ranking match a sequential replay of the " +
    "complement-rate arithmetic") {
    val terms = graft.Tables.documents(spark, sf)
      .selectExpr("source", "text")
      .collect()
      .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))

    val f = terms.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val tSrc = terms.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
    val fTerm = terms.groupBy(_._2).map { case (t, g) => t -> g.length.toLong }
    val tAll = terms.length.toLong

    val expected = f.keys.toSeq.map { case (src, term) =>
      val srcPpm = 1000000L * f((src, term)) / tSrc(src)
      val restPpm =
        1000000L * (fTerm(term) - f((src, term))) / (tAll - tSrc(src))
      (src, term, srcPpm, restPpm, srcPpm - restPpm)
    }.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (_, g) =>
      g.sortBy(e => (-e._5, e._2)).take(3).zipWithIndex.map {
        case ((src, term, sp, rp, lift), i) =>
          (src, (i + 1).toLong, term, sp, rp, lift)
      }
    }

    val got = SparkEntry.queries("t20_source_terms")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))

    assert(got.toSeq === expected)
    // A distinctive term is actually distinctive: rank-1 lift positive
    // everywhere, and the term's in-source rate beats its complement rate.
    assert(expected.filter(_._2 == 1L).forall(e => e._6 > 0 && e._4 > e._5))
  }
}
