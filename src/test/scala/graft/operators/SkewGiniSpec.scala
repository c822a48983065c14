package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q122 (key-skew Gini audit) checked against a sequential replay of the
  * ascending-order Gini formula in BigInt (so the replay can't itself
  * overflow), plus the range invariants that make the report readable:
  * gini_ppm ∈ [0, 1e6), top_share_ppm ≥ ⌊1e6/n⌋.
  */
class SkewGiniSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q122 gini and top-share ppm match a BigInt replay of the " +
    "ascending-counts formula") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "user_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, vs) =>
        val counts = vs.groupBy(_._2).toSeq
          .map { case (u, g) => (g.size.toLong, u) }
          .sortBy(identity) // ascending (count, user_id)
        val n = counts.size.toLong
        val tot = counts.map(_._1).sum
        val s1 = counts.zipWithIndex
          .map { case ((c, _), i) => BigInt(i + 1) * c }.sum
        val gini = (BigInt(1000000) * (2 * s1 - BigInt(n + 1) * tot)) /
          (BigInt(n) * tot)
        val top = (1000000L * counts.map(_._1).max) / tot
        (t, n, tot, gini.toLong, top)
    }

    val got = SparkEntry.queries("q122_skew_gini")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    assert(got.toSeq === expected)
    assert(expected.forall(e => e._4 >= 0 && e._4 < 1000000L))
    assert(expected.forall(e => e._5 >= 1000000L / e._2))
  }
}
