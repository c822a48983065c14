package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q117 (PageRank power iteration) checked against a sequential
  * driver-side replay of the four integer-ppm iterations — the test that
  * would catch a wrong iteration count, a misplaced floor, or a dangling-
  * node contribution leak handled differently from the oracle. */
class PageRankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q117 matches a sequential replay of 4 damped integer-ppm " +
    "iterations over the (ts, event_id)-ordered transition graph") {
    val rows = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val trans = rows.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.groupBy(identity).map { case ((p, c), xs) => (p, c, xs.size.toLong) }
      .toSeq
    val outW = trans.groupBy(_._1).map { case (p, es) =>
      p -> es.map(_._3).sum
    }
    val nodes = rows.map(_._4).distinct.sorted
    val k = nodes.length.toLong

    var rank = nodes.map(n => n -> 1000000L / k).toMap
    for (_ <- 1 to 4) {
      val contrib = trans.groupBy(_._2).map { case (c, es) =>
        c -> es.map(e => (rank(e._1) * e._3) / outW(e._1)).sum
      }
      rank = nodes.map(n =>
        n -> ((150000L / k) + (850000L * contrib.getOrElse(n, 0L)) / 1000000L))
        .toMap
    }
    val expected = nodes.map(n => (n, outW.getOrElse(n, 0L), rank(n)))

    val got = SparkEntry.queries("q117_pagerank")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(got.toSeq === expected)
    // The iteration must move mass: some node's final rank differs from
    // the uniform start, and total mass stays near 1e6 (leaks only via
    // floors and dangling nodes).
    assert(expected.exists(_._3 != 1000000L / k))
    assert(expected.map(_._3).sum > 500000L)
  }
}
