package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q124 (sliding distinct cardinality) checked against a sequential
  * replay of the trailing-10-row distinct count per user in (ts,
  * event_id) order — the test that would catch a frame off-by-one or a
  * distinct evaluated over the partition instead of the frame.
  */
class SlidingDistinctSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q124 trailing-frame distinct counts match a sequential replay") {
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      ordered.zipWithIndex.map { case (e, i) =>
        val frame = ordered.slice(math.max(0, i - 9), i + 1)
        (e._1, e._2, e._3, frame.length.toLong,
          frame.map(_._4).distinct.length.toLong)
      }
    }.sortBy(e => (e._1, e._2))

    val got = SparkEntry.queries("q124_sliding_distinct")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    assert(got.toSeq === expected)
    // The distinct count must actually vary (1 on first rows, >1 later).
    assert(expected.exists(_._5 == 1) && expected.exists(_._5 > 2))
    assert(expected.forall(e => e._5 <= e._4 && e._5 <= 5))
  }
}
