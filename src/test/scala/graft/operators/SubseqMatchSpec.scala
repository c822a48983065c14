package graft.operators

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}

/** q128 (z-normalized subsequence motif search) checked against a full
  * driver-side replay of every user's sliding windows and distances,
  * plus the shape-invariance property the z-normalization exists to
  * provide: a planted exact ramp — at any offset and scale — scores
  * distance 0 and ranks first, while the inverted ramp scores the
  * antipodal maximum 4·L = 32. */
class SubseqMatchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val L  = 8

  private def bruteTop10(
      events: Seq[(Long, Long, Long, Double)]) // user, event, tsu, value
      : Seq[(Long, Long, Double)] = {
    val zq = (1 to L).map(i => (i - 4.5) / math.sqrt(5.25))
    events.groupBy(_._1).toSeq.flatMap { case (user, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      ordered.sliding(L).filter(_.size == L).flatMap { win =>
        val xs = win.map(_._4)
        val mu = xs.sum / L
        val sq = xs.map(x => x * x).sum
        val v2 = sq / L - mu * mu
        if (v2 <= 1e-12) None
        else {
          val dist = xs.zip(zq).map { case (x, q) =>
            math.pow((x - mu) / math.sqrt(v2) - q, 2) }.sum
          Some((user, win.head._2,
            BigDecimal(dist).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble))
        }
      }
    }.sortBy { case (u, e, dRounded) => (dRounded, u, e) }.take(10)
  }

  test("q128 matches a driver-side replay of every sliding window's " +
    "z-normalized ramp distance (full fixture top-10)") {
    val events = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts)", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val expected = bruteTop10(events)
    val got = SparkEntry.queries("q128_subseq_match")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .toSeq
    assert(got.map(g => (g._1, g._2)) === expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case ((_, _, d), (_, _, ed)) =>
      assert(math.abs(d - ed) < 1e-5) }
  }

  test("planted ramp at an arbitrary offset and scale scores 0 and " +
    "ranks first; the inverted ramp scores the antipodal 4L = 32") {
    import spark.implicits._
    // User 1: noise, then a scaled+shifted ascending ramp (15 events →
    // 8 windows). User 2: the descending ramp at another scale (1
    // window). 9 scorable windows total, so every window — including
    // the antipodal worst — lands inside the top-10 output.
    def ev(id: Long, user: Long, sec: Int, v: Double) =
      (id, new Timestamp(1700000000000L + sec * 1000L), user, "x", v, "{}")
    val ramp = (1 to L).map(i => 500.0 + 37.5 * i)
    val anti = (1 to L).map(i => 90.0 - 11.0 * i)
    val noise = Seq(3.0, 141.0, 59.0, 26.0)
    val rows =
      noise.zipWithIndex.map { case (v, i) => ev(i, 1L, i, v) } ++
        ramp.zipWithIndex.map { case (v, i) => ev(100L + i, 1L, 100 + i, v) } ++
        Seq(ev(200L, 1L, 200, 77.0), ev(201L, 1L, 201, 18.0),
          ev(202L, 1L, 202, 64.0)) ++
        anti.zipWithIndex.map { case (v, i) => ev(300L + i, 2L, i, v) }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_subseq_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q128_subseq_match")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.head._1 == 1L && got.head._2 == 100L,
      s"top-1 must be the planted ramp window: ${got.head}")
    assert(got.head._3 == 0.0, s"ramp distance ${got.head._3}")
    val antiRow = got.find(g => g._1 == 2L && g._2 == 300L)
    assert(antiRow.isDefined, "inverted ramp window must be in top-10 " +
      "of this small corpus")
    assert(math.abs(antiRow.get._3 - 32.0) < 1e-6,
      s"antipodal distance ${antiRow.get._3}")
  }
}
