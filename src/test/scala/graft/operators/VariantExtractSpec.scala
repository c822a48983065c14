package graft.operators

import graft.{SparkEntry, SparkSpec}

/** q113 (VARIANT semi-structured extraction) checked against a
  * driver-side replay that parses props with a plain regex — independent
  * of both engines' JSON machinery — and pins the try_variant_get
  * missing-path contract (NULL, never an error, so the count is 0). */
class VariantExtractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val KRe = """\{\s*"k"\s*:\s*(-?\d+)\s*\}""".r

  test("q113 matches a driver-side parse of props per event_type, and " +
    "the probed missing path is NULL everywhere") {
    val rows = graft.Tables.events(spark, sf)
      .select("event_type", "props").collect()
      .map(r => (r.getString(0), r.getString(1)))

    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (et, rs) =>
        val ks = rs.flatMap(_._2 match {
          case KRe(k) => Some(k.toLong)
          case _      => None
        })
        (et, rs.length.toLong, ks.length.toLong, ks.sum, ks.min, ks.max,
          ks.distinct.length.toLong, 0L)
    }

    val got = SparkEntry.queries("q113_variant_extract")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"event_type ${e._1}: got $g expected $e")
    }
    // Fixture must actually carry the k field everywhere it claims to.
    assert(expected.forall(e => e._3 === e._2),
      "fixture props unexpectedly missing k — replay regex may be stale")
  }
}
