package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Structural invariants of the q85 SCD2 build that the value-equality
  * oracle cannot express directly: versions are dense and ordered, spans
  * tile each key's timeline without overlap, exactly one version per key
  * is current, and consecutive versions never carry the same attribute
  * (change detection actually detected a change). */
class Scd2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q85: per key, versions are dense from 1, spans are half-open " +
    "non-overlapping tiles, exactly one row is current, and no two " +
    "consecutive versions share an attribute") {
    val rows = SparkEntry.queries("q85_scd2_dimension")(spark, sf)
      .select("user_id", "version", "attr", "effective_from",
        "effective_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to vs.length),
        s"user $user: versions not dense: ${sorted.map(_._2).toSeq}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4,
            s"user $user: span gap/overlap: v${a._2} ends ${a._5}, " +
              s"v${b._2} starts ${b._4}")
          assert(a._3 != b._3,
            s"user $user: consecutive versions share attr ${a._3}")
          assert(!a._6, s"user $user: non-final version v${a._2} current")
        case _ => ()
      }
      val last = sorted.last
      assert(last._6 && last._5 == "9999-12-31 00:00:00",
        s"user $user: final version must be the open current span")
    }
  }
}
