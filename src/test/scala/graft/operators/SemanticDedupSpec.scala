package graft.operators

import graft.{SparkEntry, SparkSpec}

/** d17 (SemDeDup-style exemplar dedup) checked against a sequential
  * replay of the whole chain — E-step argmin, exemplar selection, and
  * the sqrt-free cosine threshold — with the same left-to-right double
  * fold the engine and oracle use, plus the invariants that make the
  * pass safe: an exemplar never drops itself, and the drop rate is
  * neither zero nor total (the threshold actually separates).
  */
class SemanticDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("d17 per-cluster drop report matches a sequential replay of " +
    "assign → exemplar → cos>0.25 pruning") {
    val e = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    val cents = e.take(8).map { case (id, v) => (id, v) }

    val assigned = e.map { case (id, v) =>
      val na = dot(v, v)
      val best = cents.map { case (cid, cv) =>
        ((na + dot(cv, cv)) - 2 * dot(v, cv), cid)
      }.min
      (best._2, id, v, best._1) // cid, vec_id, vec, dist
    }
    val expected = assigned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (cid, members) =>
        val (_, exId, exV, _) =
          members.minBy(m => (m._4, m._2))
        val flags = members.map { case (_, id, v, _) =>
          val dt = dot(v, exV)
          val dropped = id != exId && dt > 0 &&
            dt * dt > 0.0625 * dot(v, v) * dot(exV, exV)
          (id, dropped)
        }
        (cid, exId, members.size.toLong,
          flags.count(_._2).toLong, flags.count(!_._2).toLong,
          flags.filter(_._2).map(_._1).sum)
    }

    val got = SparkEntry.queries("d17_semantic_exemplar_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    assert(got.toSeq === expected)
    val (dropped, total) =
      (expected.map(_._4).sum, expected.map(_._3).sum)
    assert(dropped > 0, "threshold dropped nothing — pass is vacuous")
    assert(dropped < total, "threshold dropped everything")
    // Exemplars always survive: every cluster keeps at least one.
    assert(expected.forall(_._5 >= 1))
  }
}
