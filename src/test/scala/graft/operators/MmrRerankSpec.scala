package graft.operators

import graft.{SparkEntry, SparkSpec}

/** s15 (MMR diversified re-ranking) checked against a sequential replay
  * of the full greedy walk — top-20 by rounded cosine, pairwise rounded
  * sims, 4 rounds of argmax(rel − maxsim) with vec_id tie-break — plus
  * the property the operator exists for: the MMR set DIFFERS from the
  * plain top-5 (diversity actually traded off relevance).
  */
class MmrRerankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("s15 selection sequence and scores match a sequential replay of " +
    "the greedy MMR walk") {
    val e = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qv = e.find(_._1 == 0L).get._2
    val cands = e.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, r6(dot(v, qv))) }
      .sortBy { case (id, _, rel) => (-rel, id) }
      .take(20)
    val sim = (for {
      (ai, av, _) <- cands; (bi, bv, _) <- cands if ai != bi
    } yield (ai, bi) -> r6(dot(av, bv))).toMap

    var selected = Vector(cands.head match {
      case (id, _, rel) => (1L, id, rel, rel)
    })
    for (r <- 2 to 5) {
      val chosen = selected.map(_._2).toSet
      val pick = cands.filterNot(c => chosen(c._1)).map {
        case (id, _, rel) =>
          val pen = selected.map(s => sim((id, s._2))).max
          (id, rel, rel - pen)
      }.minBy { case (id, _, score) => (-score, id) }
      selected :+= ((r.toLong, pick._1, pick._2, r6(pick._3)))
    }

    val got = SparkEntry.queries("s15_mmr_rerank")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))

    assert(got.toSeq === selected)
    // Diversity bites: the MMR set is NOT the plain top-5.
    val top5 = cands.take(5).map(_._1).toSet
    assert(selected.map(_._2).toSet != top5,
      "MMR degenerated to plain top-k — penalty never mattered")
    // Round 1 is pure relevance (no penalty yet); later scores are
    // rel − maxsim, which CAN exceed rel when every sim to the selected
    // set is negative (near-isotropic fixture vectors), so only the
    // first-round identity is invariant.
    assert(selected.head._3 === selected.head._4)
  }
}
