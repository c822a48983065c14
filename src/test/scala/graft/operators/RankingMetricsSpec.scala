package graft.operators

import graft.{SparkEntry, SparkSpec}

/** s16 (MRR / NDCG@10 retrieval audit) checked for internal consistency
  * against the engine's own oracle-gated ranked lists: the metrics s16
  * reports must equal the metrics recomputed driver-side from s01 (exact
  * top-10), s02 (IVF probe), and s04 (sign-LSH probe) — the three frames
  * s16 derives its ranks from. Also pins the rank-awareness property that
  * separates NDCG from s08's recall: a method's ndcg is 1 iff its list
  * IS the exact list in exact order. */
class RankingMetricsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ranked(name: String): Seq[Long] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.getLong(0)).toSeq

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  private def metrics(exact: Seq[Long], method: Seq[Long])
      : (Long, Double, Double, Double) = {
    val erank = exact.zipWithIndex.map { case (v, i) => v -> (i + 1) }.toMap
    val rel   = (v: Long) => erank.get(v).map(11 - _).getOrElse(0)
    val hits  = method.count(erank.contains)
    val firstHit = method.zipWithIndex
      .collectFirst { case (v, i) if erank.contains(v) => i + 1 }
    val mrr  = firstHit.map(1.0 / _).getOrElse(0.0)
    val dcg  = method.zipWithIndex.map { case (v, i) =>
      rel(v).toDouble / log2(i + 2.0)
    }.sum
    val idcg = exact.zipWithIndex.map { case (v, i) =>
      (10 - i).toDouble / log2(i + 2.0)
    }.sum
    (hits.toLong, mrr, dcg, dcg / idcg)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("s16 equals metrics recomputed from the s01/s02/s04 ranked lists") {
    val exact = ranked("s01_ann_brute_topk")
    val byMethod = Map(
      "ivf" -> ranked("s02_ann_ivf"),
      "lsh" -> ranked("s04_ann_lsh"))
    val got = SparkEntry.queries("s16_ranking_metrics")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet === byMethod.keySet)
    for ((m, lst) <- byMethod) {
      val (hits, mrr, dcg, ndcg) = metrics(exact, lst)
      val (gh, gm, gd, gn)       = got(m)
      assert(gh === hits, s"$m n_hits")
      assert(math.abs(gm - round6(mrr)) < 1e-9, s"$m mrr: $gm vs $mrr")
      assert(math.abs(gd - round6(dcg)) < 1e-6, s"$m dcg: $gd vs $dcg")
      assert(math.abs(gn - round6(ndcg)) < 1e-6, s"$m ndcg: $gn vs $ndcg")
    }
  }

  test("ndcg is rank-aware: 1.0 exactly for the exact list in exact " +
    "order, strictly below 1.0 for any order-damaged variant of it") {
    val exact = ranked("s01_ann_brute_topk")
    val (_, mrrSelf, _, ndcgSelf) = metrics(exact, exact)
    assert(mrrSelf === 1.0)
    assert(math.abs(ndcgSelf - 1.0) < 1e-12)
    // Same set, reversed order: recall@10 (s08's metric) would still read
    // 100% — NDCG must drop. This is the property s16 adds to the audit.
    val (_, _, _, ndcgRev) = metrics(exact, exact.reverse)
    assert(ndcgRev < 1.0 - 1e-6,
      "reversed exact list must score strictly below 1")
  }
}
