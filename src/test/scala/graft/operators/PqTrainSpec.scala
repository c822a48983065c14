package graft.operators

import graft.{SparkEntry, SparkSpec}

/** s17 (PQ codebook training) checked against a full driver-side replay
  * of the per-subspace assignment (s11's exact codebook, distance
  * rounding, and tie order) and the m-step cell statistics, plus the
  * Lloyd descent guarantee the update exists to provide: the updated
  * centroid's distortion never exceeds the current codeword's. */
class PqTrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private case class Cell(
      n: Long, before: Double, after: Double, csum: Double, cl2: Double)

  private def recompute(): Map[(Int, Int), Cell] = {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val cb = (1 to 16).map(c => c -> vecs(c.toLong)).toMap
    def sub(v: Array[Double], m: Int): Array[Double] =
      v.slice((m - 1) * 16, m * 16)
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val corpus = vecs.view.filterKeys(_ != 0L).toMap
    val assigned = for {
      (_, v) <- corpus.toSeq
      m <- 1 to 4
    } yield {
      val x = sub(v, m)
      val (d2, code) = (1 to 16).map { c =>
        val w = sub(cb(c), m)
        (round9(x.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum), c)
      }.min
      (m, code, x, d2)
    }
    assigned.groupBy { case (m, code, _, _) => (m, code) }
      .map { case (key, g) =>
        val n  = g.size
        val xs = g.map(_._3)
        val sj = (0 until 16).map(j => xs.map(_(j)).sum)
        val sq = xs.map(_.map(x => x * x).sum).sum
        val s2 = sj.map(x => x * x).sum
        key -> Cell(
          n.toLong,
          g.map(_._4).sum / n,
          (sq - s2 / n) / n,
          sj.sum / n,
          math.sqrt(s2) / n)
      }
  }

  test("s17 matches a driver-side replay of the assignment and the " +
    "m-step cell statistics for every (subspace, code) cell") {
    val expected = recompute()
    val got = SparkEntry.queries("s17_pq_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (key, (n, before, after, csum, cl2)) =>
      val e = expected(key)
      assert(n === e.n, s"cell $key count")
      assert(math.abs(before - e.before) < 1e-5, s"cell $key dist_before")
      assert(math.abs(after - e.after) < 1e-5, s"cell $key dist_after")
      assert(math.abs(csum - e.csum) < 1e-5, s"cell $key centroid_sum")
      assert(math.abs(cl2 - e.cl2) < 1e-5, s"cell $key centroid_l2")
    }
  }

  test("Lloyd descent: the updated centroid's distortion never exceeds " +
    "the current codeword's, in every cell") {
    val got = SparkEntry.queries("s17_pq_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (m, code, before, after) =>
      assert(after <= before + 1e-9,
        s"cell ($m,$code): after $after > before $before")
    }
  }
}
