package graft.operators

import graft.{SparkEntry, SparkSpec}

/** s17 (PQ codebook training) checked against a full driver-side replay
  * of the per-subspace assignment (s11's exact codebook, distance
  * rounding, and tie order) and the m-step cell statistics, plus the
  * Lloyd descent guarantee the update exists to provide: the updated
  * centroid's distortion never exceeds the current codeword's. */
class PqTrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s17 matches a driver-side replay of the assignment and the " +
    "m-step cell statistics for every (subspace, code) cell") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    // Replay definition shared with CurationOpsProps (CurationOracles).
    val expected = CurationOracles.pqCells(vecs)
    val got = SparkEntry.queries("s17_pq_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (key, (n, before, after, csum, cl2)) =>
      val (en, eBefore, eAfter, eCsum, eCl2) = expected(key)
      assert(n === en, s"cell $key count")
      assert(math.abs(before - eBefore) < 1e-5, s"cell $key dist_before")
      assert(math.abs(after - eAfter) < 1e-5, s"cell $key dist_after")
      assert(math.abs(csum - eCsum) < 1e-5, s"cell $key centroid_sum")
      assert(math.abs(cl2 - eCl2) < 1e-5, s"cell $key centroid_l2")
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
