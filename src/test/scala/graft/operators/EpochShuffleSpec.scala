package graft.operators

import graft.{SparkEntry, SparkSpec}

/** p09 (epoch-shuffle decorrelation) checked against a driver-side
  * replay of the md5 epoch orders and the exact Spearman arithmetic,
  * plus the property the audit exists for: independent permutations
  * correlate near zero. */
class EpochShuffleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("p09 matches a driver-side replay of the two epoch rank orders " +
    "and the exact Spearman formula, and every source decorrelates") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (src, ds) =>
        val ids = ds.map(_._2)
        val n = ids.length
        if (n <= 1) None
        else {
          def ranks(epoch: Int): Map[Long, Int] =
            ids.sortBy(id => (md5hex(s"$id:$epoch"), id))
              .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
          val (r1, r2) = (ranks(1), ranks(2))
          val sumD2 = ids.map { id =>
            val d = (r1(id) - r2(id)).toLong; d * d
          }.sum
          val nn = n.toDouble
          val rho = 1e6 * (1e0 - (6e0 * sumD2) / (nn * (nn * nn - 1e0)))
          Some((src, n.toLong, sumD2, math.round(rho)))
        }
    }

    val got = SparkEntry.queries("p09_epoch_shuffle_audit")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.toSeq === expected)
    // Independent hash permutations: |rho| stays well inside the
    // correlated regime for every source (~25 docs/source here; the
    // 3-sigma band for n=20 is ~±700k ppm, use it as the tripwire for
    // an accidentally shared epoch key, which would give exactly 1e6).
    assert(expected.nonEmpty)
    expected.foreach { case (src, _, _, rho) =>
      assert(math.abs(rho) < 700000L, s"source $src: rho_ppm $rho")
    }
  }
}
