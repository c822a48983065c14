package graft.operators

import graft.{SparkEntry, SparkSpec}

/** p08 (largest-remainder token-budget allocation) checked against a full
  * Scala-side replay of the weighting, flooring, and remainder-rank bonus
  * assignment — an independent oracle the DuckDB gate only mirrors. */
class TokenBudgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("p08 matches a driver-side replay of isqrt weights + " +
    "largest-remainder rounding, and quotas sum EXACTLY to the budget") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))

    val tokens: Map[String, Long] = docs.groupBy(_._1).map {
      case (s, rs) =>
        s -> rs.map(_._2.split(" ", -1).length.toLong).sum
    }
    val w  = tokens.map { case (s, t) =>
      s -> math.floor(math.sqrt(t.toDouble)).toLong
    }
    val tw = w.values.sum
    val b  = tokens.values.sum / 10
    val base = w.map { case (s, wi) => s -> b * wi / tw }
    val rem  = w.map { case (s, wi) => s -> b * wi % tw }
    val leftover = b - base.values.sum
    val bonus = rem.toSeq.sortBy { case (s, r) => (-r, s) }
      .take(leftover.toInt).map(_._1).toSet

    val expected = tokens.keys.toSeq.sorted.map { s =>
      val q = base(s) + (if (bonus(s)) 1L else 0L)
      val fill = math.min(q, tokens(s))
      (s, tokens(s), w(s), q, fill, q - fill)
    }

    val got = SparkEntry.queries("p08_token_budget")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"source ${e._1}: got $g expected $e")
    }
    // The defining property of Hamilton rounding: no budget unit is lost
    // or invented — and the fixture must actually exercise the bonus
    // branch (leftover > 0), or the remainder rank is dead code here.
    assert(got.map(_._4).sum === b, "quotas must sum exactly to the budget")
    assert(leftover > 0, "fixture does not exercise the remainder bonus")
  }
}
