package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t18 (per-source language composition) checked against a driver-side
  * replay of the grid build and the deterministic majority tie-break. */
class SourceLangMixSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t18 matches a driver-side replay: per-source doc/lang counts, " +
    "majority language with (count DESC, lang ASC) tie-break, exact ppm") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))

    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rs) =>
        val grid = rs.groupBy(_._2).map { case (l, hits) =>
          l -> hits.length.toLong
        }
        val (topLang, topN) = grid.toSeq.minBy { case (l, n) => (-n, l) }
        (src, rs.length.toLong, grid.size.toLong, topLang,
          topN * 1000000L / rs.length)
    }

    val got = SparkEntry.queries("t18_source_lang_mix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"source ${e._1}: got $g expected $e")
    }
    // The report is only meaningful if the fixture is actually
    // multilingual per source.
    assert(expected.exists(_._3 > 1), "no source has a language mix")
  }
}
