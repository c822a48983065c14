package graft.operators

import graft.{SparkEntry, SparkSpec}

/** d18 (sliding-window exact-substring duplication) checked against a
  * full Scala-side recomputation — an independent oracle the DuckDB gate
  * only mirrors: every 6-word sliding window per doc, cross-document
  * duplication (same window text in ≥2 distinct docs), and the maximal
  * run merge (touching/overlapping dup windows coalesce; a gap > K
  * breaks the run). */
class ExactSubstringSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val K  = 6 // must match Dedup.SpanWords

  private def windowsOf(text: String): Seq[(Int, String)] = {
    val w = text.split(" ", -1)
    if (w.length < K) Seq.empty
    else (0 to w.length - K).map(p => p -> w.slice(p, p + K).mkString(" "))
  }

  private def mergeRuns(positions: Seq[Int]): Seq[(Int, Int)] = {
    // Runs of duplicated coverage: window [p, p+K-1]; consecutive dup
    // positions p1 < p2 stay in one run iff p2 - p1 <= K (touching
    // intervals are contiguous duplicated text).
    positions.sorted.foldLeft(List.empty[(Int, Int)]) {
      case (Nil, p)                              => List((p, p))
      case ((lo, hi) :: rest, p) if p - hi <= K  => (lo, p) :: rest
      case (acc, p)                              => (p, p) :: acc
    }.reverse
  }

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq

  test("d18 matches a driver-side recomputation of sliding-window " +
    "duplication, run merge, and coverage ppm (every doc)") {
    val docOfWindow = docs
      .flatMap { case (id, t) => windowsOf(t).map { case (_, w) => w -> id } }
      .groupBy(_._1)
      .map { case (w, hits) => w -> hits.map(_._2).distinct.size }

    val expected = docs.map { case (id, text) =>
      val nTokens = text.split(" ", -1).length.toLong
      val dupPos  = windowsOf(text)
        .collect { case (p, w) if docOfWindow(w) >= 2 => p }
      val runs    = mergeRuns(dupPos)
      val lens    = runs.map { case (lo, hi) => (hi - lo + K).toLong }
      val covered = lens.sum
      (id, nTokens, runs.size.toLong, covered,
        if (lens.isEmpty) 0L else lens.max,
        covered * 1000000L / nTokens)
    }

    val got = SparkEntry.queries("d18_exact_substrings")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"doc ${e._1}: got $g expected $e")
    }
    // The fixture must exercise both branches: some docs carry verbatim
    // cross-document spans, most do not.
    assert(expected.count(_._4 > 0) > 0, "no duplicated spans in fixture")
    assert(expected.count(_._4 == 0) > 0, "every doc duplicated — fixture degenerate")
  }

  test("d18 is alignment-invariant where the fixed-chunk tiers are not: " +
    "duplicated coverage includes spans no 16-word chunk boundary isolates") {
    // d14/d15 hash fixed 16-word chunks: a verbatim shared span shorter
    // than a chunk, or straddling a chunk boundary, produces no chunk
    // collision unless the WHOLE aligned chunk matches. d18's dup
    // positions must therefore include positions p where the enclosing
    // fixed chunk of either doc is NOT itself corpus-duplicated.
    val W = 16 // Dedup.ChunkWords
    val chunkFreq = docs
      .flatMap { case (id, t) =>
        t.split(" ", -1).grouped(W).map(_.mkString(" ")).toSeq.distinct
          .map(_ -> id)
      }
      .groupBy(_._1).map { case (c, hits) => c -> hits.map(_._2).distinct.size }
    val dupChunks: Set[(Long, Int)] = docs.flatMap { case (id, t) =>
      t.split(" ", -1).grouped(W).zipWithIndex.collect {
        case (c, ci) if chunkFreq(c.mkString(" ")) >= 2 => (id, ci)
      }
    }.toSet

    val windowFreq = docs
      .flatMap { case (id, t) => windowsOf(t).map { case (_, w) => w -> id } }
      .groupBy(_._1).map { case (w, hits) => w -> hits.map(_._2).distinct.size }
    val chunkInvisible = docs.exists { case (id, t) =>
      windowsOf(t).exists { case (p, w) =>
        windowFreq(w) >= 2 &&
        !dupChunks((id, p / W)) && !dupChunks((id, (p + K - 1) / W))
      }
    }
    assert(chunkInvisible,
      "fixture has no chunk-invisible duplicated span — contrast not exercised")
  }
}
