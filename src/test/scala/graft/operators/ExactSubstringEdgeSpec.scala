package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** d18 boundary semantics on a CONSTRUCTED corpus — the cases the
  * driver fixture only exercises by accident, each pinned exactly:
  *
  *   - an exact duplicate pair is fully covered (ppm = 1 000 000, one
  *     run spanning the whole doc);
  *   - a shared span is detected at ANY alignment (different offsets in
  *     the two docs — the property the fixed-chunk tiers lack);
  *   - a shared span SHORTER than the 6-word window is invisible (the
  *     ExactSubstr length threshold, by construction);
  *   - WITHIN-doc repetition alone is never flagged (cross-document
  *     means min≠max doc_id over the window hash — a doc repeating its
  *     own chorus is not duplication against the corpus);
  *   - two shared spans merge into one run iff the gap between their
  *     window starts is ≤ K (adjacent spans coalesce; a >K gap splits).
  */
class ExactSubstringEdgeSpec extends SparkSpec {

  private val K = 6 // must match Dedup.SpanWords

  // Globally-unique filler words so nothing collides by accident.
  private var fc = 0
  private def fill(n: Int): Seq[String] =
    (0 until n).map { _ => fc += 1; s"f$fc" }

  private val S1 = (1 to 8).map(i => s"s$i")       // 8-word shared span
  private val S2 = (1 to 8).map(i => s"r$i")       // within-doc chorus
  private val S3 = (1 to 8).map(i => s"u$i")       // merge-test span A
  private val S4 = (1 to 8).map(i => s"v$i")       // merge-test span B
  private val XYZ = Seq("x", "y", "z")             // sub-window span

  private lazy val corpus: Seq[(Long, Seq[String])] = Seq(
    0L -> (fill(2) ++ S1 ++ fill(3)),          // S1 at pos 2
    1L -> (fill(9) ++ S1 ++ fill(2)),          // S1 at pos 9 (shifted)
    2L -> ("a b c d e f g h i j".split(" ").toSeq), // exact dup …
    3L -> ("a b c d e f g h i j".split(" ").toSeq), // … pair
    4L -> XYZ,                                  // 3 words: no window
    5L -> (fill(5) ++ XYZ ++ fill(5)),          // contains x y z
    6L -> (S2 ++ fill(7) ++ S2),               // own chorus twice
    7L -> (S3 ++ S4),                           // adjacent spans: gap 6
    8L -> (S3 ++ fill(8) ++ S4))                // split spans: gap 14

  private lazy val outDir: String = {
    val dir  = Files.createTempDirectory("d18_edge").toString
    val sqlc = spark
    import sqlc.implicits._
    corpus
      .map { case (id, ws) =>
        val t = ws.mkString(" ")
        (id, t, "en", "edge", t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d18 edge corpus: full-dup coverage, alignment shift, sub-window " +
    "invisibility, within-doc immunity, and the run-merge gap rule") {
    val got = SparkEntry.queries("d18_exact_substrings")(spark, outDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
      .toMap

    // (n_tokens, dup_runs, dup_tokens, longest_run, dup_token_ppm)
    val expected = Map(
      0L -> (13L, 1L, 8L, 8L, 8L * 1000000L / 13L),  // S1 at pos 2
      1L -> (19L, 1L, 8L, 8L, 8L * 1000000L / 19L),  // S1 at pos 9
      2L -> (10L, 1L, 10L, 10L, 1000000L),           // exact dup
      3L -> (10L, 1L, 10L, 10L, 1000000L),
      4L -> (3L, 0L, 0L, 0L, 0L),                    // shorter than K
      5L -> (13L, 0L, 0L, 0L, 0L),                   // x y z < K: unseen
      6L -> (23L, 0L, 0L, 0L, 0L),                   // own chorus only
      7L -> (16L, 1L, 16L, 16L, 1000000L),           // gap 6 = K: merge
      8L -> (24L, 2L, 16L, 8L, 16L * 1000000L / 24L)) // gap 14: split
    assert(got === expected)
  }
}
