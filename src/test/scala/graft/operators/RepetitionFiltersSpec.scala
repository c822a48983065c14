package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t22 (within-doc duplicate-line fraction) and t23 (top-bigram
  * character mass) checked against full Scala-side recomputations — an
  * independent oracle the DuckDB gate only mirrors — plus a planted
  * corpus proving the two filters separate the failure modes they are
  * documented to catch (repeated whole lines vs one phrase repeated at
  * shifting offsets, which never forms two identical lines). */
class RepetitionFiltersSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val W  = 16 // must match Dedup.ChunkWords

  private def linesOf(text: String): Seq[String] =
    text.split(" ", -1).toSeq.grouped(W).map(_.mkString(" ")).toSeq

  test("t22 matches a driver-side recomputation of within-doc " +
    "duplicate-line counts and char mass (every doc, exact ppm)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)

    val expected = docs.map { case (id, text) =>
      val ls     = linesOf(text)
      val occ    = ls.groupBy(identity).toSeq.map { case (l, g) =>
        (g.size.toLong, l.length.toLong) }
      val nLines = occ.map(_._1).sum
      val nDup   = nLines - occ.size
      val dupCh  = occ.map { case (n, l) => (n - 1) * l }.sum
      val totCh  = occ.map { case (n, l) => n * l }.sum
      (id, nLines, nDup, nDup * 1000000L / nLines,
        dupCh * 1000000L / totCh)
    }

    val got = SparkEntry.queries("t22_dup_line_fraction")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"doc ${e._1}: got $g expected $e")
    }
    // The fixture corpus contains no within-doc duplicate line at any
    // SF (checked 0.001/0.01/0.1) — the equality above still pins the
    // zero path exactly; the planted-corpus test below exercises the
    // firing branch.
  }

  test("t23 matches a driver-side recomputation of the top-bigram " +
    "character-mass argmax (every doc, exact ppm)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)

    val expected = docs.map { case (id, text, nChars) =>
      val ws  = text.split(" ", -1).toSeq
      val cnt = ws.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).toSeq.map { case (bg, g) =>
          (g.size.toLong, bg.length.toLong) }
      // top = max by (mass, count) — the query's struct-max order.
      val (topN, topL) = cnt.maxBy { case (n, l) => (n * l, n) }
      (id, (ws.size - 1).toLong, topN, topN * topL,
        topN * topL * 1000000L / nChars)
    }

    val got = SparkEntry.queries("t23_top_ngram_mass")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"doc ${e._1}: got $g expected $e")
    }
  }

  test("planted corpus: whole-line repetition fires t22 but a shifting " +
    "phrase loop is invisible to it and fires t23 instead") {
    import spark.implicits._
    val lineWords = (1 to W).map(i => s"w$i")
    // Doc 0: one 16-word line repeated 4x — 3 of 4 lines are duplicates.
    val echoed = Seq.fill(4)(lineWords).flatten.mkString(" ")
    // Doc 1: a 3-word phrase repeated with a unique spacer word between
    // repeats — the spacer shifts every 16-word window, so no two lines
    // are ever equal, but the phrase's bigrams dominate the char mass.
    val phrase = Seq("spam", "spam", "ham")
    val looped = (1 to 24).flatMap(i => phrase :+ s"u$i").mkString(" ")
    // Doc 2: all-distinct words — neither filter fires.
    val clean = (1 to 64).map(i => s"d$i").mkString(" ")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_repfilter_").toString
    Seq(
      (0L, echoed, "en", "src0", echoed.length.toLong),
      (1L, looped, "en", "src0", looped.length.toLong),
      (2L, clean, "en", "src0", clean.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t22 = SparkEntry.queries("t22_dup_line_fraction")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(t22(0L).getLong(3) === 750000L, "echoed doc: 3/4 dup lines")
    assert(t22(1L).getLong(2) === 0L, "shifting phrase: zero dup lines")
    assert(t22(2L).getLong(2) === 0L, "clean doc: zero dup lines")

    val t23 = SparkEntry.queries("t23_top_ngram_mass")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // Doc 1's top bigram is "spam spam" (24 occurrences, 9 chars each).
    assert(t23(1L).getLong(2) === 24L, "phrase loop: top bigram count")
    assert(t23(1L).getLong(4) >
      3L * t23(2L).getLong(4),
      "phrase loop's top-bigram mass must dwarf the clean doc's")
  }
}
