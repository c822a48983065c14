package graft.operators

import java.nio.file.Files

import org.scalacheck.{Prop, Properties}

import graft.{SparkEntry, SparkSpec}

/** Generative invariants for the round-16 text additions on corpora the
  * fixed fixtures never exercise: the driver corpus contains NO
  * within-doc duplicate line at any SF, so t22's firing branch and
  * t23/t24's tie handling are replayed here on random corpora built
  * from a deliberately TINY vocabulary (heavy bigram collisions, real
  * whole-line echoes, shifting phrase loops, random source splits).
  * Every sample writes a fresh parquet fixture and runs the registered
  * queries through the production code path; expectations are
  * independent brute-force recomputations. t22/t23 outputs are exact
  * integers (ppm arithmetic) and compare exactly; t24 is one float fold
  * rounded at 4 dp and compares at 5e-4. */
object RepetitionFilterProps extends Properties("RepetitionFilters") {

  // Each sample runs three Spark jobs + a parquet write.
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val W = 16 // Dedup.ChunkWords

  /** Random corpus: echo docs (a line block repeated), loop docs (a
    * short phrase at shifting offsets), and soup docs over a ≤ 8-word
    * vocabulary; 2-3 sources. */
  private def corpusDir(seed: Long): String = {
    val rnd   = new scala.util.Random(seed)
    val vocab = Vector.tabulate(3 + rnd.nextInt(6))(i => s"v$i")
    val nSrc  = 2 + rnd.nextInt(2)
    def word() = vocab(rnd.nextInt(vocab.size))
    def soup(n: Int) = Seq.fill(n)(word())
    val docs = (0 until (6 + rnd.nextInt(8))).map { i =>
      val words = rnd.nextInt(3) match {
        case 0 => // echo: one W-word line repeated 2-4x (+ random tail)
          val line = soup(W)
          Seq.fill(2 + rnd.nextInt(3))(line).flatten ++
            soup(rnd.nextInt(W))
        case 1 => // loop: 2-3-word phrase with a shifting unique spacer
          val phrase = soup(2 + rnd.nextInt(2))
          (1 to 8 + rnd.nextInt(12)).flatMap(j => phrase :+ s"u$j")
        case _ => // soup, 10..70 words
          soup(10 + rnd.nextInt(61))
      }
      val text = words.mkString(" ")
      (i.toLong, text, "en", s"src${rnd.nextInt(nSrc)}",
        text.length.toLong)
    }
    val dir = Files.createTempDirectory("prop_repfilter").toString
    val sqlc = spark
    import sqlc.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def readDocs(dir: String): Seq[(Long, String, String, Long)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  property("t22 equals brute-force within-doc duplicate-line counts " +
    "on corpora with real echoes") = Prop.forAll(
    org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
    val dir = corpusDir(seed)
    val expected = readDocs(dir).map { case (id, text, _, _) =>
      val ls = text.split(" ", -1).toSeq.grouped(W)
        .map(_.mkString(" ")).toSeq
      val occ = ls.groupBy(identity).toSeq.map { case (l, g) =>
        (g.size.toLong, l.length.toLong) }
      val nLines = occ.map(_._1).sum
      val nDup   = nLines - occ.size
      val dupCh  = occ.map { case (n, l) => (n - 1) * l }.sum
      val totCh  = occ.map { case (n, l) => n * l }.sum
      id -> (nLines, nDup, nDup * 1000000L / nLines,
        dupCh * 1000000L / totCh)
    }.toMap
    val got = SparkEntry.queries("t22_dup_line_fraction")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got == expected
  }

  property("t23 equals the brute-force (mass, count) argmax under " +
    "heavy bigram ties") = Prop.forAll(
    org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
    val dir = corpusDir(seed)
    val expected = readDocs(dir).flatMap { case (id, text, _, nChars) =>
      val ws = text.split(" ", -1).toSeq
      if (ws.size < 2) None
      else {
        val cnt = ws.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).toSeq.map { case (bg, g) =>
            (g.size.toLong, bg.length.toLong) }
        val (n, l) = cnt.maxBy { case (n, l) => (n * l, n) }
        Some(id -> ((ws.size - 1).toLong, n, n * l,
          n * l * 1000000L / nChars))
      }
    }.toMap
    val got = SparkEntry.queries("t23_top_ngram_mass")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got == expected
  }

  property("t24 equals the brute-force capped smoothed-LM log-likelihood " +
    "ratio on random source splits (4 dp; loop docs' unique spacers can " +
    "push the vocabulary past the cap, so both OOV branches replay)") =
    Prop.forAll(
    org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
    val dir  = corpusDir(seed)
    val docs = readDocs(dir)
    // Replay definition shared with DsirWeightSpec (CurationOracles).
    val expected =
      CurationOracles.dsirWeights(docs.map(d => (d._1, d._2, d._3)))
    val got = SparkEntry.queries("t24_dsir_weight")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    got.length == expected.size && got.forall { case (id, (n, w)) =>
      val (en, ew) = expected(id)
      n == en && math.abs(w - ew) < 5e-4
    }
  }
}
