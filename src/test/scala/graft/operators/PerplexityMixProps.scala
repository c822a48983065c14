package graft.operators

import java.nio.file.Files

import org.scalacheck.{Prop, Properties}

import graft.{SparkEntry, SparkSpec}

/** Generative invariants for the round-16 curation additions on corpora
  * the fixed fixtures never exercise: duplicate-doc clusters (exact
  * cross-entropy TIES, so t26's rounded-score + doc_id tie-break must
  * agree with SQL ntile under full peer groups), sub-bigram docs (0/1
  * words — excluded rows on both engines), target slices with NO
  * scorable bigram (the LM degenerates to the uniform 1/V model and
  * every doc ties), and random lang/source splits. Every sample writes
  * a fresh parquet fixture and runs the registered queries through the
  * production code path; expectations are independent brute-force
  * recomputations (t25/p12 at float tolerance, t26 labels exactly). */
object PerplexityMixProps extends Properties("PerplexityMix") {

  // Each sample runs Spark jobs + a parquet write.
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  /** Random corpus: soup docs over a tiny vocabulary (heavy bigram
    * collisions, some 0/1-word docs), duplicate-doc tie clusters,
    * 1-3 langs, 2-3 sources. */
  private def corpusDir(seed: Long): String = {
    val rnd   = new scala.util.Random(seed)
    val vocab = Vector.tabulate(2 + rnd.nextInt(5))(i => s"v$i")
    val nSrc  = 2 + rnd.nextInt(2)
    val nLang = 1 + rnd.nextInt(3)
    def soup(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val base = (0 until (6 + rnd.nextInt(8))).map { i =>
      val text = rnd.nextInt(4) match {
        case 0 => soup(rnd.nextInt(2)).mkString(" ") // 0/1 words
        case _ => soup(2 + rnd.nextInt(60)).mkString(" ")
      }
      (i.toLong, text, s"l${rnd.nextInt(nLang)}",
        s"src${rnd.nextInt(nSrc)}", text.length.toLong)
    }
    // Tie clusters: clone 0-3 docs verbatim (new ids) — exact equal
    // cross-entropy, the ntile peer-group edge.
    val clones = (0 until rnd.nextInt(4)).map { j =>
      val (_, t, l, s, n) = base(rnd.nextInt(base.size))
      (1000L + j, t, l, s, n)
    }
    val dir = Files.createTempDirectory("prop_pplmix").toString
    val sqlc = spark
    import sqlc.implicits._
    (base ++ clones).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def readDocs(dir: String): Seq[(Long, String, String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq

  /** Brute-force bigram-LM cross-entropy — ONE definition shared with
    * PerplexityFilterSpec via [[CurationOracles.bigramCe]]. */
  private def bruteCe(
      docs: Seq[(Long, String, String, String)]): Map[Long, (Long, Double)] =
    CurationOracles.bigramCe(docs.map(d => (d._1, d._2, d._4)))

  property("t25 equals the brute-force add-one bigram LM on random " +
    "corpora incl. sub-bigram docs and bigram-free target slices") =
    Prop.forAll(org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
      val dir = corpusDir(seed)
      val expected = bruteCe(readDocs(dir))
      val got = SparkEntry.queries("t25_lm_perplexity")(spark, dir)
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      got.length == expected.size && got.forall { case (id, (n, ce, ppl)) =>
        val (en, ece) = expected(id)
        n == en && math.abs(ce - ece) < 5e-4 &&
          math.abs(ppl - math.exp(ece)) < 5e-3
      }
    }

  property("t26 labels equal SQL ntile(3) over the (rounded ce, doc_id) " +
    "order under exact tie clusters and all-tied uniform-LM corpora") =
    Prop.forAll(org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
      val dir  = corpusDir(seed)
      val docs = readDocs(dir)
      val langOf = docs.map(d => d._1 -> d._3).toMap
      // Spark's round(double, 4) is BigDecimal HALF_UP.
      val ce4 = bruteCe(docs).map { case (id, (_, ce)) =>
        id -> BigDecimal(ce).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
      val expected = ce4.toSeq.groupBy { case (id, _) => langOf(id) }
        .flatMap { case (_, g) =>
          val sorted = g.sortBy { case (id, ce) => (ce, id) }
          val n = sorted.length
          val q = n / 3
          val rem = n % 3
          val labels =
            Seq.fill(q + (if (rem >= 1) 1 else 0))("head") ++
              Seq.fill(q + (if (rem >= 2) 1 else 0))("middle") ++
              Seq.fill(q)("tail")
          sorted.map(_._1).zip(labels)
        }
      val got = SparkEntry.queries("t26_ccnet_buckets")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      got == expected
    }

  property("p12 equals the brute-force α=0.3 temperature weights on " +
    "random source splits") =
    Prop.forAll(org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
      val dir  = corpusDir(seed)
      val toks = readDocs(dir)
        .map(d => d._4 -> d._2.split(" ", -1).length.toLong)
        .groupBy(_._1).map { case (s, g) =>
          s -> (g.size.toLong, g.map(_._2).sum) }
      val total = toks.valuesIterator.map(_._2).sum.toDouble
      val z = toks.valuesIterator
        .map(t => math.pow(t._2 / total, 0.3)).sum
      val got = SparkEntry.queries("p12_temperature_mix")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      got.length == toks.size && got.forall {
        case (src, nDocs, nToks, share, p, boost) =>
          val (en, et) = toks(src)
          val eShare = et / total
          val eP = math.pow(eShare, 0.3) / z
          nDocs == en && nToks == et &&
            math.abs(share - eShare) < 1e-6 &&
            math.abs(p - eP) < 1e-6 &&
            math.abs(boost - eP / eShare) < 1e-4
      }
    }
}
