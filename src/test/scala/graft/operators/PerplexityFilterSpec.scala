package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t25 (CCNet LM perplexity) and t26 (head/middle/tail buckets) checked
  * against a full Scala-side recomputation of the add-one bigram LM,
  * plus the properties the filter exists to provide: target-slice docs
  * must score lower perplexity than the rest on the fixture, a planted
  * disjoint-vocabulary corpus must separate completely, and the tercile
  * buckets must be SQL-ntile-exact and balanced per language. */
class PerplexityFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t25 matches a driver-side recomputation of the target-slice " +
    "bigram LM for every fixture doc (cross-entropy and perplexity)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // Replay definition shared with the Props suite (CurationOracles).
    val expected = CurationOracles.bigramCe(docs)

    val got = SparkEntry.queries("t25_lm_perplexity")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))

    assert(got.length === expected.size)
    got.foreach { case (id, (n, ce, ppl)) =>
      val (en, ece) = expected(id)
      assert(n === en, s"doc $id bigram count")
      assert(math.abs(ce - ece) < 5e-4, s"doc $id ce: got $ce expected $ece")
      assert(math.abs(ppl - math.exp(ece)) < 5e-3,
        s"doc $id ppl: got $ppl expected ${math.exp(ece)}")
    }
  }

  test("target-slice docs score lower perplexity than the rest in " +
    "aggregate — the quality signal the CCNet filter keeps the head of") {
    val srcs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tgt = srcs.values.min
    val ppl = SparkEntry.queries("t25_lm_perplexity")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3))
    val (inT, out) = ppl.partition { case (id, _) => srcs(id) == tgt }
    assert(inT.nonEmpty && out.nonEmpty)
    val meanT = inT.map(_._2).sum / inT.size
    val meanR = out.map(_._2).sum / out.size
    assert(meanT < meanR,
      s"target mean ppl $meanT must be below raw mean $meanR")
  }

  test("planted disjoint-vocabulary corpus: every target doc's " +
    "perplexity is below every raw doc's") {
    import spark.implicits._
    def doc(id: Long, src: String, pfx: String) = {
      val text = (1 to 32).map(i => s"$pfx${i % 8}").mkString(" ")
      (id, text, "en", src, text.length.toLong)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ppl_").toString
    (Seq.tabulate(4)(i => doc(i.toLong, "a", "aw")) ++
      Seq.tabulate(12)(i => doc(100L + i, "b", "bw")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val ppl = SparkEntry.queries("t25_lm_perplexity")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val maxTgt = (0L until 4L).map(ppl).max
    val minRaw = (100L until 112L).map(ppl).min
    assert(maxTgt < minRaw,
      s"worst target ppl $maxTgt must be below best raw ppl $minRaw")
  }

  test("t26 buckets are SQL-ntile-exact over the (ce, doc_id) order " +
    "and balanced (sizes differ by at most 1) within every language") {
    val rows = SparkEntry.queries("t26_ccnet_buckets")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3)))
    rows.groupBy(_._2).foreach { case (lang, g) =>
      val n = g.length
      val q = n / 3
      val rem = n % 3
      val sorted = g.sortBy(r => (r._3, r._1))
      val expected = Seq.fill(q + (if (rem >= 1) 1 else 0))("head") ++
        Seq.fill(q + (if (rem >= 2) 1 else 0))("middle") ++
        Seq.fill(q)("tail")
      assert(sorted.map(_._4).toSeq === expected,
        s"lang $lang tercile assignment")
    }
  }
}
