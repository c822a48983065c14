package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t24 (DSIR importance weight) checked against a full Scala-side
  * recomputation of the two smoothed unigram LMs — capped at the
  * production top-K + OOV bucket, the replay shared with the Props
  * suite via [[CurationOracles.dsirWeights]]; the fixture vocabulary
  * (31 terms) EXCEEDS the cap (24), so the OOV path is live in this
  * gate — plus the discrimination properties the weight exists to
  * provide: target-source documents must outscore the rest in
  * aggregate on the fixture, and on a planted disjoint-vocabulary
  * corpus every target doc must score positive and every raw doc
  * negative. */
class DsirWeightSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t24 matches a driver-side recomputation of both capped smoothed " +
    "LMs and the per-doc mean log-likelihood ratio (every doc, 4 dp)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val expected = CurationOracles.dsirWeights(docs)

    val got = SparkEntry.queries("t24_dsir_weight")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))

    assert(got.length === expected.size)
    got.foreach { case (id, (n, w)) =>
      val (en, ew) = expected(id)
      assert(n === en, s"doc $id token count")
      assert(math.abs(w - ew) < 5e-4, s"doc $id: got $w expected $ew")
    }
  }

  test("target-source docs outscore the rest in aggregate on the " +
    "fixture corpus — the discrimination the resampler consumes") {
    val srcs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tgt = srcs.values.min
    val w = SparkEntry.queries("t24_dsir_weight")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    val (inT, out) = w.partition { case (id, _) => srcs(id) == tgt }
    assert(inT.nonEmpty && out.nonEmpty)
    val meanT = inT.map(_._2).sum / inT.size
    val meanR = out.map(_._2).sum / out.size
    assert(meanT > meanR,
      s"target mean $meanT must exceed raw mean $meanR")
  }

  test("planted disjoint-vocabulary corpus: every target doc scores " +
    "positive, every raw doc negative") {
    import spark.implicits._
    // Source 'a' (the lexicographic min = target) speaks only aN words,
    // source 'b' only bN words — the LMs share no mass beyond smoothing.
    def doc(id: Long, src: String, pfx: String) = {
      val text = (1 to 32).map(i => s"$pfx${i % 8}").mkString(" ")
      (id, text, "en", src, text.length.toLong)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dsir_").toString
    (Seq.tabulate(4)(i => doc(i.toLong, "a", "aw")) ++
      Seq.tabulate(12)(i => doc(100L + i, "b", "bw")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val w = SparkEntry.queries("t24_dsir_weight")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (0L until 4L).foreach(id =>
      assert(w(id) > 0, s"target doc $id: ${w(id)}"))
    (100L until 112L).foreach(id =>
      assert(w(id) < 0, s"raw doc $id: ${w(id)}"))
  }
}
