package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t14 (capped unigram surprisal) checked against the shared
  * driver-side replay ([[CurationOracles.unigramSurprisal]] — the same
  * definition the capped≡uncapped and OOV-routing pins in CappedLmSpec
  * build on), on the fixture corpus where the cap BINDS (31-term
  * vocabulary vs the 24-entry cap, so both the in-cap and OOV branches
  * replay), plus the monotonicity the filter exists for: a doc of
  * nothing but rare/unseen vocabulary must out-surprise a doc of
  * corpus-head vocabulary. */
class UnigramSurprisalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t14 matches the shared capped-LM replay for every fixture doc " +
    "(n_tokens exactly, avg_nll at 4 dp) with the cap binding") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = CurationOracles.unigramSurprisal(docs)

    val got = SparkEntry.queries("t14_unigram_surprisal")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))

    assert(got.length === expected.size)
    got.foreach { case (id, (n, nll)) =>
      val (en, enll) = expected(id)
      assert(n === en, s"doc $id token count")
      assert(math.abs(nll - enll) < 5e-4,
        s"doc $id: got $nll expected $enll")
    }
  }

  test("rare-vocabulary text out-surprises corpus-head text — the " +
    "signal a surprisal filter keeps the middle of") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_surprisal_").toString
    // 24 head words (fill the cap) + one rare-soup doc + one head doc.
    val head = (0 until 24).map(i =>
      (i.toLong, Seq.fill(20)(s"h$i").mkString(" "), "en", "a",
        20L * 3))
    val probe = Seq(
      (200L, (1 to 16).map(i => s"rare$i").mkString(" "), "en", "b", 16L),
      (201L, Seq.fill(16)("h0").mkString(" "), "en", "b", 16L))
    (head ++ probe)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t14_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(200L) > got(201L),
      s"rare doc ${got(200L)} must out-surprise head doc ${got(201L)}")
  }
}
