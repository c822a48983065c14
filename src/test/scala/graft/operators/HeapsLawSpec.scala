package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t27 (Heaps'-law vocabulary-growth fit) checked against a full
  * driver-side replay of the cumulative token/vocabulary series and
  * the OLS fit per source, plus the behavioral separation the exponent
  * exists to provide: an all-new-words source fits β ≈ 1 while a
  * fixed-vocabulary source fits β ≈ 0. */
class HeapsLawSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t27 matches a driver-side replay of the cumulative series and " +
    "the OLS fit for every source") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // Replay definition shared with CurationOpsProps (CurationOracles).
    val expected = CurationOracles.heapsFit(docs)
    val got = SparkEntry.queries("t27_heaps_law")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (src, (nd, nt, v, beta, logk)) =>
      val (end, ent, ev, ebeta, elogk) = expected(src)
      assert(nd === end && nt === ent && v === ev, s"source $src counts")
      assert(math.abs(beta - ebeta) < 5e-4, s"$src beta: $beta vs $ebeta")
      assert(math.abs(logk - elogk) < 5e-4, s"$src logk: $logk vs $elogk")
    }
  }

  test("planted corpora separate: an all-new-words source fits " +
    "beta ~ 1, a fixed-vocabulary source fits beta well below it") {
    import spark.implicits._
    // Source 'gen' mints 24 brand-new words per doc; source 'fix'
    // reuses the same 8-word vocabulary forever.
    val gen = (0 until 12).map { i =>
      val text = (0 until 24).map(j => s"g${i}_$j").mkString(" ")
      (i.toLong, text, "en", "gen", text.length.toLong)
    }
    val fix = (0 until 12).map { i =>
      val text = (0 until 24).map(j => s"f${j % 8}").mkString(" ")
      (100L + i, text, "en", "fix", text.length.toLong)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_heaps_").toString
    (gen ++ fix).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("t27_heaps_law")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(got("gen") - 1.0) < 0.05,
      s"all-new-words beta ${got("gen")} should be ~1")
    assert(got("fix") < 0.3,
      s"fixed-vocabulary beta ${got("fix")} should be near 0")
    assert(got("gen") - got("fix") > 0.5, s"separation: $got")
  }
}
