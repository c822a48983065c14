package graft.operators

import graft.{SparkEntry, SparkSpec}

/** d15 (corpus-frequency boilerplate removal) checked against a full
  * Scala-side recomputation of the chunk doc-frequency rule — an
  * independent oracle the DuckDB gate only mirrors. The semantic contrast
  * with d14 is also pinned: d14 keeps a repeated span's first occurrence,
  * d15 removes every occurrence of a high-doc-frequency chunk. */
class BoilerplateChunkSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val W  = 16 // must match Dedup.ChunkWords
  private val K  = 3  // must match Dedup.BoilerDocFreq

  private def chunksOf(text: String): Seq[String] =
    text.split(" ", -1).toSeq.grouped(W).map(_.mkString(" ")).toSeq

  test("d15 matches a driver-side recomputation of chunk doc-frequency " +
    "and per-doc retention (every doc, exact counts and ppm)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)

    val docFreq = docs
      .flatMap { case (id, text) => chunksOf(text).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, hits) => c -> hits.length }

    val expected = docs.map { case (id, text) =>
      val cs     = chunksOf(text)
      val boiler = cs.count(c => docFreq(c) >= K)
      (id, cs.size.toLong, boiler.toLong,
        (cs.size - boiler).toLong * 1000000L / cs.size)
    }

    val got = SparkEntry.queries("d15_boilerplate_chunks")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"doc ${e._1}: got $g expected $e")
    }
    // The fixture corpus must actually exercise the boilerplate branch.
    assert(expected.map(_._3).sum > 0, "no boilerplate chunks in fixture")
  }

  test("d15 removes ALL occurrences of a boilerplate chunk — strictly " +
    "more than d14's first-occurrence rule removes on the same chunks") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

    val occurrences = texts.flatMap { case (_, t) => chunksOf(t) }
    val docFreq = texts
      .flatMap { case (id, t) => chunksOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, hits) => c -> hits.length }
    val boilerSet      = docFreq.collect { case (c, f) if f >= K => c }.toSet
    val totalBoilerOcc = occurrences.count(boilerSet).toLong
    // d14 keeps one copy per distinct chunk, so on these same chunks it
    // removes totalBoilerOcc - |boilerSet| occurrences; d15 must remove
    // every one of them, first occurrences included.
    val d15Total = SparkEntry.queries("d15_boilerplate_chunks")(spark, sf)
      .collect().map(_.getLong(2)).sum
    assert(boilerSet.nonEmpty, "fixture has no chunk with doc_freq >= K")
    assert(d15Total === totalBoilerOcc,
      "boilerplate filter must remove ALL occurrences of f>=K chunks")
    assert(d15Total > totalBoilerOcc - boilerSet.size,
      "must remove strictly more than first-occurrence dedup on these chunks")
  }
}
