package graft.operators

import graft.{SparkEntry, SparkSpec}

/** d14 (chunk-level "paragraph" dedup) checked against a full Scala-side
  * recomputation of the fixed-window chunking and global first-occurrence
  * rule — an independent oracle the DuckDB gate only mirrors. */
class ParagraphDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val W  = 16 // must match Dedup.ChunkWords

  private def chunksOf(text: String): Seq[String] =
    text.split(" ", -1).toSeq.grouped(W).map(_.mkString(" ")).toSeq

  test("d14 matches a driver-side recomputation of chunking + global " +
    "first-occurrence dedup (every doc, exact counts and ppm)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)

    // Global first occurrence in (doc_id, chunk_idx) order.
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.map { case (id, text) =>
      val cs   = chunksOf(text)
      val dups = cs.count(c => !seen.add(c))
      (id, cs.size.toLong, dups.toLong,
        (cs.size - dups).toLong * 1000000L / cs.size)
    }

    val got = SparkEntry.queries("d14_paragraph_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g === e, s"doc ${e._1}: got $g expected $e")
    }
    // The fixture corpus must actually exercise the duplicate branch.
    assert(expected.map(_._3).sum > 0, "no duplicated chunks in fixture")
  }

  test("d14 keeps exactly one copy of every distinct chunk corpus-wide") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getString(1))
    val allChunks = docs.flatMap(chunksOf)
    val out = SparkEntry.queries("d14_paragraph_dedup")(spark, sf).collect()
    val kept = out.map(r => r.getLong(1) - r.getLong(2)).sum
    assert(kept === allChunks.distinct.length.toLong,
      "kept chunks != distinct chunk count")
    assert(out.map(_.getLong(1)).sum === allChunks.length.toLong)
  }
}
