package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** m02's decoder is a stub (no codecs in the image), so its features get
  * no SQL oracle — this spec holds it to an INDEPENDENT formulation
  * instead: the same statistics computed through Spark SQL built-ins
  * (ascii() per character — valid because the fixture text is pure
  * ASCII, asserted first), making the mapPartitions path cross-checked
  * rather than trusted. */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("m02 stub features match an independent SQL formulation") {
    val docs = graft.Tables.documents(spark, sf)
    // Precondition for the ascii()-based reference: ASCII-only text
    // (char count == UTF-8 byte count).
    assert(docs.filter(expr(
      "length(text) <> length(CAST(text AS BINARY))")).count() == 0)

    val ref = docs
      .selectExpr(
        "doc_id",
        "transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))) AS bytes")
      .selectExpr(
        "doc_id",
        "size(bytes) AS n_bytes",
        """CASE WHEN size(bytes) = 0 THEN CAST(0 AS BIGINT)
           ELSE (aggregate(bytes, CAST(0 AS BIGINT), (a, x) -> a + x)
                 * CAST(1000000 AS BIGINT)) div size(bytes)
           END AS mean_micro""",
        """concat('[', concat_ws(',',
             transform(sequence(0, 7),
               k -> CAST(size(filter(bytes, x -> CAST(x div 32 AS INT) = k)) AS STRING))),
           ']') AS byte_hist""")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getString(3)))
      .toMap

    val got = SparkEntry.queries("m02_media_features")(spark, sf).collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val (nBytes, meanMicro, hist) = ref(r.getLong(0))
      assert(r.getInt(1) == nBytes, s"n_bytes for doc ${r.getLong(0)}")
      assert(r.getLong(2) == meanMicro, s"mean_byte_micro for doc ${r.getLong(0)}")
      assert(r.getString(3) == hist, s"byte_hist for doc ${r.getLong(0)}")
    }
  }

  test("m07 chunker: empty payload yields zero chunks; boundary lengths " +
    "chunk exactly") {
    // The fixtures' min doc length is 47, so the zero-length branch is
    // unreachable through the oracle gate — without the CASE guard,
    // sequence(0, -1) auto-descends to [0, -1] and an empty document
    // would emit two bogus chunks where DuckDB's range(0, 0) emits none.
    import spark.implicits._
    val sizes = Seq("" -> 0, "a" -> 1, ("x" * 256) -> 1, ("x" * 257) -> 2,
      ("x" * 512) -> 2, ("x" * 513) -> 3)
    val got = sizes.map(_._1).toDF("text")
      .selectExpr(s"size(${Multimodal.chunkHashesExpr}) AS n")
      .as[Int].collect().toSeq
    assert(got == sizes.map(_._2),
      s"chunk counts ${got} != expected ${sizes.map(_._2)}")
  }

  test("m10 scene segmentation matches a driver-side replay of the frame " +
    "signatures and exercises both the cut and no-cut branches") {
    val vids = spark.read.parquet(s"$sf/documents.parquet")
      .filter(expr("doc_id % 3 = 2 AND length(text) >= 16 AND " +
        "length(text) = length(CAST(text AS BINARY))"))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val expected = vids.sortBy(_._1).map { case (docId, text) =>
      val nFrames = (text.length - 16) / 32 + 1
      val sigs = (0 until nFrames).map { i =>
        text.substring(i * 32, i * 32 + 16).map(_.toInt.toLong).sum
      }
      val jumps = sigs.zip(sigs.tail).map { case (a, b) => math.abs(b - a) }
      val boundaries = jumps.count(_ > 150L)
      // Scene lengths: split the frame sequence at each boundary jump.
      val lens = scala.collection.mutable.Buffer[Long]()
      var cur = 1L
      jumps.foreach { j =>
        if (j > 150L) { lens += cur; cur = 1L } else cur += 1L
      }
      lens += cur
      (docId, nFrames.toLong, (boundaries + 1).toLong, lens.max,
        if (jumps.isEmpty) 0L else jumps.max)
    }

    val got = SparkEntry.queries("m10_scene_detect")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected.toSeq)
    assert(expected.exists(_._3 > 1), "fixture must contain a cut")
    assert(expected.exists(v => v._3 == 1 && v._2 > 1),
      "fixture must contain a multi-frame single-scene video")
  }
}
