package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** s13's health report, cross-checked two ways: the latent branches the
  * fixture can't reach (zero vectors, empty arrays — failed upstream
  * encodes) proven on literals via the exposed per-vector expressions
  * (m07's convention), and the fixture rows recomputed driver-side with
  * independent Scala arithmetic. */
class EmbeddingQaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s13 per-vector expressions: zero and empty vectors flag as zero " +
    "with sqnorm 0; known components quantize exactly") {
    import spark.implicits._
    val rows = Seq(
      Seq(0.0f, 0.0f, 0.0f), // zero vector: failed encode
      Seq.empty[Float],      // empty array: degenerate row
      Seq(0.5f, -0.5f),      // floor(±500.0) → 500² + (−500)² = 500000
      Seq(1.0f),             // floor(1000.0)² = 1000000
    ).toDF("embedding")
      .selectExpr(
        s"${Similarity.SqnormMilliExpr} AS sqn",
        s"${Similarity.IsZeroExpr} AS isz")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(0) === ((0L, 1L)))
    assert(rows(1) === ((0L, 1L)))
    assert(rows(2)._2 === 0L)
    assert(rows(2)._1 === 500000L)
    assert(rows(3) === ((1000000L, 0L)))
  }

  test("s13 per-label report matches a driver-side recompute and the " +
    "fixture batches all center on the unit norm") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))

    val expected = vecs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (label, rows) =>
        val sqns = rows.map { case (_, emb) =>
          emb.map(x => math.floor(x.toDouble * 1000).toLong)
            .map(q => q * q).sum
        }
        val nZero = rows.count(_._2.forall(_ == 0.0f)).toLong
        (label, rows.length.toLong, nZero, sqns.min,
          sqns.sum / rows.length, sqns.max)
    }

    val got = SparkEntry.queries("s13_embedding_qa")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected)
    // The audit's point: every fixture batch is healthy — mean squared
    // norm within 2% of the unit 10⁶ (and the column would show a broken
    // batch loudly if one appeared).
    expected.foreach { case (label, _, nZero, _, mean, _) =>
      assert(nZero === 0L, s"label $label has unexpected zero vectors")
      assert(math.abs(mean - 1000000L) < 20000L,
        s"label $label mean sqnorm $mean drifts from unit")
    }
  }
}
