package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** m12 (LAION-style CLIP-score alignment filter) checked against a full
  * driver-side recomputation of the feature-hashed caption vector and
  * the cosine for every fixture doc, a planted corpus where the media
  * embedding IS (or is the negation of) the caption's own feature
  * vector (align → ±1, the keep gate must separate completely), and
  * the zero-exchange plan the co-bucketed layout promises. */
class AlignmentFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // Replay definitions shared with CurationOpsProps (CurationOracles).
  import CurationOracles.{cosine, featureVec}

  test("m12 matches a driver-side recomputation of the feature-hashed " +
    "caption vector and cosine for every fixture doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

    val got = SparkEntry.queries("m12_clip_filter")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))

    assert(got.length === embs.size)
    got.foreach { case (id, mt, align, kept) =>
      val expected = cosine(featureVec(docs(id)), embs(id))
      assert(math.abs(align - expected) < 1e-5,
        s"doc $id: got $align expected $expected")
      assert(kept === (if (align >= 0) 1 else 0), s"doc $id keep gate")
      val emt = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video" }
      assert(mt === emt, s"doc $id media_type")
    }
  }

  test("planted corpus: a media embedding equal to its caption's own " +
    "feature vector aligns at +1 and is kept; the negation aligns at " +
    "-1 and is dropped") {
    import spark.implicits._
    val texts = Seq(
      "spark table join merge window",
      "filter group order sort key value",
      "batch stream row column vector data",
      "customer part line agg hash scan")
    texts.foreach(t =>
      require(featureVec(t).exists(_ != 0), s"degenerate caption: $t"))
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong) }
    val embs = texts.zipWithIndex.map { case (t, i) =>
      val fv = featureVec(t).map(_.toFloat)
      (i.toLong, (if (i % 2 == 0) fv else fv.map(-_)).toSeq, 0) }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_clip_").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    embs.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("m12_clip_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    texts.indices.foreach { i =>
      val (align, kept) = got(i.toLong)
      if (i % 2 == 0) {
        assert(math.abs(align - 1.0) < 1e-5 && kept == 1,
          s"doc $i: $align kept=$kept (expected +1, kept)")
      } else {
        assert(math.abs(align + 1.0) < 1e-5 && kept == 0,
          s"doc $i: $align kept=$kept (expected -1, dropped)")
      }
    }
  }

  test("the co-bucketed alignment join plans with zero Exchange — the " +
    "embedding payload never rides a shuffle") {
    val (capT, embT) = Multimodal.prewarmAlignmentTables(spark, sf)
    val joined = spark.table(capT).hint("MERGE")
      .join(spark.table(embT), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("tf"), col("embedding"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"co-bucketed alignment join must not shuffle either side:\n$plan")
  }
}
