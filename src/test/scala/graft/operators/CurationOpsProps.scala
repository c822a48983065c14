package graft.operators

import java.nio.file.Files

import org.scalacheck.{Prop, Properties}

import graft.{SparkEntry, SparkSpec}

/** Generative invariants for the round-16 close additions on inputs the
  * fixed fixtures never exercise: t27 on corpora with SPARSE,
  * GAPPY doc_ids (prefix-scan block boundaries), duplicate texts and
  * single-doc sources; m12 on random embeddings with MISSING vectors
  * (inner-join drops) and fresh bucketed fixture tables per sample;
  * s17 on random vector corpora small enough to leave codebook cells
  * EMPTY. Every sample writes a fresh parquet fixture and runs the
  * registered queries through the production code path; expectations
  * are independent brute-force recomputations. */
object CurationOpsProps extends Properties("CurationOps") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session

  // Replay definitions shared with each operator's fixture Spec
  // (CurationOracles): one oracle definition per invariant.
  import CurationOracles.{cosine, featureVec, heapsFit, pqCells}

  // ---- t27 ----------------------------------------------------------

  property("t27 equals the brute-force Heaps OLS on corpora with gappy " +
    "doc_ids, duplicate texts, and single-doc sources") =
    Prop.forAll(org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd   = new scala.util.Random(seed)
      val vocab = Vector.tabulate(3 + rnd.nextInt(8))(i => s"v$i")
      val nSrc  = 1 + rnd.nextInt(3)
      // Sparse increasing ids with block-boundary-crossing gaps.
      var id = 0L
      val docs = (0 until (4 + rnd.nextInt(10))).map { _ =>
        val gap =
          if (rnd.nextInt(4) == 0) 4096L + rnd.nextInt(9000)
          else 1L + rnd.nextInt(3)
        id += gap
        val text = Seq.fill(1 + rnd.nextInt(40))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (id, text, "en", s"src${rnd.nextInt(nSrc)}", text.length.toLong)
      }
      val dir = Files.createTempDirectory("prop_heaps").toString
      val sqlc = spark
      import sqlc.implicits._
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val expected = heapsFit(docs.map(d => (d._1, d._2, d._4)))
      val got = SparkEntry.queries("t27_heaps_law")(spark, dir)
        .collect().map(r => r.getString(0) -> ((r.getLong(1),
          r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      got.keySet == expected.keySet && got.forall {
        case (src, (nd, nt, v, beta, logk)) =>
          val (end, ent, ev, eb, el) = expected(src)
          nd == end && nt == ent && v == ev &&
            math.abs(beta - eb) < 5e-4 && math.abs(logk - el) < 5e-4
      }
    }

  // ---- m12 ----------------------------------------------------------

  property("m12 equals the brute-force feature-hash cosine on random " +
    "embeddings, with missing vectors dropped by the join") =
    Prop.forAll(org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd   = new scala.util.Random(seed)
      val vocab = Vector.tabulate(4 + rnd.nextInt(8))(i => s"w$i")
      val docs = (0 until (4 + rnd.nextInt(8))).map { i =>
        val text = Seq.fill(1 + rnd.nextInt(30))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, text, "en", "src0", text.length.toLong)
      }
      // Some docs have no embedding row — inner join must drop them.
      val embs = docs.filter(_ => rnd.nextInt(5) > 0).map { d =>
        (d._1, Seq.fill(64)((rnd.nextGaussian() * 0.1).toFloat), 0)
      }
      val dir = Files.createTempDirectory("prop_clip").toString
      val sqlc = spark
      import sqlc.implicits._
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      embs.toDF("vec_id", "embedding", "label")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      val expected = embs.map { case (id, e, _) =>
        id -> cosine(featureVec(docs.find(_._1 == id).get._2),
          e.map(_.toDouble).toArray)
      }.toMap
      val got = SparkEntry.queries("m12_clip_filter")(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getInt(3))))
        .toMap
      got.keySet == expected.keySet && got.forall {
        case (id, (align, kept)) =>
          math.abs(align - expected(id)) < 1e-5 &&
            kept == (if (align >= 0) 1 else 0)
      }
    }

  // ---- s17 ----------------------------------------------------------

  property("s17 equals the brute-force per-subspace assignment + " +
    "m-step on random vector corpora, empty cells absent, Lloyd " +
    "descent holding in every cell") =
    Prop.forAll(org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      val n   = 18 + rnd.nextInt(30) // ids 0..n-1; cb = 1..16
      val vecs = (0 until n).map { i =>
        (i.toLong, Seq.fill(64)((rnd.nextGaussian() * 0.1).toFloat), 0)
      }
      val dir = Files.createTempDirectory("prop_pq").toString
      val sqlc = spark
      import sqlc.implicits._
      vecs.toDF("vec_id", "embedding", "label")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      val expected = pqCells(
        vecs.map(v => v._1 -> v._2.map(_.toDouble).toArray).toMap)
      val got = SparkEntry.queries("s17_pq_train")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
        .toMap
      got.keySet == expected.keySet && got.forall {
        case (key, (cn, before, after, csum, cl2)) =>
          val (en, eb, ea, ec, el) = expected(key)
          cn == en && math.abs(before - eb) < 1e-5 &&
            math.abs(after - ea) < 1e-5 && math.abs(csum - ec) < 1e-5 &&
            math.abs(cl2 - el) < 1e-5 && after <= before + 1e-9
      }
    }
}
