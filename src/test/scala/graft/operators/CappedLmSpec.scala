package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** The capped-LM contract (TextAnalysis.UnigramLmCap / BigramLmCap /
  * ContextLmCap) pinned in both directions:
  *
  *  1. SLACK cap ≡ uncapped — on a corpus whose vocabulary fits every
  *     cap, the registered t14/t24/t25 queries must equal the plain
  *     uncapped add-one LMs recomputed inline here (the pre-cap
  *     definitions, kept verbatim as the reference), because the OOV
  *     bucket then carries zero mass and the effective smoothing
  *     vocabulary degenerates to the true vocabulary.
  *  2. BINDING cap routes to ONE bucket — planted out-of-vocabulary
  *     docs with disjoint rare vocabularies must score identically
  *     (their terms all coalesce to the same ZERO-COUNT OOV entry —
  *     the add-one pseudo-count alone, so unseen text stays at the
  *     probability floor rather than inheriting the capped tail's
  *     mass), and the scores must equal the closed forms computed
  *     from first principles.
  *  3. The LM build is a bounded heap — the optimized plans carry a
  *     TakeOrderedAndProject for the top-K selection, never a global
  *     sort, so the broadcast stays ≤ K+1 rows at any corpus size.
  */
class CappedLmSpec extends SparkSpec {

  private def writeCorpus(
      docs: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cappedlm_").toString
    docs.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- the uncapped reference definitions (pre-cap formulas) --------

  private def uncappedSurprisal(
      docs: Seq[(Long, String)]): Map[Long, Double] = {
    val words = docs.flatMap { case (id, t) =>
      t.split(" ", -1).toSeq.map(w => (id, w)) }
    val cnt   = words.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val total = cnt.valuesIterator.sum
    val v     = cnt.size.toLong
    words.groupBy(_._1).map { case (id, g) =>
      id -> -g.map { case (_, w) =>
        math.log((cnt(w) + 1.0) / (total + v)) }.sum / g.size
    }
  }

  private def uncappedDsir(
      docs: Seq[(Long, String, String)]): Map[Long, Double] = {
    val tgt = docs.map(_._3).min
    val words = docs.flatMap { case (id, t, s) =>
      t.split(" ", -1).toSeq.map(w => (id, s, w)) }
    val lm = words.groupBy(_._3).map { case (w, g) =>
      w -> (g.count(_._2 == tgt).toLong, g.count(_._2 != tgt).toLong) }
    val totalT = lm.valuesIterator.map(_._1).sum
    val totalR = lm.valuesIterator.map(_._2).sum
    val v      = lm.size.toLong
    words.groupBy(_._1).map { case (id, g) =>
      id -> g.map { case (_, _, w) =>
        val (ct, cr) = lm(w)
        math.log((ct + 1.0) / (totalT + v)) -
          math.log((cr + 1.0) / (totalR + v))
      }.sum / g.size
    }
  }

  private def uncappedBigramCe(
      docs: Seq[(Long, String, String)]): Map[Long, Double] = {
    val tgt   = docs.map(_._3).min
    val vocab = docs.flatMap(_._2.split(" ", -1)).distinct.size.toLong
    val tb = docs.filter(_._3 == tgt).flatMap { case (_, t, _) =>
      val w = t.split(" ", -1).toSeq
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => (p(0), s"${p(0)} ${p(1)}")).toSeq
    }
    val cntB = tb.groupBy(_._2).map { case (b, g) => b -> g.size }
    val cntC = tb.groupBy(_._1).map { case (c, g) => c -> g.size }
    docs.flatMap { case (id, t, _) =>
      val w = t.split(" ", -1).toSeq
      if (w.length < 2) None
      else {
        val lls = w.sliding(2).map { p =>
          math.log((cntB.getOrElse(s"${p(0)} ${p(1)}", 0) + 1.0) /
            (cntC.getOrElse(p(0), 0) + vocab))
        }.toSeq
        Some(id -> -lls.sum / lls.size)
      }
    }.toMap
  }

  // ---- 1. slack caps: capped ≡ uncapped ------------------------------

  test("on a corpus whose vocabulary fits every cap, t14/t24/t25 equal " +
    "the uncapped add-one LMs (zero OOV mass, v_eff = true vocabulary)") {
    // 12-word vocabulary: ≤ 12 unigrams (< 24), ≤ 144 distinct bigrams
    // (< 512), ≤ 12 contexts (< 24) — every cap is slack.
    val rnd = new scala.util.Random(7)
    def soup(n: Int) =
      Seq.fill(n)(s"w${rnd.nextInt(12)}").mkString(" ")
    val docs = (0L until 10L).map { i =>
      (i, soup(40), "en", if (i % 3 == 0) "a" else "b")
    }
    val dir = writeCorpus(docs)

    val t14 = SparkEntry.queries("t14_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val e14 = uncappedSurprisal(docs.map(d => (d._1, d._2)))
    docs.foreach { case (id, _, _, _) =>
      assert(math.abs(t14(id) - e14(id)) < 5e-4, s"t14 doc $id") }

    val t24 = SparkEntry.queries("t24_dsir_weight")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val e24 = uncappedDsir(docs.map(d => (d._1, d._2, d._4)))
    docs.foreach { case (id, _, _, _) =>
      assert(math.abs(t24(id) - e24(id)) < 5e-4, s"t24 doc $id") }

    val t25 = SparkEntry.queries("t25_lm_perplexity")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val e25 = uncappedBigramCe(docs.map(d => (d._1, d._2, d._4)))
    e25.foreach { case (id, ce) =>
      assert(math.abs(t25(id) - ce) < 5e-4, s"t25 doc $id") }
  }

  // ---- 2. binding caps: OOV routing ----------------------------------

  test("t14 routes every below-cap term to ONE zero-count OOV bucket: " +
    "two planted docs with disjoint rare vocabularies score " +
    "identically, at the closed-form floor probability; t24 scores " +
    "the same docs at the NEUTRAL llr of exactly 0") {
    // 24 common words × 10 occurrences fill the cap exactly; two probe
    // docs carry 4 rare singletons each (8 OOV tokens pooled).
    val common = (0 until 24).map(i =>
      (i.toLong, Seq.fill(10)(s"c$i").mkString(" "), "en", "a"))
    val probes = Seq(
      (100L, "r1 r2 r3 r4", "en", "b"),
      (101L, "r5 r6 r7 r8", "en", "b"))
    val dir = writeCorpus(common ++ probes)

    val got = SparkEntry.queries("t14_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(100L) === got(101L),
      "disjoint OOV vocabularies must score identically")
    // total = 240 common + 8 rare = 248 tokens; OOV count = 0 (the
    // add-one pseudo-count alone); v_eff = 24 + 1.
    val expected = -math.log((0 + 1.0) / (248 + 25))
    assert(math.abs(got(100L) - expected) < 5e-4,
      s"zero-count OOV probability: got ${got(100L)} expected $expected")
    // A common term scores its exact in-cap count, not the bucket.
    val expectedCommon = -math.log((10 + 1.0) / (248 + 25))
    assert(math.abs(got(0L) - expectedCommon) < 5e-4,
      s"in-cap probability: got ${got(0L)} expected $expectedCommon")
    // t24 on the same corpus: an all-OOV doc carries NO evidence for
    // either slice — its importance weight is exactly 0 nats/token.
    val dsir = SparkEntry.queries("t24_dsir_weight")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(dsir(100L) === 0.0 && dsir(101L) === 0.0,
      s"neutral OOV llr: got ${dsir(100L)} / ${dsir(101L)}")
  }

  test("t25 routes below-cap bigrams and contexts to the zero-count " +
    "OOV floor: probe docs with disjoint unseen vocabularies score " +
    "the same closed-form cross-entropy, and a below-cap target " +
    "bigram scores exactly like a never-seen one") {
    // One target doc of 600 distinct words in sequence: 599 distinct
    // bigrams (> 512 — the bigram cap binds) over 599 distinct
    // contexts (> 24 — the context cap binds). Probe docs from the
    // other source miss both capped tables entirely.
    val target = (600L, (0 until 600).map(i => s"t$i").mkString(" "),
      "en", "a")
    val probes = Seq(
      (700L, "x1 x2 x3 x4", "en", "b"),
      (701L, "y1 y2 y3 y4", "en", "b"))
    val dir = writeCorpus(Seq(target) ++ probes)

    val got = SparkEntry.queries("t25_lm_perplexity")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(700L) === got(701L),
      "disjoint unseen vocabularies must score identically")
    // vocab = 600 target + 8 probe terms; every probe bigram scores
    // the unseen floor (0 + 1) / (0 + V) — the uniform 1/V model.
    val expected = -math.log(1.0 / 608.0)
    assert(math.abs(got(700L) - expected) < 5e-4,
      s"zero-count bigram OOV: got ${got(700L)} expected $expected")
    // The binding-cap routing itself, pinned on the TARGET doc — the
    // one doc whose score the cap can change (probe docs miss both LMs
    // capped or not): the registered query must match the shared CAPPED
    // replay and must NOT match the uncapped recomputation, proving the
    // below-cap target bigrams really dropped to the never-seen floor.
    val docs = Seq(
      (target._1, target._2, target._4),
      (700L, "x1 x2 x3 x4", "b"), (701L, "y1 y2 y3 y4", "b"))
    val capped   = CurationOracles.bigramCe(docs)
    val uncapped = uncappedBigramCe(docs)
    assert(math.abs(got(600L) - capped(600L)._2) < 5e-4,
      s"target doc must match the capped replay: got ${got(600L)} " +
        s"expected ${capped(600L)._2}")
    assert(math.abs(got(600L) - uncapped(600L)) > 1e-3,
      s"the cap must BIND on the target doc (capped ${got(600L)} vs " +
        s"uncapped ${uncapped(600L)}) — a reverted cap would make " +
        "these equal")
  }

  test("t25 target-vs-raw perplexity discrimination SURVIVES the " +
    "binding caps on the sf0.001 fixture — the signal the zero-count " +
    "OOV design exists to protect") {
    val sf = "/root/testdata/sf0.001"
    val srcs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tgt = srcs.values.min
    val ppl = SparkEntry.queries("t25_lm_perplexity")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3))
    val (inT, out) = ppl.partition { case (id, _) => srcs(id) == tgt }
    val meanT = inT.map(_._2).sum / inT.size
    val meanR = out.map(_._2).sum / out.size
    assert(meanT < meanR,
      s"target mean ppl $meanT must stay below raw mean $meanR " +
        "under the caps")
  }

  // ---- 3. bounded-heap LM build ---------------------------------------

  test("the top-K LM selections plan as TakeOrderedAndProject (bounded " +
    "heap), never a global sort, in all four scoring queries") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("t14_unigram_surprisal", "t24_dsir_weight",
        "t25_lm_perplexity", "t26_ccnet_buckets")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q: top-K LM selection must be a bounded heap:\n$plan")
    }
  }
}
