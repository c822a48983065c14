package graft.operators

/** ONE definition per independent brute-force oracle, shared between
  * each operator's fixture Spec and its generative Props suite — so a
  * production-definition change cannot leave one suite passing against
  * a stale replay while the other is updated. */
object CurationOracles {

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- t25/t26: add-one bigram LM cross-entropy ---------------------

  /** Top-K cap over a count table: entries ranked by (count desc,
    * md5(entry) asc) — the exact rank both engines use. Below-cap
    * entries score the zero-count OOV bucket (drop to the unseen
    * floor; see TextAnalysis.UnigramLmCap for the rationale). Shared
    * by every capped-LM replay below. */
  private def capLm[K](
      counts: Map[K, Long], cap: Int, key: K => String): Map[K, Long] =
    counts.toSeq
      .sortBy { case (k, n) => (-n, md5hex(key(k))) }
      .take(cap).toMap

  /** Per-doc (n_bigrams, cross-entropy) under the target-slice add-one
    * bigram LM with the production top-K + zero-count-OOV caps
    * (target = lexicographic min source; vocabulary = whole-corpus
    * distinct unigrams; caps default to the registered queries'
    * constants). Input rows: (doc_id, text, source). Sub-bigram docs
    * are absent from the result. */
  def bigramCe(
      docs: Seq[(Long, String, String)],
      capB: Int = TextAnalysis.BigramLmCap,
      capC: Int = TextAnalysis.ContextLmCap): Map[Long, (Long, Double)] = {
    val tgt = docs.map(_._3).min
    val vocab = docs.flatMap(_._2.split(" ", -1)).distinct.size.toLong
    val tgtBigrams = docs.filter(_._3 == tgt).flatMap { case (_, t, _) =>
      val w = t.split(" ", -1).toSeq
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => (p(0), s"${p(0)} ${p(1)}")).toSeq
    }
    val cntB = tgtBigrams.groupBy(_._2)
      .map { case (b, g) => b -> g.size.toLong }
    val cntC = tgtBigrams.groupBy(_._1)
      .map { case (c, g) => c -> g.size.toLong }
    val topB = capLm(cntB, capB, identity[String])
    val topC = capLm(cntC, capC, identity[String])
    docs.flatMap { case (id, t, _) =>
      val w = t.split(" ", -1).toSeq
      if (w.length < 2) None
      else {
        val lls = w.sliding(2).map { p =>
          math.log((topB.getOrElse(s"${p(0)} ${p(1)}", 0L) + 1.0) /
            (topC.getOrElse(p(0), 0L) + vocab))
        }.toSeq
        Some(id -> (lls.size.toLong, -lls.sum / lls.size))
      }
    }.toMap
  }

  // ---- t24: capped DSIR importance weight ----------------------------

  /** Per-doc (n_tokens, mean log-likelihood ratio) under the two
    * add-one unigram LMs with the production top-K cap: entries
    * ranked by TOTAL corpus frequency, effective vocabulary = |top| +
    * (1 iff any mass fell below the cap), OOV tokens NEUTRAL (llr = 0
    * — see the t24 scaladoc for why a ratio's OOV bucket must not
    * score through both smoothed LMs). Input rows: (doc_id, text,
    * source). */
  def dsirWeights(
      docs: Seq[(Long, String, String)],
      cap: Int = TextAnalysis.UnigramLmCap): Map[Long, (Long, Double)] = {
    val tgt = docs.map(_._3).min
    val words = docs.flatMap { case (id, text, src) =>
      text.split(" ", -1).toSeq.map(w => (id, src, w)) }
    val lm = words.groupBy(_._3).map { case (w, g) =>
      w -> (g.count(_._2 == tgt).toLong, g.count(_._2 != tgt).toLong) }
    val top = lm.toSeq
      .sortBy { case (w, (t, r)) => (-(t + r), md5hex(w)) }
      .take(cap).toMap
    val totalT = lm.valuesIterator.map(_._1).sum
    val totalR = lm.valuesIterator.map(_._2).sum
    val belowCap = (totalT + totalR) >
      (top.valuesIterator.map(_._1).sum + top.valuesIterator.map(_._2).sum)
    val vEff = top.size + (if (belowCap) 1L else 0L)
    words.groupBy(_._1).map { case (id, g) =>
      val llr = g.map { case (_, _, w) =>
        top.get(w) match {
          case None => 0.0
          case Some((ct, cr)) =>
            math.log((ct + 1.0) / (totalT + vEff)) -
              math.log((cr + 1.0) / (totalR + vEff))
        }
      }.sum
      id -> (g.size.toLong, llr / g.size)
    }
  }

  // ---- t14: capped unigram surprisal ---------------------------------

  /** Per-doc (n_tokens, mean −ln p) under the corpus add-one unigram
    * LM with the production top-K + zero-count-OOV cap. Input rows:
    * (doc_id, text). */
  def unigramSurprisal(
      docs: Seq[(Long, String)],
      cap: Int = TextAnalysis.UnigramLmCap): Map[Long, (Long, Double)] = {
    val words = docs.flatMap { case (id, text) =>
      text.split(" ", -1).toSeq.map(w => (id, w)) }
    val cnt = words.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val top = capLm(cnt, cap, identity[String])
    val total = cnt.valuesIterator.sum
    val vEff  = top.size +
      (if (total > top.valuesIterator.sum) 1L else 0L)
    words.groupBy(_._1).map { case (id, g) =>
      val nll = g.map { case (_, w) =>
        -math.log((top.getOrElse(w, 0L) + 1.0) / (total + vEff))
      }.sum
      id -> (g.size.toLong, nll / g.size)
    }
  }

  // ---- m12: feature-hashed caption vector + cosine ------------------

  /** The hashing-trick text encoder (dim = first md5 byte % 64, sign =
    * parity of the third hex digit). */
  def featureVec(text: String): Array[Double] = {
    val v = new Array[Double](64)
    text.split(" ", -1).foreach { w =>
      val h = md5hex(w)
      val dim = Integer.parseInt(h.substring(0, 2), 16) % 64
      val sgn = if (Integer.parseInt(h.substring(2, 3), 16) % 2 == 0) 1 else -1
      v(dim) += sgn
    }
    v
  }

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na  = math.sqrt(a.map(x => x * x).sum)
    val nb  = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  // ---- t27: Heaps'-law cumulative series + OLS ----------------------

  /** Per-source (n_docs, n_tokens, vocab, beta, logk) — cumulative
    * token/first-occurrence series in doc_id order, then the ln-ln OLS.
    * Input rows: (doc_id, text, source). */
  def heapsFit(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Double, Double)] =
    docs.groupBy(_._3).map { case (src, g) =>
      val ordered = g.sortBy(_._1)
      var seen = Set.empty[String]
      var ct = 0L
      var cv = 0L
      val pts = ordered.map { case (_, text, _) =>
        val ws = text.split(" ", -1).toSeq
        val novel = ws.distinct.filterNot(seen)
        seen ++= novel
        ct += ws.size
        cv += novel.size
        (ws.size.toLong, novel.size.toLong, math.log(ct.toDouble),
          math.log(cv.toDouble))
      }
      val n   = pts.size.toDouble
      val sx  = pts.map(_._3).sum
      val sy  = pts.map(_._4).sum
      val sxy = pts.map(p => p._3 * p._4).sum
      val sxx = pts.map(p => p._3 * p._3).sum
      val den = n * sxx - sx * sx
      val beta = if (den == 0) 0.0 else (n * sxy - sx * sy) / den
      src -> (pts.size.toLong, pts.map(_._1).sum, pts.map(_._2).sum,
        beta, (sy - beta * sx) / n)
    }

  // ---- s17: per-subspace PQ assignment + m-step ---------------------

  /** Per (subspace, code) cell: (n, dist_before, dist_after,
    * centroid_sum, centroid_l2) under s17's exact conventions (codebook
    * = vec_ids 1–16, 9 dp distance rounding, (d2, code) min tie order;
    * vec_id 0 excluded from the corpus). */
  def pqCells(vecs: Map[Long, Array[Double]])
      : Map[(Int, Int), (Long, Double, Double, Double, Double)] = {
    def sub(v: Array[Double], m: Int): Array[Double] =
      v.slice((m - 1) * 16, m * 16)
    val assigned = for {
      (id, v) <- vecs.toSeq if id != 0L
      m <- 1 to 4
    } yield {
      val x = sub(v, m)
      val (d2, code) = (1 to 16).map { c =>
        val w = sub(vecs(c.toLong), m)
        (round9(x.zip(w).map { case (a, b) => (a - b) * (a - b) }.sum), c)
      }.min
      (m, code, x, d2)
    }
    assigned.groupBy { case (m, code, _, _) => (m, code) }
      .map { case (key, g) =>
        val n  = g.size
        val xs = g.map(_._3)
        val sj = (0 until 16).map(j => xs.map(_(j)).sum)
        val sq = xs.map(_.map(x => x * x).sum).sum
        val s2 = sj.map(x => x * x).sum
        key -> ((n.toLong, g.map(_._4).sum / n, (sq - s2 / n) / n,
          sj.sum / n, math.sqrt(s2) / n))
      }
  }
}
