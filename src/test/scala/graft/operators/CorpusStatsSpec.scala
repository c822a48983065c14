package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Scala-side recomputation oracles for t16 (Zipf slope), q106 (Markov
  * transitions), and p07 (per-source caps) — cross-checks independent of
  * the DuckDB gate's mirrored SQL. */
class CorpusStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t16 zipf slope equals an OLS fit recomputed from raw term counts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))

    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lang, rows) =>
        val freq = rows.flatMap(_._2.split(" ", -1))
          .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }
        val ranked = freq.toSeq.sortBy { case (w, n) => (-n, w) }.take(100)
        val pts = ranked.zipWithIndex.map { case ((_, n), i) =>
          (math.log(i + 1.0), math.log(n.toDouble)) // (x=ln rank, y=ln n)
        }
        val mx = pts.map(_._1).sum / pts.size
        val my = pts.map(_._2).sum / pts.size
        val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
          pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
        (lang, pts.size.toLong, slope)
    }

    val got = SparkEntry.queries("t16_zipf_slope")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((gl, gn, gs), (el, en, es)) =>
      assert(gl === el)
      assert(gn === en)
      assert(math.abs(gs - es) < 5e-4, s"$gl slope $gs vs OLS $es")
      assert(gs < 0.0, s"$gl: rank-frequency slope must be negative")
    }
  }

  test("q106 transition rows match a replay of each user's event sequence " +
    "and every prev-row's probabilities floor-sum to ~1e6") {
    val got = SparkEntry.queries("q106_markov_transitions")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap

    // Replay: same (ts, event_id) per-user order, counted in Scala.
    import org.apache.spark.sql.functions._
    val seq = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val expected = scala.collection.mutable.Map[(String, String), Long]()
    seq.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
        .map(_._4).sliding(2).foreach {
          case Array(a, b) =>
            expected((a, b)) = expected.getOrElse((a, b), 0L) + 1L
          case _ => ()
        }
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, n) =>
      assert(got(k)._1 === n, s"transition $k count")
    }
    // Row-stochastic up to integer-div floor loss: each prev's ppm total
    // lands in (1e6 - fanout, 1e6].
    got.groupBy(_._1._1).foreach { case (prev, rows) =>
      val total = rows.values.map(_._2).sum
      assert(total <= 1000000L && total > 1000000L - rows.size,
        s"$prev ppm total $total")
    }
  }

  test("q107 last-touch attribution matches a sequential replay: latest " +
    "preceding non-purchase wins, any distance back, else 'direct'") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

    // (channel, purchases, cents, gapTotalUs) accumulated by replay.
    val acc = scala.collection.mutable
      .Map[String, (Long, Long, Long)]().withDefaultValue((0L, 0L, 0L))
    rows.groupBy(_._1).values.foreach { evs =>
      var lastTouch: Option[(String, Long)] = None
      evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).foreach { e =>
        val tsUs = e._2.getTime * 1000L + (e._2.getNanos / 1000L) % 1000L
        if (e._4 == "purchase") {
          val (ch, gap) = lastTouch
            .map { case (c, t) => (c, tsUs - t) }.getOrElse(("direct", 0L))
          val (n, c, g) = acc(ch)
          acc(ch) = (n + 1, c + math.round(e._5 * 100), g + gap)
        } else lastTouch = Some((e._4, tsUs))
      }
    }
    val expected = acc.toSeq.sortBy(_._1).map { case (ch, (n, c, g)) =>
      (ch, n, c, g / n)
    }
    val got = SparkEntry.queries("q107_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    assert(expected.exists(_._1 == "direct"),
      "fixture must exercise the no-prior-touch branch")
  }

  test("m09 snaps every image to the integer-ppm-nearest aspect bucket " +
    "with declaration-order tie-break, recomputed driver-side") {
    val buckets = Seq(
      "a_square_1_1" -> 1000000L, "b_landscape_4_3" -> 1333333L,
      "c_portrait_3_4" -> 750000L, "d_wide_16_9" -> 1777777L,
      "e_tall_9_16" -> 562500L)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 3 == 0)

    val expected = docs.map { case (id, nc) =>
      val (w0, h0) = (nc % 640 + 16, nc % 360 + 16)
      val (w, h)   = if ((id / 3) % 2 == 1) (h0, w0) else (w0, h0)
      val ar       = w * 1000000L / h
      val bucket   = buckets.minBy { case (_, ppm) => math.abs(ar - ppm) }._1
      (bucket, ar, w * h)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, rs) =>
      (b, rs.length.toLong, rs.map(_._3).sum, rs.map(_._2).sum / rs.length)
    }
    val got = SparkEntry.queries("m09_aspect_buckets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // Both orientations must reach the snap (portrait arms are only
    // reachable through the transpose).
    assert(expected.exists(_._1.startsWith("e_")) &&
      expected.exists(_._1.startsWith("d_")),
      "fixture must exercise both orientations")
  }

  test("q108 top paths match a trigram replay of each user's sequence " +
    "and the cut line is the total (n DESC, path) order") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val counts = scala.collection.mutable.Map[String, Long]()
    rows.groupBy(_._1).values.foreach { evs =>
      evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
        .sliding(3).foreach {
          case Array(a, b, c) =>
            val p = s"$a>$b>$c"
            counts(p) = counts.getOrElse(p, 0L) + 1L
          case _ => ()
        }
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = SparkEntry.queries("q108_path_mining")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === expected)
  }

  test("t17 merge candidates match a driver-side BPE pair count " +
    "(per-position, frequency-weighted) and the cut is (n DESC, pair)") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val wf = scala.collection.mutable.Map[String, Long]()
    texts.foreach(_.split(" ", -1).foreach { w =>
      wf(w) = wf.getOrElse(w, 0L) + 1L
    })
    val pairs = scala.collection.mutable.Map[String, Long]()
    wf.foreach { case (w, n) =>
      if (w.length >= 2)
        w.sliding(2).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + n
        }
    }
    val expected = pairs.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = SparkEntry.queries("t17_bpe_pair_learn")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === expected)
  }

  test("q109 pair/support/lift rows match a driver-side session replay " +
    "with exact integer ppm arithmetic") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    // Replay the 30-minute-gap sessionization per user, then collect each
    // session's DISTINCT type set.
    val sessions = scala.collection.mutable.Buffer[Set[String]]()
    rows.groupBy(_._1).values.foreach { evs =>
      var cur = scala.collection.mutable.Set[String]()
      var lastUs = Long.MinValue
      evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).foreach { e =>
        val tsUs = e._2.getTime * 1000L + (e._2.getNanos / 1000L) % 1000L
        if (lastUs != Long.MinValue && tsUs - lastUs > 1800000000L) {
          sessions += cur.toSet
          cur = scala.collection.mutable.Set[String]()
        }
        cur += e._4
        lastUs = tsUs
      }
      if (cur.nonEmpty) sessions += cur.toSet
    }
    val nTot = sessions.size.toLong
    val nEt = scala.collection.mutable.Map[String, Long]()
    val nAb = scala.collection.mutable.Map[(String, String), Long]()
    sessions.foreach { s =>
      s.foreach(t => nEt(t) = nEt.getOrElse(t, 0L) + 1L)
      val sorted = s.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size) {
        val k = (sorted(i), sorted(j))
        nAb(k) = nAb.getOrElse(k, 0L) + 1L
      }
    }
    val expected = nAb.toSeq.sortBy(_._1).map { case ((a, b), n) =>
      (a, b, n, n * 1000000L / nTot,
        n * 1000000L * nTot / (nEt(a) * nEt(b)))
    }
    val got = SparkEntry.queries("q109_basket_lift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected)
    // The lift axis must actually discriminate: the fixture grid should
    // not be a constant-lift degenerate case.
    assert(expected.map(_._5).distinct.size > 1,
      "fixture lift values are degenerate")
  }

  test("q110 per-user series match a driver-side replay: last event per " +
    "day, exact integer lerp between known days, edges clamped") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))

    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (uid, evs) =>
        // Per day: the LAST event's cents (max (tsUs, event_id)).
        // Session tz is UTC (SparkSpec), so getTime/86400000 IS the UTC
        // day; 19723 = days from epoch for 2024-01-01.
        val byDay = evs.groupBy { e =>
          (e._2.getTime / 86400000L).toInt - 19723
        }.map { case (day, des) =>
          val last = des.maxBy(e =>
            (e._2.getTime * 1000L + (e._2.getNanos / 1000L) % 1000L, e._3))
          day -> math.round(last._4 * 100)
        }
        val days = byDay.keys.toSeq.sorted
        var (nMid, nEdge, sum, wsum) = (0L, 0L, 0L, 0L)
        (0 until 30).foreach { i =>
          val f = byDay.get(i) match {
            case Some(v) => v
            case None =>
              val prev = days.filter(_ < i).lastOption
              val next = days.find(_ > i)
              (prev, next) match {
                case (Some(p), Some(n)) =>
                  nMid += 1
                  (byDay(p) * (n - i) + byDay(n) * (i - p)) / (n - p)
                case (None, Some(n)) => nEdge += 1; byDay(n)
                case (Some(p), None) => nEdge += 1; byDay(p)
                case _ => sys.error("user with no events")
              }
          }
          sum += f; wsum += f * (i + 1)
        }
        (uid, days.size.toLong, nMid, nEdge, sum, wsum)
    }

    val got = SparkEntry.queries("q110_gap_interpolate")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected)
    assert(expected.forall(_._3 > 0), "every fixture user should have " +
      "an interior gap at this density")
    assert(expected.exists(_._4 > 0),
      "fixture must exercise the edge-clamp branch")
  }

  test("q111 conversion rows match a driver-side replay: first purchase " +
    "strictly after the signup, within 24h, same-instant ties excluded") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).getTime * 1000L +
          (r.getTimestamp(1).getNanos / 1000L) % 1000L,
        r.getString(2)))

    // (day -> (signups, converted, latencyTotal)) accumulated by replay.
    val acc = scala.collection.mutable
      .Map[Int, (Long, Long, Long)]().withDefaultValue((0L, 0L, 0L))
    rows.groupBy(_._1).values.foreach { evs =>
      val purchases = evs.filter(_._3 == "purchase").map(_._2).sorted
      evs.filter(_._3 == "signup").foreach { case (_, tsu, _) =>
        val day = (tsu / 86400000000L - 19723L).toInt
        val np = purchases.find(p => p > tsu && p <= tsu + 86400000000L)
        val (n, c, l) = acc(day)
        acc(day) = (n + 1, c + np.size, l + np.map(_ - tsu).getOrElse(0L))
      }
    }
    val expected = acc.toSeq.sortBy(_._1).map { case (day, (n, c, l)) =>
      (day, n, c, c * 1000000L / n, if (c == 0) 0L else l / c)
    }
    val got = SparkEntry.queries("q111_conversion_window")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected)
    assert(expected.exists(_._3 > 0) && expected.exists(d => d._3 < d._2),
      "fixture must exercise both the converted and unconverted branches")
  }

  test("p07 keeps exactly the top-10-by-(n_chars desc, doc_id) documents " +
    "per source, recomputed driver-side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val kept = rows.sortBy(r => (-r._3, r._2)).take(10)
        (src, rows.length.toLong, kept.length.toLong,
          (rows.length - kept.length).toLong, kept.map(_._3).sum)
    }
    val got = SparkEntry.queries("p07_source_caps")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === expected)
  }
}
