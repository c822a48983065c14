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
