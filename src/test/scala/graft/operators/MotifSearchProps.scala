package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalacheck.{Prop, Properties}

import graft.{SparkEntry, SparkSpec}

/** Generative invariant for q128 on series the fixture never shapes:
  * random per-user walks with planted FLAT runs (σ² = 0 windows the
  * filter must drop identically on both the engine and the replay),
  * duplicate-second timestamps (event_id tie-break), and users shorter
  * than one window. Expectation is an independent brute-force replay
  * of every sliding window. */
object MotifSearchProps extends Properties("MotifSearch") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  private val L = 8

  property("q128 equals the brute-force z-normalized window replay on " +
    "random walks with flat runs, tied timestamps, and short users") =
    Prop.forAll(org.scalacheck.Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      var eid = 0L
      val rows = (0 until (2 + rnd.nextInt(4))).flatMap { u =>
        val len = 3 + rnd.nextInt(40)
        var v = 50.0 + rnd.nextInt(100)
        (0 until len).map { i =>
          v = rnd.nextInt(5) match {
            case 0 => v // flat step — runs of these make sigma = 0
            case _ => v + (rnd.nextGaussian() * 10).round
          }
          eid += 1
          // Half the events share a second with their predecessor.
          val sec = i / (1 + rnd.nextInt(2))
          (eid, new Timestamp(1700000000000L + sec * 1000L),
            u.toLong, "x", v, "{}")
        }
      }
      val dir = Files.createTempDirectory("prop_motif").toString
      val sqlc = spark
      import sqlc.implicits._
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val zq = (1 to L).map(i => (i - 4.5) / math.sqrt(5.25))
      val expected = rows.groupBy(_._3).toSeq.flatMap { case (_, g) =>
        val ordered = g.sortBy(e => (e._2.getTime, e._1))
        ordered.sliding(L).filter(_.size == L).flatMap { win =>
          val xs = win.map(_._5)
          val mu = xs.sum / L
          val v2 = xs.map(x => x * x).sum / L - mu * mu
          if (v2 <= 1e-12) None
          else Some((win.head._3, win.head._1,
            BigDecimal(xs.zip(zq).map { case (x, q) =>
              math.pow((x - mu) / math.sqrt(v2) - q, 2) }.sum)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }.sortBy { case (u, e, d) => (d, u, e) }.take(10)

      val got = SparkEntry.queries("q128_subseq_match")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .toSeq
      got.map(x => (x._1, x._2)) == expected.map(x => (x._1, x._2)) &&
        got.zip(expected).forall { case ((_, _, d), (_, _, ed)) =>
          math.abs(d - ed) < 1e-5 }
    }
}
