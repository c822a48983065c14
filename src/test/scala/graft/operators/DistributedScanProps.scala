package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** Generative equivalence properties for the DistributedScan family —
  * the count-scan decomposition vs the textbook single-window
  * formulation on RANDOM distributions, covering the shape space the
  * fixed-seed DistributedScanSpec rows can't sweep: arbitrary hot-key
  * share (0–99%), duplicate densities from all-distinct down to
  * ALL-EQUAL values (one bucket holds a whole stream), negative values
  * under truncating `div` banding (still monotone, a documented part
  * of the bucket contract), band widths from 1 (every value its own
  * bucket) to wider-than-the-domain (one bucket total), STRUCT buckets
  * (q122's shape: exact leading key + a block of the tiebreaker), and
  * planted size-1/size-2 streams where several target ranks collide in
  * one bucket row. */
object DistributedScanProps extends Properties("DistributedScan") {

  // Each sample runs a handful of small Spark jobs; 6 random corpora
  // per property cover the shape space without a multi-minute suite.
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  /** Rows (stream, id, v): `nStreams` keys, one taking `hotPct`% of
    * rows; v drawn from `vDomain` distinct values shifted by `vOffset`
    * (negative offsets exercise truncating-div bands). id unique. */
  private def corpus(seed: Long, nRows: Int): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val nStreams = 1 + rnd.nextInt(9)
    val hotPct = rnd.nextInt(100)
    val vDomain = Seq(1, 3, 97, 5000)(rnd.nextInt(4))
    val vOffset = Seq(0L, -2500L, 7L)(rnd.nextInt(3))
    val base = (0 until nRows).map { i =>
      val s = if (rnd.nextInt(100) < hotPct) "hot"
              else s"cold${rnd.nextInt(nStreams)}"
      (s, i.toLong, rnd.nextInt(vDomain).toLong + vOffset)
    }
    // Planted degenerate streams: size 1, size 2, and an all-equal run.
    base ++ Seq(("one", 900001L, 5L), ("two", 900002L, 3L),
      ("two", 900003L, 9L)) ++
      (0 until 7).map(i => ("flat", 910000L + i, 42L))
  }

  private def df(rows: Seq[(String, Long, Long)]) = {
    val sqlc = spark
    import sqlc.implicits._
    rows.toDF("stream", "id", "v")
  }

  property("bucketedRowNumber equals the single-window row_number on " +
    "any stream/duplicate/band distribution, incl. struct buckets") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed ^ 0x5ca1ab1eL)
      val in = df(corpus(seed, 3000 + rnd.nextInt(3000)))
      // Band width 1 (every value its own bucket), mid, or one-bucket;
      // or q122's struct shape (exact leading key, tiebreaker block).
      val bucket = rnd.nextInt(4) match {
        case 0 => expr("v div 1")
        case 1 => expr("v div 16")
        case 2 => expr("v div 100000") // wider than the domain: 1 bucket
        case _ => struct(col("v"), expr("id div 64"))
      }
      val got = DistributedScan.bucketedRowNumber(
          in, col("stream"), bucket, Seq(col("v"), col("id")), "rk")
        .select(col("stream"), col("id"), col("rk"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val w = Window.partitionBy(col("stream")).orderBy(col("v"), col("id"))
      val exp = in.withColumn("rk", row_number().over(w).cast("long"))
        .select(col("stream"), col("id"), col("rk"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      Prop(got == exp) :| s"${got.size} rows vs ${exp.size}"
    }

  property("rankSelect equals rank-filtering the single-window " +
    "row_number for every quantile class on any distribution") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed ^ 0x0ddba11L)
      val in = df(corpus(seed, 3000 + rnd.nextInt(3000)))
      val band = Seq("v div 1", "v div 16", "v div 100000")(rnd.nextInt(3))
      val ranks = Seq(
        "p25" -> "((25 * n) + 99) div 100",
        "p50" -> "((50 * n) + 99) div 100",
        "lo"  -> "(n + 1) div 2",
        "hi"  -> "n div 2 + 1",
        "p99" -> "((99 * n) + 99) div 100")
      val got = DistributedScan.rankSelect(
          in, "stream", expr(band), Seq(col("v"), col("id")), col("v"),
          ranks)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), ranks.map { case (name, _) =>
            r.getLong(r.fieldIndex(name)) }))
        .toMap
      val w = Window.partitionBy(col("stream")).orderBy(col("v"), col("id"))
      val grp = Window.partitionBy(col("stream"))
      val ranked = in
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(grp))
      val exp = ranked.groupBy(col("stream"))
        .agg(max(col("n")).as("n"),
          ranks.map { case (name, rkExpr) =>
            min(when(col("rk") === expr(rkExpr), col("v"))).as(name) }: _*)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), ranks.map { case (name, _) =>
            r.getLong(r.fieldIndex(name)) }))
        .toMap
      Prop(got == exp) :| s"${got.size} streams vs ${exp.size}"
    }

  property("exclusivePrefixSum equals the single-window running sum " +
    "on any distribution, incl. negative addends and sparse gaps") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed ^ 0xf01dab1eL)
      // Sparse non-contiguous seq (id * stride) exercises ragged blocks;
      // x spans negatives and zeros (addition stays associative).
      val stride = 1 + rnd.nextInt(5)
      val rows = corpus(seed, 3000 + rnd.nextInt(3000))
        .map { case (s, id, v) => (s, id * stride, v - 20) }
      val blockSize = Seq(64L, 4096L)(rnd.nextInt(2))
      val in = df(rows).withColumnRenamed("id", "seq")
      val got = DistributedScan.exclusivePrefixSum(
          in, col("stream"), col("seq"), col("v"), "prior", blockSize)
        .select(col("stream"), col("seq"), col("prior"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val w = Window.partitionBy(col("stream")).orderBy(col("seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
      val exp = in
        .withColumn("prior", coalesce(sum(col("v")).over(w), lit(0L)))
        .select(col("stream"), col("seq"), col("prior"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      Prop(got == exp) :| s"${got.size} rows vs ${exp.size}"
    }
}
