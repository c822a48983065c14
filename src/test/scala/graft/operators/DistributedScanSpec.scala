package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedScan.exclusivePrefixSum ≡ the textbook single-window
  * running sum, row for row — on a generated multi-stream table with a
  * deliberately skewed stream (one key holding most rows, the shape the
  * scan exists for), gaps in the sequence values, zero-valued rows, and
  * block boundaries both hit and straddled. */
class DistributedScanSpec extends SparkSpec {

  test("two-level scan equals the single-window prefix sum on a skewed " +
    "multi-stream table, including across block boundaries and gaps") {
    val rnd = new scala.util.Random(7)
    // Stream "hot" gets ~90% of rows; sparse non-contiguous seq values
    // so _eps_blk blocks are irregularly filled.
    val rows = (0 until 20000).map { i =>
      val stream = if (i % 10 == 0) s"cold${i % 7}" else "hot"
      (stream, i.toLong * (1 + rnd.nextInt(3)), rnd.nextInt(50).toLong)
    }.distinct
    val sqlc = spark
    import sqlc.implicits._
    val df = rows.toDF("stream", "seq", "x")
      // seq must be unique per stream: dedupe collisions from the *3 map
      .groupBy("stream", "seq").agg(max(col("x")).as("x"))

    val got = DistributedScan.exclusivePrefixSum(
        df, col("stream"), col("seq"), col("x"), "prior", blockSize = 64L)
      .select(col("stream"), col("seq"), col("prior"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    val w = Window.partitionBy(col("stream")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val exp = df
      .withColumn("prior", coalesce(sum(col("x")).over(w), lit(0L)))
      .select(col("stream"), col("seq"), col("prior"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    assert(got.size === exp.size)
    assert(got === exp)
  }

  test("the scan RECURSES when the block table itself outgrows a window " +
    "task: a tiny blockSize forces multiple levels (plan-pinned by " +
    "Window-node count) and the result still equals the textbook " +
    "single-window prefix sum, cap included") {
    val sqlc = spark
    import sqlc.implicits._
    val df = (0 until 2000).map { i =>
      (if (i % 5 == 0) s"cold${i % 3}" else "hot", i.toLong, (i % 23).toLong)
    }.toDF("stream", "seq", "x")

    val scanned = DistributedScan.exclusivePrefixSum(
      df, col("stream"), col("seq"), col("x"), "prior", blockSize = 4L)
    // Depth pin: a non-recursive scan plans exactly 2 Window nodes
    // (block scan + within-block); recursion adds one per extra level.
    // Counted on the optimized LOGICAL plan — AQE wraps the physical
    // tree until execution.
    val windowNodes = scanned.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(windowNodes >= 3,
      s"blockSize=4 over 2000 sequence values must recurse " +
        s"(block table 500 rows >> 4), got $windowNodes Window nodes")

    val got = scanned
      .select(col("stream"), col("seq"), col("prior"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val w = Window.partitionBy(col("stream")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val exp = df
      .withColumn("prior", coalesce(sum(col("x")).over(w), lit(0L)))
      .select(col("stream"), col("seq"), col("prior"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === exp)
  }

  test("bucketed count-scan rank equals the single-window row_number on " +
    "a skewed multi-stream table — hex-prefix buckets, tie-broken order") {
    val sqlc = spark
    import sqlc.implicits._
    // Stream "hot" gets ~90% of rows (the per-stream sort-task shape the
    // scan removes); the md5 sort key exercises uneven bucket fills and
    // the id tiebreak exercises within-bucket ordering determinism.
    val df = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"cold${i % 7}" else "hot", i.toLong)
    }.toDF("stream", "id")
      .withColumn("h", md5(col("id").cast("string")))

    val got = DistributedScan.bucketedRowNumber(
        df, col("stream"), substring(col("h"), 1, 2),
        Seq(col("h"), col("id")), "rk")
      .select(col("stream"), col("id"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    val w = Window.partitionBy(col("stream")).orderBy(col("h"), col("id"))
    val exp = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("stream"), col("id"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    assert(got.size === exp.size)
    assert(got === exp)
  }

  test("rankSelect equals rank-filtering the single-window row_number " +
    "on a skewed multi-stream table — boundary buckets only, every " +
    "quantile class, duplicate values across band boundaries") {
    val sqlc = spark
    import sqlc.implicits._
    val rnd = new scala.util.Random(11)
    // Stream "hot" gets ~90% of rows; v is heavily duplicated (mod 97)
    // so equal values cluster inside one band and tie-break on id; cold
    // streams include sizes small enough that several target ranks land
    // in one band (and n=1/n=2 edge classes via the tiny streams).
    val df = ((0 until 20000).map { i =>
      (if (i % 10 == 0) s"cold${i % 7}" else "hot",
        i.toLong, (rnd.nextInt(97) * 16 + rnd.nextInt(16)).toLong)
    } ++ Seq(("one", 100000L, 5L), ("two", 100001L, 3L),
      ("two", 100002L, 9L)))
      .toDF("stream", "id", "v")
    val ranks = Seq(
      "p25" -> "((25 * n) + 99) div 100",
      "p50" -> "((50 * n) + 99) div 100",
      "lo"  -> "(n + 1) div 2",
      "hi"  -> "n div 2 + 1",
      "p99" -> "((99 * n) + 99) div 100")

    val got = DistributedScan.rankSelect(
        df, "stream", expr("v div 16"), Seq(col("v"), col("id")), col("v"),
        ranks)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), ranks.map { case (name, _) =>
          r.getLong(r.fieldIndex(name)) }))
      .toMap

    val w = Window.partitionBy(col("stream")).orderBy(col("v"), col("id"))
    val grp = Window.partitionBy(col("stream"))
    val ranked = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(grp))
    val exp = ranked
      .groupBy(col("stream"))
      .agg(max(col("n")).as("n"),
        ranks.map { case (name, rkExpr) =>
          min(when(col("rk") === expr(rkExpr), col("v"))).as(name) }: _*)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), ranks.map { case (name, _) =>
          r.getLong(r.fieldIndex(name)) }))
      .toMap

    assert(got.size === exp.size)
    assert(got === exp)
  }

  test("ntileFromRank equals the ntile window for every group size " +
    "around the bucket count (n < k, n = k, every remainder class)") {
    val sqlc = spark
    import sqlc.implicits._
    // Streams of every size 1..23 cover q = 0, rem = 0, and all rem
    // classes for k in {2, 5, 7}.
    val df = (1 to 23).flatMap(n => (1 to n).map(r => (s"g$n", n.toLong)))
      .toDF("g", "n")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("g")).orderBy(monotonically_increasing_id()))
        .cast("long"))
    for (k <- Seq(2, 5, 7)) {
      val bad = df
        .withColumn("closed", DistributedScan.ntileFromRank(k, "r", "n"))
        .withColumn("window", ntile(k).over(
          Window.partitionBy(col("g")).orderBy(col("r"))).cast("long"))
        .filter(col("closed") =!= col("window"))
        .count()
      assert(bad === 0L, s"closed-form ntile($k) diverged on $bad rows")
    }
  }

  test("the helpers refuse input frames whose column names collide with " +
    "the working or output columns (silent clobber would corrupt priors)") {
    val sqlc = spark
    import sqlc.implicits._
    val clash1 = Seq(("a", 1L, 2L)).toDF("stream", "seq", "_eps_x")
    intercept[IllegalArgumentException] {
      DistributedScan.exclusivePrefixSum(
        clash1, col("stream"), col("seq"), col("_eps_x"), "prior")
    }
    val clash2 = Seq(("a", 1L)).toDF("stream", "rk")
    intercept[IllegalArgumentException] {
      DistributedScan.bucketedRowNumber(
        clash2, col("stream"), col("stream"), Seq(col("rk")), "rk")
    }
    val clash3 = Seq(("a", 1L)).toDF("stream", "n")
    intercept[IllegalArgumentException] {
      DistributedScan.rankSelect(
        clash3, "stream", col("n"), Seq(col("n")), col("n"),
        Seq("p50" -> "(n + 1) div 2"))
    }
  }
}
