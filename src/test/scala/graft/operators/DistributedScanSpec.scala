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
}
