package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-partition exclusive prefix sum — the distributed-scan shape
  * for running totals over a LOW-CARDINALITY stream key.
  *
  * `sum(x) OVER (PARTITION BY stream ORDER BY seq ROWS UNBOUNDED
  * PRECEDING .. 1 PRECEDING)` hands each stream ONE task holding the
  * stream's every row — for a corpus where one language/source is half
  * the data, that is the same single-task cliff as the hash windows the
  * r13–14 campaign removed, except the dependence really is sequential:
  * a prefix sum cannot be computed by a commutative partial aggregate.
  *
  * What it CAN be is the classic two-level scan: block the stream into
  * fixed `seq`-ranges, (1) sum each block with an ordinary
  * partial-combining aggregate, (2) run the unbounded window over the
  * BLOCK TABLE (one row per block — the per-stream task now holds
  * rows/blockSize rows, three orders of magnitude fewer), (3) join the
  * block offsets back (equi-join on the near-unique (stream, block)
  * key) and add a within-block exclusive cumsum whose window partition
  * is (stream, block) — bounded by blockSize rows per task by
  * construction. Integer addition is associative, so the result is
  * EXACTLY the single-window formulation's, row for row; the oracle
  * keeps the textbook SQL.
  *
  * Cost shape: one extra shuffle and a join versus the one-shuffle
  * single-window plan — the price of turning an unbounded per-stream
  * sort buffer into two bounded passes. At 100 TB, level 2 can recurse
  * if rows/blockSize is still large; one level suffices for any corpus
  * whose per-stream row count fits 10⁹·blockSize.
  */
object DistributedScan {

  /** Adds `as` = exclusive running sum of `x` over `seq` within
    * `stream`, computed with bounded window partitions. `seq` must be
    * unique per stream row (doc_id here); `x` must be integral. */
  def exclusivePrefixSum(
      df: DataFrame,
      stream: Column,
      seq: Column,
      x: Column,
      as: String,
      blockSize: Long = 4096L): DataFrame = {
    val in = df
      .withColumn("_eps_stream", stream)
      .withColumn("_eps_seq", seq)
      .withColumn("_eps_x", x)
      // `div`, not `/`: Spark's `/` routes longs through DOUBLE, whose
      // quotient can misround for large sequence values.
      .withColumn("_eps_blk", expr(s"_eps_seq div ${blockSize}L"))
    // (1) block sums: plain partial-combining aggregate.
    val blocks = in.groupBy(col("_eps_stream"), col("_eps_blk"))
      .agg(sum(col("_eps_x")).as("_eps_bsum"))
    // (2) exclusive scan over the block table — the only per-stream
    // window left, and it sees ONE ROW PER BLOCK.
    val blockW = Window.partitionBy(col("_eps_stream"))
      .orderBy(col("_eps_blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = blocks
      .withColumn("_eps_boff", coalesce(sum(col("_eps_bsum")).over(blockW), lit(0L)))
      .select(col("_eps_stream"), col("_eps_blk"), col("_eps_boff"))
    // (3) within-block exclusive cumsum: window partition bounded by
    // blockSize rows, plus the block offset from the equi-join.
    val innerW = Window.partitionBy(col("_eps_stream"), col("_eps_blk"))
      .orderBy(col("_eps_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    in.join(offsets, Seq("_eps_stream", "_eps_blk"))
      .withColumn(as,
        col("_eps_boff") + coalesce(sum(col("_eps_x")).over(innerW), lit(0L)))
      .drop("_eps_stream", "_eps_seq", "_eps_x", "_eps_blk", "_eps_boff")
  }
}
