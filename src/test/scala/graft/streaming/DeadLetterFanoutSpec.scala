package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** q94's fan-out topology: ONE source batch commits to TWO independent
  * IdempotentSink ledgers (main + dead-letter). The interesting failure
  * is the crash BETWEEN the two commits — on replay the already-committed
  * store must skip while the missed store commits, leaving both stores
  * exactly-once with no coordination between their ledgers. */
class DeadLetterFanoutSpec extends SparkSpec {

  private def batchDf(id: Long) = {
    val s = spark
    import s.implicits._
    ((id * 10) until (id * 10 + 10))
      .map(v => (v, v % 3 == 0))
      .toDF("v", "good")
  }

  private def fanout(main: IdempotentSink, dlq: IdempotentSink)(
      id: Long, crashBetween: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.col
    val b = batchDf(id)
    main(b.filter(col("good")), id)
    if (crashBetween) return // simulated failure before the DLQ commit
    dlq(b.filter(!col("good")), id)
  }

  test("a crash between the main and dead-letter commits recovers to " +
    "exactly-once on BOTH stores when the batch replays") {
    val mainDir = Files.createTempDirectory("graft_fanout_main").toString
    val dlqDir  = Files.createTempDirectory("graft_fanout_dlq").toString
    val main    = new IdempotentSink(mainDir)
    val dlq     = new IdempotentSink(dlqDir)
    val run     = fanout(main, dlq) _

    run(0L, false)
    // Batch 1 "crashes" after the main commit, before the DLQ commit.
    run(1L, true)
    assert(main.committedBatchIds == Seq(0L, 1L))
    assert(dlq.committedBatchIds == Seq(0L))

    // Structured Streaming replays the whole batch: main must skip
    // (its ledger has 1), DLQ must commit its missing half.
    run(1L, false)
    // A second full replay must change nothing anywhere.
    run(1L, false)
    run(2L, false)

    assert(main.committedBatchIds == Seq(0L, 1L, 2L))
    assert(dlq.committedBatchIds == Seq(0L, 1L, 2L))
    val got  = spark.read.parquet(mainDir).select("v")
      .unionByName(spark.read.parquet(dlqDir).select("v"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 30L),
      s"fan-out must partition the input exactly once: $got")
  }
}
