package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** Compaction must not reopen the exactly-once window: a batchId whose
  * `batch=` dir was absorbed into a compacted segment is still skipped
  * on replay (the segment's ledger is the commit record), and readers
  * see every delivered row exactly once at every point in the
  * lifecycle — across two compactions, replays of both absorbed and
  * live ids, and new deliveries in between. */
class IdempotentSinkCompactionSpec extends SparkSpec {

  private def batchDf(id: Long) = {
    val s = spark
    import s.implicits._
    ((id * 10) until (id * 10 + 10)).toDF("v")
  }

  private def storeNames(store: String): Seq[String] =
    Option(new java.io.File(store).listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSeq.sorted

  test("re-delivery stays exactly-once across compaction, and the " +
    "store stays bounded") {
    val store = Files.createTempDirectory("graft_sink_compact").toString
    val sink  = new IdempotentSink(store)

    (0L to 5L).foreach(id => sink(batchDf(id), id))
    assert(sink.committedBatchIds == (0L to 5L))

    sink.compact(spark, keepLast = 2)
    assert(storeNames(store) == Seq("batch=4", "batch=5", "compacted=3"))
    // The ledger keeps the full commit record.
    assert(sink.committedBatchIds == (0L to 5L))

    // Replays of an absorbed id and of a live id must both skip.
    sink(batchDf(2), 2L)
    sink(batchDf(5), 5L)
    assert(storeNames(store) == Seq("batch=4", "batch=5", "compacted=3"))
    assert(sink.readAll(spark).collect().map(_.getLong(0)).sorted
      .sameElements(0L until 60L))

    // New deliveries keep applying.
    sink(batchDf(6), 6L)

    // Second compaction absorbs the previous segment plus more batches.
    sink.compact(spark, keepLast = 1)
    assert(storeNames(store) == Seq("batch=6", "compacted=5"))

    // Replay across the second compaction: id 4 was absorbed twice
    // removed — still skipped.
    sink(batchDf(4), 4L)
    assert(sink.committedBatchIds == (0L to 6L))
    assert(sink.readAll(spark).collect().map(_.getLong(0)).sorted
      .sameElements(0L until 70L))
  }
}
