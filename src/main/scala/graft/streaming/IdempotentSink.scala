package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Exactly-once delivery to an EXTERNAL store via `foreachBatch` — the
  * delivery tier Spark's own file/Kafka sinks don't cover (they keep
  * their own commit logs; an external table, API, or key-value store
  * does not). Structured Streaming guarantees `foreachBatch` sees each
  * (batchId, data) pair deterministically under replay: after a crash
  * between "data written" and "checkpoint committed", the SAME batchId
  * is re-delivered with the SAME rows. Idempotence therefore only needs
  * a transactional `(batchId → already applied?)` check on the store
  * side, which is exactly what this sink provides for a directory-backed
  * store:
  *
  *  - each batch lands under `store/batch=<id>/` via write-then-rename
  *    (a temp dir renamed into place — the rename is the atomic commit);
  *  - a replayed batchId finds its directory already present and
  *    SKIPS — no duplicates, no partial rewrites;
  *  - readers see only committed batch dirs (the temp suffix is never
  *    listed as a batch).
  *
  * At 100 TB the same shape holds against object stores with
  * atomic-commit primitives (multipart-complete, conditional put) or a
  * database transaction holding the batchId ledger; the reference's
  * analog is the producer's at-least-once delivery + the consumer-side
  * dedup this sink makes unnecessary (producer.ex:159-168 redelivery).
  */
final class IdempotentSink(storeDir: String) extends Serializable {

  /** The foreachBatch handler: `stream.writeStream.foreachBatch(sink.apply _)`. */
  def apply(batch: DataFrame, batchId: Long): Unit = {
    val target = Paths.get(storeDir, s"batch=$batchId")
    if (Files.exists(target)) return // replayed batch: already committed
    // Scratch is unique PER ATTEMPT: two concurrent deliveries of the
    // same batchId (zombie driver during failover) must never share a
    // temp dir, or the loser's still-open writers would bleed into the
    // winner's committed directory.
    val tmp = Paths.get(
      storeDir, s".inprogress-$batchId-${java.util.UUID.randomUUID()}")
    batch.write.mode("overwrite").parquet(tmp.toString)
    // ATOMIC_MOVE: if the store's filesystem cannot rename atomically,
    // fail loudly rather than let Files.move degrade to copy+delete —
    // a half-copied batch dir would read as committed forever.
    try Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // Losing the race surfaces as FileAlreadyExists on some
      // filesystems but as a generic ENOTEMPTY FileSystemException on
      // Linux rename(2) (the target is a non-empty committed dir) —
      // treat either as "other attempt committed" IF the target really
      // exists; anything else is a genuine failure and propagates.
      case e: java.nio.file.FileSystemException if Files.exists(target) =>
        graft.Fs.deleteRecursively(tmp.toFile)
    }
    // Reclaim scratch left by attempts that crashed between write and
    // rename (their UUID dirs would otherwise accumulate a full batch
    // copy per crash): this batchId is committed, so every remaining
    // .inprogress dir for it is dead.
    val d = new java.io.File(storeDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s".inprogress-$batchId-"))
      .foreach(graft.Fs.deleteRecursively)
  }

  /** Batches applied so far (committed dirs only). */
  def committedBatchIds: Seq[Long] = {
    val d = new java.io.File(storeDir)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong)
      .sorted
  }
}
