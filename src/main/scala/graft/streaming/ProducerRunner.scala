package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.kinesislike.KinesisLikeErrors

/** Producer lifecycle + retry semantics, ported from the reference's
  * generated GenStage producer (producer.ex):
  *
  *  - `enable?` kill-switch (producer.ex:56-76): enabled ⇒ start the
  *    query and register (as not-ready) with the registry; disabled ⇒
  *    don't start, unregister, state `disabled`;
  *  - fixed backoff between reconnect attempts
  *    (@reconnection_delay 70_000, producer.ex:37, scheduled at 161-164)
  *    — 70 s is deliberately longer than Kinesis's consumer-registration
  *    window and is preserved as the default;
  *  - every error class marks the stream unhealthy, is classified
  *    ([[KinesisLikeErrors.classify]], mirroring producer.ex:89-132), and
  *    leads to a retry from the checkpointed resume position — events
  *    delivered before the error stay delivered (producer.ex:159-168;
  *    Spark's committed batches are exactly that guarantee);
  *  - a `monitor` callback, when provided, is consulted INSTEAD of the
  *    fixed-backoff self-retry (producer.ex:165-168's monitor_pid
  *    delegation): it receives the error and returns whether to retry.
  *
  * Connection states mirror producer.ex:21,71,74,87,145,164,167.
  */
object ProducerRunner {
  val DefaultBackoffMillis: Long = 70 * 1000L // producer.ex:37

  sealed trait ConnState
  case object Uninitialized extends ConnState
  case object Established   extends ConnState
  case object Normal        extends ConnState
  case object Retry         extends ConnState
  case object Disabled      extends ConnState
  /** Every shard closed and fully drained — the reference's distinct
    * `:closed` outcome (subscribe_to_shard.ex:356-363; producer.ex:116-123
    * keeps a dedicated clause for it). Distinguishable from Normal, which
    * an idle-but-open stream also reaches. */
  case object ShardsClosed  extends ConnState
}

final class ProducerRunner(
    streamName: String,
    startQuery: () => StreamingQuery,
    registry: ProducerRegistry = ProducerRegistry,
    enable: Boolean = true,                    // producer.ex:58 default true
    backoffMillis: Long = ProducerRunner.DefaultBackoffMillis,
    maxRetries: Int = Int.MaxValue,
    monitor: Option[Throwable => Boolean] = None,
    sleep: Long => Unit = Thread.sleep,
    // The supervised source's log dir, when known: lets the runner surface
    // the stream-closed signal ([[ShardsClosed]]) after a clean run.
    logDir: Option[String] = None,
) {
  import ProducerRunner._

  @volatile private var state: ConnState = Uninitialized
  @volatile private var lastErrors: List[(String, Throwable)] = Nil

  def connState: ConnState = state
  def errorLog: List[(String, Throwable)] = lastErrors

  /** Run the producer to completion (query finished) or exhaustion of
    * retries. Returns true iff the query ended without error. */
  def run(): Boolean = {
    if (!enable) { // producer.ex:72-75: disabled ⇒ unregister, no query
      registry.unregister(streamName)
      state = Disabled
      return true
    }
    registry.register(streamName) // registers as not-ready, producer.ex:70
    var attempts = 0
    while (true) {
      state = Established
      val ok =
        try {
          val q = startQuery()
          state = Normal
          q.awaitTermination()
          registry.updateValue(streamName, value = true)
          // Surface `:closed` distinctly from idle (producer.ex:116-123):
          // the source marks the dir once everything is delivered AND
          // every shard carries the nil-continuation marker.
          if (logDir.exists(d =>
              graft.sources.kinesislike.KinesisLikeStatus.of(d) ==
                graft.sources.kinesislike.KinesisLikeStatus.Closed))
            state = ShardsClosed
          true
        } catch {
          case t: Throwable =>
            // every class ⇒ unhealthy + classified log (producer.ex:89-132)
            registry.updateValue(streamName, value = false)
            lastErrors ::= (KinesisLikeErrors.classify(t), t)
            false
        }
      if (ok) return true
      attempts += 1
      if (attempts > maxRetries) return false
      // retry_conn sets conn_state :retry in BOTH arms — the monitor
      // hand-off leaves the producer in :retry awaiting the monitor's
      // decision, exactly like the self-scheduled reconnect
      // (producer.ex:159-168).
      state = Retry
      monitor match {
        case Some(decide) => // monitor delegation, producer.ex:165-168
          if (!decide(lastErrors.head._2)) return false
        case None => // fixed-backoff self-retry, producer.ex:159-164
          sleep(backoffMillis)
      }
    }
    false // unreachable
  }
}
