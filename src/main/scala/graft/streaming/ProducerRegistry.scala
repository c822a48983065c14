package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Per-stream boolean health registry — the Scala port of the reference's
  * ProducerRegistry GenServer (producer_registry.ex:5-12 state;
  * 25-47 client API; 49-97 handlers), backed by a synchronized map
  * instead of a process mailbox.
  *
  * Behavior matrix preserved exactly (producer_registry_test.exs:15-147):
  *  - register is idempotent and registers as NOT ready
  *    (Map.put_new(stream, false), producer_registry.ex:49-53);
  *  - unregister succeeds (no-op) for unknown streams
  *    (producer_registry.ex:55-63);
  *  - updateValue on an unknown stream is silently ok
  *    (producer_registry.ex:70-75); the boolean-only guard
  *    (producer_registry.ex:35-39) is enforced by the type system here —
  *    `updateValue(stream, value: Boolean)` cannot be called with a
  *    non-boolean, the compile-time analog of the runtime guard;
  *  - producersReady is the all-values fold, VACUOUSLY TRUE when empty
  *    (Enum.all?, producer_registry.ex:87-92);
  *  - setReadyOverride forces the answer; None restores the computed
  *    value (producer_registry.ex:45-47, 78-80, 95-97).
  */
class ProducerRegistry {
  private val registry = mutable.Map.empty[String, Boolean]
  @volatile private var readyOverride: Option[Boolean] = None

  /** Register a stream as not-ready; idempotent (an existing value is
    * never overwritten — producer_registry.ex:49-53). */
  def register(streamName: String): Unit = synchronized {
    registry.getOrElseUpdate(streamName, false); ()
  }

  /** Remove a stream; ok even if absent (producer_registry.ex:55-63). */
  def unregister(streamName: String): Unit = synchronized {
    registry.remove(streamName); ()
  }

  /** Set a stream's readiness; silently ok for unknown streams
    * (producer_registry.ex:70-75). */
  def updateValue(streamName: String, value: Boolean): Unit = synchronized {
    if (registry.contains(streamName)) registry(streamName) = value
  }

  /** All registered streams ready? Vacuously true when none are
    * registered; an override wins when set (producer_registry.ex:82-97). */
  def producersReady: Boolean = readyOverride match {
    case Some(v) => v
    case None    => synchronized { registry.values.forall(identity) }
  }

  /** Force producersReady to a constant; None restores the computed fold
    * (producer_registry.ex:45-47, 78-80). */
  def setReadyOverride(value: Option[Boolean]): Unit = readyOverride = value

  def snapshot: Map[String, Boolean] = synchronized { registry.toMap }
}

/** Process-wide default instance, the analog of the reference's single
  * named GenServer (producer_registry.ex:20-23 start_link under the app
  * supervisor). */
object ProducerRegistry extends ProducerRegistry

/** Feeds a registry from Structured Streaming lifecycle events — the
  * Spark-native replacement for the producer's explicit update_value
  * calls on every delivery/error (producer.ex:85, 90, 99, 108, 117, 126):
  * progress ⇒ healthy, error termination ⇒ unhealthy (the producer's
  * every-error-class-marks-unhealthy behavior, producer.ex:89-132), clean
  * termination leaves the last health standing (unregistration is the
  * producer's own disable-path duty, producer.ex:72-75, handled by
  * ProducerRunner).
  *
  * The query is matched to its stream by query NAME
  * (`writeStream.queryName(streamName)`). QueryTerminatedEvent carries no
  * name, so the id→name binding is captured at onQueryStarted — a query
  * started WITHOUT the runner still gets error-path health transitions.
  */
class RegistryListener(registry: ProducerRegistry)
    extends StreamingQueryListener {
  private val names =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, String]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    Option(event.name).foreach { n =>
      names.put(event.id, n)
      registry.register(n)
    }
  override def onQueryProgress(event: QueryProgressEvent): Unit =
    Option(event.progress.name).foreach(registry.updateValue(_, value = true))
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    Option(names.remove(event.id)).foreach { n =>
      if (event.exception.isDefined) registry.updateValue(n, value = false)
    }
}
