package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's registry unit matrix
  * (producer_registry_test.exs:15-147). */
class ProducerRegistrySpec extends AnyFunSuite {

  private def fresh = new ProducerRegistry

  test("register adds the stream as NOT ready (producer_registry_test.exs:15-24)") {
    val r = fresh
    r.register("stream-a")
    assert(r.snapshot == Map("stream-a" -> false))
    assert(!r.producersReady)
  }

  test("register is idempotent — an existing value survives re-register " +
    "(producer_registry_test.exs:26-37)") {
    val r = fresh
    r.register("stream-a")
    r.updateValue("stream-a", value = true)
    r.register("stream-a") // must NOT reset to false
    assert(r.snapshot == Map("stream-a" -> true))
  }

  test("unregister removes the stream (producer_registry_test.exs:39-50)") {
    val r = fresh
    r.register("stream-a")
    r.unregister("stream-a")
    assert(r.snapshot.isEmpty)
  }

  test("unregister of an unknown stream is ok (producer_registry_test.exs:52-58)") {
    val r = fresh
    r.unregister("never-registered") // must not throw
    assert(r.snapshot.isEmpty)
  }

  test("updateValue flips readiness (producer_registry_test.exs:60-75)") {
    val r = fresh
    r.register("stream-a")
    r.updateValue("stream-a", value = true)
    assert(r.producersReady)
    r.updateValue("stream-a", value = false)
    assert(!r.producersReady)
  }

  test("updateValue on an unknown stream is silently ok " +
    "(producer_registry.ex:70-75)") {
    val r = fresh
    r.updateValue("ghost", value = true) // must not throw, must not insert
    assert(r.snapshot.isEmpty)
  }

  test("producersReady is the all-streams fold (producer_registry_test.exs:95-118)") {
    val r = fresh
    r.register("a"); r.register("b")
    r.updateValue("a", value = true)
    assert(!r.producersReady) // b still unready
    r.updateValue("b", value = true)
    assert(r.producersReady)
  }

  test("producersReady is vacuously TRUE with no registered streams " +
    "(producer_registry.ex:87-92)") {
    assert(fresh.producersReady)
  }

  test("ready override forces the answer; None restores the fold " +
    "(producer_registry_test.exs:120-147)") {
    val r = fresh
    r.register("a") // unready → computed answer false
    r.setReadyOverride(Some(true))
    assert(r.producersReady)
    r.setReadyOverride(Some(false))
    r.updateValue("a", value = true)
    assert(!r.producersReady) // override wins over the now-true fold
    r.setReadyOverride(None)
    assert(r.producersReady) // computed value restored
  }
}
