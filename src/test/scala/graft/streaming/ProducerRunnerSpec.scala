package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kinesislike.KinesisLikeErrors

/** Producer lifecycle/retry semantics (producer.ex) — the layer the
  * reference itself left untested (SURVEY.md §5.1 notes no
  * producer_test.exs exists; we don't copy that gap).
  *
  * A stub StreamingQuery is enough here: the runner's contract is about
  * registry transitions, the kill-switch, backoff, classification, and
  * monitor delegation — the streaming source itself is covered end-to-end
  * in KinesisLikeSourceSpec.
  */
class ProducerRunnerSpec extends AnyFunSuite {

  /** Minimal StreamingQuery stub: awaitTermination either returns or
    * throws, per the provided behavior queue. */
  private def queryThat(body: () => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    new org.apache.spark.sql.streaming.StreamingQuery {
      override def name: String = "stub"
      override def id: java.util.UUID = java.util.UUID.randomUUID()
      override def runId: java.util.UUID = java.util.UUID.randomUUID()
      override def sparkSession: org.apache.spark.sql.SparkSession = null
      override def isActive: Boolean = false
      override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] = None
      override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = null
      override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = Array.empty
      override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress = null
      override def awaitTermination(): Unit = body()
      override def awaitTermination(timeoutMs: Long): Boolean = { body(); true }
      override def processAllAvailable(): Unit = ()
      override def stop(): Unit = ()
      override def explain(): Unit = ()
      override def explain(extended: Boolean): Unit = ()
    }

  test("enable?=false: no query starts, the stream is unregistered, state " +
    "disabled (producer.ex:72-75)") {
    val reg = new ProducerRegistry
    reg.register("s1")
    var started = false
    val runner = new ProducerRunner(
      "s1",
      () => { started = true; queryThat(() => ()) },
      registry = reg,
      enable = false)
    assert(runner.run())
    assert(!started)
    assert(reg.snapshot.isEmpty)
    assert(runner.connState == ProducerRunner.Disabled)
  }

  test("errors mark the stream unhealthy, retry after fixed backoff, " +
    "recovery marks healthy (producer.ex:89-132, 159-164)") {
    val reg      = new ProducerRegistry
    var attempts = 0
    var sleeps   = List.empty[Long]
    val runner = new ProducerRunner(
      "s1",
      () => queryThat { () =>
        attempts += 1
        if (attempts < 3)
          throw new KinesisLikeErrors.ResourceInUseException("busy")
      },
      registry = reg,
      backoffMillis = 123L,
      sleep = ms => sleeps ::= ms)
    assert(runner.run())
    assert(attempts == 3)
    assert(sleeps == List(123L, 123L)) // fixed, not exponential
    assert(reg.snapshot == Map("s1" -> true))
    assert(runner.errorLog.map(_._1) == List("resource_in_use", "resource_in_use"))
  }

  test("error classification covers the producer's five clauses " +
    "(producer.ex:89-132)") {
    import KinesisLikeErrors._
    assert(classify(new ResourceInUseException("x")) == "resource_in_use")
    assert(classify(new TransportClosedException("x")) == "transport_closed")
    assert(classify(new HttpErrorException(503, "x")) == "http_error")
    assert(classify(new StreamClosedException("x")) == "closed")
    assert(classify(new RuntimeException("anything")) == "unknown")
    // Wrapped causes classify by root cause (Spark wraps task failures).
    assert(classify(new RuntimeException("wrap",
      new TransportClosedException("inner"))) == "transport_closed")
  }

  test("monitor delegation replaces the self-retry: monitor decides " +
    "(producer.ex:165-168)") {
    val reg  = new ProducerRegistry
    var seen = List.empty[String]
    val runner = new ProducerRunner(
      "s1",
      () => queryThat(() =>
        throw new KinesisLikeErrors.TransportClosedException("gone")),
      registry = reg,
      monitor = Some { t => seen ::= KinesisLikeErrors.classify(t); false },
      sleep = _ => fail("self-retry backoff must not run when a monitor is set"))
    assert(!runner.run())
    assert(seen == List("transport_closed"))
    assert(reg.snapshot == Map("s1" -> false)) // left unhealthy
  }

  test("maxRetries bounds the retry loop") {
    val reg      = new ProducerRegistry
    var attempts = 0
    val runner = new ProducerRunner(
      "s1",
      () => queryThat { () =>
        attempts += 1
        throw new KinesisLikeErrors.HttpErrorException(500, "boom")
      },
      registry = reg,
      backoffMillis = 0L,
      maxRetries = 2,
      sleep = _ => ())
    assert(!runner.run())
    assert(attempts == 3) // initial + 2 retries
    assert(reg.snapshot == Map("s1" -> false))
  }
}
