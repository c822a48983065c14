package graft.sources

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kinesislike.StartingPosition
import graft.sources.kinesislike.StartingPosition._

/** Table-driven coverage of the five starting-position encodings,
  * mirroring the reference's table-driven wire-encoding test
  * (subscribe_to_shard_test.exs:91-116; encodings
  * subscribe_to_shard.ex:424-435). */
class StartingPositionSpec extends AnyFunSuite {

  private val table: Seq[(String, StartingPosition)] = Seq(
    "latest"                    -> Latest,
    "trim_horizon"              -> TrimHorizon,
    "at_sequence_number:123"    -> AtSequenceNumber(123L),
    "after_sequence_number:456" -> AfterSequenceNumber(456L),
    "at_timestamp:2021-01-01T12:34:56Z" ->
      AtTimestamp(Instant.parse("2021-01-01T12:34:56Z")),
    // The reference's wire form is unix epoch seconds
    // (subscribe_to_shard.ex:434-435): 1609504496 = 2021-01-01T12:34:56Z.
    "at_timestamp:1609504496" ->
      AtTimestamp(Instant.ofEpochSecond(1609504496L)),
  )

  for ((input, expected) <- table)
    test(s"parses '$input'") {
      assert(StartingPosition.parse(input) == expected)
    }

  test("default is latest (producer.ex:22)") {
    assert(StartingPosition.default == Latest)
  }

  test("case-insensitive keywords") {
    assert(StartingPosition.parse("LATEST") == Latest)
    assert(StartingPosition.parse("Trim_Horizon") == TrimHorizon)
  }

  for (bad <- Seq("", "yesterday", "at_sequence_number:", "at_sequence_number:abc",
      "at_timestamp:not-a-time", "before_sequence_number:3"))
    test(s"rejects '$bad'") {
      intercept[IllegalArgumentException](StartingPosition.parse(bad))
    }
}
