package graft.sources.kinesislike

import java.time.Instant

/** The five-variant starting/resume position sum type of the reference's
  * SubscribeToShard client (subscribe_to_shard.ex:60-65; wire encodings at
  * subscribe_to_shard.ex:424-435):
  *
  *   :latest | :trim_horizon | {:at_sequence_number, seq}
  *   | {:after_sequence_number, seq} | {:at_timestamp, ts}
  *
  * The default is `latest` (producer.ex:22), with the reference's
  * documented caveat that it "may result in gaps ... in cases of
  * application downtime" (producer.ex:209-210).
  *
  * Source-option encoding (the Spark analog of the wire encoding):
  *   startingPosition = latest | trim_horizon
  *     | at_sequence_number:<n> | after_sequence_number:<n>
  *     | at_timestamp:<ISO-8601 instant | epoch seconds>
  */
sealed trait StartingPosition

object StartingPosition {
  case object Latest                            extends StartingPosition
  case object TrimHorizon                       extends StartingPosition
  final case class AtSequenceNumber(seq: Long)  extends StartingPosition
  final case class AfterSequenceNumber(seq: Long) extends StartingPosition
  final case class AtTimestamp(ts: Instant)     extends StartingPosition

  val default: StartingPosition = Latest // producer.ex:22

  /** Parse the option string; throws IllegalArgumentException on anything
    * outside the five variants (the reference's sum type is closed). */
  def parse(s: String): StartingPosition = s.trim.toLowerCase match {
    case "latest"       => Latest
    case "trim_horizon" => TrimHorizon
    case other =>
      val idx = other.indexOf(':')
      if (idx < 0)
        throw new IllegalArgumentException(s"invalid startingPosition: $s")
      val (kind, arg) = (other.substring(0, idx), s.trim.substring(idx + 1))
      kind match {
        case "at_sequence_number"    => AtSequenceNumber(parseSeq(arg, s))
        case "after_sequence_number" => AfterSequenceNumber(parseSeq(arg, s))
        case "at_timestamp"          => AtTimestamp(parseTs(arg, s))
        case _ =>
          throw new IllegalArgumentException(s"invalid startingPosition: $s")
      }
  }

  private def parseSeq(arg: String, full: String): Long =
    try arg.toLong
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"invalid sequence number in startingPosition: $full")
    }

  /** Accepts ISO-8601 instants or unix epoch seconds (the reference's wire
    * form is epoch seconds, subscribe_to_shard.ex:434-435). */
  private def parseTs(arg: String, full: String): Instant =
    try Instant.parse(arg)
    catch {
      case _: Exception =>
        try Instant.ofEpochSecond(arg.toLong)
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"invalid timestamp in startingPosition: $full")
        }
    }
}
