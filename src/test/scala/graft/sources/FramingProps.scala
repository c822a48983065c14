package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Prop, Properties}

import graft.sources.kinesislike.EventStreamFraming

/** Generative invariant for the frame reassembler: for ANY frame
  * sequence (payload sizes 0..64 KB, so frames straddle many chunk
  * boundaries and preludes split mid-read) and ANY partition of the
  * wire bytes into chunks, feeding the chunks in order reproduces
  * exactly the original payloads, byte for byte, with the decoder
  * frame-aligned at wire end — the `{buffer, msg_bytes_left}` machine
  * is split-point-invariant (subscribe_to_shard.ex:277-327's contract;
  * EventStreamFramingSpec pins the 1-byte and 16 KB extremes, this
  * property sweeps the space between). */
object FramingProps extends Properties("EventStreamFraming") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val genPayload: Gen[Array[Byte]] = Gen.frequency(
    1 -> Gen.const(Array.emptyByteArray),
    4 -> Gen.choose(1, 300).map(n =>
      Array.tabulate(n)(i => (i % 251).toByte)),
    2 -> Gen.choose(16 * 1024, 64 * 1024).map(n =>
      Array.tabulate(n)(i => ((i * 31 + 5) % 251).toByte)))

  private val genCase: Gen[(Seq[Array[Byte]], Seq[Int])] = for {
    payloads <- Gen.nonEmptyListOf(genPayload)
    wireLen = payloads.map(_.length + 4).sum
    // Random cut points partition the wire into chunks of uneven sizes.
    cuts <- Gen.listOf(Gen.choose(1, math.max(1, wireLen - 1)))
  } yield (payloads, cuts.distinct.sorted)

  property("any chunk split of any frame sequence reassembles the " +
    "original payloads byte-identically") = Prop.forAll(genCase) {
    case (payloads, cuts) =>
      val wire = payloads.toArray.flatMap(p =>
        EventStreamFraming.encodeFrame(p))
      val bounds = (0 +: cuts.filter(_ < wire.length)) :+ wire.length
      val dec = new EventStreamFraming.FrameDecoder
      val got = bounds.sliding(2).flatMap { case Seq(a, b) =>
        dec.feed(wire, a, b - a)
      }.toSeq
      !dec.isMidFrame &&
        got.length == payloads.length &&
        got.zip(payloads).forall { case (g, e) =>
          java.util.Arrays.equals(g, e) }
  }

  property("payloads containing newline and tab bytes survive framing " +
    "(the binary transparency the text encoding cannot offer)") =
    Prop.forAll(Gen.choose(1, 500)) { n =>
      val payload = ("a\tb\nc\r" * n).getBytes(UTF_8)
      val dec = new EventStreamFraming.FrameDecoder
      val frame = EventStreamFraming.encodeFrame(payload)
      val got = dec.feed(frame, 0, frame.length)
      got.length == 1 && java.util.Arrays.equals(got.head, payload)
    }
}
