package graft.sources.kinesislike

import java.io.{File, FileInputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Byte-level AWS event-stream encoding for the shard log — the fidelity
  * tier for the reference's largest state machine (the frame parser of
  * subscribe_to_shard.ex:273-327) plus its header demux
  * (subscribe_to_shard.ex:320-341). The wire format is the public AWS
  * event-stream encoding (docs.aws.amazon.com/transcribe/latest/dg/
  * event-stream.html), implemented in full:
  *
  *   prelude:  total length (4B BE, includes the whole message)
  *             headers length (4B BE)
  *             prelude CRC (4B BE, CRC-32 of the first 8 bytes)
  *   headers:  repeated [name len (1B)][name][value type (1B = 7,
  *             string)][value len (2B BE)][value]
  *   payload
  *   message CRC (4B BE, CRC-32 of everything before it)
  *
  * The reference's reassembly countdown is `:binary.decode_unsigned(
  * first_4_bytes) - 4` (subscribe_to_shard.ex:298) — mirrored by
  * [[FrameDecoder]] — and its header demux is a fixed vocabulary:
  * `:message-type` event/exception, `:event-type` initial-response (a
  * skip, subscribe_to_shard.ex:341) / SubscribeToShardEvent,
  * `:content-type` asserted to application/x-amz-json-1.1
  * (subscribe_to_shard.ex:320-322), and `:exception-type` naming the
  * typed error (subscribe_to_shard.ex:336-338; the test-side encoder is
  * test/support/fake_kinesis.ex:28-42). HTTP/2 delivers at most 16 KB
  * per data frame, so one logical record (up to 1 MB pre-base64) spans
  * MANY chunks and the parser reassembles partial frames across reads
  * (subscribe_to_shard_test.exs:220-245 — mirrored by
  * EventStreamFramingSpec's 1 MB / 16 KB round-trip).
  *
  * A framed shard file (`shard-NNNNN.elog`) is a header-framed twin of
  * the line log: an `initial-response` event message first (skipped on
  * decode, like the reference), then one message per record. A record
  * message's payload is the log LINE (so every layer above the framing —
  * parsing, offsets, cursor resolution — is encoding-agnostic; the
  * record body staying in line format rather than the wire's Records
  * JSON is the one documented fixture deviation). Control flow, however,
  * is demuxed from the HEADERS, not from line markers: shard-closed is
  * an event message whose JSON payload carries a null
  * ContinuationSequenceNumber (subscribe_to_shard.ex:356-363), and an
  * in-stream error is an `exception` message whose `:exception-type`
  * header names the class (subscribe_to_shard.ex:336-338). The decoder
  * maps both back to the line vocabulary (`#CLOSED` / `#ERROR`) the
  * shared parser consumes.
  */
object EventStreamFraming {

  /** The HTTP/2 data-frame ceiling the reference's parser reassembles
    * across (subscribe_to_shard_test.exs:221-222). */
  val ChunkBytes = 16 * 1024

  /** Sanity ceiling on one message: a Kinesis record is ≤ 1 MB
    * pre-base64 (≈1.4 MB encoded) plus line framing and headers — 4 MiB
    * is generous. A corrupt prelude claiming more fails FAST at the
    * prelude, not as a truncation error at EOF after buffering the rest
    * of the file. */
  val MaxMessageBytes: Int = 4 * 1024 * 1024

  /** Smallest legal message: 12-byte prelude + 0 headers + 0 payload +
    * 4-byte message CRC. */
  val MinMessageBytes: Int = 16

  // The reference's header vocabulary (subscribe_to_shard.ex:320-341,
  // fake_kinesis.ex:28-42).
  val ContentTypeHeader   = ":content-type"
  val MessageTypeHeader   = ":message-type"
  val EventTypeHeader     = ":event-type"
  val ExceptionTypeHeader = ":exception-type"
  val ContentTypeValue    = "application/x-amz-json-1.1"
  val EventMessageType     = "event"
  val ExceptionMessageType = "exception"
  val SubscribeEventType   = "SubscribeToShardEvent"
  val InitialResponseType  = "initial-response"

  /** Canonical payload of the shard-closed control event — the null
    * ContinuationSequenceNumber signal of subscribe_to_shard.ex:356-363.
    * Record payloads are tab-separated lines (never `{`-prefixed), so
    * the decoder distinguishes control JSON from records on the first
    * byte. */
  val ClosedEventJson = """{"ContinuationSequenceNumber":null}"""

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  private def putBe32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = ((v >>> 24) & 0xff).toByte
    out(off + 1) = ((v >>> 16) & 0xff).toByte
    out(off + 2) = ((v >>> 8) & 0xff).toByte
    out(off + 3) = (v & 0xff).toByte
  }

  private def be32(bytes: Array[Byte], off: Int): Int =
    ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
      ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)

  /** Encode one full event-stream message (prelude + string headers +
    * payload + CRCs). Header values are type-7 (string) — the only type
    * the reference's vocabulary uses. */
  def encodeMessage(
      headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val headerBytes = headers.map { case (name, value) =>
      val n = name.getBytes(UTF_8)
      val v = value.getBytes(UTF_8)
      require(n.length <= 255, s"header name too long: $name")
      require(v.length <= 65535, s"header value too long for $name")
      val h = new Array[Byte](1 + n.length + 1 + 2 + v.length)
      h(0) = n.length.toByte
      System.arraycopy(n, 0, h, 1, n.length)
      h(1 + n.length) = 7 // value type: string
      h(2 + n.length) = ((v.length >>> 8) & 0xff).toByte
      h(3 + n.length) = (v.length & 0xff).toByte
      System.arraycopy(v, 0, h, 4 + n.length, v.length)
      h
    }
    val headersLen = headerBytes.map(_.length).sum
    val total      = 12 + headersLen + payload.length + 4
    require(total <= MaxMessageBytes,
      s"message of $total bytes exceeds the $MaxMessageBytes ceiling")
    val out = new Array[Byte](total)
    putBe32(out, 0, total)
    putBe32(out, 4, headersLen)
    putBe32(out, 8, crc32(out, 0, 8))
    var i = 12
    headerBytes.foreach { h =>
      System.arraycopy(h, 0, out, i, h.length); i += h.length
    }
    System.arraycopy(payload, 0, out, i, payload.length)
    putBe32(out, total - 4, crc32(out, 0, total - 4))
    out
  }

  /** Event message with the reference's standard header triple
    * (fake_kinesis.ex:37-39). */
  def encodeEvent(eventType: String, payload: Array[Byte]): Array[Byte] =
    encodeMessage(
      Seq(
        ContentTypeHeader -> ContentTypeValue,
        MessageTypeHeader -> EventMessageType,
        EventTypeHeader   -> eventType),
      payload)

  /** Exception message: `:exception-type` names the class
    * (fake_kinesis.ex:41-42); payload carries the message JSON plus the
    * fixture's raise budget. */
  def encodeException(
      exceptionType: String, payload: Array[Byte]): Array[Byte] =
    encodeMessage(
      Seq(
        ContentTypeHeader   -> ContentTypeValue,
        MessageTypeHeader   -> ExceptionMessageType,
        ExceptionTypeHeader -> exceptionType),
      payload)

  /** The connection-open message every framed shard starts with; the
    * decoder skips it (subscribe_to_shard.ex:341, fake_kinesis.ex:22). */
  def initialResponseMessage: Array[Byte] =
    encodeEvent(InitialResponseType, "{}".getBytes(UTF_8))

  /** Decode one complete message: verify BOTH CRCs, parse the headers,
    * return (headers, payload). `msg` includes the prelude — exactly what
    * [[FrameDecoder]] yields. */
  def decodeMessage(msg: Array[Byte]): (Map[String, String], Array[Byte]) = {
    require(msg.length >= MinMessageBytes,
      s"event-stream message of ${msg.length} bytes is shorter than " +
        s"the $MinMessageBytes-byte minimum")
    val total = be32(msg, 0)
    require(total == msg.length,
      s"prelude total $total != message length ${msg.length}")
    val headersLen = be32(msg, 4)
    require(crc32(msg, 0, 8) == be32(msg, 8),
      "event-stream prelude CRC mismatch")
    require(headersLen >= 0 && 12 + headersLen + 4 <= total,
      s"headers length $headersLen does not fit in message of $total")
    require(crc32(msg, 0, total - 4) == be32(msg, total - 4),
      "event-stream message CRC mismatch")
    var i   = 12
    val end = 12 + headersLen
    val headers = Map.newBuilder[String, String]
    while (i < end) {
      val nameLen = msg(i) & 0xff
      require(i + 1 + nameLen + 3 <= end, "truncated header")
      val name = new String(msg, i + 1, nameLen, UTF_8)
      i += 1 + nameLen
      require(msg(i) == 7, s"header $name: only string (7) values used")
      val valLen = ((msg(i + 1) & 0xff) << 8) | (msg(i + 2) & 0xff)
      require(i + 3 + valLen <= end, s"truncated value for header $name")
      headers += name -> new String(msg, i + 3, valLen, UTF_8)
      i += 3 + valLen
    }
    (headers.result(), java.util.Arrays.copyOfRange(msg, end, total - 4))
  }

  /** Translate one log line to its wire message — the encoder half of
    * the line↔frame bijection ([[decodeToLine]] is the other half):
    * records become SubscribeToShardEvent messages carrying the line,
    * the closed marker becomes the null-continuation control event, an
    * `#ERROR` marker becomes a typed exception message. */
  def encodeLine(line: String): Array[Byte] =
    if (line == KinesisLikeLog.ClosedMarker)
      encodeEvent(SubscribeEventType, ClosedEventJson.getBytes(UTF_8))
    else if (line.startsWith(KinesisLikeLog.ErrorMarker)) {
      val parts = line.split('\t')
      val spec  = parts.lift(1).getOrElse("transport_closed")
      val times = parts.lift(2).getOrElse("1")
      encodeException(spec,
        s"""{"message":"injected","times":$times}""".getBytes(UTF_8))
    } else encodeEvent(SubscribeEventType, line.getBytes(UTF_8))

  private val TimesRe = """"times"\s*:\s*(\d+)""".r

  /** Demux one decoded message back to line-space — the literal mirror
    * of handle_message/handle_event (subscribe_to_shard.ex:329-363):
    * asserts the content type, skips initial-response, maps the
    * null-continuation control event to `#CLOSED`, an exception message
    * to `#ERROR\t<class>\t<times>`, and a record event to its line. */
  def decodeToLine(
      headers: Map[String, String], payload: Array[Byte]): Option[String] = {
    // @content_type assertion, subscribe_to_shard.ex:320-322.
    require(headers.get(ContentTypeHeader).contains(ContentTypeValue),
      s"unexpected $ContentTypeHeader: ${headers.get(ContentTypeHeader)}")
    headers.getOrElse(MessageTypeHeader,
      throw new IllegalArgumentException(s"missing $MessageTypeHeader")) match {
      case EventMessageType =>
        headers.getOrElse(EventTypeHeader,
          throw new IllegalArgumentException(s"missing $EventTypeHeader")) match {
          case InitialResponseType => None // subscribe_to_shard.ex:341
          case SubscribeEventType =>
            val text = new String(payload, UTF_8)
            if (text.startsWith("{")) {
              // Control event: the only one is the shard-closed signal.
              require(text == ClosedEventJson,
                s"unrecognized control event payload: $text")
              Some(KinesisLikeLog.ClosedMarker)
            } else Some(text)
          case other =>
            throw new IllegalArgumentException(s"unknown event type $other")
        }
      case ExceptionMessageType =>
        val spec = headers.getOrElse(ExceptionTypeHeader, "transport_closed")
        val times = TimesRe
          .findFirstMatchIn(new String(payload, UTF_8))
          .map(_.group(1)).getOrElse("1")
        Some(s"${KinesisLikeLog.ErrorMarker}\t$spec\t$times")
      case other =>
        throw new IllegalArgumentException(s"unknown message type $other")
    }
  }

  /** Incremental frame reassembler — the `{buffer, msg_bytes_left}`
    * state machine of subscribe_to_shard.ex:277-327: feed arbitrary-size
    * chunks in arrival order; complete MESSAGES (prelude included, ready
    * for [[decodeMessage]]) are emitted as soon as their last byte
    * arrives, partial frames (including a split PRELUDE) wait in the
    * buffer. Single-consumer, like the reference's per-connection
    * parser. A prelude claiming fewer than [[MinMessageBytes]] or more
    * than [[MaxMessageBytes]] fails immediately at the prelude. */
  final class FrameDecoder {
    private val pending = new java.io.ByteArrayOutputStream(256)
    // -1 ⇒ reading the prelude (pending holds its first 0-3 bytes);
    // else message bytes still missing — the msg_bytes_left countdown.
    private var bytesLeft: Int = -1

    def feed(chunk: Array[Byte], off: Int, len: Int): Seq[Array[Byte]] = {
      val out = Seq.newBuilder[Array[Byte]]
      var i   = off
      val end = off + len
      while (i < end) {
        if (bytesLeft < 0) {
          pending.write(chunk(i)); i += 1
          if (pending.size == 4) {
            val p     = pending.toByteArray
            val total = be32(p, 0)
            require(total >= MinMessageBytes && total <= MaxMessageBytes,
              s"event-stream prelude claims $total bytes — outside " +
                s"[$MinMessageBytes, $MaxMessageBytes]; corrupt frame")
            bytesLeft = total - 4 // subscribe_to_shard.ex:298
          }
        } else {
          val take = math.min(bytesLeft, end - i)
          pending.write(chunk, i, take)
          i += take
          bytesLeft -= take
          if (bytesLeft == 0) {
            out += pending.toByteArray
            pending.reset()
            bytesLeft = -1
          }
        }
      }
      out.result()
    }

    /** True while a frame (or its prelude) is partially buffered — EOF in
      * this state means a truncated log. */
    def isMidFrame: Boolean = bytesLeft >= 0 || pending.size > 0
  }

  /** Streaming line source over a framed shard file: reads in
    * [[ChunkBytes]] chunks (never materializing the file), reassembles
    * messages, verifies their CRCs, demuxes their headers, and yields
    * each surviving message as the line it encodes (initial-response
    * yields nothing). */
  final class FramedLineSource(f: File) extends KinesisLikeLog.LineSource {
    private val in      = new FileInputStream(f)
    private val decoder = new FrameDecoder
    private val chunk   = new Array[Byte](ChunkBytes)
    private val queue   = scala.collection.mutable.Queue.empty[String]

    override def readLine(): String = {
      while (queue.isEmpty) {
        val n = in.read(chunk)
        if (n < 0) {
          require(!decoder.isMidFrame,
            s"truncated event-stream frame at EOF in $f")
          return null
        }
        decoder.feed(chunk, 0, n).foreach { msg =>
          val (headers, payload) = decodeMessage(msg)
          decodeToLine(headers, payload).foreach(queue.enqueue(_))
        }
      }
      queue.dequeue()
    }

    override def close(): Unit = in.close()
  }

  /** Derive the framed twin of a line-log directory: every
    * `shard-NNNNN.log` becomes `shard-NNNNN.elog` — an initial-response
    * message followed by one message per line, control markers demuxed
    * into headers ([[encodeLine]]). Pure line transformation, idempotent
    * via the ready marker (the [[KinesisLikeLog.derive]] convention). */
  def deriveFramed(baseDir: String, targetDir: String): Unit =
    synchronized {
      val ready = Paths.get(targetDir, KinesisLikeLog.ReadyMarker)
      if (Files.exists(ready)) return
      Files.createDirectories(Paths.get(targetDir))
      KinesisLikeLog.shardFiles(baseDir).foreach { f =>
        val sink = KinesisLikeLog.openLineSink(
          new File(targetDir,
            KinesisLikeLog.shardId(f) + KinesisLikeLog.FramedExtension))
        try KinesisLikeLog.eachLine(f)(sink.writeLine)
        finally sink.close()
      }
      Files.createFile(ready)
    }
}
