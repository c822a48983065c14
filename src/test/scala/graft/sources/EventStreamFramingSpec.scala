package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.kinesislike.{EventStreamFraming, KinesisLikeLog}

/** The byte-level event-stream tier (subscribe_to_shard.ex:273-341 made
  * literal): prelude parsing, partial-frame reassembly across arbitrary
  * chunk splits, CRC verification, the HEADER vocabulary and its demux
  * (message-type/event-type/exception-type, initial-response skip), the
  * 1 MB-record / 16 KB-chunk round-trip of
  * subscribe_to_shard_test.exs:220-245 through the REAL source read
  * path, and the framed/text twin equivalence the `.elog` encoding
  * promises. */
class EventStreamFramingSpec extends SparkSpec {
  import EventStreamFraming._

  private var ctr = 0
  private def tmpDir(prefix: String): Path = {
    ctr += 1
    Files.createTempDirectory(s"$prefix$ctr")
  }

  private def record(seq: Long, payload: String): String = {
    val b64 = java.util.Base64.getEncoder
      .encodeToString(payload.getBytes(UTF_8))
    s"$seq\t${1000000L + seq}\tk$seq\t$b64"
  }

  /** A framed shard exactly as the sink writes it: initial-response
    * first, then one message per line (markers demuxed into headers). */
  private def writeFramedShard(dir: Path, lines: Seq[String]): Path = {
    val f = dir.resolve("shard-00000.elog")
    val sink = KinesisLikeLog.openLineSink(f.toFile)
    try lines.foreach(sink.writeLine)
    finally sink.close()
    f
  }

  test("a message round-trips headers AND payload through encode/decode, " +
    "and the FrameDecoder reassembles it fed ONE BYTE at a time — every " +
    "split point, including mid-prelude and mid-header") {
    val messages = Seq(
      encodeEvent(InitialResponseType, "{}".getBytes(UTF_8)),
      encodeEvent(SubscribeEventType, Array.emptyByteArray),
      encodeEvent(SubscribeEventType,
        Array.tabulate(70000)(i => (i % 251).toByte)),
      encodeException("transport_closed",
        """{"message":"injected","times":2}""".getBytes(UTF_8)))
    val wire = messages.flatMap(_.toSeq).toArray
    val dec  = new FrameDecoder
    val got  = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    wire.foreach(b => got ++= dec.feed(Array(b), 0, 1))
    assert(!dec.isMidFrame, "decoder must be frame-aligned at wire end")
    assert(got.length === messages.length)
    got.zip(messages).zipWithIndex.foreach { case ((g, e), i) =>
      assert(java.util.Arrays.equals(g, e), s"message $i")
    }
    // Header vocabulary survives the byte round-trip.
    val (h0, p0) = decodeMessage(got.head)
    assert(h0(MessageTypeHeader) === EventMessageType)
    assert(h0(EventTypeHeader) === InitialResponseType)
    assert(h0(ContentTypeHeader) === ContentTypeValue)
    assert(new String(p0, UTF_8) === "{}")
    val (h3, _) = decodeMessage(got(3))
    assert(h3(MessageTypeHeader) === ExceptionMessageType)
    assert(h3(ExceptionTypeHeader) === "transport_closed")
  }

  test("the header demux mirrors handle_message/handle_event: " +
    "initial-response is SKIPPED, a record event yields its line, the " +
    "null-continuation control event yields the closed marker, an " +
    "exception message yields the typed #ERROR line") {
    def roundTrip(msg: Array[Byte]): Seq[String] = {
      val (h, p) = decodeMessage(msg)
      decodeToLines(h, p)
    }
    assert(roundTrip(initialResponseMessage) === Seq.empty) // s2s.ex:341
    val line = record(7, "payload")
    assert(roundTrip(encodeLine(line)) === Seq(line))
    assert(roundTrip(encodeLine(KinesisLikeLog.ClosedMarker)) ===
      Seq(KinesisLikeLog.ClosedMarker)) // s2s.ex:356-363
    assert(roundTrip(encodeLine(s"${KinesisLikeLog.ErrorMarker}\thttp_error:503\t2")) ===
      Seq(s"${KinesisLikeLog.ErrorMarker}\thttp_error:503\t2")) // s2s.ex:336-338
    // A wrong content type is refused (the @content_type assertion,
    // subscribe_to_shard.ex:320-322).
    intercept[IllegalArgumentException] {
      decodeToLines(
        Map(ContentTypeHeader -> "text/plain",
          MessageTypeHeader -> EventMessageType,
          EventTypeHeader -> SubscribeEventType),
        "x".getBytes(UTF_8))
    }
  }

  test("a multi-record SubscribeToShardEvent round-trips through the " +
    "Records JSON envelope: one message, many records, base64 Data " +
    "intact, exact-microsecond arrivals, and the continuation is the " +
    "LAST record's sequence number (handle_event advances the cursor " +
    "once per EVENT, subscribe_to_shard.ex:343-354)") {
    val lines = Seq(record(11, "a"), record(12, "b\tc\nd"), record(13, "e"))
    val recs  = lines.map(KinesisLikeLog.parseLine(_).get)
    val msg   = encodeRecordsEvent(recs)
    val (h, p) = decodeMessage(msg)
    assert(h(EventTypeHeader) === SubscribeEventType)
    // The payload IS the reference's JSON shape
    // (subscribe_to_shard_test.exs:230-234).
    val json = new String(p, UTF_8)
    assert(json.contains("\"ContinuationSequenceNumber\":\"13\""))
    assert(json.contains("\"Records\":["))
    assert(json.contains("\"Data\":\"" + recs(1).dataB64 + "\""))
    decodeToEvent(h, p) match {
      case Some(KinesisLikeLog.RecordsEvent(cont, got)) =>
        assert(cont === 13L)
        assert(got === recs)
      case other => fail(s"expected a records event, got $other")
    }
    assert(decodeToLines(h, p) === lines)
  }

  test("the framed sink groups records into multi-record envelope " +
    "events (flushing before control messages so message order equals " +
    "line order), and the event source yields per-event continuations; " +
    "the line flatten is grouping-invariant") {
    val dir   = tmpDir("graft_framing_group")
    val lines = (1L to 7L).map(i => record(i, s"p$i")) :+
      KinesisLikeLog.ClosedMarker
    val f = dir.resolve("shard-00000.elog")
    val sink = KinesisLikeLog.openLineSink(f.toFile, recordsPerEvent = 3)
    try lines.foreach(sink.writeLine)
    finally sink.close()

    val src = KinesisLikeLog.openEvents(f.toFile)
    val events = try Iterator.continually(src.readEvent())
      .takeWhile(_ != null).toList
    finally src.close()
    // 7 records at 3/event = events of 3, 3, 1 — the trailing partial
    // group flushed by the closed marker — then the control event.
    assert(events.map {
      case KinesisLikeLog.RecordsEvent(c, rs) => (c, rs.map(_.seq))
      case KinesisLikeLog.Closed              => (-1L, Seq.empty[Long])
      case other                              => fail(s"unexpected $other")
    } === List(
      (3L, Seq(1L, 2L, 3L)), (6L, Seq(4L, 5L, 6L)), (7L, Seq(7L)),
      (-1L, Seq.empty[Long])))
    // Flattened back to lines, grouping is invisible.
    val flat = scala.collection.mutable.ArrayBuffer.empty[String]
    KinesisLikeLog.eachLine(f.toFile)(flat += _)
    assert(flat.toSeq === lines)
    assert(KinesisLikeLog.maxSeq(f.toFile) === 7L)
    assert(KinesisLikeLog.isClosed(f.toFile))
  }

  test("CRC verification fails fast: flipping any single byte of a " +
    "message is caught at decode (prelude or message CRC), and a " +
    "corrupt prelude claiming an absurd length is refused AT THE " +
    "PRELUDE, not buffered to EOF") {
    val msg = encodeEvent(SubscribeEventType, record(1, "x").getBytes(UTF_8))
    // Corrupt a header byte and a payload byte: both must be caught.
    Seq(13, msg.length - 6).foreach { i =>
      val bad = msg.clone()
      bad(i) = (bad(i) ^ 0x40).toByte
      intercept[IllegalArgumentException](decodeMessage(bad))
    }
    // A prelude claiming 2 GB: the reassembler refuses immediately.
    val huge = Array[Byte](0x7f, -1, -1, -1)
    intercept[IllegalArgumentException] {
      new FrameDecoder().feed(huge, 0, 4)
    }
    // And one claiming less than the 16-byte minimum likewise.
    intercept[IllegalArgumentException] {
      new FrameDecoder().feed(Array[Byte](0, 0, 0, 8), 0, 4)
    }
  }

  test("FrameDecoder flags a truncated trailing frame (isMidFrame) and " +
    "the framed line source refuses a truncated shard file") {
    val full = encodeEvent(SubscribeEventType, "abcdef".getBytes(UTF_8))
    val dec  = new FrameDecoder
    dec.feed(full, 0, full.length - 2)
    assert(dec.isMidFrame)

    val dir = tmpDir("graft_framing_trunc")
    val f   = dir.resolve("shard-00000.elog")
    Files.write(f, full.dropRight(2))
    val src = KinesisLikeLog.openLines(f.toFile)
    try intercept[IllegalArgumentException] {
      var l = src.readLine()
      while (l != null) l = src.readLine()
    } finally src.close()
  }

  test("a 1 MB record framed into a shard file streams through the " +
    "source byte-identically, reassembled from >= 64 chunked reads " +
    "(the 16 KB transport ceiling of subscribe_to_shard_test.exs:220-245)") {
    // 1 MB of deterministic non-repeating bytes, base64'd into the line.
    val mb = Array.tabulate(1024 * 1024)(i => ((i * 31 + 7) % 251).toByte)
    val payload = new String(
      java.util.Base64.getEncoder.encode(mb), UTF_8) // text-safe 1.37 MB
    val dir = tmpDir("graft_framing_1mb")
    writeFramedShard(dir,
      Seq(record(1, "small-before"), record(2, payload),
        record(3, "small-after"), KinesisLikeLog.ClosedMarker))

    val fileBytes = dir.resolve("shard-00000.elog").toFile.length()
    assert(fileBytes / ChunkBytes >= 64,
      s"fixture must span >= 64 transport chunks, got " +
        s"${fileBytes / ChunkBytes}")

    val rows = spark.read.format("kinesislike")
      .option("path", dir.toString).load()
      .select(col("sequenceNumber").cast("long"), col("data"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
      .toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    // The source base64-decodes the payload field; decoding the payload
    // string yields the original 1 MB, byte for byte.
    val got = java.util.Base64.getDecoder.decode(
      new String(rows(2L), UTF_8))
    assert(java.util.Arrays.equals(got, mb),
      "1 MB record must round-trip byte-identically")
    assert(new String(rows(1L), UTF_8) === "small-before")
    assert(new String(rows(3L), UTF_8) === "small-after")
  }

  test("deriveFramed builds a header-framed twin that the source reads " +
    "row-for-row identically to the text original — markers, metadata " +
    "(maxSeq/closed) and offsets included, initial-response skipped") {
    val dir = tmpDir("graft_framing_twin")
    val lines = (1L to 40L).map(i => record(i, s"payload-$i")) :+
      KinesisLikeLog.ClosedMarker
    Files.write(dir.resolve("shard-00000.log"),
      (lines.mkString("\n") + "\n").getBytes(UTF_8))
    val framedDir = tmpDir("graft_framing_twin_out")
    EventStreamFraming.deriveFramed(dir.toString, framedDir.toString)

    def rows(d: Path) = spark.read.format("kinesislike")
      .option("path", d.toString).load()
      .select(col("shardId"), col("sequenceNumber"),
        col("approximateArrivalTimestamp").cast("long").as("us"),
        col("partitionKey"), col("data").cast("string"))
      .collect().map(_.toSeq).toSeq
    assert(rows(framedDir) === rows(dir))

    val f = framedDir.resolve("shard-00000.elog").toFile
    assert(KinesisLikeLog.maxSeq(f) === 40L)
    assert(KinesisLikeLog.isClosed(f))
  }
}
