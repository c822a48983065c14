package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.kinesislike.{EventStreamFraming, KinesisLikeLog}

/** The byte-level event-stream framing tier (subscribe_to_shard.ex:273-327
  * made literal): prelude parsing, partial-frame reassembly across
  * arbitrary chunk splits, the 1 MB-record / 16 KB-chunk round-trip of
  * subscribe_to_shard_test.exs:220-245 through the REAL source read path,
  * and the framed/text twin equivalence the `.elog` encoding promises. */
class EventStreamFramingSpec extends SparkSpec {

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

  private def writeFramedShard(
      dir: Path, lines: Seq[String]): Path = {
    val f = dir.resolve("shard-00000.elog")
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f.toFile))
    try lines.foreach(l =>
      out.write(EventStreamFraming.encodeFrame(l.getBytes(UTF_8))))
    finally out.close()
    f
  }

  test("FrameDecoder reassembles frames fed ONE BYTE at a time — every " +
    "possible split point, including mid-prelude — and emits each " +
    "payload exactly once, byte-identically") {
    val payloads = Seq(
      Array.emptyByteArray,                       // zero-payload frame
      "short".getBytes(UTF_8),
      Array.tabulate(70000)(i => (i % 251).toByte)) // spans many chunks
    val wire = payloads.flatMap(p =>
      EventStreamFraming.encodeFrame(p).toSeq).toArray
    val dec = new EventStreamFraming.FrameDecoder
    val got = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    wire.foreach { b =>
      got ++= dec.feed(Array(b), 0, 1)
    }
    assert(!dec.isMidFrame, "decoder must be frame-aligned at wire end")
    assert(got.length === payloads.length)
    got.zip(payloads).zipWithIndex.foreach { case ((g, e), i) =>
      assert(java.util.Arrays.equals(g, e), s"payload $i") }
  }

  test("FrameDecoder flags a truncated trailing frame (isMidFrame) and " +
    "the framed line source refuses a truncated shard file") {
    val full = EventStreamFraming.encodeFrame("abcdef".getBytes(UTF_8))
    val dec  = new EventStreamFraming.FrameDecoder
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
    assert(fileBytes / EventStreamFraming.ChunkBytes >= 64,
      s"fixture must span >= 64 transport chunks, got " +
        s"${fileBytes / EventStreamFraming.ChunkBytes}")

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

  test("deriveFramed builds a byte-framed twin that the source reads " +
    "row-for-row identically to the text original — markers, metadata " +
    "(maxSeq/closed) and offsets included") {
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
