package graft.sources.kinesislike

import java.io.{File, FileInputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Byte-level event-stream framing for the shard log — the fidelity tier
  * for the reference's largest state machine (the AWS event-stream frame
  * parser, subscribe_to_shard.ex:273-327): a frame is a 4-byte BIG-ENDIAN
  * total-length prelude that INCLUDES its own 4 bytes ("the first 4 bytes
  * of a message indicate its total size"; the reference's countdown is
  * `:binary.decode_unsigned(new_buffer) - 4`, subscribe_to_shard.ex:298)
  * followed by the payload. HTTP/2 delivers at most 16 KB per data frame,
  * so one logical record (up to 1 MB pre-base64) spans MANY chunks and
  * the parser must reassemble partial frames across reads
  * (subscribe_to_shard_test.exs:220-245 — mirrored by
  * KinesisLikeSourceSpec's 1 MB / 16 KB round-trip).
  *
  * A framed shard file (`shard-NNNNN.elog`) carries exactly the line log's
  * records, one frame per line (marker lines included), payload = the line
  * bytes without the newline — so every layer above the framing (parsing,
  * offsets, markers, fault injection) is encoding-agnostic: the log module
  * dispatches on the file extension and hands both encodings to the same
  * line parser. The reference's frame HEADERS (:message-type /
  * :event-type / :content-type) are a fixed vocabulary demuxed to either
  * "deliver the JSON payload" or "raise the typed exception"
  * (subscribe_to_shard.ex:329-341) — that demux already exists above the
  * framing layer as the line-level `#ERROR` / `#CLOSED` markers, so the
  * prelude + reassembly machine is the part with real state to reproduce.
  */
object EventStreamFraming {

  /** The HTTP/2 data-frame ceiling the reference's parser reassembles
    * across (subscribe_to_shard_test.exs:221-222). */
  val ChunkBytes = 16 * 1024

  /** One frame: [total length (4B big-endian, includes itself)][payload]. */
  def encodeFrame(payload: Array[Byte]): Array[Byte] = {
    val total = payload.length + 4
    val out   = new Array[Byte](total)
    out(0) = ((total >>> 24) & 0xff).toByte
    out(1) = ((total >>> 16) & 0xff).toByte
    out(2) = ((total >>> 8) & 0xff).toByte
    out(3) = (total & 0xff).toByte
    System.arraycopy(payload, 0, out, 4, payload.length)
    out
  }

  /** Incremental frame reassembler — the `{buffer, msg_bytes_left}`
    * state machine of subscribe_to_shard.ex:277-327: feed arbitrary-size
    * chunks in arrival order; complete payloads are emitted as soon as
    * their last byte arrives, partial frames (including a split PRELUDE)
    * wait in the buffer. Single-consumer, like the reference's per-
    * connection parser. */
  final class FrameDecoder {
    private val pending = new java.io.ByteArrayOutputStream(256)
    // -1 ⇒ reading the prelude (pending holds its first 0-3 bytes);
    // else payload bytes still missing — the msg_bytes_left countdown.
    private var bytesLeft: Int = -1

    def feed(chunk: Array[Byte], off: Int, len: Int): Seq[Array[Byte]] = {
      val out = Seq.newBuilder[Array[Byte]]
      var i   = off
      val end = off + len
      while (i < end) {
        if (bytesLeft < 0) {
          pending.write(chunk(i)); i += 1
          if (pending.size == 4) {
            val p = pending.toByteArray
            val total = ((p(0) & 0xff) << 24) | ((p(1) & 0xff) << 16) |
              ((p(2) & 0xff) << 8) | (p(3) & 0xff)
            require(total >= 4, s"event-stream frame length $total < 4")
            bytesLeft = total - 4 // subscribe_to_shard.ex:298
            pending.reset()
            if (bytesLeft == 0) { // legal zero-payload frame
              out += Array.emptyByteArray
              bytesLeft = -1
            }
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
    * frames, yields each payload as the UTF-8 line it encodes. */
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
        decoder.feed(chunk, 0, n)
          .foreach(b => queue.enqueue(new String(b, UTF_8)))
      }
      queue.dequeue()
    }

    override def close(): Unit = in.close()
  }

  /** Derive the framed twin of a line-log directory: every
    * `shard-NNNNN.log` becomes `shard-NNNNN.elog` with one frame per
    * line (markers included), byte-for-byte the same payloads. Pure
    * line transformation, idempotent via the ready marker (the
    * [[KinesisLikeLog.derive]] convention). */
  def deriveFramed(baseDir: String, targetDir: String): Unit =
    synchronized {
      val ready = Paths.get(targetDir, KinesisLikeLog.ReadyMarker)
      if (Files.exists(ready)) return
      Files.createDirectories(Paths.get(targetDir))
      KinesisLikeLog.shardFiles(baseDir).foreach { f =>
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(
            new File(targetDir,
              KinesisLikeLog.shardId(f) + KinesisLikeLog.FramedExtension)))
        try KinesisLikeLog.eachLine(f) { l =>
          out.write(encodeFrame(l.getBytes(UTF_8)))
        } finally out.close()
      }
      Files.createFile(ready)
    }
}
