package graft.operators

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.{Q, Tables => T}
import graft.sources.kinesislike.KinesisLikeLog

/** Real Structured Streaming operators running on the KinesisLike source
  * (SURVEY.md §2.2 streaming row): event-time tumbling-window aggregation
  * with a watermark, and at-least-once dedup via dropDuplicates.
  *
  * Each query replays the event log through
  * `readStream.format("kinesislike")` with Trigger.AvailableNow into a
  * memory sink, then returns the sink contents — formulated
  * batch-equivalently so the DuckDB oracle over the `events` table checks
  * the streaming result byte-for-byte (SURVEY.md §5.2).
  *
  * The payload pipeline honors the reference's decode path: the source
  * delivers base64-decoded `data` bytes (subscribe_to_shard.ex:365-366),
  * parsed here with from_json — the S12 "decode_message" analog.
  *
  * Scale posture: the source is per-shard parallel, the windowed
  * aggregation is a standard partial-agg + state-store plan keyed by
  * (window, event_type), and dedup state is bounded by the watermark.
  */
object Streaming {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  private val sinkCounter = new AtomicLong(0)

  /** Build (once per sf dir + copies) the shard log replayed by these
    * queries. Lives under java.io.tmpdir; idempotent via the log's ready
    * marker. */
  private def ensureLog(s: SparkSession, d: String, copies: Int): String = {
    val base = new java.io.File(d).getName
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_kinesislike/${base}_c$copies").getAbsolutePath
    KinesisLikeLog.writeFromEvents(s, d, dir, numShards = 4, copies = copies)
    dir
  }

  /** Run a streaming DataFrame to completion (AvailableNow) into a memory
    * sink; returns the sink table. */
  private def runToMemory(
      s: SparkSession,
      df: DataFrame,
      outputMode: String): DataFrame = {
    val name = s"graft_stream_sink_${sinkCounter.incrementAndGet()}"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  /** Parse the Kinesis-record envelope back into typed event columns. */
  private def parsed(stream: DataFrame): DataFrame =
    stream
      .select(from_json(col("data").cast("string"), eventSchema).as("e"))
      .select(col("e.*"))

  /** Streaming tumbling-window aggregate: watermarked event-time window()
    * over the replayed log. Complete output mode so every window is
    * emitted once the log drains — making the result identical to the
    * q23 batch formulation, whose oracle doubles as this query's check. */
  private val q28 = Q(
    "q28_stream_window",
    (s, d) => {
      val log = ensureLog(s, d, copies = 1)
      val stream = s.readStream
        .format("kinesislike")
        .option("path", log)
        .option("startingPosition", "trim_horizon")
        .load()
      val agg = parsed(stream)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
      runToMemory(s, agg, "complete")
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"),
          col("n"),
          col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    // Same oracle shape as q23: streaming window() ≡ date_trunc group-by.
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type"""),
  )

  /** Streaming dedup: the log is written with every record duplicated
    * (at-least-once redelivery, exactly what a Kinesis resubscribe can
    * produce — subscribe_to_shard.ex:205-220), and dropDuplicates on the
    * event id collapses them within the watermark. Duplicates share a
    * sequence number, so they can never straddle a microbatch boundary —
    * the dedup state always sees both copies before eviction. The oracle
    * aggregates the ORIGINAL events table: a correct dedup makes the
    * doubled log indistinguishable from it. */
  private val q29 = Q(
    "q29_stream_dedup",
    (s, d) => {
      val log = ensureLog(s, d, copies = 2)
      val stream = s.readStream
        .format("kinesislike")
        .option("path", log)
        .option("startingPosition", "trim_horizon")
        .load()
      val deduped = parsed(stream)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
      runToMemory(s, deduped, "append")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
  )

  val all: Seq[Q] = Seq(q28, q29)
}
