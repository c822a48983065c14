package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata alongside. The container has no image/audio codecs,
  * so the decode step is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing (binary columns, schema, batch iteration,
  * partition-parallel decode) is real and tested.
  *
  * m01 extracts typed metadata (SQL-expressible → oracle-checked); m02
  * runs the stubbed decoder partition-parallel over the binary payloads
  * via Dataset.mapPartitions, oracle-checked through the ASCII-fixture
  * byte-statistics reformulation (and independently cross-checked against
  * a Spark-SQL formulation in MultimodalSpec).
  */
object Multimodal {

  // The stub "decoded dimensions" derivation, shared by m01 (metadata)
  // and m04 (resize): one definition per engine dialect so the two
  // operators (and their oracles) cannot drift apart.
  private val WidthExpr  = "CAST(n_chars % 640 + 16 AS INT)"
  private val HeightExpr = "CAST(n_chars % 360 + 16 AS INT)"

  /** Typed metadata over fake media blobs (text bytes stand in for the
    * payload): type tag, byte length, checksum, derived dimensions. */
  private val m01 = Q(
    "m01_media_meta",
    (s, d) =>
      T.documents(s, d)
        .selectExpr(
          "doc_id",
          """CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type""",
          "length(CAST(text AS BINARY)) AS n_bytes",
          "md5(text) AS checksum",
          s"$WidthExpr AS width",
          s"$HeightExpr AS height",
          "CAST(n_chars * 7 AS BIGINT) AS duration_ms")
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
             md5(text) AS checksum,
             $WidthExpr AS width,
             $HeightExpr AS height,
             CAST(n_chars * 7 AS BIGINT) AS duration_ms
      FROM documents
      ORDER BY doc_id"""),
  )

  /** Partition-parallel "decode + feature extract" over binary payloads.
    *
    * STUB DECODER: a real deployment would decode the media bytes with a
    * codec library here (per batch, inside mapPartitions, exactly this
    * shape). This container ships no codecs, so the decode is a
    * deterministic fake: an 8-bin byte histogram + integer-scaled mean
    * byte value standing in for pixel statistics. The schema,
    * partitioning, and batch iteration are the real thing.
    *
    * Oracle: the fixture text is pure ASCII (asserted in MultimodalSpec),
    * so DuckDB can recompute the byte statistics character-wise via
    * ascii(substr(...)) — the same trick m03's oracle uses — which
    * upgrades this from a rows-only check to a full hash-gated row. The
    * mean is emitted integer-scaled (µ-byte units, truncating division)
    * because both engines compute `sum * 1000000 / n` exactly in integer
    * arithmetic, where a rounded double could differ in half-tie ulps.
    */
  private val m02 = Q(
    "m02_media_features",
    (s, d) => {
      val spark = s
      import spark.implicits._
      T.documents(s, d)
        // byte==char guard: see m05 — bytes here, characters in the
        // oracle; only ASCII rows are comparable, so exclude the rest by
        // construction (currently none).
        .filter("length(CAST(text AS BINARY)) = length(text)")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (docId, bytes) =>
            // --- STUB: stands in for codec decode + feature extraction ---
            val hist = new Array[Long](8)
            var sum  = 0L
            var i    = 0
            while (i < bytes.length) {
              val b = bytes(i) & 0xff
              hist(b >> 5) += 1
              sum += b
              i += 1
            }
            val meanMicro =
              if (bytes.length == 0) 0L else sum * 1000000L / bytes.length
            // Histogram as a JSON string: array-typed output columns crash
            // the driver comparator's pandas factorize — a scalar string
            // column keeps the operator validatable.
            (docId, bytes.length, meanMicro, hist.mkString("[", ",", "]"))
          }
        }
        .toDF("doc_id", "n_bytes", "mean_byte_micro", "byte_hist")
        .orderBy(col("doc_id"))
    },
    Some {
      val histTerms = (0 until 8)
        .map(k => s"CAST(len(list_filter(bytes, x -> (x // 32) = $k)) AS VARCHAR)")
        .mkString(" || ',' || ")
      s"""
      WITH b AS (
        SELECT doc_id,
               list_transform(range(1, len(text) + 1),
                              i -> ascii(substr(text, i, 1))) AS bytes
        FROM documents
        WHERE octet_length(CAST(text AS BLOB)) = length(text))
      SELECT doc_id,
             CAST(len(bytes) AS INT) AS n_bytes,
             CASE WHEN len(bytes) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST((list_sum(bytes) * 1000000) // len(bytes) AS BIGINT)
             END AS mean_byte_micro,
             '[' || $histTerms || ']' AS byte_hist
      FROM b
      ORDER BY doc_id"""
    },
  )

  /** Frame sampling over "video" payloads (doc_id % 3 = 2): one frame of
    * 16 bytes every 32-byte stride — the row-explodes-to-frames plumbing a
    * video pipeline needs (schema, offsets, per-frame checksum), with the
    * decode itself standing on binary substring. Fully oracle-checkable:
    * both engines slice the same blob and md5 the slice. */
  /** The m03 frame derivation (video payloads → 16-byte frames every 32
    * bytes, hash per frame) — shared by m03's listing, m08's cross-video
    * duplicate-frame audit, and m10's scene detection so the frame
    * definition cannot drift between them. `frame_sig` is the exact
    * integer byte sum of the frame (the hash detects IDENTICAL frames;
    * the signature measures HOW DIFFERENT consecutive frames are, which
    * is what a scene cut is). The signature folds over the frame's OWN
    * 16-byte BINARY slice (sliced once, then summed via its hex dump) —
    * NOT character-wise over the whole text: a string substring at
    * position p is an O(p) codepoint scan in Spark's UTF8String, which
    * made the per-document signature cost QUADRATIC in document length
    * (caught empirically by the sf1 scale rehearsal: m10 ran 33× its
    * sf0.1 time on 10× data; binary substring is a byte-offset O(1)
    * slice and restores linearity). Values are identical under the
    * derivation's existing byte==char ASCII guard (m05's convention),
    * so both engines sum the same integers and the oracle is unchanged. */
  private def videoFrames(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    T.documents(s, d)
      .selectExpr(
        "doc_id",
        "text",
        "CAST(text AS BINARY) AS payload",
        "length(CAST(text AS BINARY)) AS n")
      .filter("doc_id % 3 = 2 AND n >= 16 AND n = length(text)")
      .select(
        col("doc_id"),
        col("payload"),
        explode(expr("sequence(0, CAST((n - 16) div 32 AS INT))"))
          .as("frame_idx"))
      .selectExpr(
        "doc_id",
        "frame_idx",
        "frame_idx * 32 + 1 AS frame_off",
        "substring(payload, frame_idx * 32 + 1, 16) AS fbytes")
      .selectExpr(
        "doc_id",
        "frame_idx",
        "frame_off",
        "md5(fbytes) AS frame_hash",
        """aggregate(sequence(0, 15), 0L,
             (acc, j) -> acc + CAST(conv(substring(hex(fbytes), j * 2 + 1, 2),
                                         16, 10) AS BIGINT))
           AS frame_sig""")

  /** The m03 frame derivation as DuckDB CTEs ending in
    * `frames_h(doc_id, frame_idx, frame_off, frame_hash, frame_sig)`. */
  private val videoFramesSql = """
      v AS (
        SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n
        FROM documents
        WHERE doc_id % 3 = 2
          AND octet_length(CAST(text AS BLOB)) = length(text)),
      frames AS (
        SELECT doc_id, text,
               unnest(generate_series(0, CAST((n - 16) // 32 AS INT))) AS i
        FROM v WHERE n >= 16),
      frames_h AS (
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(i * 32 + 1 AS INT) AS frame_off,
               md5(substr(text, CAST(i * 32 + 1 AS BIGINT), 16))
                 AS frame_hash,
               CAST(list_sum(list_transform(range(0, 16),
                 j -> ascii(substr(text, CAST(i * 32 + 1 + j AS BIGINT), 1))))
                 AS BIGINT) AS frame_sig
        FROM frames)"""

  private val m03 = Q(
    "m03_frame_sample",
    (s, d) => videoFrames(s, d)
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        col("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx")),
    // DuckDB quirks absorbed here: generate_series as a TABLE function
    // rejects lateral column refs (scalar-list + unnest instead), and
    // this build has no BLOB substr — the VARCHAR slice is byte-identical
    // for the ASCII fixture (md5(VARCHAR) hashes UTF-8 bytes; the Spark
    // side stays genuinely binary).
    Some(s"""
      WITH $videoFramesSql
      SELECT doc_id, frame_idx, frame_off, frame_hash
      FROM frames_h
      ORDER BY doc_id, frame_idx"""),
  )

  /** Resize/downsample over "image" payloads (doc_id % 3 = 0): a
    * nearest-neighbor resample of the blob to a fixed 64-sample thumbnail
    * — sample i reads byte position `i*(n-1)/63` (integer math, monotone
    * spread over the payload), the exact index arithmetic a real
    * nearest-neighbor resize runs per output pixel, with the codec's
    * pixel access STUBBED as byte access (no codecs in the container).
    * The plumbing is the real thing: partition-parallel mapPartitions
    * batch iteration, source dims carried as typed metadata, per-thumb
    * checksum + exact integer sample sum.
    *
    * Oracle: same ASCII trick as m02/m03 — DuckDB recomputes the sampled
    * bytes character-wise and md5s the same 64-byte string. */
  private val m04 = Q(
    "m04_media_resize",
    (s, d) => {
      val spark = s
      import spark.implicits._
      T.documents(s, d)
        .filter("doc_id % 3 = 0 AND length(CAST(text AS BINARY)) >= 64" +
          " AND length(CAST(text AS BINARY)) = length(text)")
        .selectExpr(
          "doc_id",
          "CAST(text AS BINARY) AS payload",
          s"$WidthExpr AS src_w",
          s"$HeightExpr AS src_h")
        .as[(Long, Array[Byte], Int, Int)]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { case (docId, bytes, w, h) =>
            // --- STUB: codec pixel access stands on raw byte access ---
            val n       = bytes.length.toLong
            val sampled = new Array[Byte](64)
            var sum     = 0L
            var i       = 0
            while (i < 64) {
              val b = bytes(((i * (n - 1)) / 63).toInt)
              sampled(i) = b
              sum += (b & 0xff)
              i += 1
            }
            md.reset()
            val hash = md.digest(sampled)
              .map(b => f"${b & 0xff}%02x").mkString
            (docId, w, h, hash, sum)
          }
        }
        .toDF("doc_id", "src_w", "src_h", "thumb_hash", "sample_sum")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH img AS (
        SELECT doc_id, text,
               octet_length(CAST(text AS BLOB)) AS n,
               $WidthExpr AS src_w,
               $HeightExpr AS src_h
        FROM documents
        WHERE doc_id % 3 = 0 AND octet_length(CAST(text AS BLOB)) >= 64
          AND octet_length(CAST(text AS BLOB)) = length(text)),
      sampled AS (
        SELECT doc_id, src_w, src_h,
               list_transform(range(0, 64),
                 i -> substr(text, CAST((i * (n - 1)) // 63 AS BIGINT) + 1, 1))
                 AS chars,
               list_transform(range(0, 64),
                 i -> ascii(substr(text, CAST((i * (n - 1)) // 63 AS BIGINT) + 1, 1)))
                 AS vals
        FROM img)
      SELECT doc_id, src_w, src_h,
             md5(list_aggregate(chars, 'string_agg', '')) AS thumb_hash,
             CAST(list_sum(vals) AS BIGINT) AS sample_sum
      FROM sampled
      ORDER BY doc_id"""),
  )

  /** Audio frame analysis over "audio" payloads (doc_id % 3 = 1): the
    * payload is read as PCM16 little-endian samples, windowed into
    * 16-sample (32-byte) frames, and each frame emits exact integer
    * energy (Σ v²) and peak (max |v|) — the waveform-statistics plumbing
    * an audio pipeline needs (sample decode, framing, per-frame
    * aggregate rows), with the codec STUBBED as raw PCM interpretation
    * (no audio libs in the container; a real deployment decodes
    * compressed audio to PCM in exactly this mapPartitions seam).
    * All-integer arithmetic, so the oracle recomputes the identical
    * values character-wise (the m02/m03 ASCII trick) with zero
    * floating-point divergence risk. */
  private val m05 = Q(
    "m05_audio_frames",
    (s, d) => {
      val spark = s
      import spark.implicits._
      T.documents(s, d)
        // The byte==char guard makes the ASCII-fixture assumption explicit
        // on BOTH sides (oracle mirrors it): this side reads UTF-8 BYTES,
        // the DuckDB oracle indexes CHARACTERS via substr/ascii — they
        // only agree on ASCII, so a non-ASCII document is excluded by
        // construction rather than silently diverging if the fixture ever
        // grows one.
        .filter("doc_id % 3 = 1 AND length(CAST(text AS BINARY)) >= 32" +
          " AND length(CAST(text AS BINARY)) = length(text)")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.flatMap { case (docId, bytes) =>
            // --- STUB: codec decode stands on raw PCM16-LE access ---
            val nFrames = bytes.length / 32
            (0 until nFrames).iterator.map { f =>
              var energy = 0L
              var peak   = 0
              var k      = 0
              while (k < 16) {
                val off = f * 32 + 2 * k
                val u   = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
                val v   = if (u >= 32768) u - 65536 else u
                energy += v.toLong * v
                val a = math.abs(v)
                if (a > peak) peak = a
                k += 1
              }
              (docId, f, energy, peak)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "energy", "peak")
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""
      WITH a AS (
        SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n
        FROM documents
        WHERE doc_id % 3 = 1 AND octet_length(CAST(text AS BLOB)) >= 32
          AND octet_length(CAST(text AS BLOB)) = length(text)),
      smp AS (
        SELECT doc_id,
               list_transform(range(0, (n // 32) * 16), j ->
                 CASE WHEN ascii(substr(text, CAST(2*j + 2 AS BIGINT), 1)) * 256
                           + ascii(substr(text, CAST(2*j + 1 AS BIGINT), 1)) >= 32768
                      THEN ascii(substr(text, CAST(2*j + 2 AS BIGINT), 1)) * 256
                           + ascii(substr(text, CAST(2*j + 1 AS BIGINT), 1)) - 65536
                      ELSE ascii(substr(text, CAST(2*j + 2 AS BIGINT), 1)) * 256
                           + ascii(substr(text, CAST(2*j + 1 AS BIGINT), 1))
                 END) AS v
        FROM a),
      frames AS (
        SELECT doc_id, v,
               unnest(generate_series(0, CAST(len(v) // 16 - 1 AS INT))) AS fi
        FROM smp)
      SELECT doc_id,
             CAST(fi AS INT) AS frame_idx,
             CAST(list_sum(list_transform(range(1, 17),
               k -> CAST(v[fi*16 + k] AS BIGINT) * v[fi*16 + k])) AS BIGINT)
               AS energy,
             CAST(list_max(list_transform(range(1, 17),
               k -> abs(v[fi*16 + k]))) AS INT) AS peak
      FROM frames
      ORDER BY doc_id, frame_idx"""),
  )

  /** Multimodal sequence packing — t11's fixed-context binning extended
    * to samples whose token cost mixes modalities: a sample charges its
    * text tokens PLUS its media tokens, where media cost follows the
    * modality (image → 16 px patch grid; audio → 80 ms frames; video →
    * coarser 32 px grid × 4 sampled frames, m03's rate). Dims/durations
    * are m01's derived metadata, so the packer and the metadata extractor
    * cannot drift. Bins are 8192-token contexts packed per modality
    * stream in doc_id order; all arithmetic is integer (`div`, ceil via
    * (x+k-1) div k) so both engines place every sample identically.
    *
    * Scale shape: map-only costing, then the bounded two-level scan
    * ([[DistributedScan.exclusivePrefixSum]]) for the running sum —
    * identical posture to t11, and MORE load-bearing here: media_type
    * has THREE values, so the textbook per-stream window would split a
    * 100 TB corpus across three unbounded tasks. */
  private val m06 = Q(
    "m06_multimodal_packing",
    (s, d) => {
      val costed = T.documents(s, d)
        .selectExpr(
          "doc_id",
          """CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type""",
          "CAST(size(split(text, ' ')) AS BIGINT) AS text_toks",
          s"CAST($WidthExpr AS BIGINT) AS w0",
          s"CAST($HeightExpr AS BIGINT) AS h0",
          "CAST(n_chars * 7 AS BIGINT) AS dur_ms")
        .withColumn(
          "media_toks",
          expr("""CASE media_type
                    WHEN 'image' THEN ((w0 + 15) div 16) * ((h0 + 15) div 16)
                    WHEN 'audio' THEN dur_ms div 80
                    ELSE ((w0 + 31) div 32) * ((h0 + 31) div 32) * 4
                  END"""))
        .withColumn("toks", col("text_toks") + col("media_toks"))
      DistributedScan.exclusivePrefixSum(
          costed, col("media_type"), col("doc_id"), col("toks"), "prior")
        .withColumn("bin", expr("prior div 8192"))
        .groupBy(col("media_type"), col("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("text_toks")).cast("bigint").as("text_tokens"),
          sum(col("media_toks")).cast("bigint").as("media_tokens"),
          sum(col("toks")).cast("bigint").as("tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("media_type"), col("bin"))
    },
    Some(s"""
      WITH sized AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS text_toks,
               CAST($WidthExpr AS BIGINT) AS w0,
               CAST($HeightExpr AS BIGINT) AS h0,
               CAST(n_chars * 7 AS BIGINT) AS dur_ms
        FROM documents),
      costed AS (
        SELECT doc_id, media_type, text_toks,
               CASE media_type
                 WHEN 'image' THEN ((w0 + 15) // 16) * ((h0 + 15) // 16)
                 WHEN 'audio' THEN dur_ms // 80
                 ELSE ((w0 + 31) // 32) * ((h0 + 31) // 32) * 4
               END AS media_toks
        FROM sized),
      placed AS (
        SELECT doc_id, media_type, text_toks, media_toks,
               text_toks + media_toks AS toks,
               COALESCE(sum(text_toks + media_toks) OVER (
                 PARTITION BY media_type ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prior
        FROM costed)
      SELECT media_type, CAST(prior // 8192 AS BIGINT) AS bin,
             count(*) AS n_docs,
             CAST(sum(text_toks) AS BIGINT) AS text_tokens,
             CAST(sum(media_toks) AS BIGINT) AS media_tokens,
             CAST(sum(toks) AS BIGINT) AS tokens,
             min(doc_id) AS first_doc,
             max(doc_id) AS last_doc
      FROM placed
      GROUP BY 1, 2
      ORDER BY media_type, bin"""),
  )

  /** Chunk-level content-addressed dedup — the STORAGE-tier dedup under
    * the document-level pack (d01 dedups records; a blob store dedups
    * fixed-size CHUNKS, which is how petabytes of media with shared
    * prefixes/segments actually shrink): split each payload into
    * 256-byte chunks, address each by hash, and report per media type
    * how many stored chunks collapse into distinct ones. ASCII fixture
    * ⇒ byte == char, so the oracle mirrors the chunking with substr
    * (the m02/m03 trick) and the whole row is integer-exact.
    *
    * 100 TB shape: chunking is a map-side explode over a computed
    * index range; the distinct-count is one shuffle on the chunk hash —
    * the CAS ingest path, with the hash as the storage key. */
  /** The m07 chunker: 256-byte content-addressed chunk hashes of `text`.
    * Zero-length guard: sequence(0, -1) auto-DESCENDS to [0, -1] (two
    * bogus chunk indexes) while the oracle's range(0, 0) is empty — an
    * empty payload must yield zero chunks on both engines (pinned by
    * MultimodalEdgeSpec; the fixtures' min doc length can't reach it). */
  private[graft] val chunkHashesExpr =
    """CASE WHEN length(text) > 0 THEN
         transform(sequence(0, CAST(ceil(length(text) / 256.0) AS INT) - 1),
                   i -> md5(substring(text, i * 256 + 1, 256)))
       ELSE CAST(array() AS ARRAY<STRING>) END"""

  private val m07 = Q(
    "m07_media_chunk_dedup",
    (s, d) => {
      val chunks = T.documents(s, d)
        .filter("length(CAST(text AS BINARY)) = length(text)")
        .selectExpr(
          "doc_id",
          """CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type""",
          "text")
        .select(col("media_type"),
          explode(expr(chunkHashesExpr)).as("chunk_hash"))
      chunks
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk_hash")).as("n_distinct"))
        .select(
          col("media_type"), col("n_chunks"), col("n_distinct"),
          expr("(n_chunks - n_distinct) * 1000000 div n_chunks")
            .as("dedup_ppm"))
        .orderBy(col("media_type"))
    },
    Some("""
      WITH chunks AS (
        SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
               md5(substr(text, i * 256 + 1, 256)) AS chunk_hash
        FROM documents,
             LATERAL (SELECT unnest(range(0,
               CAST(ceil(length(text) / 256.0) AS INT))) AS i) t
        WHERE octet_length(CAST(text AS BLOB)) = length(text))
      SELECT media_type, count(*) AS n_chunks,
             count(DISTINCT chunk_hash) AS n_distinct,
             (count(*) - count(DISTINCT chunk_hash)) * 1000000 // count(*)
               AS dedup_ppm
      FROM chunks
      GROUP BY media_type
      ORDER BY media_type"""),
  )

  /** Cross-video duplicate-frame audit — keyframe-level near-dup
    * detection over m03's SHARED frame derivation (one frame definition
    * for listing and audit): a frame hash appearing in more than one
    * video marks shared footage (intros, templates, re-uploads); each
    * video reports how much of it is shared material, in integer ppm.
    * This is the video analog of d08's containment — segment-level
    * overlap the whole-payload checksum (m01) cannot see.
    *
    * 100 TB shape: one shuffle on the frame hash (the content-addressed
    * key), then one rollup per video; at scale the hash table IS the
    * frame store index, so the audit rides an existing asset. */
  private val m08 = Q(
    "m08_frame_dedup",
    (s, d) => {
      val f = videoFrames(s, d).select(col("doc_id"), col("frame_hash"))
      val spread = f.groupBy(col("frame_hash"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      f.join(spread, "frame_hash")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
        .select(
          col("doc_id"), col("n_frames"), col("n_shared"),
          expr("n_shared * 1000000 div n_frames").as("shared_ppm"))
        .filter(col("n_shared") > 0)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $videoFramesSql,
      spread AS (
        SELECT frame_hash, count(DISTINCT doc_id) AS n_docs
        FROM frames_h GROUP BY 1)
      SELECT f.doc_id, count(*) AS n_frames,
             CAST(sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
             CAST(sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               * 1000000 // count(*) AS shared_ppm
      FROM frames_h f JOIN spread s USING (frame_hash)
      GROUP BY f.doc_id
      HAVING sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) > 0
      ORDER BY f.doc_id"""),
  )

  /** Aspect-ratio bucketing — the batch-assembly step image-training
    * pipelines run so a batch shares one canvas shape (padding-free
    * attention): every image snaps to the nearest of five standard
    * aspect buckets (1:1, 4:3, 3:4, 16:9, 9:16). "Nearest" is argmin of
    * |aspect − bucket| measured in exact integer ppm (aspect = width ·
    * 10⁶ div height), with ties broken by the buckets' fixed declaration
    * order — every comparison is integer, so both engines pick identical
    * buckets with no float argmin hazard. Reports the per-bucket batch
    * profile: image count, total source pixels, and mean source aspect.
    *
    * Scale shape (100 TB): the snap is pure map-side arithmetic on m01's
    * derived dimensions (a literal 5-way CASE — no join against a bucket
    * table, nothing broadcast), and the profile aggregates map-side onto
    * a 5-row grid. */
  private val m09 = Q(
    "m09_aspect_buckets",
    (s, d) => {
      val arms = AspectBuckets
        .map { case (nm, ppm) => s"abs(ar_ppm - ${ppm}L)" -> nm }
      val best = arms.map(_._1).mkString("least(", ", ", ")")
      val pick = arms
        .map { case (e, nm) => s"WHEN $e = $best THEN '$nm'" }
        .mkString("CASE ", " ", " END")
      T.documents(s, d)
        .filter("CAST(doc_id % 3 AS INT) = 0") // m01's media_type='image'
        // EXIF-style orientation normalization: m01's derived dims are
        // always landscape (w ≥ h by construction), so half the images
        // carry a deterministic portrait orientation tag and transpose —
        // the rotate-before-bucket step a real pipeline applies, and the
        // reason the portrait arms of the bucket set are reachable.
        .selectExpr(
          "doc_id",
          s"CAST($WidthExpr AS BIGINT) AS w0",
          s"CAST($HeightExpr AS BIGINT) AS h0",
          "CAST((doc_id div 3) % 2 AS INT) = 1 AS portrait")
        .selectExpr(
          "doc_id",
          "CASE WHEN portrait THEN h0 ELSE w0 END AS width",
          "CASE WHEN portrait THEN w0 ELSE h0 END AS height")
        .selectExpr(
          "doc_id", "width", "height",
          "width * 1000000 div height AS ar_ppm")
        .selectExpr("ar_ppm", "width * height AS pixels", s"$pick AS bucket")
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_images"),
          sum(col("pixels")).as("total_pixels"),
          expr("sum(ar_ppm) div count(1)").as("mean_ar_ppm"))
        .orderBy(col("bucket"))
    },
    Some {
      val arms = AspectBuckets
        .map { case (nm, ppm) => s"abs(ar_ppm - $ppm)" -> nm }
      val best = arms.map(_._1).mkString("least(", ", ", ")")
      val pick = arms
        .map { case (e, nm) => s"WHEN $e = $best THEN '$nm'" }
        .mkString("CASE ", " ", " END")
      s"""
      WITH raw AS (
        SELECT doc_id,
               CAST($WidthExpr AS BIGINT) AS w0,
               CAST($HeightExpr AS BIGINT) AS h0,
               CAST((doc_id // 3) % 2 AS INT) = 1 AS portrait
        FROM documents WHERE CAST(doc_id % 3 AS INT) = 0),
      dims AS (
        SELECT doc_id,
               CASE WHEN portrait THEN h0 ELSE w0 END AS width,
               CASE WHEN portrait THEN w0 ELSE h0 END AS height
        FROM raw),
      ar AS (
        SELECT doc_id, width, height,
               width * 1000000 // height AS ar_ppm
        FROM dims),
      snapped AS (
        SELECT ar_ppm, width * height AS pixels, $pick AS bucket
        FROM ar)
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_images,
             CAST(sum(pixels) AS BIGINT) AS total_pixels,
             CAST(sum(ar_ppm) // count(*) AS BIGINT) AS mean_ar_ppm
      FROM snapped GROUP BY bucket ORDER BY bucket"""
    },
  )

  /** m09's aspect buckets as (name, aspect·10⁶) — 1:1, 4:3, 3:4, 16:9,
    * 9:16, each ppm value the same floor(w·10⁶/h) integer both engines
    * compute. Declaration order is the argmin tie-break order. Declared
    * before m09 would read it... kept immediately adjacent instead: m09
    * references it lazily from inside both the Spark closure and the
    * oracle `Some { }` block, so ordering is safe — but see p07 for why
    * eager string interpolation must NOT forward-reference. */
  private lazy val AspectBuckets: Seq[(String, Long)] = Seq(
    "a_square_1_1"     -> 1000000L,
    "b_landscape_4_3"  -> 1333333L,
    "c_portrait_3_4"   -> 750000L,
    "d_wide_16_9"      -> 1777777L,
    "e_tall_9_16"      -> 562500L)

  /** Scene-change detection — shot-boundary segmentation over m03's
    * SHARED frame derivation: a cut is where consecutive frames
    * DIFFER sharply, measured as the absolute jump in the exact integer
    * frame signature (byte sum; threshold 150 ≈ the fixture's p92 jump,
    * so both branches are exercised). The per-video report — frame count,
    * scene count, longest scene, sharpest cut — is what a video-training
    * curation pass filters on (single-scene statics and hyper-cut
    * montages are both suspect). m08 finds IDENTICAL frames across
    * videos; this finds CHANGE within one, the temporal axis nothing
    * else exercises.
    *
    * Scale shape (100 TB): one shuffle on doc_id for the lag window;
    * the boundary cumsum rides the same sort, and both rollups
    * ((doc, scene) then doc) reuse the partitioning via the subset rule
    * — the whole operator is one exchange, plan-asserted. */
  private val m10 = Q(
    "m10_scene_detect",
    (s, d) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      videoFrames(s, d)
        .withColumn("jump",
          abs(col("frame_sig") - lag(col("frame_sig"), 1).over(w)))
        .withColumn("boundary",
          when(col("jump") > 150L, 1L).otherwise(0L))
        .withColumn("scene_id",
          sum(col("boundary")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("scene_id"))
        .agg(count(lit(1)).as("scene_len"), max(col("jump")).as("mj"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("scene_len")).as("n_frames"),
          count(lit(1)).as("n_scenes"),
          max(col("scene_len")).as("longest_scene"),
          coalesce(max(col("mj")), lit(0L)).as("max_jump"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $videoFramesSql,
      jumps AS (
        SELECT doc_id, frame_idx,
               abs(frame_sig - lag(frame_sig) OVER w) AS jump
        FROM frames_h
        WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
      flagged AS (
        SELECT doc_id, jump,
               sum(CASE WHEN jump > 150 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY frame_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS scene_id
        FROM jumps),
      scenes AS (
        SELECT doc_id, scene_id, count(*) AS scene_len, max(jump) AS mj
        FROM flagged GROUP BY 1, 2)
      SELECT doc_id,
             CAST(sum(scene_len) AS BIGINT) AS n_frames,
             CAST(count(*) AS BIGINT) AS n_scenes,
             CAST(max(scene_len) AS BIGINT) AS longest_scene,
             CAST(coalesce(max(mj), 0) AS BIGINT) AS max_jump
      FROM scenes GROUP BY doc_id ORDER BY doc_id"""),
  )

  /** Keyframe selection — the third stage of the video curation funnel
    * (m03 samples frames, m10 segments scenes, m11 keeps ONE
    * representative frame per scene): a multimodal training batch
    * doesn't want 24 near-identical frames of one shot, it wants the
    * scene's canonical frame plus how much footage it stands for. The
    * keyframe is the scene's FIRST frame (the I-frame proxy — the frame
    * a decoder would seek to), selected with the min-struct argmin so
    * its signature rides along for downstream CAS dedup (m07's tier),
    * and each row carries the scene length the keyframe represents —
    * the compression accounting (frames kept vs frames seen) a budget
    * pass reads.
    *
    * Scale shape (100 TB): identical to m10's — the whole derivation
    * (lag window, scene numbering, per-scene argmin) rides ONE doc_id
    * exchange; the output is scene-count-sized, the 24× frame fan-out
    * never shuffles twice. */
  private val m11 = Q(
    "m11_keyframes",
    (s, d) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      videoFrames(s, d)
        .withColumn("jump",
          abs(col("frame_sig") - lag(col("frame_sig"), 1).over(w)))
        .withColumn("boundary",
          when(col("jump") > 150L, 1L).otherwise(0L))
        .withColumn("scene_id",
          sum(col("boundary")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("scene_id"))
        .agg(
          min(struct(col("frame_idx"), col("frame_sig"))).as("kf"),
          count(lit(1)).as("scene_len"))
        .select(col("doc_id"), col("scene_id"),
          col("kf.frame_idx").cast("long").as("keyframe_idx"),
          col("kf.frame_sig").as("keyframe_sig"),
          col("scene_len"))
        .orderBy(col("doc_id"), col("scene_id"))
    },
    Some(s"""
      WITH $videoFramesSql,
      jumps AS (
        SELECT doc_id, frame_idx, frame_sig,
               abs(frame_sig - lag(frame_sig) OVER w) AS jump
        FROM frames_h
        WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
      flagged AS (
        SELECT doc_id, frame_idx, frame_sig,
               sum(CASE WHEN jump > 150 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY frame_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS scene_id
        FROM jumps)
      SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
             CAST(min(frame_idx) AS BIGINT) AS keyframe_idx,
             CAST(min([frame_idx, frame_sig])[2] AS BIGINT)
               AS keyframe_sig,
             CAST(count(*) AS BIGINT) AS scene_len
      FROM flagged
      GROUP BY doc_id, scene_id
      ORDER BY doc_id, scene_id"""),
  )

  /** One-time bucketed twin tables for m12's alignment join (idempotent
    * per session via tableExists, the q42 convention; public so Bench
    * prewarms the writes as fixture setup). The caption side is the
    * feature-hashed text vector: each word lands in one of 64 dims by
    * md5 with a ±1 md5-parity sign (the hashing-trick text encoder —
    * the deterministic stand-in for a CLIP text tower, per the m-pack
    * stub convention), accumulated per doc into a dense FLOAT array.
    * The media side is the embeddings table as-is (the stand-in for
    * the image tower's output). BOTH are written bucketed on the id
    * (8 buckets, sorted) — the pay-the-shuffle-once posture: at 100 TB
    * caption features and media embeddings are stored co-bucketed at
    * ingest, so the alignment join (and every re-score with a new
    * threshold) plans with ZERO exchange and the embedding payload
    * never rides a shuffle (the payload-on-the-wire invariant; only
    * (doc_id, dim, sign) ints shuffle inside the one-time write). */
  def prewarmAlignmentTables(
      s: org.apache.spark.sql.SparkSession, d: String): (String, String) = {
    val (tag, wh) = Relational.fixtureLoc(d)
    val capT = s"graft_caption_tf_$tag"
    val embT = s"graft_embeddings_b_$tag"
    Relational.ensureBucketed(
      s, wh, capT,
      T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .select(
          col("doc_id"),
          expr("CAST(conv(substr(md5(word), 1, 2), 16, 10) AS INT) % 64")
            .as("dim"),
          expr("""CASE WHEN CAST(conv(substr(md5(word), 3, 1), 16, 10)
                            AS INT) % 2 = 0
                  THEN 1L ELSE -1L END""").as("sgn"))
        .groupBy(col("doc_id"), col("dim"))
        .agg(sum(col("sgn")).as("w"))
        .groupBy(col("doc_id"))
        .agg(map_from_entries(collect_list(struct(col("dim"), col("w"))))
          .as("m"))
        .select(col("doc_id"),
          expr("""transform(sequence(0, 63),
                    i -> CAST(coalesce(element_at(m, i), 0L) AS FLOAT))""")
            .as("tf")),
      "doc_id")
    Relational.ensureBucketed(s, wh, embT, T.embeddings(s, d), "vec_id")
    (capT, embT)
  }

  /** CLIP-score alignment filter — the LAION curation gate (Schuhmann
    * et al. 2021/2022): keep a media-caption pair iff the cosine
    * between the text tower's and the image tower's embeddings clears
    * a threshold (LAION-400M used 0.3 on real CLIP; the stub towers'
    * random geometry centers alignment at 0, so the gate here is
    * align ≥ 0 — the MECHANISM is what's exercised, per the m-pack
    * stub convention). The keep decision uses the ROUNDED score so it
    * cannot flip between engines on a summation-order ulp.
    *
    * Scale shape (100 TB): both towers' outputs read from the
    * co-bucketed stored tables ([[prewarmAlignmentTables]]), so the
    * id-equi join plans ZERO exchanges (MERGE hint; plan-pinned like
    * q42) and the three dot products (dot, both norms) run in the
    * codegen'd [[graft.functions.FloatVectorDot]] kernel map-side.
    * Nothing data-sized broadcasts; the embedding payload never rides
    * a hash exchange; the final orderBy is the query's own output
    * shipping. */
  private val m12 = Q(
    "m12_clip_filter",
    (s, d) => {
      val (capT, embT) = prewarmAlignmentTables(s, d)
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        graft.functions.GraftFunctions.vecDot(s, a, b)
      s.table(capT).hint("MERGE")
        .join(s.table(embT), col("doc_id") === col("vec_id"))
        .withColumn("dotp", dot(col("tf"), col("embedding")))
        .withColumn("tnorm", sqrt(dot(col("tf"), col("tf"))))
        .withColumn("inorm", sqrt(dot(col("embedding"), col("embedding"))))
        .withColumn("align",
          round(
            when(col("tnorm") === 0 || col("inorm") === 0, lit(0.0))
              .otherwise(col("dotp") / (col("tnorm") * col("inorm"))), 6)
            + lit(0.0))
        .select(
          col("doc_id"),
          expr("""CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END""")
            .as("media_type"),
          col("align"),
          when(col("align") >= 0, 1).otherwise(0).as("kept"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents),
      h AS (
        SELECT doc_id,
               (16 * (strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1)
                  + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS dim,
               CASE WHEN (strpos('0123456789abcdef',
                                 substr(md5(word), 3, 1)) - 1) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM w),
      tf AS (
        SELECT doc_id, dim, CAST(sum(sgn) AS DOUBLE) AS tfw
        FROM h GROUP BY 1, 2),
      grid AS (
        -- Derived from docs that PRODUCE words (w), not the raw table:
        -- Spark's explode(split(text)) drops a NULL-text doc entirely,
        -- and so does w's unnest — deriving the grid from the raw table
        -- would re-admit such a doc on the oracle side only (ADVICE
        -- r16: a latent engine divergence if fixtures ever carry nulls).
        SELECT d.doc_id, g.i
        FROM (SELECT DISTINCT doc_id FROM w) d, range(0, 64) g(i)),
      tfl AS (
        SELECT grid.doc_id AS doc_id,
               list(coalesce(tfw, 0.0) ORDER BY i) AS tf
        FROM grid LEFT JOIN tf ON tf.doc_id = grid.doc_id
                              AND tf.dim = grid.i
        GROUP BY grid.doc_id),
      sc AS (
        SELECT t.doc_id,
               list_sum(list_transform(range(1, 65),
                 i -> t.tf[i] * CAST(e.embedding[i] AS DOUBLE))) AS dotp,
               sqrt(list_sum(list_transform(range(1, 65),
                 i -> t.tf[i] * t.tf[i]))) AS tnorm,
               sqrt(list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * e.embedding[i])))
                 AS inorm
        FROM tfl t JOIN embeddings e ON t.doc_id = e.vec_id)
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             round(CASE WHEN tnorm = 0 OR inorm = 0 THEN 0.0
                        ELSE dotp / (tnorm * inorm) END, 6)
               + CAST(0.0 AS DOUBLE) AS align,
             CASE WHEN round(CASE WHEN tnorm = 0 OR inorm = 0 THEN 0.0
                                  ELSE dotp / (tnorm * inorm) END, 6)
                       + CAST(0.0 AS DOUBLE) >= 0
                  THEN 1 ELSE 0 END AS kept
      FROM sc
      ORDER BY doc_id"""),
  )

  val all: Seq[Q] =
    Seq(m01, m02, m03, m04, m05, m06, m07, m08, m09, m10, m11, m12)
}
