package graft.operators

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
  * via Dataset.mapPartitions (rows-only check: no clean SQL analog).
  */
object Multimodal {

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
          "CAST(n_chars % 640 + 16 AS INT) AS width",
          "CAST(n_chars % 360 + 16 AS INT) AS height",
          "CAST(n_chars * 7 AS BIGINT) AS duration_ms")
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
             md5(text) AS checksum,
             CAST(n_chars % 640 + 16 AS INT) AS width,
             CAST(n_chars % 360 + 16 AS INT) AS height,
             CAST(n_chars * 7 AS BIGINT) AS duration_ms
      FROM documents
      ORDER BY doc_id"""),
  )

  /** Partition-parallel "decode + feature extract" over binary payloads.
    *
    * STUB DECODER: a real deployment would decode the media bytes with a
    * codec library here (per batch, inside mapPartitions, exactly this
    * shape). This container ships no codecs, so the decode is a
    * deterministic fake: an 8-bin byte histogram + mean byte value
    * standing in for pixel statistics. The schema, partitioning, and
    * batch iteration are the real thing.
    */
  private val m02 = Q(
    "m02_media_features",
    (s, d) => {
      val spark = s
      import spark.implicits._
      T.documents(s, d)
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
            val mean =
              if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
            // Histogram as a JSON string: the driver's rows-only check
            // factorizes columns in pandas, which cannot hash an ndarray —
            // a scalar string column keeps the operator validatable.
            (docId, bytes.length, math.round(mean * 1e6) / 1e6,
              hist.mkString("[", ",", "]"))
          }
        }
        .toDF("doc_id", "n_bytes", "mean_byte", "byte_hist")
        .orderBy(col("doc_id"))
    },
    None, // stubbed decode: no SQL analog → driver records rows-only check
  )

  val all: Seq[Q] = Seq(m01, m02)
}
