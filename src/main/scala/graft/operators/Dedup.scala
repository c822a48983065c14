package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables => T}

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash group-by), MinHash+LSH banded near-dup, SimHash with
  * pigeonhole blocking, windowed n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Hash-function portability: every hash used here is md5 (hex string),
  * which Spark and DuckDB compute identically, so the DuckDB oracle can
  * mirror signatures bit-for-bit. MinHash "k independent hash functions"
  * are md5 over a seed-prefixed shingle, and the min is taken
  * lexicographically over hex strings (= min over the 128-bit values).
  *
  * Scale posture (100 TB): signature computation is map-only (array HOFs,
  * no explode/shuffle); candidate generation shuffles only on short band
  * keys; verification touches candidate pairs, never n². The windowed
  * Jaccard variant is the bounded O(k·n) check; MinHash-LSH is the scale
  * path.
  */
object Dedup {

  private val NumHashes = 8
  private val BandSize  = 2 // → 4 bands of 2 hashes

  /** doc_id + distinct word-bigram shingle array, map-only. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(
        col("doc_id"),
        array_distinct(expr(
          "transform(sequence(1, size(ws)-1), " +
            "i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))"))
          .as("sh"))

  private val shingledSql =
    """base AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, len(ws)),
      |                       i -> ws[i] || ' ' || ws[i+1])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |        WHERE len(string_split(text, ' ')) >= 2))""".stripMargin

  /** Exact dedup: md5 content hash, canonical = min doc_id per hash group.
    * At scale this is one shuffle on the 128-bit hash. */
  private val d01 = Q(
    "d01_dedup_exact",
    (s, d) => {
      val w = Window.partitionBy(col("content_hash"))
      T.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .withColumn("group_size", count(lit(1)).over(w))
        .withColumn("is_duplicate", col("doc_id") =!= col("canonical_id"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, md5(text) AS content_hash,
             min(doc_id) OVER w AS canonical_id,
             count(*) OVER w AS group_size,
             doc_id <> min(doc_id) OVER w AS is_duplicate
      FROM documents
      WINDOW w AS (PARTITION BY md5(text))
      ORDER BY doc_id"""),
  )

  /** MinHash signature + banded LSH candidate pairs + exact-Jaccard verify.
    * k=8 md5 minhashes, 4 bands × 2 rows; pairs sharing any band are
    * verified against true shingle-set Jaccard ≥ 0.2. */
  private val d02 = Q(
    "d02_dedup_minhash_lsh",
    (s, d) => {
      val base = shingled(s, d)
      val hashCols: Seq[Column] = (0 until NumHashes).map { i =>
        array_min(transform(col("sh"), x => md5(concat(lit(s"$i:"), x))))
          .as(s"h$i")
      }
      val sig = base.select(col("doc_id") +: hashCols: _*)
      val bandCols = (0 until NumHashes / BandSize).map { b =>
        concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))
      }
      val bands = sig.select(
        col("doc_id"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
      val b1 = bands.select(
        col("doc_id").as("id1"),
        col("band_idx"),
        col("band_val"))
      val b2 = bands.select(
        col("doc_id").as("id2"),
        col("band_idx").as("band_idx2"),
        col("band_val").as("band_val2"))
      val cand = b1
        .join(
          b2,
          col("band_idx") === col("band_idx2") &&
            col("band_val") === col("band_val2") &&
            col("id1") < col("id2"))
        .select(col("id1"), col("id2"))
        .distinct()
      val a = base.select(col("doc_id").as("id1"), col("sh").as("sh1"))
      val b = base.select(col("doc_id").as("id2"), col("sh").as("sh2"))
      cand
        .join(a, "id1")
        .join(b, "id2")
        .select(
          col("id1"),
          col("id2"),
          (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            (size(col("sh1")) + size(col("sh2")) -
              size(array_intersect(col("sh1"), col("sh2")))))
            .as("jacc"))
        .filter(col("jacc") >= 0.2)
        .select(col("id1"), col("id2"), round(col("jacc"), 6).as("jaccard"))
        .orderBy(col("id1"), col("id2"))
    },
    Some {
      val mins = (0 until NumHashes)
        .map(i => s"list_min(list_transform(sh, x -> md5('$i:' || x))) AS h$i")
        .mkString(", ")
      val bandRows = (0 until NumHashes / BandSize)
        .map(b =>
          s"SELECT doc_id, $b AS band_idx, h${2 * b} || h${2 * b + 1} AS band_val FROM sig")
        .mkString(" UNION ALL ")
      s"""
      WITH $shingledSql,
      sig AS (SELECT doc_id, $mins FROM base),
      bands AS ($bandRows),
      cand AS (SELECT DISTINCT b1.doc_id AS id1, b2.doc_id AS id2
               FROM bands b1 JOIN bands b2
                 ON b1.band_idx = b2.band_idx AND b1.band_val = b2.band_val
                AND b1.doc_id < b2.doc_id),
      scored AS (SELECT c.id1, c.id2,
                        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                          AS jacc
                 FROM cand c JOIN base a ON a.doc_id = c.id1
                             JOIN base b ON b.doc_id = c.id2)
      SELECT id1, id2, round(jacc, 6) AS jaccard
      FROM scored WHERE jacc >= 0.2
      ORDER BY id1, id2"""
    },
  )

  /** 16-bit SimHash over the distinct-word set. Per-word md5 computed once;
    * each bit is the sign of a ±1 vote sum (order-independent, so the two
    * engines' differing distinct-ordering cannot matter). */
  private def simhashDf(s: SparkSession, d: String): DataFrame = {
    val bitTerms = (0 until 16)
      .map { i =>
        s"""CASE WHEN aggregate(hv, 0, (acc, h) -> acc +
           | (CASE WHEN instr('89abcdef', substring(h, ${i + 1}, 1)) > 0
           |       THEN 1 ELSE -1 END)) > 0
           | THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"""
          .stripMargin.replaceAll("\n", " ")
      }
      .mkString(" + ")
    T.documents(s, d)
      .withColumn(
        "hv",
        expr("transform(array_distinct(split(text, ' ')), w -> md5(w))"))
      .selectExpr("doc_id", s"($bitTerms) AS simhash")
  }

  private def simhashSql: String = {
    val bitTerms = (0 until 16)
      .map { i =>
        s"""CASE WHEN CAST(list_sum(list_transform(hv,
           | h -> CASE WHEN strpos('89abcdef', substr(h, ${i + 1}, 1)) > 0
           |       THEN 1 ELSE -1 END)) AS BIGINT) > 0
           | THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"""
          .stripMargin.replaceAll("\n", " ")
      }
      .mkString(" + ")
    s"""sigs AS (
       |  SELECT doc_id, ($bitTerms) AS simhash
       |  FROM (SELECT doc_id,
       |               list_transform(list_distinct(string_split(text, ' ')),
       |                              w -> md5(w)) AS hv
       |        FROM documents))""".stripMargin
  }

  private val d03 = Q(
    "d03_dedup_simhash",
    (s, d) => simhashDf(s, d).orderBy(col("doc_id")),
    Some(s"""
      WITH $simhashSql
      SELECT doc_id, simhash FROM sigs ORDER BY doc_id"""),
  )

  /** SimHash near-dup pairs, Hamming ≤ 3, found via pigeonhole blocking:
    * split the 16-bit signature into 4 nibbles — any pair within Hamming 3
    * must agree on ≥ 1 nibble (4 chunks, ≤ 3 differing bits), so an
    * equi-join on (chunk_idx, chunk_val) finds ALL such pairs without the
    * n² cross join. Exact, not approximate. The oracle brute-forces the
    * same result. */
  private val d04 = Q(
    "d04_dedup_simhash_pairs",
    (s, d) => {
      val sig = simhashDf(s, d)
      val chunks = sig.select(
        col("doc_id"),
        col("simhash"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("simhash"), 4 * i).bitwiseAND(lit(15L))): _*))
          .as(Seq("chunk_idx", "chunk_val")))
      val c1 = chunks.select(
        col("doc_id").as("id1"),
        col("simhash").as("sig1"),
        col("chunk_idx"),
        col("chunk_val"))
      val c2 = chunks.select(
        col("doc_id").as("id2"),
        col("simhash").as("sig2"),
        col("chunk_idx").as("ci2"),
        col("chunk_val").as("cv2"))
      c1.join(
          c2,
          col("chunk_idx") === col("ci2") &&
            col("chunk_val") === col("cv2") &&
            col("id1") < col("id2"))
        .select(
          col("id1"),
          col("id2"),
          expr("CAST(bit_count(sig1 ^ sig2) AS INT)").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy(col("id1"), col("id2"))
    },
    Some(s"""
      WITH $simhashSql
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY id1, id2"""),
  )

  /** Exact n-gram (trigram) Jaccard with sliding-window blocking: only
    * pairs within 25 doc_ids are compared — the bounded O(k·n) variant
    * (LSH above is the unbounded-scale path). */
  private val d05 = Q(
    "d05_dedup_ngram_jaccard",
    (s, d) => {
      val tri = T.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(
          col("doc_id"),
          array_distinct(expr(
            "transform(sequence(1, size(ws)-2), i -> concat_ws(' ', " +
              "element_at(ws, i), element_at(ws, i+1), element_at(ws, i+2)))"))
            .as("tg"))
      val a = tri.select(col("doc_id").as("id1"), col("tg").as("tg1"))
      val b = tri.select(col("doc_id").as("id2"), col("tg").as("tg2"))
      a.join(
          b,
          col("id2") > col("id1") && col("id2") <= col("id1") + 25)
        .select(
          col("id1"),
          col("id2"),
          (size(array_intersect(col("tg1"), col("tg2"))).cast("double") /
            (size(col("tg1")) + size(col("tg2")) -
              size(array_intersect(col("tg1"), col("tg2"))))).as("jacc"))
        .filter(col("jacc") >= 0.1)
        .select(col("id1"), col("id2"), round(col("jacc"), 6).as("jaccard"))
        .orderBy(col("id1"), col("id2"))
    },
    Some("""
      WITH tri AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tg
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
              WHERE len(string_split(text, ' ')) >= 3)),
      scored AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
               (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))) AS jacc
        FROM tri a JOIN tri b
          ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 25)
      SELECT id1, id2, round(jacc, 6) AS jaccard
      FROM scored WHERE jacc >= 0.1
      ORDER BY id1, id2"""),
  )

  /** Embedding-cosine near-dup: top-100 most-similar pairs. Vectors are
    * L2-normalized (FIXTURES.md) so cosine = dot product. Brute pair join
    * here; the LSH/IVF variants in Similarity are the 100 TB path. */
  private val d06 = Q(
    "d06_dedup_cosine",
    (s, d) => {
      val e = T.embeddings(s, d)
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("v1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("v2"))
      a.join(b, col("id1") < col("id2"))
        .select(
          col("id1"),
          col("id2"),
          round(
            aggregate(
              zip_with(col("v1"), col("v2"),
                (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0),
              (acc, x) => acc + x),
            6).as("cosine"))
        .orderBy(col("cosine").desc, col("id1"), col("id2"))
        .limit(100)
    },
    Some("""
      SELECT a.vec_id AS id1, b.vec_id AS id2,
             round(list_sum(list_transform(range(1, 65),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
               6) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      ORDER BY cosine DESC, id1, id2
      LIMIT 100"""),
  )

  val all: Seq[Q] = Seq(d01, d02, d03, d04, d05, d06)
}
