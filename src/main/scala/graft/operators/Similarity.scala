package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over the embedding column
  * (ArrayType(FloatType), fixed dim 64, L2-normalized per FIXTURES.md so
  * cosine = dot product).
  *
  * s01 is the exact brute-force baseline (O(n) per query — at 100 TB this
  * is a broadcast of the query vector and a single TakeOrderedAndProject,
  * no shuffle). s02 is the IVF-style scale path: coarse-quantize into
  * partitions (the `label` column plays the cluster-id role), rank
  * centroids against the query, probe only the nearest nprobe=2 cells —
  * at scale the probed cells are partition-pruned instead of scanned.
  */
object Similarity {

  /** dot(a, b) via the native codegen'd [[graft.functions.FloatVectorDot]]
    * expression: promoted to double, accumulated left-to-right — the same
    * IEEE operation sequence as the HOF fold the DuckDB oracle mirrors
    * (list_sum ∘ list_transform), so results stay bit-identical while the
    * per-row intermediate product array and lambda dispatch disappear. */
  private def dot(s: SparkSession, a: Column, b: Column): Column =
    GraftFunctions.vecDot(s, a, b)

  /** Exact brute-force cosine top-k for the query vector vec_id=0. */
  private val s01 = Q(
    "s01_ann_brute_topk",
    (s, d) => {
      val e = T.embeddings(s, d)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(
          col("vec_id"),
          col("label"),
          round(dot(s, col("embedding"), col("qv")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    },
    Some("""
      SELECT e.vec_id, e.label,
             round(list_sum(list_transform(range(1, 65),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
               6) AS cosine
      FROM embeddings e,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
      ORDER BY cosine DESC, vec_id
      LIMIT 10"""),
  )

  /** IVF-style ANN: centroid per label cell (element-wise mean), rank
    * cells by centroid·query, probe top-2 cells only, exact rank inside.
    * Centroid ranking is rounded to 9 dp so summation-order noise cannot
    * flip cell selection between engines. */
  private val s02 = Q(
    "s02_ann_ivf",
    (s, d) => {
      val e    = T.embeddings(s, d)
      val rest = e.filter(col("vec_id") =!= 0)
      val qRow = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val qExp = e.filter(col("vec_id") === 0)
        .select(posexplode(col("embedding")).as(Seq("pos", "qval")))
      val cent = rest
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("v").cast("double")).as("c"))
      val cellRank = cent
        .join(broadcast(qExp), "pos")
        .groupBy(col("label"))
        .agg(round(sum(col("c") * col("qval").cast("double")), 9).as("cd"))
        .orderBy(col("cd").desc, col("label"))
        .limit(2)
        .select(col("label"))
      rest
        .join(broadcast(cellRank), "label")
        .crossJoin(broadcast(qRow))
        .select(
          col("vec_id"),
          col("label"),
          round(dot(s, col("embedding"), col("qv")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    },
    Some("""
      WITH cent AS (
        SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS c
        FROM embeddings, range(1, 65) t(i)
        WHERE vec_id <> 0
        GROUP BY label, i),
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      cellrank AS (
        SELECT label, round(sum(c * CAST(qv[i] AS DOUBLE)), 9) AS cd
        FROM cent, q
        GROUP BY label
        ORDER BY cd DESC, label
        LIMIT 2)
      SELECT e.vec_id, e.label,
             round(list_sum(list_transform(range(1, 65),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))),
               6) AS cosine
      FROM embeddings e JOIN cellrank USING (label), q
      WHERE e.vec_id <> 0
      ORDER BY cosine DESC, vec_id
      LIMIT 10"""),
  )

  /** Batch ANN JOIN: top-5 corpus neighbors for EACH of a 20-vector query
    * set — the retrieval/dedup-across-datasets primitive (every query
    * vector of set A matched against corpus B). Plan: broadcast the small
    * query side, score the corpus in one pass with the codegen'd vec_dot,
    * then per-query top-k through the custom two-phase TopKPerGroup
    * operator — map-side partial heaps shrink the shuffle to
    * partitions·queries·k rows, so the corpus itself is never shuffled.
    * At 100 TB that is exactly the viable shape: one corpus scan, k rows
    * per query per map task over the wire. */
  private val s03 = Q(
    "s03_ann_join",
    (s, d) => {
      val e = T.embeddings(s, d)
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val corpus = e.filter(col("vec_id") >= 20)
      val scored = corpus
        .crossJoin(broadcast(queries))
        .select(
          col("query_id"),
          col("vec_id"),
          round(dot(s, col("embedding"), col("qv")), 6).as("cosine"))
      graft.plans.TopK
        .perGroup(
          s,
          scored,
          Seq(col("query_id")),
          Seq(col("cosine").desc, col("vec_id").asc),
          5)
        .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
    },
    Some("""
      SELECT query_id, vec_id, cosine
      FROM (
        SELECT q.vec_id AS query_id, e.vec_id,
               round(list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
                 6) AS cosine,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, 65),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
                   6) DESC, e.vec_id ASC) AS rk
        FROM embeddings e, embeddings q
        WHERE q.vec_id < 20 AND e.vec_id >= 20)
      WHERE rk <= 5
      ORDER BY query_id, cosine DESC, vec_id"""),
  )

  /** LSH-bucketed ANN — the hash-partitioned scale path alongside s02's
    * IVF: 16 sign-LSH plane bits ([[graft.functions.SignDots16]], the
    * same deterministic ±1 hyperplanes d06 uses) banded 4×4 bits; a
    * vector is a candidate iff it shares at least one band value with
    * the query vector. 4-bit bands collide at rate ~1/16 per band, so
    * one probe point keeps a dense-enough candidate set (~1/4 of the
    * corpus across 4 bands) to rank top-10 from — an explicit
    * recall/cost knob: widen bands for less scoring at lower recall.
    *
    * 100 TB posture: the signature is one map-only codegen pass; at
    * scale the corpus is stored bucketed by band value so a probe reads
    * only the query's 4 buckets (partition pruning), and the exact
    * scoring touches ~n/16 per band, never all pairs. Like d06/s02, the
    * oracle mirrors the identical deterministic computation (plane
    * matrix baked as literals), so results hash-match exactly. */
  private val s04 = {
    import graft.operators.SignBands.{bandSpark, bandDuck}
    val bandsS = (0 until 4).map(b => s"(${bandSpark(b, 4)}) AS band$b")
    val bandsD = (0 until 4).map(b => s"(${bandDuck(b, 4)}) AS band$b")
    Q(
      "s04_ann_lsh",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = T.embeddings(s, d)
        val sig = e
          .selectExpr(
            Seq("vec_id", "label", "embedding",
              "sign_dots16(embedding) AS dots"): _*)
          .selectExpr(
            Seq("vec_id", "label", "embedding") ++ bandsS: _*)
        val q = sig.filter(col("vec_id") === 0)
          .select(
            col("embedding").as("qv"),
            col("band0").as("qb0"), col("band1").as("qb1"),
            col("band2").as("qb2"), col("band3").as("qb3"))
        sig.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .filter(
            col("band0") === col("qb0") || col("band1") === col("qb1") ||
              col("band2") === col("qb2") || col("band3") === col("qb3"))
          .select(
            col("vec_id"),
            col("label"),
            round(dot(s, col("embedding"), col("qv")), 6).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""
      WITH sig AS (
        SELECT vec_id, label, embedding, ${bandsD.mkString(", ")}
        FROM embeddings),
      q AS (
        SELECT embedding AS qv, band0 AS qb0, band1 AS qb1,
               band2 AS qb2, band3 AS qb3
        FROM sig WHERE vec_id = 0)
      SELECT e.vec_id, e.label,
             round(list_sum(list_transform(range(1, 65),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))),
               6) AS cosine
      FROM sig e, q
      WHERE e.vec_id <> 0
        AND (e.band0 = q.qb0 OR e.band1 = q.qb1 OR
             e.band2 = q.qb2 OR e.band3 = q.qb3)
      ORDER BY cosine DESC, vec_id
      LIMIT 10"""),
    )
  }

  /** Int8 embedding quantization with a reconstruction-error audit — the
    * storage tier of ANN at scale: per-vector absmax scaling to [-127,
    * 127] integers cuts embedding storage/bandwidth 4× (the same scheme
    * faiss-style scalar quantization and int8 GEMM kernels use), and the
    * per-vector error ceiling is the audit a pipeline runs before
    * swapping the fp32 column out. Quantization uses FLOOR, not
    * round-to-nearest: floor has no tie mode, so the integer codes are
    * bit-identical across engines (the q44/t08 half-tie lesson), while
    * real deployments would round — the audit math is unchanged. Both
    * engines promote float→double and compute (x·127)/absmax with the
    * same parenthesization, so codes and scaled errors agree exactly.
    * Map-only per row; nothing shuffles until the final (tiny) sort. */
  private val s05 = Q(
    "s05_embed_quantize",
    (s, d) =>
      T.embeddings(s, d)
        .withColumn(
          "maxabs",
          expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
        .filter(col("maxabs") > 0)
        .withColumn(
          "q",
          expr("transform(embedding, " +
            "x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs) AS BIGINT))"))
        .select(
          col("vec_id"),
          expr("aggregate(q, 0L, (a, x) -> a + x)").as("sum_q"),
          expr("array_max(q)").as("max_q"),
          expr("array_min(q)").as("min_q"),
          expr("CAST(floor(array_max(zip_with(embedding, q, " +
            "(x, qi) -> abs(CAST(x AS DOUBLE) * 127.0 / maxabs - qi))) " +
            "* 1000000) AS BIGINT)").as("max_err_ppm"))
        .orderBy(col("vec_id")),
    Some("""
      WITH m AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings),
      qz AS (
        SELECT vec_id, embedding, maxabs,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs)
                      AS BIGINT)) AS qv
        FROM m WHERE maxabs > 0)
      SELECT vec_id,
             CAST(list_sum(qv) AS BIGINT) AS sum_q,
             CAST(list_max(qv) AS BIGINT) AS max_q,
             CAST(list_min(qv) AS BIGINT) AS min_q,
             CAST(floor(list_max(list_transform(range(1, len(embedding) + 1),
               i -> abs(CAST(embedding[i] AS DOUBLE) * 127.0 / maxabs - qv[i])))
               * 1000000) AS BIGINT) AS max_err_ppm
      FROM qz
      ORDER BY vec_id"""),
  )

  /** k-means E-step — centroid assignment, the workhorse of embedding
    * clustering for data-mixture curation (cluster-then-balance) and IVF
    * index builds (s02's cells come from exactly this step at scale).
    * Centroids are the k=8 lowest-vec_id vectors (a deterministic seed
    * choice; a real run would iterate Lloyd rounds, each round being this
    * same job). Squared L2 is computed as a·a + c·c − 2·(a·c) with three
    * [[graft.functions.FloatVectorDot]] folds, so every double matches
    * the oracle's mirrored list_sum folds bit-for-bit; assignment is
    * argmin(dist) with ties to the lowest centroid id. The per-centroid
    * report uses integer rollups only (counts, id sums, per-row
    * floor-ppm distances summed as BIGINT) — a float mean would hang the
    * oracle on group summation order; the M-step's mean is the same
    * rollup shape with per-dimension sums.
    *
    * Scale posture: centroids BROADCAST (k rows), the corpus scan is
    * map-only, and the only shuffle is the k-row final rollup — the
    * canonical distributed Lloyd iteration. */
  private val s06 = Q(
    "s06_kmeans_assign",
    (s, d) => {
      val e = T.embeddings(s, d)
      val cent = e.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      e.crossJoin(broadcast(cent))
        .select(
          col("vec_id"), col("cid"),
          (dot(s, col("embedding"), col("embedding"))
            + dot(s, col("cvec"), col("cvec"))
            - lit(2) * dot(s, col("embedding"), col("cvec"))).as("dist"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("cid"))
        .agg(
          count(lit(1)).as("n_assigned"),
          sum(col("vec_id")).as("sum_vec_id"),
          sum(expr("CAST(floor(dist * 1000000) AS BIGINT)"))
            .as("sum_dist_ppm"))
        .orderBy(col("cid"))
    },
    Some("""
      WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 8),
      pairs AS (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE)
                    * CAST(e.embedding[i] AS DOUBLE)))
             + list_sum(list_transform(range(1, 65),
                 i -> CAST(c.cvec[i] AS DOUBLE)
                    * CAST(c.cvec[i] AS DOUBLE)))
             - 2 * list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE)
                    * CAST(c.cvec[i] AS DOUBLE))) AS dist
        FROM embeddings e CROSS JOIN cent c),
      assigned AS (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY dist, cid) AS rk
        FROM pairs)
      SELECT cid,
             count(*) AS n_assigned,
             CAST(sum(vec_id) AS BIGINT) AS sum_vec_id,
             CAST(sum(CAST(floor(dist * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_dist_ppm
      FROM assigned
      WHERE rk = 1
      GROUP BY cid
      ORDER BY cid"""),
  )

  val all: Seq[Q] = Seq(s01, s02, s03, s04, s05, s06)
}
