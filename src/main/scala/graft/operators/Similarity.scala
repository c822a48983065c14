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

  val all: Seq[Q] = Seq(s01, s02, s03)
}
