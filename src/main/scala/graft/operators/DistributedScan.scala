package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-partition exclusive prefix sum — the distributed-scan shape
  * for running totals over a LOW-CARDINALITY stream key.
  *
  * `sum(x) OVER (PARTITION BY stream ORDER BY seq ROWS UNBOUNDED
  * PRECEDING .. 1 PRECEDING)` hands each stream ONE task holding the
  * stream's every row — for a corpus where one language/source is half
  * the data, that is the same single-task cliff as the hash windows the
  * r13–14 campaign removed, except the dependence really is sequential:
  * a prefix sum cannot be computed by a commutative partial aggregate.
  *
  * What it CAN be is the classic two-level scan: block the stream into
  * fixed `seq`-ranges, (1) sum each block with an ordinary
  * partial-combining aggregate, (2) run the unbounded window over the
  * BLOCK TABLE (one row per block — the per-stream task now holds
  * rows/blockSize rows, three orders of magnitude fewer), (3) join the
  * block offsets back (equi-join on the near-unique (stream, block)
  * key) and add a within-block exclusive cumsum whose window partition
  * is (stream, block) — bounded by blockSize rows per task by
  * construction. Integer addition is associative, so the result is
  * EXACTLY the single-window formulation's, row for row; the oracle
  * keeps the textbook SQL.
  *
  * Cost shape: one extra shuffle and a join versus the one-shuffle
  * single-window plan — the price of turning an unbounded per-stream
  * sort buffer into two bounded passes. The block table itself grows as
  * rows/blockSize, so the scan RECURSES: whenever a level's block table
  * could still exceed blockSize rows (judged from plan statistics at
  * plan time — no extra job), its offsets are computed by another
  * two-level scan one level up. Every window task at every level is
  * therefore ≤ blockSize rows BY CONSTRUCTION at any corpus size —
  * 10¹² input rows is depth 3 (4096³ ≈ 6.9×10¹³), not a 2.4×10⁸-row
  * single-task window.
  */
object DistributedScan {

  /** The helpers are general-purpose: a caller whose frame already uses
    * a working-column name (or the output name) would be silently
    * clobbered and get wrong priors with no error — refuse loudly. */
  private def requireFreeNames(
      df: DataFrame, as: String, prefix: String): Unit = {
    val clash = df.columns.filter(c => c == as || c.startsWith(prefix))
    require(clash.isEmpty,
      s"DistributedScan working/output column names collide with input " +
        s"columns ${clash.mkString(", ")} — alias them before calling")
  }

  /** Plan-time row-count bound for deciding recursion depth — the
    * optimizer's statistics, never a job: exact rowCount when the plan
    * carries one (CBO / local relations), else a conservative
    * bytes-per-row floor over sizeInBytes. A small divisor
    * OVER-estimates rows ⇒ recurses a level too many (two tiny extra
    * shuffles) rather than a level too few, which would re-open the
    * unbounded window; unknown stats saturate sizeInBytes at huge
    * defaults and likewise land on "assume big". The estimate is taken
    * ONCE on the input and divided by blockSize per level — aggregate
    * nodes don't propagate the 4096× shrink through sizeInBytes, so
    * re-reading stats per level would always claim "big". */
  private def estimatedRows(df: DataFrame): Double = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount
      .map(_.toDouble)
      .getOrElse(stats.sizeInBytes.toDouble / 8.0)
  }

  /** Hard recursion cap: blockSize^6 at the default 4096 is ~4.7×10²¹
    * rows — beyond any corpus, so the cap exists only to bound a
    * pathological stats estimate, never real data. */
  private val MaxScanLevels = 6

  /** Adds `as` = exclusive running sum of `x` over `seq` within
    * `stream`, computed with bounded window partitions. `seq` must be
    * unique per stream row (doc_id here); `x` must be integral.
    *
    * Recursive: the block table's own offsets are computed by another
    * two-level scan whenever plan statistics say it could exceed
    * blockSize rows, so no window task at any level exceeds blockSize
    * rows at ANY corpus size (see the object scaladoc). */
  def exclusivePrefixSum(
      df: DataFrame,
      stream: Column,
      seq: Column,
      x: Column,
      as: String,
      blockSize: Long = 4096L): DataFrame = {
    requireFreeNames(df, as, "_eps")
    scanLevel(df, stream, seq, x, as, blockSize,
      level = 0, estRows = estimatedRows(df))
  }

  /** One level of the recursive scan. Working columns carry the level
    * (`_eps0_…`, `_eps1_…`) so a recursive call never collides with its
    * caller's; [[requireFreeNames]] reserves the whole `_eps` prefix.
    * `estRows` is this level's input-row estimate; each level's block
    * table is estRows/blockSize rows. */
  private def scanLevel(
      df: DataFrame,
      stream: Column,
      seq: Column,
      x: Column,
      as: String,
      blockSize: Long,
      level: Int,
      estRows: Double): DataFrame = {
    val p = s"_eps${level}_"
    val in = df
      .withColumn(s"${p}stream", stream)
      .withColumn(s"${p}seq", seq)
      .withColumn(s"${p}x", x)
      // `div`, not `/`: Spark's `/` routes longs through DOUBLE, whose
      // quotient can misround for large sequence values.
      .withColumn(s"${p}blk", expr(s"${p}seq div ${blockSize}L"))
    // (1) block sums: plain partial-combining aggregate.
    val blocks = in.groupBy(col(s"${p}stream"), col(s"${p}blk"))
      .agg(sum(col(s"${p}x")).as(s"${p}bsum"))
    // (2) exclusive scan over the block table. If the block table could
    // itself exceed blockSize rows per stream, recurse — the offsets of
    // blocks are just another exclusive prefix sum (blk is unique per
    // stream within it); otherwise one per-stream window of ≤ blockSize
    // rows finishes the scan.
    val blockRows = estRows / blockSize.toDouble
    val offsets =
      if (level + 1 < MaxScanLevels && blockRows > blockSize) {
        scanLevel(blocks, col(s"${p}stream"), col(s"${p}blk"),
          col(s"${p}bsum"), s"${p}boff", blockSize, level + 1, blockRows)
          .select(col(s"${p}stream"), col(s"${p}blk"), col(s"${p}boff"))
      } else {
        val blockW = Window.partitionBy(col(s"${p}stream"))
          .orderBy(col(s"${p}blk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
        blocks
          .withColumn(s"${p}boff",
            coalesce(sum(col(s"${p}bsum")).over(blockW), lit(0L)))
          .select(col(s"${p}stream"), col(s"${p}blk"), col(s"${p}boff"))
      }
    // (3) within-block exclusive cumsum: window partition bounded by
    // blockSize rows, plus the block offset from the equi-join.
    val innerW = Window.partitionBy(col(s"${p}stream"), col(s"${p}blk"))
      .orderBy(col(s"${p}seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    in.join(offsets, Seq(s"${p}stream", s"${p}blk"))
      .withColumn(as,
        col(s"${p}boff") + coalesce(sum(col(s"${p}x")).over(innerW), lit(0L)))
      .drop(s"${p}stream", s"${p}seq", s"${p}x", s"${p}blk", s"${p}boff")
  }

  /** Adds `as` = `row_number() OVER (PARTITION BY stream ORDER BY
    * order...)` (as LONG), computed with bounded window partitions —
    * [[exclusivePrefixSum]]'s sibling applied to COUNTS, the upgrade
    * path SURVEY recorded for the rank family: a per-stream rank window
    * hands each stream ONE task that sorts the stream's every row; here
    * the task bound is rows/buckets.
    *
    * `bucket` must be MONOTONE in the leading sort key — every row of a
    * smaller bucket sorts before every row of a larger one (e.g. a hex
    * prefix of a fixed-width hash string the ordering leads with). Then
    * rank = (count of the stream's rows in earlier buckets) + (rank
    * within the bucket):
    * (1) per-(stream, bucket) row counts — a plain partial-combining
    *     aggregate, the only pass that sees every row on the wire;
    * (2) an exclusive count-scan over the BUCKET TABLE (one row per
    *     non-empty bucket: the per-stream window frame is ≤ #buckets
    *     rows, catalog-bounded by the bucket-key width);
    * (3) equi-join the offsets back on the near-unique (stream, bucket)
    *     key and add a within-bucket `row_number` whose window
    *     partition holds rows/buckets rows by construction.
    * Counting is associative, so the result row-for-row equals the
    * single-window formulation (DistributedScanSpec replays both on a
    * planted hot stream); oracles keep the textbook SQL.
    *
    * WHEN TO PREFER THE TEXTBOOK WINDOW INSTEAD (the cold-case rule,
    * from BASELINE tier 3d's measurements): this shape pays one extra
    * shuffle + join over the plain window, so on a stream population
    * with NO hot key — every stream small enough that its sort fits one
    * task comfortably — the textbook window wins (measured 0.63× at a
    * 0.5%-max-stream cold case). The cliff this removes is the HOT
    * stream: one stream holding a large share of the corpus, where the
    * window's floor is a single task sorting that share regardless of
    * cluster size (measured 5.1× at 95%-hot, 2×10⁸ rows). Every
    * production caller here is hot-stream-shaped BY CONSTRUCTION:
    * q44/q67/q99/q116/q120 partition on ≤~25-value catalog keys
    * (nation, event_type, priority — each stratum is a corpus-scale
    * fraction), q122 ranks a user population under a 5-value type key,
    * and p09/t21 partition on k≈20 sources. A caller whose partition
    * key is a near-unique entity id (user_id, doc_id) should use the
    * plain window — that is the census's `entity` class, bounded by
    * per-entity activity, and the extra shuffle buys nothing. */
  def bucketedRowNumber(
      df: DataFrame,
      stream: Column,
      bucket: Column,
      order: Seq[Column],
      as: String): DataFrame = {
    requireFreeNames(df, as, "_drn_")
    val in = df
      .withColumn("_drn_stream", stream)
      .withColumn("_drn_blk", bucket)
    // (1) bucket counts: plain partial-combining aggregate.
    val counts = in.groupBy(col("_drn_stream"), col("_drn_blk"))
      .agg(count(lit(1)).as("_drn_bcnt"))
    // (2) exclusive count-scan over the bucket table — the only
    // per-stream window, one row per non-empty bucket.
    val blockW = Window.partitionBy(col("_drn_stream"))
      .orderBy(col("_drn_blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = counts
      .withColumn("_drn_boff",
        coalesce(sum(col("_drn_bcnt")).over(blockW), lit(0L)))
      .select(col("_drn_stream"), col("_drn_blk"), col("_drn_boff"))
    // (3) within-bucket rank: window partition bounded at rows/buckets.
    val innerW = Window.partitionBy(col("_drn_stream"), col("_drn_blk"))
      .orderBy(order: _*)
    in.join(offsets, Seq("_drn_stream", "_drn_blk"))
      .withColumn(as,
        col("_drn_boff") + row_number().over(innerW).cast("long"))
      .drop("_drn_stream", "_drn_blk", "_drn_boff")
  }

  /** Per-stream EXACT RANK SELECTION — the value at rank r(n) within
    * each stream's `order`, WITHOUT numbering a single non-candidate
    * row: [[bucketedRowNumber]]'s sibling for the quantile/median-pick
    * family (q67's p25..p99, q116's p05/p95 clip bounds, q120's median
    * pairs), where the full ranking is wasted work — selection only
    * needs the ONE bucket that straddles each target rank.
    *
    *   (1) per-(stream, bucket) row counts — a partial-combining
    *       aggregate, the only pass that aggregates every row;
    *   (2) exclusive count-scan over the bucket table (≤ #buckets rows
    *       per stream) → bucket offsets, and stream totals n = Σ counts;
    *   (3) each target rank rk = f(n) lands in exactly the bucket with
    *       boff < rk ≤ boff + bcnt — a (streams × ranks)-row BOUNDARY
    *       table, broadcast;
    *   (4) a second scan joins the boundary table and keeps ONLY the
    *       boundary buckets' rows (~rows/buckets of the corpus), ranks
    *       them in a window partitioned per (stream, bucket, target) —
    *       bounded by one bucket's occupancy — and picks rk − boff.
    *
    * vs bucketedRowNumber + rank-filter: pass 2 becomes a broadcast-join
    * filter instead of shuffling and sorting the whole corpus to number
    * rows that are then thrown away. Same monotone-bucket contract as
    * [[bucketedRowNumber]]; same result rows (DistributedScanSpec
    * replays the textbook window on a planted hot stream).
    *
    * `stream` is a COLUMN NAME in `df` (it names the output key too);
    * `ranks` maps each output column name to a SQL expression over `n`
    * (the stream's row count, e.g. `"((25 * n) + 99) div 100"`) that
    * must evaluate into [1, n]. Returns one row per stream:
    * (stream, n, <rank-name>...), where each rank column carries
    * `value` at that rank. */
  def rankSelect(
      df: DataFrame,
      stream: String,
      bucket: Column,
      order: Seq[Column],
      value: Column,
      ranks: Seq[(String, String)]): DataFrame = {
    require(ranks.nonEmpty, "rankSelect needs at least one target rank")
    val outNames = ranks.map(_._1) :+ "n"
    val clash = df.columns.filter(c =>
      (outNames.contains(c) && c != stream) || c.startsWith("_rsel_"))
    require(clash.isEmpty,
      s"rankSelect working/output column names collide with input " +
        s"columns ${clash.mkString(", ")} — alias them before calling")
    val in = df
      .withColumn("_rsel_blk", bucket)
      .withColumn("_rsel_val", value)
    // (1) bucket counts: plain partial-combining aggregate.
    val counts = in.groupBy(col(stream), col("_rsel_blk"))
      .agg(count(lit(1)).as("_rsel_bcnt"))
    // (2) exclusive count-scan over the bucket table + stream totals.
    val blockW = Window.partitionBy(col(stream))
      .orderBy(col("_rsel_blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = counts.withColumn("_rsel_boff",
      coalesce(sum(col("_rsel_bcnt")).over(blockW), lit(0L)))
    val totals = counts.groupBy(col(stream))
      .agg(sum(col("_rsel_bcnt")).as("n"))
    // (3) targets in long form, one row per (stream, rank name); the
    // boundary bucket is unique per target because bucket counts are
    // positive and rk ∈ [1, n].
    val targets = ranks.map { case (name, rkExpr) =>
      totals.select(col(stream), lit(name).as("_rsel_name"),
        expr(rkExpr).cast("long").as("_rsel_rk"), col("n"))
    }.reduce(_ unionByName _)
    val boundary = offsets.join(targets, Seq(stream))
      .filter(col("_rsel_boff") < col("_rsel_rk") &&
        col("_rsel_rk") <= col("_rsel_boff") + col("_rsel_bcnt"))
      .select(col(stream), col("_rsel_blk"), col("_rsel_name"),
        col("_rsel_rk"), col("_rsel_boff"), col("n"))
    // (4) candidates only: the inner join keeps boundary buckets' rows;
    // the window partition is one bucket's occupancy per target.
    val innerW = Window
      .partitionBy(col(stream), col("_rsel_blk"), col("_rsel_name"))
      .orderBy(order: _*)
    val picked = in.join(broadcast(boundary), Seq(stream, "_rsel_blk"))
      .withColumn("_rsel_rn", row_number().over(innerW).cast("long"))
      .filter(col("_rsel_boff") + col("_rsel_rn") === col("_rsel_rk"))
    val rankCols = ranks.map { case (name, _) =>
      min(when(col("_rsel_name") === name, col("_rsel_val"))).as(name) }
    picked.groupBy(col(stream))
      .agg(max(col("n")).as("n"), rankCols: _*)
  }

  /** `ntile(k)`'s SQL-standard bucket assignment as a CLOSED FORM over
    * (rank, group size) — the piece that turns [[bucketedRowNumber]]
    * into a distributed ntile: with q = n div k and rem = n mod k, the
    * first rem buckets hold q+1 rows and the rest hold q, so the bucket
    * is pure integer arithmetic on the two inputs (`div`, not `/` —
    * the double path misrounds large quotients). The ELSE divisor q is
    * 0 only when n < k, and then every row satisfies the THEN branch
    * (rem = n), so the NULL-on-zero-div branch is never taken.
    * `rankCol`/`sizeCol` are COLUMN NAMES in the calling frame (1-based
    * rank, positive group size). */
  def ntileFromRank(k: Int, rankCol: String, sizeCol: String): Column = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    expr(
      s"""CASE WHEN $rankCol <= ($sizeCol % $k) * ($sizeCol div $k + 1)
          THEN ($rankCol + $sizeCol div $k) div ($sizeCol div $k + 1)
          ELSE $sizeCol % $k
               + ($rankCol - ($sizeCol % $k) * ($sizeCol div $k + 1) - 1)
                 div ($sizeCol div $k) + 1
          END""")
  }
}
