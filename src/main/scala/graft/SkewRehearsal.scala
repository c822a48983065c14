package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial-skew rehearsal: the measured counterpart of the
  * OperatorInvariantProps planted-skew property. Builds a corpus where
  * ONE 16-word boilerplate block opens EVERY document and ~10% of the
  * corpus is ONE exact-duplicate page — the viral license-stub /
  * empty-page shape whose chunk, span, gram, and content hashes are
  * each a single hot key touching (nearly) all rows — then times the
  * d01/d14/d15/d18/t21 production rewrites (partial aggregation +
  * join-back) against the r12-era `Window.partitionBy(hash)` shapes on
  * the SAME corpus, and cross-checks that both produce identical rows.
  *
  * The point: at bench scale both shapes finish — the difference is a
  * single-task sort buffer that grows with corpus size ON THE HOT KEY
  * ONLY for the window shape. Run it one decade up (on a
  * ScaleRehearsal tree) and the window column grows super-linearly
  * while the rewrite column scales with the cluster.
  *
  * Usage:
  *   sbt "runMain graft.SkewRehearsal /root/testdata/sf0.1 target/skew01"
  *   sbt "runMain graft.SkewRehearsal target/sf1 target/skew1"
  *
  * Prints one JSON line: per-op rewrite/window wall seconds + the
  * equality verdicts. Idempotent fixture build via a ready marker.
  */
object SkewRehearsal {

  def main(args: Array[String]): Unit = {
    val src  = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out  = args.lift(1).getOrElse("target/skew01")
    // Viral MASS multiplier: the block is repeated R times at the head
    // of every doc. Identical blocks collapse to ONE chunk hash (and a
    // handful of cyclic span/gram hashes), so the hot key's row count is
    // R × corpus — the knob that makes a single-task window buffer grow
    // past what a bench-scale corpus alone can demonstrate.
    val viralRepeats = args.lift(2).map(_.toInt).getOrElse(1)
    // `prewarm` as arg 3: bill the rewrites' READ pass only (the
    // write-once fixtures stay warm between runs) — the amortized
    // production posture, where chunking/banding 100 TB happens once
    // per corpus snapshot at ingest. Default bills total work per
    // shape (fixtures cleared before every rewrite run).
    val prewarmFixtures = args.lift(3).contains("prewarm")
    // arg 4: comma-separated op-name filter (decade runs bill one op at
    // a time — d10's tier needs the cluster fixpoint, which at sf1 is
    // minutes of common-cost setup the other tiers shouldn't wait on).
    val onlyOps = args.lift(4).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- skewed corpus: viral prefix on EVERY doc + exact-dup clones
    val viral = Seq.fill(viralRepeats)(
      (1 to 16).map(i => s"viralword$i").mkString(" ")).mkString(" ")
    // The marker records the BUILD PARAMETERS, not bare existence:
    // rerunning with a different (src, viralRepeats) against a warm out
    // dir must rebuild, not silently reuse the old corpus while the
    // emitted JSON labels results with the new viral_repeats value.
    val ready      = new java.io.File(out, "_READY")
    val buildStamp = s"src=$src viralRepeats=$viralRepeats"
    if (ready.exists()) {
      val prior = new String(
        java.nio.file.Files.readAllBytes(ready.toPath), "UTF-8").trim
      if (prior != buildStamp) {
        println(s"[skew] $out was built with '$prior', requested " +
          s"'$buildStamp' — rebuilding")
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
          x.delete()
        }
        rm(new java.io.File(out))
      }
    }
    if (!ready.exists()) {
      new java.io.File(out).mkdirs()
      val docs   = spark.read.parquet(s"$src/documents.parquet")
      val dShift = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val nDocs  = docs.count()
      val prefixed = docs.select(
        col("doc_id"),
        concat(lit(viral + " "), col("text")).as("text"),
        col("lang"), col("source"))
      // ~10% of the corpus: ONE page, byte-identical everywhere — the
      // d01 hot group (and more mass on the same viral chunk/spans).
      val clones = spark.range(nDocs / 10).select(
        (col("id") + dShift).as("doc_id"),
        lit(viral).as("text"), lit("en").as("lang"),
        lit("viralsrc").as("source"))
      prefixed.unionByName(clones)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      java.nio.file.Files.write(ready.toPath, buildStamp.getBytes("UTF-8"))
      println(s"[skew] $out built from $src (+${nDocs / 10} clones)")
    }

    // The rewrites' write-once fixtures must be COLD so their build cost
    // is inside the timing — the comparison is total work per shape.
    def clearFixtures(): Unit =
      for (p <- Seq(operators.Dedup.chunkPairsPath(out),
          operators.Dedup.corpusBandIndexPath(out))) {
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
          x.delete()
        }
        rm(new java.io.File(p))
      }

    def timed(body: => DataFrame): (Double, DataFrame) = {
      val t0 = System.nanoTime()
      val df = body
      df.write.format("noop").mode("overwrite").save()
      ((System.nanoTime() - t0) / 1e9, df)
    }
    def fingerprint(df: DataFrame): (Long, Long, BigDecimal) = {
      // Order-invariant row-set fingerprint. XOR alone (chosen over a
      // long sum, which overflows 2^63-range hashes under ANSI mode)
      // collides for multisets differing by PAIRED duplicate rows —
      // {a,a,b,b} and {c,c,d,d} both XOR to 0 at equal count — so a
      // second independent reduction (exact decimal sum of the same
      // hashes) runs alongside: paired-duplicate cancellation cannot
      // zero both.
      val cols = df.columns.map(col)
      val r = df.select(xxhash64(scala.collection.immutable.ArraySeq.unsafeWrapArray(cols): _*).as("rh"))
        .agg(count(lit(1)), expr("bit_xor(rh)"),
          expr("sum(CAST(rh AS DECIMAL(38,0)))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) BigDecimal(0) else BigDecimal(r.getDecimal(2)))
    }

    // ---- the r12-era Window.partitionBy(hash) shapes, verbatim in
    // spirit: global first-occurrence / corpus frequency / cross-doc
    // test each as a window over the hash — the single-hot-task form
    // the production operators replaced.
    val ChunkWords = 16
    val SpanWords  = 6
    def docsTbl: DataFrame = Tables.documents(spark, out)
      .repartition(spark.sparkContext.defaultParallelism)
    def chunked: DataFrame = {
      val w   = split(col("text"), " ")
      val nCh = ceil(size(w) / lit(ChunkWords.toDouble)).cast("int")
      val chunks = transform(sequence(lit(0), nCh - 1),
        i => array_join(slice(w, i * ChunkWords + 1, lit(ChunkWords)), " "))
      docsTbl.select(col("doc_id"), explode(chunks).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("h"))
    }

    def d01Window: DataFrame = {
      val hw = Window.partitionBy(col("content_hash"))
      docsTbl.select(col("doc_id"), md5(col("text")).as("content_hash"))
        .withColumn("canonical_id", min(col("doc_id")).over(hw))
        .withColumn("group_size", count(lit(1)).over(hw))
        .select(col("doc_id"), col("content_hash"), col("canonical_id"),
          col("group_size"),
          (col("doc_id") =!= col("canonical_id")).as("is_duplicate"))
        .orderBy(col("doc_id"))
    }
    def d14Window: DataFrame = {
      val hw = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      chunked
        .withColumn("rk", row_number().over(hw))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
        .selectExpr("doc_id", "n_chunks", "n_dup_chunks",
          "(n_chunks - n_dup_chunks) * 1000000 div n_chunks AS retained_ppm")
        .orderBy(col("doc_id"))
    }
    def d15Window: DataFrame = {
      val hw = Window.partitionBy(col("h"))
      chunked
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("n_occ"))
        .withColumn("doc_freq", count(lit(1)).over(hw))
        .groupBy(col("doc_id"))
        .agg(sum(col("n_occ")).as("n_chunks"),
          sum(when(col("doc_freq") >= 3, col("n_occ")).otherwise(0L))
            .as("n_boiler_chunks"))
        .selectExpr("doc_id", "n_chunks", "n_boiler_chunks",
          "(n_chunks - n_boiler_chunks) * 1000000 div n_chunks AS retained_ppm")
        .orderBy(col("doc_id"))
    }
    def d18Window: DataFrame = {
      val K = SpanWords
      val base = docsTbl.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val wins = docsTbl
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= K)
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), size(col("w")) - K),
          p => md5(array_join(slice(col("w"), p + 1, lit(K)), " "))))
          .as(Seq("pos", "h")))
      val hw = Window.partitionBy(col("h"))
      val dups = wins
        .withColumn("dup",
          min(col("doc_id")).over(hw) =!= max(col("doc_id")).over(hw))
        .filter(col("dup")).select(col("doc_id"), col("pos"))
      val seqW = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val runs = dups
        .withColumn("brk",
          when(col("pos") - lag(col("pos"), 1).over(seqW) > K, 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("brk")).over(seqW))
        .groupBy(col("doc_id"), col("run_id"))
        .agg((max(col("pos")) - min(col("pos")) + K).cast("long").as("run_len"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("dup_runs"), sum(col("run_len")).as("dup_tokens"),
          max(col("run_len")).as("longest_run"))
      base.join(runs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_runs"), lit(0L)).as("dup_runs"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          coalesce(col("longest_run"), lit(0L)).as("longest_run"))
        .selectExpr("doc_id", "n_tokens", "dup_runs", "dup_tokens",
          "longest_run", "dup_tokens * 1000000 div n_tokens AS dup_token_ppm")
        .orderBy(col("doc_id"))
    }
    def t21Window: DataFrame = {
      val bktW = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val docs = Tables.documents(spark, out)
        .select(col("doc_id"), col("source"),
          graft.functions.GraftFunctions.wordNgrams(spark, col("text"), 2)
            .as("grams"))
        .filter(size(col("grams")) >= 1)
        .withColumn("bucket", ntile(5).over(bktW).cast("long"))
      val gramW = Window.partitionBy(col("h"))
      docs
        .select(col("doc_id"), col("source"), col("bucket"),
          explode(col("grams")).as("gram"))
        .select(col("doc_id"), col("source"), col("bucket"),
          md5(col("gram")).as("h"))
        .withColumn("is_first",
          col("doc_id") === min(col("doc_id")).over(gramW))
        .groupBy(col("source"), col("bucket"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_grams"),
          sum(when(col("is_first"), 1L).otherwise(0L)).as("n_novel"))
        .select(col("source"), col("bucket"), col("n_docs"),
          col("n_grams"), col("n_novel"),
          expr("(1000000 * n_novel) div n_grams").as("novel_ppm"))
        .orderBy(col("source"), col("bucket"))
    }

    // d10's r13-era shape: row_number over Window.partitionBy(cluster_id).
    // The ~10% clone block is ONE cluster, so that window hands one task
    // the whole clone set. Both shapes share the memoized cluster-label
    // fixpoint (computed once per session+dir on the warm pass), so the
    // billed delta isolates window-vs-partial-agg on the survivor step
    // itself — the label fixpoint is common cost, like the prewarmed
    // chunk fixtures under `prewarm`.
    def d10Window: DataFrame = {
      val labeled = operators.Dedup.clusterLabels(spark, out)
        .join(Tables.documents(spark, out)
          .select(col("doc_id"), col("n_chars")), "doc_id")
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      labeled
        .withColumn("rk", row_number().over(w))
        .groupBy(col("cluster_id"))
        .agg(
          count(lit(1)).as("cluster_size"),
          sum(when(col("rk") === 1, col("doc_id"))).as("survivor_id"),
          sum(when(col("rk") === 1, col("n_chars"))).as("survivor_chars"),
          coalesce(sum(when(col("rk") > 1, col("doc_id"))), lit(0L))
            .as("dropped_id_sum"),
          coalesce(sum(when(col("rk") > 1, col("n_chars"))), lit(0L))
            .as("dropped_chars_sum"))
        .filter(col("cluster_size") >= 2)
        .orderBy(col("cluster_id"))
    }

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "d01_dedup_exact"     -> (() => d01Window),
      "d10_dedup_survivors" -> (() => d10Window),
      "d14_paragraph_dedup" -> (() => d14Window),
      "d15_boilerplate_chunks" -> (() => d15Window),
      "d18_exact_substrings" -> (() => d18Window),
      "t21_source_saturation" -> (() => t21Window))
      .filter { case (n, _) => onlyOps.forall(_.contains(n)) }

    val fmt = (v: Double) => "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val lines = ops.map { case (name, windowShape) =>
      // Unbilled warm pass per shape first (first-run codegen/JIT would
      // otherwise be billed to whichever shape runs first), then the
      // billed run — the rewrite's write-once fixture is cleared before
      // BOTH of its runs so its build cost stays inside the timing.
      if (!prewarmFixtures) clearFixtures()
      timed(SparkEntry.queries(name)(spark, out))
      if (!prewarmFixtures) clearFixtures()
      val (tRewrite, dfR) = timed(SparkEntry.queries(name)(spark, out))
      timed(windowShape())
      val (tWindow, dfW) = timed(windowShape())
      val same = fingerprint(dfR) == fingerprint(dfW)
      println(s"[skew] $name rewrite ${fmt(tRewrite)} s / " +
        s"window ${fmt(tWindow)} s / equal=$same")
      s""""$name":{"rewrite":${fmt(tRewrite)},"window":${fmt(tWindow)},"equal":$same}"""
    }
    println(s"""{"metric":"skew_rehearsal","src":"$src","out":"$out","viral_repeats":$viralRepeats,"prewarm":$prewarmFixtures,"ops":{${lines.mkString(",")}}}""")
    spark.stop()
  }
}
