package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Guard: a raw TimestampType output column (top-level or nested) is
    * always a latent schema/hash mismatch — Spark's parquet dump is
    * UTC-adjusted (DuckDB reads TIMESTAMPTZ) while oracle timestamps
    * are naive. House convention is date_format(...) to a string
    * (q28/q56/q58). Returns the offending top-level column names. */
  private[graft] def rawTimestampColumns(
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types._
    def hasTs(dt: DataType): Boolean = dt match {
      case _: TimestampType => true
      case s: StructType    => s.fields.exists(f => hasTs(f.dataType))
      case a: ArrayType     => hasTs(a.elementType)
      case m: MapType       => hasTs(m.keyType) || hasTs(m.valueType)
      case _                => false
    }
    schema.fields.collect { case f if hasTs(f.dataType) => f.name }.toSeq
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — trailing names (a local-dev
    // convenience) restrict the dump to those queries; the driver's
    // two-arg invocation always dumps everything.
    val sfDir  = args(0)
    val outDir = args(1)
    val only   = args.drop(2).toSet
    val runT0  = System.nanoTime()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Annotated int64 micros (not INT96) so the driver-side DuckDB
      // reader sees the same logical type Spark computed with.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fixture-schema preamble: one stderr line per table, so a driver-side
    // fixture regeneration (r9: events.ts nanos→timestamp_ntz broke 64
    // queries) shows up as an obvious type diff at the top of the log
    // instead of 64 scattered per-query failures. nanosAsLong first so a
    // TIMESTAMP(NANOS) column prints as bigint rather than throwing.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val desc =
        try spark.read.parquet(s"$sfDir/$t.parquet").schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        catch { case e: Throwable => s"UNREADABLE (${e.getMessage})" }
      System.err.println(s"[verify] fixture schema $t: $desc")
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val rawTs = rawTimestampColumns(df.schema)
        if (rawTs.nonEmpty) throw new IllegalStateException(
          s"query emits raw TimestampType column(s) ${rawTs.mkString(",")}" +
            "; date_format them to strings (see q58)")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Drop any blocks an operator checkpointed for its own self-joins so
      // a 56-query run doesn't accumulate every query's materializations,
      // and drop consumed memory-sink tables (their buffers hold the full
      // streaming result in driver memory; clearCache doesn't touch them).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.operators.Streaming.dropConsumedSinks(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Run manifest: a deterministic all-green correctness sweep produces a
    // byte-identical comparison artifact round over round, which is
    // indistinguishable from a stale file copy. This stamps each dump with
    // when it ran, on what code, and how long it took, so every round's
    // run is self-identifying from the output tree alone.
    locally {
      val commit =
        try {
          val p = new ProcessBuilder("git", "rev-parse", "HEAD")
            .redirectErrorStream(true).start()
          val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
          if (p.waitFor() == 0) out else "unknown"
        } catch { case _: Throwable => "unknown" }
      val manifest =
        s"""{"completed_at":${q(java.time.Instant.now.toString)},""" +
          s""""git_commit":${q(commit)},""" +
          s""""wall_sec":${"%.1f".formatLocal(java.util.Locale.ROOT,
            (System.nanoTime() - runT0) / 1e9)},""" +
          s""""sf_dir":${q(sfDir)},"queries_dumped":${
            SparkEntry.queries.count { case (n, _) =>
              only.isEmpty || only(n) }}}"""
      Files.writeString(Paths.get(s"$outDir/run_manifest.json"),
        manifest + "\n")
    }
    spark.stop()
  }
}
