package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-partition-count safety census: no query's RESULT may depend
  * on `spark.sql.shuffle.partitions` — the knob a real deployment sizes
  * to its cluster, which the bench pins to the core count. This main
  * sweeps every registered query at each requested setting (default the
  * extremes 1 and 64 around the repo's 8/16/32 operating points) and
  * diffs an order-invariant fingerprint of every result set: sorted-
  * column JSON per row → xxhash64 → (count, bit_xor). A query whose
  * rows differ across settings — a raw double fold whose summation
  * order leaks into the output, a limit without a total order, a
  * partition-index dependency — prints as a DIVERGENCE and fails the
  * run, as does any query that fails to EXECUTE at any setting (a
  * failure is never counted as invariance). Streaming queries pin
  * their STATE partitioning internally (the StateParts conf flip in
  * runToMemory/runForeachBatch — sized to state volume, independent of
  * this knob), so this sweep exercises their surrounding batch plans
  * like everything else's.
  *
  * Usage: sbt "runMain graft.tools.PartitionInvariance
  *   [/root/testdata/sf0.001] [1,64]"
  * Result is recorded in BASELINE.md ("partition-count invariance").
  */
object PartitionInvariance {

  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val settings = args.lift(1).getOrElse("1,64")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", settings.head)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def sweep(parts: String): Map[String, (Long, Long)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      graft.SparkEntry.queries.map { case (name, fn) =>
        val out =
          try {
            val df   = fn(spark, sf)
            val cols = df.columns.sorted.map(col)
            val r = df
              .select(xxhash64(to_json(struct(cols: _*))).as("h"))
              .agg(count(lit(1)), expr("bit_xor(h)")).head()
            (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
          } catch {
            // A failure is a FAILED CHECK, never a fingerprint: two
            // settings that both throw must not compare as "invariant"
            // (a stale fixture tree would otherwise print divergent:0
            // while checking nothing).
            case e: Throwable =>
              System.err.println(s"[parts=$parts] $name FAILED: ${e.getMessage}")
              failures += s"$name@parts=$parts"
              (-1L, -1L)
          }
        // The Verify reclaim pair: drop checkpointed subtrees and
        // consumed memory-sink buffers between queries.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        graft.operators.Streaming.dropConsumedSinks(spark)
        name -> out
      }
    }

    val bySetting = settings.map(p => p -> sweep(p)).toMap
    val base      = bySetting(settings.head)
    var divergent = List.empty[String]
    base.keys.toSeq.sorted.foreach { name =>
      val fps = settings.map(p => p -> bySetting(p)(name))
      if (fps.map(_._2).distinct.size > 1) {
        divergent ::= name
        println(s"[DIVERGENCE] $name: " +
          fps.map { case (p, (n, h)) => s"parts=$p -> rows=$n hash=$h" }
            .mkString(" | "))
      }
    }
    println(s"""{"metric":"partition_invariance","sf":"$sf","settings":"${
      settings.mkString(",")}","queries":${base.size},"divergent":${
      divergent.size},"failed":${failures.size},"divergent_names":[${
      divergent.sorted.map(n => s""""$n"""").mkString(",")}],"failed_names":[${
      failures.sorted.map(n => s""""$n"""").mkString(",")}]}""")
    spark.stop()
    if (divergent.nonEmpty || failures.nonEmpty || base.isEmpty) sys.exit(1)
  }
}
