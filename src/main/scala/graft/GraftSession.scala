package graft
import org.apache.spark.sql.SparkSession

/** Session tuning shared by every runtime entry point (Bench, Verify,
  * TimeQuery, ProfileQuery, PlanDump) — one place, so the bench, the
  * correctness dump and the dev tools always measure the same engine.
  *
  * Scale posture of each knob (guide §2/§9; values env-overridable so a
  * production deployment can size them to its hardware):
  *
  *  - `spark.sql.adaptive.coalescePartitions.minPartitionSize`
  *    (default here 64k, Spark default 1m). AQE's parallelism-first
  *    coalescing targets max(shuffleBytes/parallelism, minPartitionSize)
  *    per post-shuffle partition. BYTES are the wrong proxy for the
  *    CPU-dense stages this engine runs after tiny exchanges — a few
  *    hundred KB of candidate pairs fan out into millions of
  *    array_intersect/levenshtein evaluations, and the Spark-default 1 MB
  *    floor collapses those stages to ONE task (measured: d02's verify
  *    stage 1.6 s on 1 task vs ~0.1 s wall across 32; d12's K² truth the
  *    same shape). At warehouse scale shuffleBytes/parallelism dwarfs
  *    either floor, so this knob is inert exactly where the default was
  *    chosen for; it only governs the small-bytes/heavy-CPU regime, where
  *    parallelism is worth more than fewer fetches. */
object GraftSession {
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
}
