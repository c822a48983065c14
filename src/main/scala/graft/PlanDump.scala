package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: write `.explain("formatted")` for named registered
  * queries to files — the before/after plan evidence the optimization
  * rounds commit under `plans/rN/`. Bench's session config (same
  * master/shuffle-partitions basis), no execution: plans only.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <queryName> [more...]"
  * writes <outDir>/<queryName>_<suffix>.txt per query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args.drop(2)) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        new java.io.File(outDir, s"${n}_$suffix.txt").toPath, plan)
      println(s"[plandump] wrote $n ($suffix): ${plan.linesIterator.size} lines")
    }
    spark.stop()
  }
}
