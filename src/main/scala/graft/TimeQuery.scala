package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registered queries in isolation, with
  * Bench's exact billing (noop-format write materializing every result
  * row, same session config). Each query runs twice — an unbilled
  * JIT/codegen warm pass, then the billed pass — so a single line can be
  * adjudicated out of a full-sweep artifact (is a spike positional/
  * environmental, or does the line reproduce alone?).
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.TimeQuery <queryName> [more...]" */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.operators.Streaming.dropConsumedSinks(spark)
      t
    }
    val fmt = (v: Double) => "%.2f".formatLocal(java.util.Locale.ROOT, v)
    for (n <- args) {
      val warm   = once(n)
      val billed = once(n)
      println(s"[time] $n warm=${fmt(warm)} s billed=${fmt(billed)} s " +
        s"(sf=$sfDir cpus=$cpus)")
    }
    spark.stop()
  }
}
