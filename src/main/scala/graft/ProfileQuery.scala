package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev utility: run a registered query with Bench's billing (warm pass +
  * billed pass, noop sink) and print per-stage wall/executor-time for the
  * billed pass — the guide §1 "which stage is the time going to" loop,
  * usable without the UI. Stage names carry the call site of the operator
  * that created them, which is enough to map a stage back to a plan node.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.ProfileQuery <queryName> [more...]" */
object ProfileQuery {
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
    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
        execMs: Long, gcMs: Long, shuffleReadMb: Double,
        shuffleWriteMb: Double)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    @volatile var record = false
    val listener = new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        if (record) {
          val i = e.stageInfo
          val wall = (for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b).getOrElse(0L)
          val m = i.taskMetrics
          stages += St(i.stageId, i.name.linesIterator.next().take(90),
            i.numTasks, wall, m.executorRunTime, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
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
      val warm = once(n)
      stages.clear(); record = true
      val billed = once(n)
      record = false
      println(s"[profile] $n warm=${fmt(warm)} s billed=${fmt(billed)} s " +
        s"stages=${stages.size}")
      val top = stages.sortBy(-_.wallMs).take(25)
      for (s <- top) {
        println(f"[profile]   stage=${s.id}%5d wall=${s.wallMs}%6d ms " +
          f"exec=${s.execMs}%6d ms gc=${s.gcMs}%5d ms tasks=${s.tasks}%4d " +
          f"sr=${s.shuffleReadMb}%8.2f MB sw=${s.shuffleWriteMb}%8.2f MB " +
          s"${s.name}")
      }
      val totalWall = stages.map(_.wallMs).sum
      println(s"[profile]   total stage wall=${totalWall} ms " +
        s"(billed includes driver/plan gaps)")
    }
    spark.stop()
  }
}
