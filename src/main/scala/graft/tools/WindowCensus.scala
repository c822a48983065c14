package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch main: list every registered batch query whose physical
  * plan contains a Window node, with the partition specs — input for
  * PlanAuditSpec's window-frame census. Not part of the library surface.
  */
object WindowCensus {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streaming = graft.SparkEntry.queries.keys.filter(_.contains("stream")).toSet
    graft.SparkEntry.queries.keys.toSeq.sorted.filterNot(streaming).foreach { name =>
      try {
        val p = graft.SparkEntry.queries(name)(spark, sf)
          .queryExecution.sparkPlan.toString
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val specs = "Window \\[[^\\n]*?\\], \\[([^\\]]*)\\]".r
          .findAllMatchIn(p).map(_.group(1)).toList
        if (specs.nonEmpty)
          println(s"CENSUS $name :: ${specs.mkString(" || ")}")
      } catch {
        case e: Throwable => println(s"CENSUS_ERR $name :: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
