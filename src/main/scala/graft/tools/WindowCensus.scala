package graft.tools

import org.apache.spark.sql.SparkSession

/** Window-census enumeration: every registered batch query whose
  * physical plan contains a Window node, with the partition specs.
  * [[enumerate]] is THE single source of truth — PlanAuditSpec's
  * window-frame census test consumes it directly (so the documented
  * frame-bound map and this tool cannot drift), and [[main]] prints it
  * for census maintenance. Streaming queries are excluded here and
  * audited via their own specs.
  */
object WindowCensus {

  /** (query name, Window partition-spec strings) for every non-streaming
    * registered query that plans at least one Window node at `sf`.
    * Unpersists between queries so the enumeration doesn't pin the
    * dedup pack's checkpointed subtrees into the shared session. */
  def enumerate(spark: SparkSession, sf: String): Seq[(String, List[String])] =
    graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.contains("stream"))
      .flatMap { name =>
        val p = graft.SparkEntry.queries(name)(spark, sf)
          .queryExecution.sparkPlan.toString
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val specs = "Window \\[[^\\n]*?\\], \\[([^\\]]*)\\]".r
          .findAllMatchIn(p).map(_.group(1)).toList
        val hasWindow = "Window \\[".r.findFirstIn(p).isDefined
        if (hasWindow) Some(name -> specs) else None
      }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    enumerate(spark, sf).foreach { case (name, specs) =>
      println(s"CENSUS $name :: ${specs.mkString(" || ")}")
    }
    spark.stop()
  }
}
