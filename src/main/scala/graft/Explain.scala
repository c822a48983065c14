package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of registered queries.
  * Usage: sbt "runMain graft.Explain <queryName> [more...]" */
object Explain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.01").explain("formatted")
    }
    s.stop()
  }
}
