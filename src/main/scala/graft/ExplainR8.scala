package graft
import org.apache.spark.sql.SparkSession
object ExplainR8 {
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
