package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary

import graft.SparkSpec

/** q54's scale claim, asserted from the parquet footers themselves: the
  * sort-clustered events copy must put each file's (event_type, ts)
  * min/max stats on a narrow range, so a selective predicate admits a
  * STRICT SUBSET of files — on an unclustered layout every file's stats
  * span the whole domain and stats-based pruning (row-group skipping
  * here, manifest-level file skipping in a table format) eliminates
  * nothing. */
class FileStatsClusteringSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("clustered layout: a selective event_type predicate admits a " +
    "strict subset of files by footer min/max") {
    val dir = graft.operators.Relational.prewarmClusteredEvents(spark, sf)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .toSeq
    assert(files.size > 1, s"need several files to prune, got ${files.size}")

    // Per file: min/max of event_type across its row groups.
    val typeRanges = files.map { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        val stats = rdr.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == "event_type")
          .map(_.getStatistics)
        assert(stats.nonEmpty && stats.forall(s => s.hasNonNullValue),
          s"no event_type stats in ${f.getName}")
        val mins = stats.map(_.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8)
        val maxs = stats.map(_.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8)
        (f.getName, mins.min, maxs.max)
      } finally rdr.close()
    }

    val admitting = typeRanges.filter { case (_, lo, hi) =>
      lo <= "purchase" && "purchase" <= hi
    }
    assert(admitting.nonEmpty, "the predicate value must exist somewhere")
    assert(
      admitting.size < typeRanges.size,
      s"clustering produced no file-level discrimination: every file admits " +
        s"'purchase' — $typeRanges")
  }
}
