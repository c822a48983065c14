package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.SparkSpec

/** q62's scale claim, asserted from the parquet footers: bit-interleaved
  * (user_id, ts) clustering must give BOTH single-dimension predicates
  * file-level discrimination — the property a linear (prefix) sort only
  * provides for its leading column. Each file's min/max for user_id AND
  * for ts must admit a strict subset of files under a selective
  * predicate on that dimension alone. */
class ZOrderClusteringSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fileRanges(dir: String, column: String): Seq[(String, Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .toSeq
    assert(files.size > 1, s"need several files to prune, got ${files.size}")
    files.map { f =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        val stats = rdr.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == column)
          .map(_.getStatistics)
        assert(stats.nonEmpty && stats.forall(s => s.hasNonNullValue),
          s"no $column stats in ${f.getName}")
        val mins = stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue)
        val maxs = stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        (f.getName, mins.min, maxs.max)
      } finally rdr.close()
    }
  }

  private def assertStrictSubset(
      ranges: Seq[(String, Long, Long)], lo: Long, hi: Long, what: String): Unit = {
    val admitting = ranges.filter { case (_, mn, mx) => mn <= hi && lo <= mx }
    assert(admitting.nonEmpty, s"$what: predicate range hits no file — $ranges")
    assert(admitting.size < ranges.size,
      s"$what: no file-level discrimination, every file admits [$lo, $hi] — $ranges")
  }

  test("z-ordered layout: a user_id-only predicate admits a strict " +
    "subset of files by footer min/max") {
    val dir = graft.operators.Relational.prewarmZOrderedEvents(spark, sf)
    // Low quartile of the sf0.001 user domain [0, 14].
    assertStrictSubset(fileRanges(dir, "user_id"), 0L, 3L, "user_id")
  }

  test("z-ordered layout: a ts-only predicate admits a strict subset " +
    "of files by footer min/max") {
    val dir = graft.operators.Relational.prewarmZOrderedEvents(spark, sf)
    def micros(s: String): Long =
      java.time.LocalDateTime.parse(s)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assertStrictSubset(
      fileRanges(dir, "ts"),
      micros("2024-01-10T00:00:00"), micros("2024-01-13T00:00:00"), "ts")
  }
}
