package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary

import graft.SparkSpec

/** p02's layout claim, asserted from the written shard tree itself: the
  * training-shard writer must produce one `shard=` directory per
  * md5-nibble, and within a shard the files — sorted runs cut by
  * maxRecordsPerFile — must carry NON-OVERLAPPING md5-hash ranges in
  * their footer min/max stats, so a point lookup by hash (resume from
  * a training cursor, targeted re-read of one document) admits at most
  * one file per shard instead of scanning the shard. */
class TrainingShardLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("training shards: hash-sorted files within a shard carry " +
    "non-overlapping footer ranges") {
    // Run the registered writer (idempotent overwrite), then audit.
    graft.SparkEntry.queries("p02_training_shards")(spark, sf).collect()
    val root = new java.io.File(graft.operators.Pipeline.shardPath(sf))
    val shardDirs = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 16, s"expected 16 shard dirs in $root")

    var multiFileShards = 0
    shardDirs.foreach { dir =>
      val files = dir.listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .toSeq
      assert(files.nonEmpty, s"empty shard dir ${dir.getName}")
      val ranges = files.map { f =>
        val rdr = ParquetFileReader.open(
          HadoopInputFile.fromPath(
            new Path(f.getAbsolutePath), new Configuration()))
        try {
          val stats = rdr.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == "h")
            .map(_.getStatistics)
          assert(stats.nonEmpty && stats.forall(_.hasNonNullValue),
            s"no h stats in ${dir.getName}/${f.getName}")
          val mins =
            stats.map(_.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8)
          val maxs =
            stats.map(_.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8)
          (mins.min, maxs.max)
        } finally rdr.close()
      }.sortBy(_._1)
      if (ranges.size > 1) {
        multiFileShards += 1
        ranges.sliding(2).foreach { case Seq((_, hi1), (lo2, _)) =>
          assert(hi1 < lo2,
            s"overlapping h ranges in ${dir.getName}: $ranges")
        }
      }
    }
    // maxRecordsPerFile=10 over ~23 docs/shard must split most shards —
    // without this the non-overlap assertion would be vacuous.
    assert(multiFileShards > 8,
      s"expected mostly multi-file shards, got $multiFileShards of 16")
  }
}
